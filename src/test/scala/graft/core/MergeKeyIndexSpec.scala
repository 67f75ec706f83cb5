package graft.core

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.Tables

/** Pins the KEY-LOCATE INDEX contract of [[Merge.mergePartitionedIndexed]]:
  *
  *  1. the touched-partition resolution reads ONLY the `table__keyidx`
  *     relation — never the data table (the plan-level form of "key
  *     location is a metadata job at 100 TB");
  *  2. the indexed path's output and write-amplification are identical to
  *     [[Merge.mergePartitioned]] (same survivors, untouched partitions'
  *     files bit-identical);
  *  3. after every move — in-place update, cross-partition key move,
  *     tombstone-emptied partition — the index equals the table's
  *     (key, partition) projection exactly (the invariant that keeps
  *     future locates correct).
  */
class MergeKeyIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fileState(wh: String, table: String): Map[String, (Long, Long)] = {
    val base = new Path(s"$wh/$table")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Map.empty
    val it = fs.listFiles(base, true)
    val out = scala.collection.mutable.Map[String, (Long, Long)]()
    while (it.hasNext) {
      val f = it.next()
      val rel = f.getPath.toString.stripPrefix(base.toString)
      if (f.getPath.getName.endsWith(".parquet"))
        out(rel) = (f.getLen, f.getModificationTime)
    }
    out.toMap
  }

  private def seed(wh: String): Unit = {
    val v1 = Seq(
      ("A", 1L, 10.0), ("A", 2L, 20.0),
      ("B", 3L, 30.0), ("B", 4L, 40.0),
      ("C", 5L, 50.0))
      .toDF("region", "id", "amount")
      .select($"id", $"amount", $"region")
    val base = new Path(s"$wh/sales")
    base.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(base, true)
    Tables.writeWarehousePartitioned(v1, wh, "sales", Seq("region"))
    Merge.buildKeyIndex(spark, wh, "sales", "id", "region")
  }

  private def mergeIndexed(wh: String, change: org.apache.spark.sql.DataFrame) =
    Merge.mergePartitionedIndexed(spark, wh, "sales", change,
      keyCol = "id", partitionCol = "region",
      order = Seq($"amount".desc_nulls_last),
      isTombstone = $"region" === "DELETED")

  /** index content must equal the table's (key, partition) projection. */
  private def assertIndexExact(wh: String): Unit = {
    val table = Tables.readWarehouse(spark, wh, "sales")
      .select($"id", $"region".cast("string")).as[(Long, String)].collect().toSet
    val idx = Tables.readWarehouse(spark, wh, Merge.keyIndexName("sales"))
      .select($"id", $"region".cast("string")).as[(Long, String)].collect().toSet
    assert(idx === table, "key index drifted from the table's (key, partition) projection")
  }

  test("locate plan reads only the index relation, never the table") {
    val wh = Files.createTempDirectory("graft-mki").toString
    seed(wh)
    val change = Seq((3L, 99.0, "B")).toDF("id", "amount", "region")
    val touched = Merge.touchedPartitionsIndexed(spark, wh, "sales", change,
      "id", "region", $"region" === "DELETED")
    val scans = touched.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val fileScans = scans.filter(_.contains(wh))
    assert(fileScans.nonEmpty, s"expected an index scan, got:\n${scans.mkString("\n")}")
    // every warehouse scan must be of sales__keyidx; none of the bare table
    val masked = fileScans.map(_.replace("sales__keyidx", "IDX"))
    assert(masked.forall(!_.contains("sales")),
      s"locate plan scans the data table:\n${fileScans.mkString("\n")}")
    assert(touched.as[String].collect().toSet === Set("B"))
  }

  test("indexed merge ≡ locate-scan merge; untouched partitions bit-identical") {
    val whA = Files.createTempDirectory("graft-mki").toString
    val whB = Files.createTempDirectory("graft-mki").toString
    seed(whA); seed(whB)
    val beforeA = fileState(whA, "sales")
    val change = Seq((3L, 99.0, "B")).toDF("id", "amount", "region")

    val touchedIdx = mergeIndexed(whA, change)
    val touchedScan = Merge.mergePartitioned(spark, whB, "sales", change,
      "id", "region", Seq($"amount".desc_nulls_last), $"region" === "DELETED")
    assert(touchedIdx.toSet === touchedScan.toSet)
    assert(touchedIdx.toSet === Set("B"))

    def rows(wh: String) = Tables.readWarehouse(spark, wh, "sales")
      .select($"region", $"id", $"amount").as[(String, Long, Double)].collect().toSet
    assert(rows(whA) === rows(whB), "indexed path must produce the same table")

    val afterA = fileState(whA, "sales")
    val untouched = (p: String) => !p.contains("region=B")
    assert(afterA.filter(t => untouched(t._1)) === beforeA.filter(t => untouched(t._1)),
      "untouched partitions must keep their exact file set")
    assertIndexExact(whA)
  }

  test("cross-partition key move updates both partitions' index entries") {
    val wh = Files.createTempDirectory("graft-mki").toString
    seed(wh)
    val before = fileState(wh, "sales")
    val change = Seq((1L, 11.0, "D")).toDF("id", "amount", "region")
    val touched = mergeIndexed(wh, change)
    assert(touched.toSet === Set("A", "D"))
    for (p <- Seq("region=B", "region=C"))
      assert(fileState(wh, "sales").filter(_._1.contains(p)) ===
        before.filter(_._1.contains(p)), s"$p must not be rewritten")
    assertIndexExact(wh)
    // the index must not keep a stale A-copy of id=1: a follow-up change to
    // id=1 must locate ONLY region=D
    val relocate = Merge.touchedPartitionsIndexed(spark, wh, "sales",
      Seq((1L, 12.0, "D")).toDF("id", "amount", "region"),
      "id", "region", $"region" === "DELETED")
    assert(relocate.as[String].collect().toSet === Set("D"))
  }

  test("tombstone-emptied partition is deleted from table AND index") {
    val wh = Files.createTempDirectory("graft-mki").toString
    seed(wh)
    val change = Seq((5L, Option.empty[Double], "DELETED"))
      .toDF("id", "amount", "region")
    val touched = mergeIndexed(wh, change)
    assert(touched.toSet === Set("C"))
    assert(!fileState(wh, "sales").keys.exists(_.contains("region=C")))
    assert(!fileState(wh, Merge.keyIndexName("sales")).keys.exists(_.contains("region=C")),
      "emptied partition's index directory must be deleted too")
    assertIndexExact(wh)
  }

  test("no-op change-set touches neither table nor index") {
    val wh = Files.createTempDirectory("graft-mki").toString
    seed(wh)
    val beforeT = fileState(wh, "sales")
    val beforeI = fileState(wh, Merge.keyIndexName("sales"))
    val change = Seq((42L, Option.empty[Double], "DELETED"))
      .toDF("id", "amount", "region")
    assert(mergeIndexed(wh, change).isEmpty)
    assert(fileState(wh, "sales") === beforeT)
    assert(fileState(wh, Merge.keyIndexName("sales")) === beforeI)
  }

  test("multi-night chain keeps the index exact") {
    val wh = Files.createTempDirectory("graft-mki").toString
    seed(wh)
    mergeIndexed(wh, Seq((3L, 99.0, "B")).toDF("id", "amount", "region"))
    mergeIndexed(wh, Seq((1L, 11.0, "D")).toDF("id", "amount", "region"))
    mergeIndexed(wh, Seq((5L, Option.empty[Double], "DELETED"))
      .toDF("id", "amount", "region"))
    mergeIndexed(wh, Seq((6L, 60.0, "A")).toDF("id", "amount", "region"))
    assertIndexExact(wh)
    val rows = Tables.readWarehouse(spark, wh, "sales")
      .select($"region", $"id").as[(String, Long)].collect().toSet
    assert(rows === Set(("A", 2L), ("A", 6L), ("B", 3L), ("B", 4L), ("D", 1L)))
  }
}
