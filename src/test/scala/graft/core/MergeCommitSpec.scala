package graft.core

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.Tables

/** Pins the DURABILITY contract of the partitioned merge's stage →
  * manifest → swap commit ([[Merge.writeBack]] /
  * [[Merge.recoverMergeCommit]]): a crash at ANY point leaves the table
  * either fully old (pre-manifest — nothing was touched, debris swept)
  * or recoverable-forward to fully new (post-manifest — the swap
  * completes idempotently). Each crash window is simulated by running
  * the protocol's steps separately and recovering.
  */
class MergeCommitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fs(wh: String) =
    new Path(wh).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def seed(wh: String): Unit = {
    val v1 = Seq(
      ("A", 1L, 10.0), ("A", 2L, 20.0),
      ("B", 3L, 30.0), ("B", 4L, 40.0),
      ("C", 5L, 50.0))
      .toDF("region", "id", "amount")
      .select($"id", $"amount", $"region")
    fs(wh).delete(new Path(s"$wh/sales"), true)
    Tables.writeWarehousePartitioned(v1, wh, "sales", Seq("region"))
  }

  private def readSales(wh: String): Set[(Long, Double, String)] =
    Tables.readWarehouse(spark, wh, "sales")
      .select($"id", $"amount", $"region").as[(Long, Double, String)]
      .collect().toSet

  private val oldRows = Set(
    (1L, 10.0, "A"), (2L, 20.0, "A"),
    (3L, 30.0, "B"), (4L, 40.0, "B"),
    (5L, 50.0, "C"))

  /** Stage replacement content for region=B (id=3 updated) the way the
    * merge would: only the touched partition's directory appears.
    */
  private def stageNewB(wh: String): Unit =
    Seq((3L, 99.0, "B"), (4L, 40.0, "B"))
      .toDF("id", "amount", "region")
      .write.mode("overwrite").partitionBy("region")
      .parquet(s"$wh/${Merge.stagedName("sales")}")

  private val newRows = Set(
    (1L, 10.0, "A"), (2L, 20.0, "A"),
    (3L, 99.0, "B"), (4L, 40.0, "B")) // region=C emptied by the manifest

  private def manifestB(wh: String): Unit =
    Merge.writeMergeManifest(spark, wh, "sales", Seq(
      Merge.MergeCommitEntry("sales", "region=B", survived = true),
      Merge.MergeCommitEntry("sales", "region=C", survived = false)))

  test("crash BEFORE the manifest: table fully old, recovery sweeps staging") {
    val wh = Files.createTempDirectory("graft-mc").toString
    seed(wh)
    stageNewB(wh) // job died after staging, before the commit point
    assert(readSales(wh) === oldRows, "live table must be untouched")
    assert(!Merge.recoverMergeCommit(spark, wh, "sales"),
      "no manifest -> nothing to roll forward")
    assert(!fs(wh).exists(new Path(s"$wh/${Merge.stagedName("sales")}")),
      "pre-commit staging debris must be swept")
    assert(readSales(wh) === oldRows)
  }

  test("crash AFTER the manifest, before any swap: recovery rolls forward") {
    val wh = Files.createTempDirectory("graft-mc").toString
    seed(wh)
    stageNewB(wh)
    manifestB(wh) // the commit point — job dies here
    assert(readSales(wh) === oldRows,
      "manifest publication alone must not change what readers see")
    assert(Merge.recoverMergeCommit(spark, wh, "sales"))
    assert(readSales(wh) === newRows,
      "recovery must complete the swap AND the emptied-partition delete")
    assert(!fs(wh).exists(new Path(Merge.mergeManifestPath(wh, "sales"))))
    assert(!fs(wh).exists(new Path(s"$wh/${Merge.stagedName("sales")}")))
  }

  test("crash MID-swap: recovery completes idempotently, never re-deletes swapped data") {
    val wh = Files.createTempDirectory("graft-mc").toString
    seed(wh)
    stageNewB(wh)
    manifestB(wh)
    // first attempt swapped region=B then died (region=C delete pending)
    val f = fs(wh)
    f.delete(new Path(s"$wh/sales/region=B"), true)
    assert(f.rename(new Path(s"$wh/${Merge.stagedName("sales")}/region=B"),
      new Path(s"$wh/sales/region=B")))
    assert(Merge.recoverMergeCommit(spark, wh, "sales"))
    assert(readSales(wh) === newRows,
      "already-swapped partitions keep their NEW data; pending steps complete")
  }

  test("a completed merge leaves no manifest or staging behind") {
    val wh = Files.createTempDirectory("graft-mc").toString
    seed(wh)
    val change = Seq((3L, 99.0, "B")).toDF("id", "amount", "region")
    Merge.mergePartitioned(spark, wh, "sales", change,
      keyCol = "id", partitionCol = "region",
      order = Seq($"amount".desc_nulls_last),
      isTombstone = $"region" === "DELETED")
    assert(!fs(wh).exists(new Path(Merge.mergeManifestPath(wh, "sales"))))
    assert(!fs(wh).exists(new Path(s"$wh/${Merge.stagedName("sales")}")))
    assert(readSales(wh) ===
      Set((1L, 10.0, "A"), (2L, 20.0, "A"),
        (3L, 99.0, "B"), (4L, 40.0, "B"), (5L, 50.0, "C")))
  }

  test("plain mergePartitioned maintains an existing key-locate index instead of going stale") {
    val wh = Files.createTempDirectory("graft-mc").toString
    seed(wh)
    Merge.buildKeyIndex(spark, wh, "sales", "id", "region")
    // key 3 moves B -> A through the NON-indexed path
    val change = Seq((3L, 99.0, "A")).toDF("id", "amount", "region")
    Merge.mergePartitioned(spark, wh, "sales", change,
      keyCol = "id", partitionCol = "region",
      order = Seq($"amount".desc_nulls_last),
      isTombstone = $"region" === "DELETED")
    val idx = Tables.readWarehouse(spark, wh, Merge.keyIndexName("sales"))
      .select($"id", $"region").as[(Long, String)].collect().toSet
    val tbl = Tables.readWarehouse(spark, wh, "sales")
      .select($"id", $"region").as[(Long, String)].collect().toSet
    assert(idx === tbl,
      "the index must stay exactly the (key, partition) projection of the table")
    // and the next INDEXED merge resolves correctly off that index
    val change2 = Seq((3L, 100.0, "A")).toDF("id", "amount", "region")
    val touched = Merge.mergePartitionedIndexed(spark, wh, "sales", change2,
      keyCol = "id", partitionCol = "region",
      order = Seq($"amount".desc_nulls_last),
      isTombstone = $"region" === "DELETED")
    assert(touched.toSet === Set("A"))
    assert(readSales(wh).contains((3L, 100.0, "A")))
  }
}
