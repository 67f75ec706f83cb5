package graft.io

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the warehouse-maintenance operators: the file-sprawl ledger
  * ([[Tables.fileStats]]/[[Tables.needsCompaction]]) and atomic TTL
  * partition expiry ([[Tables.expirePartitions]]/[[Tables.recoverExpiry]]).
  */
class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seed(wh: String): Unit =
    Tables.writeWarehousePartitioned(
      (1 to 300).map(i => (i.toLong, s"d${i % 3}")).toDF("id", "day"),
      wh, "ttl", Seq("day"))

  test("fileStats aggregates per partition dir; sprawl triggers needsCompaction") {
    val wh = Files.createTempDirectory("graft-maint").toString
    seed(wh)
    // sprawl ONE partition with many tiny appends
    for (_ <- 1 to 6)
      Seq((9999L, "d1")).toDF("id", "day")
        .coalesce(1).write.mode("append").partitionBy("day")
        .parquet(s"$wh/ttl")
    val stats = Tables.fileStats(spark, wh, "ttl", smallBytes = 100L * 1024)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stats.keySet === Set("day=d0", "day=d1", "day=d2"))
    assert(stats("day=d1")._1 > stats("day=d0")._1)
    assert(stats.values.forall(_._2 > 0L))
    // file-count rule alone (smallBytes=1 disables the small-file rule):
    // only the sprawled partition trips
    val need = Tables.needsCompaction(spark, wh, "ttl",
        smallBytes = 1L, maxFiles = 4)
      .select("part_dir").as[String].collect().toSet
    assert(need === Set("day=d1"), s"only the sprawled partition: $need")
    // small-file rule: every seed file here is tiny, so all partitions trip
    val needSmall = Tables.needsCompaction(spark, wh, "ttl",
        smallBytes = 100L * 1024, maxFiles = 1000)
      .select("part_dir").as[String].collect().toSet
    assert(needSmall === Set("day=d0", "day=d1", "day=d2"))
  }

  test("expirePartitions drops exactly the listed partitions, keeps the rest") {
    val wh = Files.createTempDirectory("graft-maint2").toString
    seed(wh)
    val before = spark.read.parquet(s"$wh/ttl")
      .filter(col("day") === "d2").count()
    assert(before > 0)
    Tables.expirePartitions(spark, wh, "ttl", "day", Seq("d0", "d2"))
    val left = spark.read.parquet(s"$wh/ttl")
    assert(left.select("day").distinct().as[String].collect().toSeq === Seq("d1"))
    assert(left.count() === 100)
    // empty expiry is a no-op and leaves no manifest
    Tables.expirePartitions(spark, wh, "ttl", "day", Nil)
    val fs = new Path(wh).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$wh/ttl/_ttl_manifest")))
  }

  test("crash after manifest commit: recovery rolls the deletes forward; tmp-only crash sweeps") {
    val wh = Files.createTempDirectory("graft-maint3").toString
    seed(wh)
    val fs = new Path(wh).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the post-commit crash window: manifest in place, dirs intact
    val manifest = new Path(s"$wh/ttl/_ttl_manifest")
    val out = fs.create(manifest, true)
    out.write("day=d0\nday=d2".getBytes("UTF-8")); out.close()
    assert(Tables.recoverExpiry(spark, wh, "ttl"))
    assert(!fs.exists(new Path(s"$wh/ttl/day=d0")))
    assert(!fs.exists(new Path(s"$wh/ttl/day=d2")))
    assert(fs.exists(new Path(s"$wh/ttl/day=d1")))
    assert(!fs.exists(manifest))
    assert(spark.read.parquet(s"$wh/ttl").count() === 100)

    // pre-commit crash: only the tmp file exists — swept, nothing deleted
    val tmp = new Path(s"$wh/ttl/._ttl_manifest.tmp")
    val out2 = fs.create(tmp, true); out2.write("day=d1".getBytes("UTF-8")); out2.close()
    assert(!Tables.recoverExpiry(spark, wh, "ttl"))
    assert(!fs.exists(tmp))
    assert(fs.exists(new Path(s"$wh/ttl/day=d1")))
  }
}
