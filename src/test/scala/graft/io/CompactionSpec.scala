package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Compaction contract: many tiny appended files collapse to few
  * right-sized ones with the data bit-identical.
  */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dataFiles(dir: String, table: String): Seq[java.io.File] =
    new java.io.File(s"$dir/$table").listFiles.toSeq
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))

  test("compactWarehouse collapses small-file proliferation, preserving data") {
    val dir = Files.createTempDirectory("graft_compact").toString
    // simulate 25 incremental micro-appends (the streaming sink shape)
    for (b <- 0 until 25) {
      val rows = (0 until 20).map(i => (b * 100L + i, s"payload-$b-$i"))
      Tables.appendWarehouse(rows.toDF("id", "v").coalesce(1), dir, "tiny")
    }
    val before = dataFiles(dir, "tiny")
    assert(before.size >= 25, s"expected many small files, got ${before.size}")
    val expected = Tables.readWarehouse(spark, dir, "tiny")
      .as[(Long, String)].collect().sorted.toSeq

    Tables.compactWarehouse(spark, dir, "tiny")

    val after = dataFiles(dir, "tiny")
    assert(after.size < before.size / 3,
      s"compaction must collapse files: ${before.size} -> ${after.size}")
    val got = Tables.readWarehouse(spark, dir, "tiny")
      .as[(Long, String)].collect().sorted.toSeq
    assert(got === expected, "compaction must not change the data")
  }

  test("clustered compaction keeps rows and accepts cluster columns") {
    val dir = Files.createTempDirectory("graft_compact_c").toString
    for (b <- 0 until 10) {
      val rows = (0 until 30).map(i => (i % 5, b * 100L + i))
      Tables.appendWarehouse(rows.toDF("k", "id").coalesce(1), dir, "tiny2")
    }
    val expected = Tables.readWarehouse(spark, dir, "tiny2")
      .as[(Int, Long)].collect().sorted.toSeq
    Tables.compactWarehouse(spark, dir, "tiny2", clusterCols = Seq("k"))
    val got = Tables.readWarehouse(spark, dir, "tiny2")
      .as[(Int, Long)].collect().sorted.toSeq
    assert(got === expected)
  }

  test("bucketed compaction collapses per-append file sprawl and KEEPS co-location") {
    val dir = Files.createTempDirectory("graft_compact_b").toString
    val name = "tinybkt"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    try {
      Tables.writeWarehouseBucketed(
        (0 until 20).map(i => (i.toLong % 7, i.toLong)).toDF("k", "v"),
        dir, name, "k", 4)
      // 12 nightly appends: >= one file per bucket per batch
      for (b <- 1 to 12)
        (0 until 20).map(i => (i.toLong % 7, b * 1000L + i)).toDF("k", "v")
          .write.mode("append").bucketBy(4, "k").sortBy("k")
          .saveAsTable(name)
      val before = dataFiles(dir, name)
      assert(before.size >= 13, s"expected file sprawl, got ${before.size}")
      val expected = Tables.readWarehouseBucketed(spark, name)
        .as[(Long, Long)].collect().sorted.toSeq

      Tables.compactWarehouseBucketed(spark, dir, name, "k", 4)

      val after = dataFiles(dir, name)
      assert(after.size <= 5,
        s"compaction must fold to ~one file per bucket: ${before.size} -> ${after.size}")
      val got = Tables.readWarehouseBucketed(spark, name)
        .as[(Long, Long)].collect().sorted.toSeq
      assert(got === expected, "compaction must not change the data")
      // the layout survives: bucket-key aggregation still plans shuffle-free
      val agg = Tables.readWarehouseBucketed(spark, name)
        .groupBy("k").agg(count(lit(1)))
      agg.collect()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucket co-location must survive compaction")
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("bucketed compaction recovery: complete staging redoes, incomplete sweeps") {
    val dir = Files.createTempDirectory("graft_compact_r").toString
    val name = "tinybktr"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    try {
      Tables.writeWarehouseBucketed(
        (0 until 10).map(i => (i.toLong % 3, i.toLong)).toDF("k", "v"),
        dir, name, "k", 2)
      val expected = Tables.readWarehouseBucketed(spark, name)
        .as[(Long, Long)].collect().sorted.toSeq

      // crash AFTER staging completed, before/mid rewrite: staging is the
      // durable copy — recovery must redo the rewrite from it
      Tables.readWarehouseBucketed(spark, name)
        .write.mode("overwrite").parquet(s"$dir/$name._fold")
      Tables.recoverBucketedCompaction(spark, dir, name, "k", 2)
      assert(!new java.io.File(s"$dir/$name._fold").exists())
      assert(Tables.readWarehouseBucketed(spark, name)
        .as[(Long, Long)].collect().sorted.toSeq === expected)

      // crash DURING staging (no _SUCCESS): live untouched, debris swept
      Tables.readWarehouseBucketed(spark, name)
        .write.mode("overwrite").parquet(s"$dir/$name._fold")
      new java.io.File(s"$dir/$name._fold/_SUCCESS").delete()
      Tables.recoverBucketedCompaction(spark, dir, name, "k", 2)
      assert(!new java.io.File(s"$dir/$name._fold").exists())
      assert(Tables.readWarehouseBucketed(spark, name)
        .as[(Long, Long)].collect().sorted.toSeq === expected)
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }
}
