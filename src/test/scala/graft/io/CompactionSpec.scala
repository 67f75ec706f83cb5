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
}
