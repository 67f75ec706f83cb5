package graft.io

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Range-clustered write contract: rows survive bit-for-bit, each parquet
  * file owns a disjoint slice of the cluster key (tight footer min/max),
  * and a selective predicate therefore reads a fraction of the rows an
  * interleaved layout reads (row-group skipping off the footer stats).
  */
class RangeClusteredSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // keys shuffled so the input layout is maximally interleaved
  private def fixture = scala.util.Random.shuffle((1L to 4000L).toVector)
    .map(i => (i, s"payload$i", (i % 97).toInt))
    .toDF("k", "payload", "grp")

  private def scannedRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  test("range-clustered files carry disjoint key ranges and preserve data") {
    val wh = Files.createTempDirectory("graft-rc").toString
    val df = fixture
    Tables.writeWarehouseRangeClustered(df, wh, "t", "k", numFiles = 8)
    val back = Tables.readWarehouse(spark, wh, "t")
    assert(back.count() === 4000L)
    assert(back.agg(sum($"k")).as[Long].head === (1L to 4000L).sum)

    val files = new java.io.File(s"$wh/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(files.length >= 6, s"expected ~8 files, got ${files.length}")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min($"k"), max($"k")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"file ranges overlap: $ranges")
      case _ =>
    }
  }

  test("a selective range predicate scans a fraction of the interleaved layout's rows") {
    val wh = Files.createTempDirectory("graft-rc").toString
    val df = fixture
    Tables.writeWarehouseRangeClustered(df, wh, "clustered", "k", numFiles = 8)
    // negative control: same rows, same file count, interleaved round-robin
    df.repartition(8).write.mode("overwrite").parquet(s"$wh/interleaved")

    def q(table: String) = Tables.readWarehouse(spark, wh, table)
      .filter($"k" >= 100L && $"k" < 200L)

    assert(q("clustered").count() === 100L)
    assert(q("interleaved").count() === 100L)
    val clustered = scannedRows(q("clustered"))
    val interleaved = scannedRows(q("interleaved"))
    // clustered: the predicate hits one file's range → one row group's rows;
    // interleaved: every file straddles [1, 4000] → stats prune nothing.
    assert(clustered <= 600L,
      s"clustered layout should row-group-skip to ~1 file, scanned $clustered")
    assert(interleaved >= 3500L,
      s"interleaved control should scan ~everything, scanned $interleaved")
  }

  test("z-ordered layout prunes on the SECOND dimension where single-key clustering cannot") {
    val wh = Files.createTempDirectory("graft-z").toString
    val rnd = new scala.util.Random(11)
    val df = (1L to 8000L).map(i =>
      (i, rnd.nextInt(1000), rnd.nextInt(1000))).toDF("id", "x", "y")
    Tables.writeWarehouseZOrdered(df, wh, "zorder", "x", "y", numFiles = 16)
    Tables.writeWarehouseRangeClustered(df, wh, "xonly", "x", numFiles = 16)

    // every z-file owns a small rectangle: BOTH dims' spans stay bounded
    val files = new java.io.File(s"$wh/zorder").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min($"x"), max($"x"), min($"y"), max($"y")).head()
      (r.getInt(1) - r.getInt(0), r.getInt(3) - r.getInt(2))
    }
    val avgX = spans.map(_._1).sum.toDouble / spans.length
    val avgY = spans.map(_._2).sum.toDouble / spans.length
    assert(avgX <= 450 && avgY <= 450,
      s"z-order files must box both dims, avg spans ($avgX, $avgY)")

    // a second-dimension predicate skips z-order files but scans the
    // whole single-key layout
    def q(table: String) = Tables.readWarehouse(spark, wh, table)
      .filter($"y" < 100)
    val zScan = scannedRows(q("zorder"))
    val xScan = scannedRows(q("xonly"))
    assert(q("zorder").count() === q("xonly").count())
    assert(zScan <= 3500L,
      s"z-order should prune most files on y, scanned $zScan/8000")
    assert(xScan >= 7000L,
      s"x-clustered control cannot prune on y, scanned $xScan/8000")
  }
}
