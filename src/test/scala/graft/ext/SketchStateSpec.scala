package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Mergeable-sketch state contracts: deterministic registers/bins,
  * append ≡ full build under the fold, estimates inside published
  * bounds, and replay inertness where the merge law grants it.
  */
class SketchStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hll estimate lands within 3 sigma on a known distinct count") {
    val df = (1L to 20000L).map(i => ("g", i % 5000)).toDF("g", "k")
    val est = SketchState.hllEstimate(
        SketchState.hllState(df, "g", col("k")), "g")
      .select("hll_est").as[Double].head()
    assert(math.abs(est - 5000.0) <= 0.195 * 5000.0,
      s"estimate $est outside 3 sigma of 5000")
  }

  test("hll window state: window fold == from-scratch over the window; prunes; replay inert") {
    val wh = java.nio.file.Files.createTempDirectory("graft-hllw").toString
    val batches = Seq(
      (1L to 2000L).map(i => ("g", i)),
      (1500L to 4000L).map(i => ("g", i)),
      (3500L to 6000L).map(i => ("g", i)))
    for ((b, i) <- batches.zipWithIndex)
      SketchState.appendHllWindowState(spark, wh, "w",
        b.toDF("g", "k"), "g", col("k"), s"n${i + 1}")
    def row(df: org.apache.spark.sql.DataFrame) =
      df.select("s_fx", "v", "hll_est").as[(Long, Long, Double)].head()
    val win = SketchState.readHllWindow(spark, wh, "w", "g", Seq("n2", "n3"))
    val fromScratch = SketchState.hllEstimate(
      SketchState.hllState((batches(1) ++ batches(2)).toDF("g", "k"),
        "g", col("k")), "g")
    assert(row(win) === row(fromScratch),
      "window fold must be bit-identical to a from-scratch windowed build")
    val scan = win.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*_ingest_batch[^\\]]*\\]".r
      .findFirstIn(scan).isDefined,
      s"window must land in PartitionFilters:\n$scan")
    // at-least-once replay: partition replace
    SketchState.appendHllWindowState(spark, wh, "w",
      batches(2).toDF("g", "k"), "g", col("k"), "n3")
    assert(row(SketchState.readHllWindow(spark, wh, "w", "g", Seq("n2", "n3")))
      === row(fromScratch))
  }

  test("hll state: append equals full build; re-append is inert (max-merge)") {
    val wh = Files.createTempDirectory("graft-hll").toString
    val a = (1L to 3000L).map(i => ("g", i)).toDF("g", "k")
    val b = (2000L to 6000L).map(i => ("g", i)).toDF("g", "k")
    SketchState.writeHllState(a, "g", col("k"), wh, "hllspec", 2)
    SketchState.appendHllState(spark, "hllspec", b, "g", col("k"), 2)
    def est() = SketchState.hllEstimateStored(spark, "hllspec", "g")
      .select("s_fx", "v", "hll_est").as[(Long, Long, Double)].head()
    val appended = est()
    val full = SketchState.hllEstimate(
        SketchState.hllState(a.unionAll(b), "g", col("k")), "g")
      .select("s_fx", "v", "hll_est").as[(Long, Long, Double)].head()
    assert(appended === full, "append must equal the full build under max-fold")
    // replayed append: max-merge makes duplicate register rows inert
    SketchState.appendHllState(spark, "hllspec", b, "g", col("k"), 2)
    assert(est() === full, "re-appended batch must not move the estimate")
    spark.sql("DROP TABLE IF EXISTS hllspec_hll")
  }

  test("hist window state: window quantiles == from-scratch; replay inert") {
    val wh = java.nio.file.Files.createTempDirectory("graft-histw").toString
    val batches = Seq(
      (1 to 500).map(i => ("g", (i % 40).toLong)),
      (1 to 500).map(i => ("g", (i % 25 + 10).toLong)),
      (1 to 500).map(i => ("g", (i % 60).toLong)))
    for ((b, i) <- batches.zipWithIndex)
      SketchState.appendHistWindowState(spark, wh, "hw",
        b.toDF("g", "v"), "g", col("v"), 5L, s"n${i + 1}")
    def quant(df: org.apache.spark.sql.DataFrame) =
      df.select("p50_ub", "p95_ub").as[(Long, Long)].head()
    val win = SketchState.readHistWindowQuantiles(spark, wh, "hw", "g", 5L,
      Seq(500000L, 950000L), Seq("n2", "n3"))
    val scratch = SketchState.histQuantiles(
      SketchState.histState((batches(1) ++ batches(2)).toDF("g", "v"),
        "g", col("v"), 5L), "g", 5L, Seq(500000L, 950000L))
    assert(quant(win) === quant(scratch))
    // replay: partition replace (the bucketed append would double-count)
    SketchState.appendHistWindowState(spark, wh, "hw",
      batches(2).toDF("g", "v"), "g", col("v"), 5L, "n3")
    assert(quant(SketchState.readHistWindowQuantiles(spark, wh, "hw", "g", 5L,
      Seq(500000L, 950000L), Seq("n2", "n3"))) === quant(scratch))
  }

  test("hist quantiles: upper bounds match a sorted reference within binWidth") {
    val rnd = new scala.util.Random(55L)
    val vals = Seq.fill(2000)(rnd.nextInt(100).toLong)
    val df = vals.map(v => ("g", v)).toDF("g", "v")
    val got = SketchState.histQuantiles(
        SketchState.histState(df, "g", col("v"), 10L), "g", 10L,
        Seq(500000L, 950000L))
      .as[(String, Long, Long)].head()
    val sorted = vals.sorted
    def exact(q: Double) = sorted((q * vals.size).ceil.toInt - 1)
    assert(exact(0.5) <= got._2 && got._2 - exact(0.5) <= 10,
      s"p50 bound ${got._2} vs exact ${exact(0.5)}")
    assert(exact(0.95) <= got._3 && got._3 - exact(0.95) <= 10,
      s"p95 bound ${got._3} vs exact ${exact(0.95)}")
  }

  test("hist state: append equals full build under sum-fold") {
    val wh = Files.createTempDirectory("graft-hq").toString
    val a = (1L to 500L).map(i => ("g", i % 40)).toDF("g", "v")
    val b = (1L to 700L).map(i => ("g", i % 90)).toDF("g", "v")
    SketchState.writeHistState(a, "g", col("v"), 5L, wh, "hqspec", 2)
    SketchState.appendHistState(spark, "hqspec", b, "g", col("v"), 5L, 2)
    val stored = SketchState.histQuantilesStored(spark, "hqspec", "g", 5L,
        Seq(500000L, 990000L)).as[(String, Long, Long)].head()
    val full = SketchState.histQuantiles(
        SketchState.histState(a.unionAll(b), "g", col("v"), 5L), "g", 5L,
        Seq(500000L, 990000L)).as[(String, Long, Long)].head()
    assert(stored === full)
    spark.sql("DROP TABLE IF EXISTS hqspec_hist")
  }

  test("expectations: one row per rule, null predicates count as violations") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (5L, "b"), (null, "a"))
      .toDF("v", "s")
    val got = Analytics.expectations(df, Seq(
        "v_small" -> (col("v") <= 3),
        "s_known" -> col("s").isin("a", "b")))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // v <= 3: row 2 violates, null row violates (conservative) -> 2
    assert(got("v_small") === (("v_small", 3L, 2L, false)))
    assert(got("s_known") === (("s_known", 3L, 0L, true)))
  }
}
