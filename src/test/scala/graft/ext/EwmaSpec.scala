package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Fixed-point EWMA: exact integer recurrence vs a driver-side fold,
  * partition invariance, and per-key independence.
  */
class EwmaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def drive(xs: Seq[Long], num: Long, den: Long): Seq[Long] =
    xs.tail.scanLeft(xs.head)((s, x) => (num * x + (den - num) * s) / den)

  test("smoothed series equals the exact integer recurrence, any partitioning") {
    val xs = Seq(100L, 200L, 50L, 400L, 0L, 300L)
    val rows = xs.zipWithIndex.map { case (x, i) => ("u", i.toLong, x) }
    for (parts <- Seq(1, 7)) {
      val got = Analytics.ewmaFixedPoint(
          rows.toDF("k", "o", "x").repartition(parts),
          "k", col("o"), col("x"), num = 2L, den = 10L)
        .orderBy("seq").select("seq", "x_fp", "s_fp")
        .as[(Int, Long, Long)].collect().toSeq
      assert(got.map(_._2) === xs)
      assert(got.map(_._3) === drive(xs, 2L, 10L), s"parts=$parts")
      assert(got.map(_._1) === (1 to xs.size))
    }
  }

  test("stored chain == the one-shot fold at any batch split; replay inert") {
    val wh = java.nio.file.Files.createTempDirectory("graft-ewma").toString
    val xs = Seq(100L, 200L, 50L, 400L, 0L, 300L, 250L, 10L, 999L)
    val rows = xs.zipWithIndex.map { case (x, i) => ("u", i.toLong, x) } ++
      Seq(("v", 4L, 77L), ("v", 5L, 177L)) // appears first in batch 2
    def slice(lo: Long, hi: Long) = rows.filter(r => r._2 >= lo && r._2 < hi)
      .toDF("k", "o", "x")
    EwmaState.createEwmaState(spark, wh, "e", slice(0, 3),
      "k", col("o"), col("x"), 2L, 10L)
    EwmaState.appendEwmaBatch(spark, wh, "e", slice(3, 6),
      "k", col("o"), col("x"), 2L, 10L, seq = 1)
    EwmaState.appendEwmaBatch(spark, wh, "e", slice(6, 99),
      "k", col("o"), col("x"), 2L, 10L, seq = 2)
    def series() = EwmaState.readEwmaSeries(spark, wh, "e")
      .select("key", "o", "x_fp", "s_fp")
      .as[(String, Long, Long, Long)].collect().toSet
    val wantU = drive(xs, 2L, 10L).zipWithIndex.map { case (sv, i) =>
      ("u", i.toLong, xs(i), sv)
    }
    val wantV = Set(("v", 4L, 77L, 77L), ("v", 5L, 177L, (2 * 177 + 8 * 77) / 10))
    assert(series() === (wantU.toSet ++ wantV),
      "stored chain must equal the exact one-shot recurrence")
    // resume points are the last smoothed value per key
    val res = EwmaState.readEwmaResume(spark, wh, "e")
      .as[(String, Long)].collect().toMap
    assert(res === Map("u" -> drive(xs, 2L, 10L).last,
      "v" -> (2 * 177 + 8 * 77) / 10))
    // at-least-once replay of the last batch: partition replace
    EwmaState.appendEwmaBatch(spark, wh, "e", slice(6, 99),
      "k", col("o"), col("x"), 2L, 10L, seq = 2)
    assert(series() === (wantU.toSet ++ wantV))
  }

  test("ewmaAnomaly: flags match the exact recurrence; jump flags, settled run doesn't") {
    // constant run, a 10x jump, then settling back
    val xs = Seq(100L, 100L, 100L, 1000L, 100L, 100L, 100L, 100L)
    val rows = xs.zipWithIndex.map { case (x, i) => ("u", i.toLong, x) }
    val got = Analytics.ewmaAnomaly(rows.toDF("k", "o", "x").repartition(5),
        "k", col("o"), col("x"), 2L, 10L, bandNum = 3L, bandDen = 1L)
      .orderBy("seq").select("x_fp", "s_fp", "d_fp", "is_anom")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    // driver-side exact twin
    var s = xs.head; var d = 0L
    val want = (xs.head, xs.head, 0L, false) +: xs.tail.map { x =>
      val r = math.abs(x - s)
      val flag = r * 1L > 3L * d
      s = (2 * x + 8 * s) / 10; d = (2 * r + 8 * d) / 10
      (x, s, d, flag)
    }
    assert(got === want)
    // the jump must flag; the constant prefix must not; note a zero band
    // makes the settled 100s after the jump flag too (residual vs s>100
    // exceeds 3×d only until d catches up) — pin the exact pattern
    assert(got(3)._4 === true, "the 10x jump must flag")
    assert(got.take(3).forall(!_._4), "constant prefix must not flag")
  }

  test("stored anomaly chain == one-shot ewmaAnomaly; replay inert") {
    val wh = java.nio.file.Files.createTempDirectory("graft-ewmaa").toString
    val xs = Seq(100L, 100L, 100L, 1000L, 100L, 100L, 950L, 100L, 100L)
    val rows = xs.zipWithIndex.map { case (x, i) => ("u", i.toLong, x) }
    def slice(lo: Long, hi: Long) = rows.filter(r => r._2 >= lo && r._2 < hi)
      .toDF("k", "o", "x")
    EwmaState.createEwmaAnomalyState(spark, wh, "a", slice(0, 3),
      "k", col("o"), col("x"), 2L, 10L, 3L, 1L)
    EwmaState.appendEwmaAnomalyBatch(spark, wh, "a", slice(3, 6),
      "k", col("o"), col("x"), 2L, 10L, 3L, 1L, seq = 1)
    EwmaState.appendEwmaAnomalyBatch(spark, wh, "a", slice(6, 99),
      "k", col("o"), col("x"), 2L, 10L, 3L, 1L, seq = 2)
    def series() = EwmaState.readEwmaAnomalySeries(spark, wh, "a")
      .select("o", "x_fp", "s_fp", "d_fp", "is_anom")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    val want = Analytics.ewmaAnomaly(rows.toDF("k", "o", "x"),
        "k", col("o"), col("x"), 2L, 10L, 3L, 1L)
      .select((col("seq") - 1).cast("long"), col("x_fp"), col("s_fp"),
        col("d_fp"), col("is_anom"))
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    assert(series() === want,
      "stored anomaly chain must equal the one-shot control chart")
    assert(want.exists(_._5), "the fixture's jumps must flag somewhere")
    // at-least-once replay of the last batch
    EwmaState.appendEwmaAnomalyBatch(spark, wh, "a", slice(6, 99),
      "k", col("o"), col("x"), 2L, 10L, 3L, 1L, seq = 2)
    assert(series() === want)
  }

  test("keys smooth independently; alpha=1 reproduces the input") {
    val rows = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 1L, 5L))
    val byKey = Analytics.ewmaFixedPoint(rows.toDF("k", "o", "x"),
        "k", col("o"), col("x"), num = 1L, den = 2L)
      .select("k", "seq", "s_fp").as[(String, Int, Long)].collect().toSet
    assert(byKey === Set(("a", 1, 10L), ("a", 2, 15L), ("b", 1, 5L)))
    val identity = Analytics.ewmaFixedPoint(rows.toDF("k", "o", "x"),
        "k", col("o"), col("x"), num = 1L, den = 1L)
      .select("s_fp").as[Long].collect().toSet
    assert(identity === Set(10L, 20L, 5L), "alpha=1 must reproduce the inputs")
  }
}
