package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Table diff: status classification, null-safe column comparison, and
  * the self-diff/inverse properties that make it a usable regression
  * audit.
  */
class DiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fix = Seq(
    (1L, Option("a"), Option(10L)),
    (2L, Option("b"), Option(20L)),
    (3L, Option("c"), None),
    (4L, None, Option(40L))).toDF("k", "s", "v")

  test("statuses, changed column lists, and null-safety") {
    val neu = Seq(
      (1L, Option("a"), Option(10L)),   // unchanged → dropped
      (2L, Option("B"), Option(21L)),   // both columns changed
      (3L, Option("c"), Option(30L)),   // NULL → value is a change
      (5L, Option("e"), Option(50L))    // added; 4 removed
    ).toDF("k", "s", "v")
    val d = Diff.diff(fix, neu, Seq("k"))
      .select(col("k"), col("status"), concat_ws(",", col("changed_cols")))
      .as[(Long, String, String)].collect()
      .map { case (k, s, c) => k -> ((s, c)) }.toMap
    assert(d === Map(
      2L -> (("changed", "s,v")),
      3L -> (("changed", "v")),
      4L -> (("removed", "")),
      5L -> (("added", ""))))
  }

  test("self-diff is empty; diff against modified recovers exactly the edits") {
    assert(Diff.diff(fix, fix, Seq("k")).isEmpty, "A diff A must be empty")
    val edited = fix.withColumn("v",
      when(col("k") === 2, lit(99L)).otherwise(col("v")))
    val d = Diff.diff(fix, edited, Seq("k")).as[(Long, String, Seq[String])]
      .collect()
    assert(d.toSeq === Seq((2L, "changed", Seq("v"))))
  }

  test("value → NULL transition is a change (3VL guard)") {
    val neu = fix.withColumn("s",
      when(col("k") === 1, lit(null).cast("string")).otherwise(col("s")))
    val d = Diff.diff(fix, neu, Seq("k")).as[(Long, String, Seq[String])]
      .collect()
    assert(d.toSeq === Seq((1L, "changed", Seq("s"))))
  }

  test("diff(pre-merge, post-merge) recovers exactly the applied change batch") {
    import graft.core.Merge
    val target = Seq(
      (1L, "a", 10L, 0L, false),
      (2L, "b", 20L, 0L, false),
      (3L, "c", 30L, 0L, false)).toDF("k", "s", "v", "ver", "del")
    val change = Seq(
      (2L, "B", 21L, 1L, false), // update
      (3L, "c", 30L, 1L, true),  // tombstone
      (4L, "d", 40L, 1L, false)  // insert
    ).toDF("k", "s", "v", "ver", "del")
    val merged = Merge.merge(target, change, "k",
      Seq(col("ver").desc), col("del"))
    val d = Diff.diff(
      target.select("k", "s", "v"), merged.select("k", "s", "v"), Seq("k"))
      .select(col("k"), col("status"), concat_ws(",", col("changed_cols")))
      .as[(Long, String, String)].collect()
      .map { case (k, st, c) => k -> ((st, c)) }.toMap
    assert(d === Map(
      2L -> (("changed", "s,v")),
      3L -> (("removed", "")),
      4L -> (("added", ""))),
      "the diff must be exactly the merge's applied change batch")
  }

  test("diffSummary: per-status counts and per-column change frequencies") {
    val neu = Seq(
      (1L, Option("a"), Option(11L)),
      (2L, Option("x"), Option(21L)),
      (5L, Option("e"), Option(50L)),
      (6L, Option("f"), Option(60L))).toDF("k", "s", "v")
    val sum = Diff.diffSummary(Diff.diff(fix, neu, Seq("k")))
      .as[(String, Option[String], Long)].collect()
      .map { case (st, c, n) => (st, c.getOrElse("")) -> n }.toMap
    // 1: v changed; 2: s+v changed; 3,4 removed; 5,6 added
    assert(sum === Map(
      ("changed", "v") -> 2L,
      ("changed", "s") -> 1L,
      ("removed", "") -> 2L,
      ("added", "") -> 2L))
  }
}
