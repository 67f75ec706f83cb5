package graft.ext

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Merge
import graft.io.Tables

/** Pins [[ScdState]]: chain-of-nightly-appends ≡ one-pass
  * [[Merge.scdHistory]] over the union, the closed history is append-only
  * at the FILE level, and a batch's internal version chain folds in the
  * same night.
  */
class ScdStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int, hour: Int) =
    Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:00:00")

  private def histFiles(wh: String): Set[String] = {
    val base = new Path(s"$wh/scdspec_hist")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Set.empty
    val it = fs.listFiles(base, true)
    val out = scala.collection.mutable.Set[String]()
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet"))
        out += s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}"
    }
    out.toSet
  }

  test("nightly chain ≡ one-pass history; history files append-only") {
    val wh = Files.createTempDirectory("graft-scd").toString
    spark.sql("DROP TABLE IF EXISTS scdspec_hist")
    try {
      // A: v1 night1; v2+v3 night2 (internal chain!) — B: night1 only —
      // C: first seen night2, again night3
      val n1 = Seq((1L, "A", "a1", ts(1, 9)), (2L, "B", "b1", ts(1, 10)))
      val n2 = Seq((3L, "A", "a2", ts(5, 9)), (4L, "A", "a3", ts(5, 12)),
        (5L, "C", "c1", ts(6, 8)))
      val n3 = Seq((6L, "C", "c2", ts(9, 8)))
      def df(rows: Seq[(Long, String, String, Timestamp)]) =
        rows.toDF("event_id", "user_id", "event_type", "ts")

      ScdState.createStored(spark, wh, "scdspec", df(n1), "user_id", "ts",
        col("event_id"), 2)
      val filesAfterCreate = histFiles(wh)
      ScdState.appendStored(spark, wh, "scdspec", df(n2), "user_id", "ts",
        col("event_id"))
      val filesAfterN2 = histFiles(wh)
      assert(filesAfterCreate.subsetOf(filesAfterN2),
        "append must not rewrite existing history files")
      ScdState.appendStored(spark, wh, "scdspec", df(n3), "user_id", "ts",
        col("event_id"))
      assert(filesAfterN2.subsetOf(histFiles(wh)))

      val cols = Seq("event_id", "user_id", "event_type",
        "valid_from", "valid_to", "is_current")
      val got = ScdState.readStored(spark, wh, "scdspec")
        .select(cols.map(col): _*).as[(Long, String, String, Timestamp, Option[Timestamp], Boolean)].collect().toSet
      val want = Merge.scdHistory(df(n1 ++ n2 ++ n3), Seq("user_id"), "ts",
          col("event_id"))
        .select(cols.map(col): _*).as[(Long, String, String, Timestamp, Option[Timestamp], Boolean)].collect().toSet
      assert(got === want)
      // sanity on the semantics themselves: A has exactly one current row
      // (v3), and its v1 closed at v2's valid_from
      assert(got.count(r => r._2 == "A" && r._6) === 1)
      assert(got.contains((1L, "A", "a1", ts(1, 9), Some(ts(5, 9)), false)))
    } finally spark.sql("DROP TABLE IF EXISTS scdspec_hist")
  }

  test("empty night is a no-op") {
    val wh = Files.createTempDirectory("graft-scd").toString
    spark.sql("DROP TABLE IF EXISTS scdspec_hist")
    try {
      val n1 = Seq((1L, "A", "a1", ts(1, 9)))
        .toDF("event_id", "user_id", "event_type", "ts")
      ScdState.createStored(spark, wh, "scdspec", n1, "user_id", "ts",
        col("event_id"), 2)
      ScdState.appendStored(spark, wh, "scdspec", n1.limit(0), "user_id",
        "ts", col("event_id"))
      val got = ScdState.readStored(spark, wh, "scdspec")
      assert(got.count() === 1)
      assert(got.filter(col("is_current")).count() === 1)
    } finally spark.sql("DROP TABLE IF EXISTS scdspec_hist")
  }

  test("schema-drifted night is rejected at the gate; align=true coerces") {
    val wh = Files.createTempDirectory("graft-scd").toString
    spark.sql("DROP TABLE IF EXISTS scdspec_hist")
    try {
      val n1 = Seq((1L, "A", "a1", ts(1, 9)))
        .toDF("event_id", "user_id", "event_type", "ts")
      ScdState.createStored(spark, wh, "scdspec", n1, "user_id", "ts",
        col("event_id"), 2)
      val drifted = Seq((2L, "A", ts(2, 9), "oops"))
        .toDF("event_id", "user_id", "ts", "renamed_type")
      val e = intercept[IllegalArgumentException] {
        ScdState.appendStored(spark, wh, "scdspec", drifted, "user_id",
          "ts", col("event_id"))
      }
      assert(e.getMessage.contains("event_type"))
      // and nothing was half-written by the failed night
      assert(ScdState.readStored(spark, wh, "scdspec").count() === 1)
      // opt-in coercion: the renamed column becomes NULLs, the append runs
      ScdState.appendStored(spark, wh, "scdspec", drifted, "user_id",
        "ts", col("event_id"), align = true)
      val cur = ScdState.readStored(spark, wh, "scdspec")
        .filter(col("is_current"))
      assert(cur.count() === 1)
      assert(cur.head().getAs[String]("event_type") == null)
    } finally spark.sql("DROP TABLE IF EXISTS scdspec_hist")
  }

  test("crash between the history and current phases: re-running the night converges") {
    val wh = Files.createTempDirectory("graft-scd").toString
    spark.sql("DROP TABLE IF EXISTS scdspec_hist")
    try {
      val n1 = Seq((1L, "A", "a1", ts(1, 9)), (2L, "B", "b1", ts(1, 10)))
        .toDF("event_id", "user_id", "event_type", "ts")
      val n2 = Seq((3L, "A", "a2", ts(5, 9)), (4L, "A", "a3", ts(5, 12)))
        .toDF("event_id", "user_id", "event_type", "ts")
      ScdState.createStored(spark, wh, "scdspec", n1, "user_id", "ts",
        col("event_id"), 2)
      // crash: night 2 appended its closed versions but never replaced cur
      ScdState.appendClosedPhase(spark, wh, "scdspec", n2, "user_id", "ts",
        col("event_id"))
      // recovery: simply re-run the whole night (both phases idempotent
      // pre-completion: the (key, valid_from) anti-join drops the closed
      // rows already written)
      ScdState.appendStored(spark, wh, "scdspec", n2, "user_id", "ts",
        col("event_id"))
      val cols = Seq("event_id", "user_id", "event_type",
        "valid_from", "valid_to", "is_current")
      val got = ScdState.readStored(spark, wh, "scdspec")
        .select(cols.map(col): _*)
        .as[(Long, String, String, Timestamp, Option[Timestamp], Boolean)]
        .collect().toSet
      val want = Merge.scdHistory(n1.unionByName(n2), Seq("user_id"), "ts",
          col("event_id"))
        .select(cols.map(col): _*)
        .as[(Long, String, String, Timestamp, Option[Timestamp], Boolean)]
        .collect().toSet
      assert(got === want, "no duplicated closed versions after the re-run")
    } finally spark.sql("DROP TABLE IF EXISTS scdspec_hist")
  }

  test("current-slice swap interrupted between delete and rename is rolled forward") {
    val wh = Files.createTempDirectory("graft-scd").toString
    spark.sql("DROP TABLE IF EXISTS scdspec_hist")
    try {
      val n1 = Seq((1L, "A", "a1", ts(1, 9)))
        .toDF("event_id", "user_id", "event_type", "ts")
      ScdState.createStored(spark, wh, "scdspec", n1, "user_id", "ts",
        col("event_id"), 2)
      // emulate the crash window: live slice deleted, fully-written swap
      // copy still beside it
      val fs = new Path(wh).getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.rename(new Path(s"$wh/scdspec_cur"),
        new Path(s"$wh/scdspec_cur._swap")))
      val got = ScdState.readStored(spark, wh, "scdspec")
      assert(got.filter(col("is_current")).count() === 1,
        "reader must roll the swap forward, not fail on the missing slice")
      assert(fs.exists(new Path(s"$wh/scdspec_cur")))
      assert(!fs.exists(new Path(s"$wh/scdspec_cur._swap")))
    } finally spark.sql("DROP TABLE IF EXISTS scdspec_hist")
  }

  test("pointInTime picks exactly the version valid at each probe instant") {
    // user A: versions at d1 (a1), d3 (a2), d5 (a3-current); user B: d2 only
    val versions = Seq(
      (1L, "A", "a1", ts(1, 0)), (2L, "A", "a2", ts(3, 0)),
      (3L, "A", "a3", ts(5, 0)), (4L, "B", "b1", ts(2, 0)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val dim = Merge.scdHistory(versions, Seq("user_id"), "ts", col("event_id"))
    val facts = Seq(
      (10L, "A", ts(1, 0)),  // exactly at a1's valid_from -> a1
      (11L, "A", ts(2, 12)), // inside [a1, a2) -> a1
      (12L, "A", ts(3, 0)),  // boundary: a1's valid_to = a2's valid_from -> a2
      (13L, "A", ts(9, 0)),  // after the last version -> current a3
      (14L, "A", Timestamp.valueOf("2024-02-01 00:00:00")), // before any -> none
      (15L, "B", ts(2, 1)),  // b1 current
      (16L, "C", ts(3, 0)),  // unknown key -> none
      (17L, "A", null))      // null probe ts -> none (3VL)
      .toDF("fact_id", "user_id", "probe_ts")
    val got = ScdState.pointInTime(dim, facts, "user_id", "probe_ts")
      .select("fact_id", "event_type").as[(Long, String)].collect().toMap
    assert(got === Map(10L -> "a1", 11L -> "a1", 12L -> "a2", 13L -> "a3",
      15L -> "b1"))

    // the SCD2 invariant makes the match unique: no fact joins twice
    assert(ScdState.pointInTime(dim, facts, "user_id", "probe_ts").count() === 5)

    // snapshot at d3 00:00: the boundary instant belongs to the NEW
    // version (closed interval start, open end); B's current row shows
    val snap = ScdState.snapshot(dim, lit(ts(3, 0)))
      .select("user_id", "event_type").as[(String, String)].collect().toSet
    assert(snap === Set(("A", "a2"), ("B", "b1")))
  }
}
