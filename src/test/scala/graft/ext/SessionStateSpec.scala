package graft.ext

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.Tables

/** Pins [[SessionState]]: chain-of-nightly-appends ≡ one-pass
  * sessionization at any batch split (including sessions spanning the
  * split), watermark closing, the crash window between the two phases,
  * and the streaming twin's staged replay safety.
  */
class SessionStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int, hour: Int, min: Int = 0) =
    Timestamp.valueOf(f"2024-05-$day%02d $hour%02d:$min%02d:00")

  // user A: one session spanning the night-1/night-2 split (23:50 + 00:05
  // within 30min), then a separate session; user B: single events far apart
  private def events = Seq(
    (1L, "A", ts(1, 23, 50), 100L), (2L, "A", ts(2, 0, 5), 200L),
    (3L, "A", ts(2, 0, 20), 50L), (4L, "A", ts(2, 9, 0), 10L),
    (5L, "B", ts(1, 10, 0), 7L), (6L, "B", ts(3, 10, 0), 8L))
    .toDF("event_id", "user_id", "ts", "v")

  private def night(df: org.apache.spark.sql.DataFrame, lo: Timestamp,
      hi: Timestamp) = df.filter(col("ts") >= lit(lo) && col("ts") < lit(hi))

  private def onePass(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("v").as("value_fp"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"),
        col("value_fp"))

  private type Sess = (String, Timestamp, Timestamp, Long, Long)
  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("user_id", "session_start", "session_end", "n_events",
      "value_fp").as[Sess].collect().toSet

  test("nightly chain ≡ one-pass sessionization; split-spanning session reassembles") {
    val wh = Files.createTempDirectory("graft-sess").toString
    spark.sql("DROP TABLE IF EXISTS sspec_closed")
    try {
      val fp = col("v")
      SessionState.createStored(spark, wh, "sspec",
        night(events, ts(1, 0), ts(2, 0)), "user_id", "ts", fp,
        "30 minutes", 2)
      SessionState.appendStored(spark, wh, "sspec",
        night(events, ts(2, 0), ts(3, 0)), "user_id", "ts", fp, "30 minutes")
      SessionState.appendStored(spark, wh, "sspec",
        night(events, ts(3, 0), ts(4, 0)), "user_id", "ts", fp, "30 minutes")
      val got = asSet(SessionState.readStored(spark, wh, "sspec", "user_id"))
      assert(got === asSet(onePass(events)))
      // the split-spanning session exists as ONE 3-event session
      assert(got.exists(s => s._1 == "A" && s._4 == 3L && s._5 == 350L))
      // B's last event stays OPEN (watermark can't close it) yet reads back
      assert(got.exists(s => s._1 == "B" && s._2 == ts(3, 10, 0)))
    } finally spark.sql("DROP TABLE IF EXISTS sspec_closed")
  }

  test("empty night is a no-op; crash between phases converges on re-run") {
    val wh = Files.createTempDirectory("graft-sess2").toString
    spark.sql("DROP TABLE IF EXISTS sspec2_closed")
    try {
      val fp = col("v")
      SessionState.createStored(spark, wh, "sspec2",
        night(events, ts(1, 0), ts(2, 0)), "user_id", "ts", fp,
        "30 minutes", 2)
      SessionState.appendStored(spark, wh, "sspec2",
        events.limit(0), "user_id", "ts", fp, "30 minutes")
      val n2 = night(events, ts(2, 0), ts(3, 0))
      // emulate a crash after phase 1: run only the closed-append, then
      // re-run the FULL night — the anti-join guard must not duplicate
      val sessions = SessionState.mergedSessions(spark, wh, "sspec2", n2,
        "user_id", "ts", fp, "30 minutes").localCheckpoint(true)
      val wm = sessions.agg(max("last_ts")).head().getTimestamp(0)
      SessionState.appendClosedPhase(spark, wh, "sspec2", sessions,
        "user_id", wm, "30 minutes")
      SessionState.appendStored(spark, wh, "sspec2", n2, "user_id", "ts",
        fp, "30 minutes")
      SessionState.appendStored(spark, wh, "sspec2",
        night(events, ts(3, 0), ts(4, 0)), "user_id", "ts", fp, "30 minutes")
      assert(asSet(SessionState.readStored(spark, wh, "sspec2", "user_id"))
        === asSet(onePass(events)))
    } finally spark.sql("DROP TABLE IF EXISTS sspec2_closed")
  }
}
