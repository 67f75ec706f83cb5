package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin attaches the latest right row at-or-before each left row") {
    val quotes = Seq(
      (1L, ts("2026-01-01 10:00:00"), 100.0, 11L),
      (1L, ts("2026-01-01 11:00:00"), 101.0, 12L),
      (2L, ts("2026-01-01 10:30:00"), 200.0, 13L))
      .toDF("key", "qts", "price", "qid")
    val trades = Seq(
      (1L, ts("2026-01-01 10:30:00"), 101L), // between the two quotes → 100.0
      (1L, ts("2026-01-01 11:00:00"), 102L), // exactly at quote 2 → 101.0 (<=)
      (2L, ts("2026-01-01 10:00:00"), 103L), // before any quote → null
      (3L, ts("2026-01-01 12:00:00"), 104L)) // key with no quotes → null
      .toDF("key", "tts", "tid")
    val out = TemporalJoins.asOfJoin(
        trades, quotes, "key", "tts", "qts", Seq("price", "qid"),
        tiebreakCol = Some("qid"))
      .select("tid", "price", "qid")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(out === Set(
      (101L, Some(100.0), Some(11L)),
      (102L, Some(101.0), Some(12L)),
      (103L, None, None),
      (104L, None, None)))
  }

  test("asOfJoin tiebreak: same-timestamp right rows resolve deterministically") {
    val right = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1.0, 21L),
      (1L, ts("2026-01-01 10:00:00"), 2.0, 22L)) // same instant — max id wins
      .toDF("key", "rts", "v", "rid")
    val left = Seq((1L, ts("2026-01-01 10:01:00"), 9L)).toDF("key", "lts", "lid")
    val got = TemporalJoins.asOfJoin(
        left, right, "key", "lts", "rts", Seq("v", "rid"), Some("rid"))
      .select("v", "rid").collect().head
    assert((got.getDouble(0), got.getLong(1)) === ((2.0, 22L)))
  }

  test("asOfJoinForward attaches the earliest right row at-or-after each left row") {
    val quotes = Seq(
      (1L, ts("2026-01-01 10:00:00"), 100.0, 11L),
      (1L, ts("2026-01-01 11:00:00"), 101.0, 12L),
      (2L, ts("2026-01-01 10:30:00"), 200.0, 13L))
      .toDF("key", "qts", "price", "qid")
    val trades = Seq(
      (1L, ts("2026-01-01 10:30:00"), 101L), // between quotes → NEXT (101.0)
      (1L, ts("2026-01-01 10:00:00"), 102L), // exactly at quote 1 → 100.0 (>=)
      (1L, ts("2026-01-01 11:30:00"), 103L), // after the last quote → null
      (2L, ts("2026-01-01 10:00:00"), 104L), // before key 2's quote → 200.0
      (3L, ts("2026-01-01 12:00:00"), 105L)) // key with no quotes → null
      .toDF("key", "tts", "tid")
    val out = TemporalJoins.asOfJoinForward(
        trades, quotes, "key", "tts", "qts", Seq("price", "qid"),
        tiebreakCol = Some("qid"))
      .select("tid", "price", "qid")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(out === Set(
      (101L, Some(101.0), Some(12L)),
      (102L, Some(100.0), Some(11L)),
      (103L, None, None),
      (104L, Some(200.0), Some(13L)),
      (105L, None, None)))

    // same-instant right rows: min tiebreak wins (first in order)
    val right = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1.0, 21L),
      (1L, ts("2026-01-01 10:00:00"), 2.0, 22L))
      .toDF("key", "rts", "v", "rid")
    val left = Seq((1L, ts("2026-01-01 09:59:00"), 9L)).toDF("key", "lts", "lid")
    val got = TemporalJoins.asOfJoinForward(
        left, right, "key", "lts", "rts", Seq("v", "rid"), Some("rid"))
      .select("v", "rid").collect().head
    assert((got.getDouble(0), got.getLong(1)) === ((1.0, 21L)))
  }

  test("rangeJoin equals the naive theta-join across bucket boundaries") {
    // timestamps straddle bucket edges incl. sub-second offsets
    val base = ts("2026-01-01 00:00:00").getTime
    val lefts = (0 until 50).map(i =>
      (i % 3L, new Timestamp(base + i * 7 * 60 * 1000 + i * 123), i.toLong))
      .toDF("k", "lts", "lid")
    val rights = (0 until 80).map(j =>
      (j % 3L, new Timestamp(base + j * 5 * 60 * 1000 + j * 77), 1000L + j))
      .toDF("rk", "rts", "rid")
    val fast = TemporalJoins.rangeJoin(
        lefts, rights, "k", "rk", col("lts"), col("rts"),
        rangeSec = 900, bucketSec = 600)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = lefts.join(rights,
        col("k") === col("rk") &&
          col("rts") >= col("lts") - expr("INTERVAL 900 SECONDS") &&
          col("rts") <= col("lts"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast === naive)
    assert(fast.nonEmpty)
  }
}
