package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-computed fixtures for the cohort-retention matrix and the
  * collocation lift arithmetic (the declared queries check both at corpus
  * scale against DuckDB; these pin the semantics on cases small enough to
  * verify by eye).
  */
class RetentionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int, hour: Int) =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("retention: cohort = first active day, offsets count distinct users") {
    // A: days 1, 2, 4 (two events on day 1 must not double-count)
    // B: day 2 only; C: days 2 and 4
    val ev = Seq(
      ("A", ts(1, 9)), ("A", ts(1, 17)), ("A", ts(2, 9)), ("A", ts(4, 9)),
      ("B", ts(2, 10)),
      ("C", ts(2, 11)), ("C", ts(4, 11)))
      .toDF("user_id", "ts")
    val got = Analytics.retention(ev, "user_id", "ts", "day", 1)
      .select(col("cohort").cast("string"), col("period_offset"), col("n_users"))
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(
      ("2024-01-01", 0L, 1L), // A
      ("2024-01-01", 1L, 1L), // A
      ("2024-01-01", 3L, 1L), // A
      ("2024-01-02", 0L, 2L), // B, C
      ("2024-01-02", 2L, 1L))) // C
  }

  test("retention: week unit divides offsets by 7") {
    val ev = Seq(("A", ts(1, 9)), ("A", ts(8, 9)), ("A", ts(22, 9)))
      .toDF("user_id", "ts")
    val got = Analytics.retention(ev, "user_id", "ts", "week", 7)
      .select(col("period_offset"), col("n_users"))
      .as[(Long, Long)].collect().toSet
    assert(got === Set((0L, 1L), (1L, 1L), (3L, 1L)))
  }

  test("collocations: exact counts and integer lift on a known corpus") {
    // "a b" ×3 in doc1, plus "b a" ×2; unigrams: a×5, b×5 → n_uni=10
    val docs = Seq("a b a b a b", "b a b a").toDF("text")
    val got = TextAnalysis.collocations(docs, "text", minCount = 2L)
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet
    // doc1 bigrams: (a,b)(b,a)(a,b)(b,a)(a,b); doc2: (b,a)(a,b)(b,a)
    // → c(a,b)=4, c(b,a)=4; lift_fp = (4*10*10000) div (5*5) = 16000
    assert(got === Set(
      ("a", "b", 4L, 5L, 5L, 10L, 16000L),
      ("b", "a", 4L, 5L, 5L, 10L, 16000L)))
  }

  test("collocations: single-token and empty docs contribute no bigrams") {
    val docs = Seq("solo", "", "x y").toDF("text")
    val got = TextAnalysis.collocations(docs, "text", minCount = 1L)
      .select("w1", "w2", "c_xy").as[(String, String, Long)].collect().toSet
    assert(got === Set(("x", "y", 1L)))
  }

  test("funnelWindowed: conversions outside the window null out and cascade") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // u1: full conversion inside 1h windows
      ("u1", "view", ts("2024-01-01 10:00:00")),
      ("u1", "click", ts("2024-01-01 10:30:00")),
      ("u1", "buy", ts("2024-01-01 11:00:00")),
      // u2: click 2h after view -> outside; later buy must NOT count
      ("u2", "view", ts("2024-01-01 10:00:00")),
      ("u2", "click", ts("2024-01-01 12:30:00")),
      ("u2", "buy", ts("2024-01-01 12:45:00")),
      // u3: click inside, buy outside click's window
      ("u3", "view", ts("2024-01-01 09:00:00")),
      ("u3", "click", ts("2024-01-01 09:20:00")),
      ("u3", "buy", ts("2024-01-01 11:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = Analytics.funnelWindowed(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "buy"), "1 hour")
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(got("u1")._3.contains(ts("2024-01-01 11:00:00")))
    assert(got("u2")._2.isEmpty && got("u2")._3.isEmpty,
      "late click must null out and cascade past the buy")
    assert(got("u3")._2.isDefined && got("u3")._3.isEmpty)
    // the unwindowed funnel WOULD convert u2 fully — the window is the delta
    val loose = Analytics.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "buy")).collect()
      .map(r => r.getString(0) -> Option(r.get(3))).toMap
    assert(loose("u2").isDefined)
  }
}
