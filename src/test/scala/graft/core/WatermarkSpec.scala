package graft.core

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WatermarkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("save/load round-trips the state file") {
    val dir = Files.createTempDirectory("graft-wm").toString
    val marks = Seq(
      Watermark("customer", ts("2024-06-01 00:12:44")),
      Watermark("vendorledgerentry", ts("2024-06-01 00:13:02")))
    WatermarkStore.save(spark, marks, s"$dir/latest.csv")
    val loaded = WatermarkStore.load(spark, s"$dir/latest.csv")
    assert(loaded === marks.map(w => w.folder -> w.maxCreatedAt).toMap)
  }

  test("load of a missing state file is an empty map (first run)") {
    assert(WatermarkStore.load(spark, "/tmp/graft-no-such-state.csv") === Map.empty)
  }

  test("newFiles is strictly greater-than (equal-to-mark already processed)") {
    val files = Seq(
      ("f1", ts("2024-01-01 00:00:00")),
      ("f2", ts("2024-01-02 00:00:00")),
      ("f3", ts("2024-01-03 00:00:00")))
    assert(WatermarkStore.newFiles(files, Some(ts("2024-01-02 00:00:00"))) === Seq("f3"))
    assert(WatermarkStore.newFiles(files, None).size === 3)
  }

  test("maxByCreated picks the max creation time with a name tiebreaker") {
    val files = Seq(
      ("b", ts("2024-01-02 00:00:00")),
      ("a", ts("2024-01-02 00:00:00")),
      ("c", ts("2024-01-01 00:00:00")))
    assert(WatermarkStore.maxByCreated("f", files) ===
      Some(Watermark("f", ts("2024-01-02 00:00:00"))))
    assert(WatermarkStore.maxByCreated("f", Seq.empty) === None)
  }

  test("latestPerGroup: one hash agg, deterministic under ties") {
    import spark.implicits._
    val df = Seq(
      ("g1", "n1", ts("2024-01-01 00:00:00")),
      ("g1", "n2", ts("2024-01-02 00:00:00")),
      ("g1", "n0", ts("2024-01-02 00:00:00")), // tie -> larger name wins
      ("g2", "n3", ts("2024-01-01 00:00:00"))
    ).toDF("folder", "name", "created")
    val got = WatermarkStore.latestPerGroup(df, "folder", "name", "created")
      .collect().map(r => (r.getString(0), r.getString(1), r.getTimestamp(2))).toSet
    assert(got === Set(
      ("g1", "n2", ts("2024-01-02 00:00:00")),
      ("g2", "n3", ts("2024-01-01 00:00:00"))))
  }
}
