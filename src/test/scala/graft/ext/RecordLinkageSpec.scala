package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[RecordLinkage.link]]: blocking bounds the candidate set,
  * mutual-best keeps only pairs BOTH sides rank first, ties break
  * deterministically, and unmatched rows vanish.
  */
class RecordLinkageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(Long, String, String)]) =
    rows.toDF("id", "name", "blk")

  test("mutual best survives; one-sided best pairs are eliminated") {
    // block b: l1 "alpha" has a perfect r-copy; l2 "alphq" (dist 1 from
    // alpha's copy too) must NOT steal it — r10's best is l1, so the
    // (l2, r10) candidate dies on the r-side rank even though it is
    // l2's own best.
    val left = df(Seq((1L, "alpha", "b"), (2L, "alphq", "b"),
      (3L, "omega", "b")))
    val right = df(Seq((10L, "alpha", "b"), (11L, "omegz", "b")))
    val got = RecordLinkage.link(left, right, "id", "name", "blk", 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 10L, 0L), (3L, 11L, 1L)))
  }

  test("blocking is a hard wall: identical names in different blocks never pair") {
    val left = df(Seq((1L, "same", "b1")))
    val right = df(Seq((10L, "same", "b2")))
    assert(RecordLinkage.link(left, right, "id", "name", "blk", 2)
      .count() === 0)
  }

  test("distance cap excludes far pairs; tie on dist breaks by id") {
    val left = df(Seq((1L, "aaaa", "b")))
    val right = df(Seq(
      (12L, "aaab", "b"), (11L, "aaac", "b"), // both dist 1 -> pick min id
      (13L, "zzzz", "b")))                    // dist 4 -> capped out
    val got = RecordLinkage.link(left, right, "id", "name", "blk", 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 11L, 1L)))
  }
}
