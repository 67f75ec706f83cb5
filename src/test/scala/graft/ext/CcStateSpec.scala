package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Incremental connected-component state: chain ≡ from-scratch at any
  * edge split, cross-batch merge cascades, delta minimality (only
  * affected components' members rewrite), replay inertness, and durable
  * compaction.
  */
class CcStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select("node", "comp").as[(Long, Long)].collect().toMap

  private def scratch(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("stored chain == from-scratch CC at any edge split; merges cascade") {
    val wh = java.nio.file.Files.createTempDirectory("graft-cc").toString
    // batch 0: two separate chains {1-2-3}, {10-11}; batch 1: {20-21},
    // extends 3-4; batch 2: one edge 11-20 merges {10,11} with {20,21},
    // and 4-10 then merges EVERYTHING except nothing — full cascade
    val b0 = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val b1 = Seq((20L, 21L), (3L, 4L))
    val b2 = Seq((11L, 20L), (4L, 10L))
    CcState.createCcState(spark, wh, "cc", b0.toDF("a", "b"), "a", "b")
    CcState.appendCcEdges(spark, wh, "cc", b1.toDF("a", "b"), "a", "b", 1)
    CcState.appendCcEdges(spark, wh, "cc", b2.toDF("a", "b"), "a", "b", 2)
    val got = labelsOf(CcState.readCcLabels(spark, wh, "cc"))
    assert(got === scratch(b0 ++ b1 ++ b2),
      "incremental chain must equal the from-scratch components")
    // everything collapsed into comp 1
    assert(got.values.toSet === Set(1L))
  }

  test("a new node with a smaller id relabels the whole existing component") {
    val wh = java.nio.file.Files.createTempDirectory("graft-cc2").toString
    CcState.createCcState(spark, wh, "cc",
      Seq((10L, 11L), (11L, 12L)).toDF("a", "b"), "a", "b")
    CcState.appendCcEdges(spark, wh, "cc",
      Seq((5L, 12L)).toDF("a", "b"), "a", "b", 1)
    val got = labelsOf(CcState.readCcLabels(spark, wh, "cc"))
    assert(got === Map(5L -> 5L, 10L -> 5L, 11L -> 5L, 12L -> 5L))
  }

  test("delta minimality: unaffected components write zero rows") {
    val wh = java.nio.file.Files.createTempDirectory("graft-cc3").toString
    CcState.createCcState(spark, wh, "cc",
      Seq((1L, 2L), (10L, 11L), (20L, 21L)).toDF("a", "b"), "a", "b")
    // batch touches ONLY {10,11} (adds 12); {1,2} and {20,21} must not
    // appear in the delta partition
    CcState.appendCcEdges(spark, wh, "cc",
      Seq((11L, 12L)).toDF("a", "b"), "a", "b", 1)
    val delta = graft.io.Tables.readWarehouse(spark, wh, "cc_cclab")
      .filter(col("_ingest_batch") === "b00001")
      .select("node", "comp").as[(Long, Long)].collect().toMap
    assert(delta === Map(12L -> 10L),
      s"only the new member of the touched component may write: $delta")
  }

  test("replay inertness: re-running a batch replaces its own partition") {
    val wh = java.nio.file.Files.createTempDirectory("graft-cc4").toString
    val b1 = Seq((5L, 12L), (30L, 31L))
    CcState.createCcState(spark, wh, "cc",
      Seq((10L, 11L), (11L, 12L)).toDF("a", "b"), "a", "b")
    CcState.appendCcEdges(spark, wh, "cc", b1.toDF("a", "b"), "a", "b", 1)
    val before = labelsOf(CcState.readCcLabels(spark, wh, "cc"))
    CcState.appendCcEdges(spark, wh, "cc", b1.toDF("a", "b"), "a", "b", 1)
    assert(labelsOf(CcState.readCcLabels(spark, wh, "cc")) === before,
      "at-least-once replay must not change the labels")
  }

  test("compaction folds the log durably and preserves the labels") {
    val wh = java.nio.file.Files.createTempDirectory("graft-cc5").toString
    CcState.createCcState(spark, wh, "cc",
      Seq((1L, 2L), (10L, 11L)).toDF("a", "b"), "a", "b")
    CcState.appendCcEdges(spark, wh, "cc",
      Seq((2L, 10L), (30L, 31L)).toDF("a", "b"), "a", "b", 1)
    val before = labelsOf(CcState.readCcLabels(spark, wh, "cc"))
    CcState.compactCcState(spark, wh, "cc")
    assert(labelsOf(CcState.readCcLabels(spark, wh, "cc")) === before)
    // one partition remains; every node exactly once
    val raw = graft.io.Tables.readWarehouse(spark, wh, "cc_cclab")
    assert(raw.select("_ingest_batch").distinct().count() === 1L)
    assert(raw.count() === before.size.toLong)
  }
}
