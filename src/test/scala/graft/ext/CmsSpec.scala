package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Count-min sketch: the overestimate-only guarantee, exact mergeability
  * of the stored per-batch grids, partition-replace replay inertness, and
  * the partition-pruned sliding-window read.
  */
class CmsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Depth = 4
  private val Width = 64

  /** Zipf-ish fixture with known exact counts: key i occurs i times. */
  private def corpus(lo: Int, hi: Int): DataFrame =
    (lo to hi).flatMap(i => Seq.fill(i)(s"k$i")).toDF("k")

  private def gridMap(g: DataFrame): Map[(Int, Long), Long] =
    g.select("row_i", "bucket", "cnt").as[(Int, Long, Long)]
      .collect().map { case (r, b, c) => (r, b) -> c }.toMap

  test("estimates never undercount, and are exact when no row collides") {
    val df = corpus(1, 30) // N = 465 instances, 30 distinct keys
    val sketch = SketchState.cmsSketch(df, col("k"), Depth, Width)
    val est = SketchState.cmsEstimate(sketch, df, col("k"), Depth, Width)
      .as[(String, Long)].collect().toMap
    (1 to 30).foreach { i =>
      val e = est(s"k$i")
      assert(e >= i, s"k$i: est $e undercounts true $i")
      // d independent rows over 64 buckets for 30 keys: at least one
      // collision-free row is near-certain; the min picks it up, so the
      // overshoot stays far below one full colliding partner (>= 1·lo).
      assert(e <= i + 31, s"k$i: est $e too far above true $i")
    }
    // unseen key reads 0 only if all its buckets are empty — with 30
    // occupied cells out of 64 per row it may collide; assert the
    // documented bound instead: est(unseen) <= max true count.
    val unseen = SketchState.cmsEstimate(sketch,
        Seq("never-seen").toDF("k"), col("k"), Depth, Width)
      .as[(String, Long)].head()._2
    assert(unseen >= 0 && unseen <= 30)
  }

  test("an empty grid estimates 0 for every probe") {
    val empty = SketchState.cmsSketch(corpus(1, 5).limit(0), col("k"), Depth, Width)
    val est = SketchState.cmsEstimate(empty, corpus(1, 3), col("k"), Depth, Width)
      .as[(String, Long)].collect().toMap
    assert(est.values.forall(_ == 0L), s"empty sketch must estimate 0: $est")
  }

  test("stored chain == live grid (additivity); re-append is inert") {
    val wh = Files.createTempDirectory("graft-cms").toString
    val b0 = corpus(1, 10)
    val b1 = corpus(5, 20)
    val b2 = corpus(15, 30)
    SketchState.createCmsState(spark, wh, "c", b0, col("k"), Depth, Width)
    SketchState.appendCmsState(spark, wh, "c", b1, col("k"), Depth, Width, "n2")
    SketchState.appendCmsState(spark, wh, "c", b2, col("k"), Depth, Width, "n3")
    val live = gridMap(SketchState.cmsSketch(
      b0.unionAll(b1).unionAll(b2), col("k"), Depth, Width))
    assert(gridMap(SketchState.readCmsSketch(spark, wh, "c")) === live,
      "sum-fold of per-batch grids must equal the one-shot grid")
    // at-least-once replay: the batch REPLACES its own partition
    SketchState.appendCmsState(spark, wh, "c", b2, col("k"), Depth, Width, "n3")
    assert(gridMap(SketchState.readCmsSketch(spark, wh, "c")) === live,
      "re-appended batch must not change the grid")
  }

  test("windowed read matches the windowed corpus and partition-prunes") {
    val wh = Files.createTempDirectory("graft-cmsw").toString
    val b0 = corpus(1, 10)
    val b1 = corpus(5, 20)
    val b2 = corpus(15, 30)
    SketchState.createCmsState(spark, wh, "c", b0, col("k"), Depth, Width)
    SketchState.appendCmsState(spark, wh, "c", b1, col("k"), Depth, Width, "n2")
    SketchState.appendCmsState(spark, wh, "c", b2, col("k"), Depth, Width, "n3")
    val win = SketchState.readCmsSketchWindow(spark, wh, "c", Seq("n2", "n3"))
    assert(gridMap(win) === gridMap(
      SketchState.cmsSketch(b1.unionAll(b2), col("k"), Depth, Width)),
      "window fold must equal the grid over just the windowed batches")
    val scan = win.queryExecution.executedPlan.toString
    val partFilter = "PartitionFilters: \\[[^\\]]*_ingest_batch[^\\]]*\\]".r
    assert(partFilter.findFirstIn(scan).isDefined,
      s"window must land in PartitionFilters:\n$scan")
  }
}
