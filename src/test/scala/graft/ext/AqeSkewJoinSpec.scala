package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The adaptive twin of [[Skew.saltedJoin]]: AQE's skew-join split
  * handles a skewed sort-merge join at runtime (splitting oversized
  * partitions into parallel subtasks), no salting required. This spec
  * pins that the engine configuration actually triggers it — evidence
  * that the explicit salt is a deterministic CHOICE, not a workaround
  * for a missing engine path — and that results are unchanged.
  */
class AqeSkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AQE splits the skewed side of a sort-merge join (skew=true in plan)") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = confs.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // force SMJ + make the planted hot key trip the skew detector at
      // test scale (thresholds are tuned for multi-GB partitions by default)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // 96% of rows on key 0, with a payload wide enough to exceed the
      // per-partition threshold; dim has one row per key.
      val big = (1L to 60000L)
        .map(i => (i, if (i % 25 == 0) i % 11 else 0L))
        .toDF("row_id", "k")
        .withColumn("payload", concat_ws("-", lit("x"), md5($"row_id".cast("string"))))
      val dim = (0L until 11L).map(i => (i, s"dim$i")).toDF("k", "label")

      val joined = big.join(dim, "k")
      // collect() drives joined's OWN QueryExecution (count() builds a
      // separate one and would leave this plan isFinalPlan=false)
      assert(joined.collect().length === 60000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && plan.contains("skew=true"),
        s"AQE must mark the skewed join side (skew=true):\n${plan.take(3000)}")

      // and the split changes only the schedule, never the result
      val expectHot = big.filter($"k" === 0L).count()
      assert(joined.filter($"k" === 0L).count() === expectHot)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
