package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the bucketing contract: equal-bucket tables joined on the bucket
  * key plan with ZERO Exchange — the write-time shuffle is reused by every
  * downstream join, the core co-location lever at warehouse scale.
  */
class BucketedTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("join of co-bucketed tables plans without any Exchange") {
    val dir = Files.createTempDirectory("graft_bucketed").toString
    val orders = (1L to 1000L).map(i => (i, i % 97, s"order$i"))
      .toDF("o_id", "cust", "note")
    val custs = (0L until 97L).map(i => (i, s"cust$i")).toDF("cust", "name")
    Tables.writeWarehouseBucketed(orders, dir, "bkt_orders", "cust", 8)
    Tables.writeWarehouseBucketed(custs, dir, "bkt_custs", "cust", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so co-location is what's being tested
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Tables.readWarehouseBucketed(spark, "bkt_orders")
        .join(Tables.readWarehouseBucketed(spark, "bkt_custs"), "cust")
      assert(joined.count() == 1000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$plan")
      // negative control: the same data as plain parquet DOES shuffle
      val p1 = orders.write.mode("overwrite").parquet(s"$dir/plain_orders")
      val plainPlan = spark.read.parquet(s"$dir/plain_orders")
        .join(Tables.readWarehouseBucketed(spark, "bkt_custs"), "cust")
      plainPlan.count()
      assert(plainPlan.queryExecution.executedPlan.toString.contains("Exchange"),
        "plain parquet side should require a shuffle (control)")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_custs")
    }
  }

  test("groupBy on the bucket key aggregates without a shuffle") {
    val dir = Files.createTempDirectory("graft_bucketed_agg").toString
    val events = (1L to 2000L).map(i => (i % 53, i.toDouble)).toDF("k", "v")
    Tables.writeWarehouseBucketed(events, dir, "bkt_events", "k", 8)
    try {
      val agg = Tables.readWarehouseBucketed(spark, "bkt_events")
        .groupBy("k").agg(sum("v").as("s"))
      assert(agg.count() == 53L)
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucketed groupBy must reuse the write-time partitioning")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_events")
    }
  }
}
