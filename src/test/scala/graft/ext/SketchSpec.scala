package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Sketch aggregates have no DuckDB oracle (approximations are
  * engine-specific), so their correctness gate lives here: error bounds
  * against the exact answers on the real corpus.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("approx_count_distinct is within its configured rsd of exact") {
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), rsd = 0.02).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.06,
        s"$k: approx $a vs exact $e beyond 3×rsd")
    }
  }

  test("percentile_approx converges to the exact percentile at high accuracy") {
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = li.groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e) / e <= 0.01,
        s"$k: approx ${approx(k)} vs exact $e beyond 1%")
    }
  }
}
