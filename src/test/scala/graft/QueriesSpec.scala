package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke for every declared query on sf0.001: runs, returns rows, and every
  * oracle key actually exists in `queries`. Hash-level verification against
  * DuckDB runs in the driver harness (and locally via tools/compare_oracle.py).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown === Set.empty[String])
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
    }
  }
}
