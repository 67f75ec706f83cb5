package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.Tables

/** Pins [[IncrementalJoin]]'s two contracts:
  *  - maintained state ≡ from-scratch join after any append chain
  *    (including empty and one-sided deltas);
  *  - the delta terms read the stored side as co-located buckets (no
  *    state-side Exchange) and the materialized output stays bucketed
  *    through appends.
  */
class IncrementalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lBatch(i: Int) =
    (1L to 60L).filter(_ % 3 == i).map(k => (k % 11, k, s"l$k"))
      .toDF("k", "lid", "lval")
  private def rBatch(i: Int) =
    (0L until 11L).filter(_ % 2 == i).map(k => (k, s"r$k"))
      .toDF("k", "rval")

  private def dropAll(name: String): Unit =
    for (s <- Seq("left", "right", "out"))
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$s")

  test("append chain ≡ from-scratch join, incl. empty and one-sided deltas") {
    val wh = Files.createTempDirectory("graft-ij").toString
    val name = "ijchain"
    dropAll(name)
    try {
      IncrementalJoin.createStored(spark, wh, name, lBatch(0), rBatch(0), "k", 4)
      IncrementalJoin.appendStored(spark, wh, name, lBatch(1), rBatch(1), "k")
      IncrementalJoin.appendStored(spark, wh, name, lBatch(2), rBatch(0).limit(0), "k")
      IncrementalJoin.appendStored(spark, wh, name,
        lBatch(0).limit(0), rBatch(1).limit(0), "k") // full no-op

      val got = IncrementalJoin.readStored(spark, name)
        .as[(Long, Long, String, String)].collect().toSet
      val allL = lBatch(0).unionByName(lBatch(1)).unionByName(lBatch(2))
      val allR = rBatch(0).unionByName(rBatch(1))
      val want = allL.join(allR, Seq("k"))
        .as[(Long, Long, String, String)].collect().toSet
      assert(got === want)
      assert(got.nonEmpty)
    } finally dropAll(name)
  }

  test("delta join reads the stored side bucketed — Exchange only on the delta") {
    val wh = Files.createTempDirectory("graft-ij").toString
    val name = "ijplan"
    dropAll(name)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      IncrementalJoin.createStored(spark, wh, name, lBatch(0), rBatch(0), "k", 4)
      val r0 = Tables.readWarehouseBucketed(spark, s"${name}_right")
      val deltaTerm = lBatch(1).join(r0, Seq("k"))
      deltaTerm.count()
      val plan = deltaTerm.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"stored side must scan as buckets:\n$plan")
      assert("Exchange".r.findAllIn(plan).size <= 1,
        s"only the delta side may shuffle:\n$plan")

      // the materialized output keeps its bucket layout through appends
      IncrementalJoin.appendStored(spark, wh, name, lBatch(1), rBatch(1), "k")
      val agg = IncrementalJoin.readStored(spark, name)
        .groupBy("k").agg(count(lit(1)).as("n"))
      agg.count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucketed output must aggregate on the key without a shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      dropAll(name)
    }
  }
}
