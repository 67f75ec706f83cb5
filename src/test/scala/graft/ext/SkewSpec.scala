package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Salted-join contract: bit-identical to the direct join on a fixture
  * where 90% of the big side lands on one hot key, and the physical
  * shuffle actually spreads that key (salt present in the exchange keys).
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90% of rows hit key 0 — the planted heavy hitter.
  private def skewedBig = (1L to 2000L)
    .map(i => (i, if (i % 10 == 0) i % 7 else 0L))
    .toDF("row_id", "k")
  private def smallDim = (0L until 7L).map(i => (i, s"dim$i")).toDF("k", "label")

  test("saltedJoin is bit-identical to the direct join (inner and left)") {
    val big = skewedBig
    val dim = smallDim.filter($"k" =!= 3L) // a keyless hole for the left case
    for (jt <- Seq("inner", "left")) {
      val salted = Skew.saltedJoin(big, dim, Seq("k"), $"row_id", 8, jt)
        .select("row_id", "k", "label")
        .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
        .sortBy(x => (x._1, x._2))
      val direct = big.join(dim, Seq("k"), jt)
        .select("row_id", "k", "label")
        .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
        .sortBy(x => (x._1, x._2))
      assert(salted === direct, s"joinType=$jt")
    }
  }

  test("left_anti and left_semi match the direct forms") {
    val big = skewedBig
    val dim = smallDim.filter($"k" < 3L)
    for (jt <- Seq("left_semi", "left_anti")) {
      val salted = Skew.saltedJoin(big, dim, Seq("k"), $"row_id", 8, jt)
        .select("row_id").as[Long].collect().sorted
      val direct = big.join(dim, Seq("k"), jt)
        .select("row_id").as[Long].collect().sorted
      assert(salted === direct, s"joinType=$jt")
    }
  }

  test("the shuffle spreads hot keys: exchange keys include the salt") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val salted = Skew.saltedJoin(skewedBig, smallDim, Seq("k"), $"row_id", 8)
      salted.count()
      val plan = salted.queryExecution.executedPlan.toString
      assert(plan.contains("__salt"),
        s"salt must appear in the physical plan's join/partition keys:\n$plan")
      val exchanges = plan.linesIterator
        .filter(_.contains("Exchange hashpartitioning")).toSeq
      assert(exchanges.nonEmpty && exchanges.forall(_.contains("__salt")),
        s"every join exchange must partition by (key, salt):\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("unsupported join types are rejected") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewedBig, smallDim, Seq("k"), $"row_id", 8, "full_outer")
    }
  }

  private def policyRows(df: org.apache.spark.sql.DataFrame) =
    df.select("row_id", "k", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
      .sortBy(x => (x._1, x._2)).toSeq

  test("joinWithSkewPolicy: small dim -> broadcast, plan shows BroadcastHashJoin") {
    val (out, decision) = Skew.joinWithSkewPolicy(
      skewedBig, smallDim, Seq("k"), $"row_id")
    assert(decision === "broadcast")
    out.count()
    assert(out.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    assert(policyRows(out) === policyRows(skewedBig.join(smallDim, Seq("k"))))
  }

  test("joinWithSkewPolicy: hot key past the ratio gate -> salted, same rows") {
    // force the dim past the broadcast gate so the skew branch decides
    val (out, decision) = Skew.joinWithSkewPolicy(
      skewedBig, smallDim, Seq("k"), $"row_id",
      nSalts = 8, hotRatioX100 = 500L, broadcastRows = 3L)
    assert(decision === "salted")
    assert(!out.columns.contains("__salt"))
    assert(policyRows(out) === policyRows(skewedBig.join(smallDim, Seq("k"))))
  }

  test("joinWithSkewPolicy: uniform keys -> plain shuffle join, same rows") {
    val uniform = (1L to 700L).map(i => (i, i % 7)).toDF("row_id", "k")
    val (out, decision) = Skew.joinWithSkewPolicy(
      uniform, smallDim, Seq("k"), $"row_id",
      hotRatioX100 = 200L, broadcastRows = 3L)
    assert(decision === "plain")
    assert(policyRows(out) === policyRows(uniform.join(smallDim, Seq("k"))))
  }

  test("joinWithSkewPolicy: an outer joinType never salts (falls to plain)") {
    val (out, decision) = Skew.joinWithSkewPolicy(
      skewedBig, smallDim, Seq("k"), $"row_id",
      joinType = "full_outer", hotRatioX100 = 100L, broadcastRows = 3L)
    assert(decision === "plain")
    assert(out.count() === skewedBig.join(smallDim, Seq("k"), "full_outer").count())
  }

  test("joinWithSkewPolicy: WIDE rows under the row gate fall past broadcast") {
    // 20 rows x ~10 KB each ≈ 200 KB — passes any row gate, fails a
    // 64 KB byte gate; the r7 rows-only policy would broadcast it
    val wide = (1L to 20L).map(k => (k % 7, "x" * 10000)).toDF("k", "label")
    val (out, decision) = Skew.joinWithSkewPolicy(
      skewedBig, wide, Seq("k"), $"row_id",
      hotRatioX100 = 500L, broadcastRows = 1000L, broadcastBytes = 64L << 10)
    assert(decision === "salted",
      "a wide small side must fail the byte gate and fall through")
    assert(out.count() === skewedBig.join(wide, Seq("k")).count())
    // the same dim under a roomy byte gate broadcasts
    val (_, d2) = Skew.joinWithSkewPolicy(
      skewedBig, wide, Seq("k"), $"row_id",
      broadcastRows = 1000L, broadcastBytes = 64L << 20)
    assert(d2 === "broadcast")
  }

  test("joinWithSkewPolicy: right/full outer never claim broadcast (right side cannot build)") {
    // tiny dim well under both gates — but Spark cannot broadcast the
    // RIGHT side of a right/full outer join, so claiming "broadcast"
    // would misreport the executed plan
    for (jt <- Seq("right_outer", "full_outer")) {
      val (out, decision) = Skew.joinWithSkewPolicy(
        skewedBig, smallDim, Seq("k"), $"row_id", joinType = jt)
      assert(decision === "plain", s"$jt must not claim broadcast")
      assert(out.count() ===
        skewedBig.join(smallDim, Seq("k"), jt).count())
    }
  }

  test("joinWithSkewPolicy: caller-supplied count skips the probe, same result") {
    val (out, decision) = Skew.joinWithSkewPolicy(
      skewedBig, smallDim, Seq("k"), $"row_id",
      smallRows = Some(smallDim.count()))
    assert(decision === "broadcast")
    assert(policyRows(out) === policyRows(skewedBig.join(smallDim, Seq("k"))))
    // a supplied count past the gate goes straight to the skew branch
    val (_, d2) = Skew.joinWithSkewPolicy(
      skewedBig, smallDim, Seq("k"), $"row_id",
      hotRatioX100 = 500L, broadcastRows = 3L, smallRows = Some(1000L))
    assert(d2 === "salted")
  }

  test("skewReport: exact top-k, shares, and hot/mean ratio on a known distribution") {
    import org.apache.spark.sql.functions.col
    // hot: 60 rows; warm: 30; 10 cold singletons → n=100, keys=12, mean=ceil(100/12)=9
    val rows = Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++
      (1 to 10).map(i => s"c$i")
    val rep = Skew.skewReport(rows.toDF("k").repartition(7), col("k"), topK = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(rep.keySet === Set("hot", "warm", "c1"))
    assert(rep("hot") === ((60L, 100L, 12L, 600000L, 60L * 100 / 9)))
    assert(rep("warm") === ((30L, 100L, 12L, 300000L, 30L * 100 / 9)))
    assert(rep("c1") === ((1L, 100L, 12L, 10000L, 100L / 9)))
  }
}
