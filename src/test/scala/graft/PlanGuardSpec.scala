package graft

import org.scalatest.funsuite.AnyFunSuite

/** Repo-wide physical-plan invariant: NO declared query may plan a
  * CartesianProduct or a BroadcastNestedLoopJoin — the two nodes that turn
  * into O(n²) row-pair work at corpus scale. The single exception is the
  * clearly-labeled exact brute-force baseline (`q_cosine_topk`), whose
  * cross join IS its contract. Constant-key fanouts (centroids, bloom
  * bitsets, query vectors) must all plan as BroadcastHashJoin — this spec
  * is the regression guard for that house pattern (a folded lit() key
  * silently degrades to BNLJ and nothing else would catch it until a
  * 100× corpus does).
  *
  * Plans are built (analysis + physical planning) at sf0.001; stateful
  * query guards may run their one-time state writes, which is the same
  * work Verify does per dump.
  */
class PlanGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  /** Labeled exact baselines whose cross product is the documented contract. */
  private val crossAllowed = Set("q_cosine_topk")

  test("no declared query plans CartesianProduct or BroadcastNestedLoopJoin") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, sf).queryExecution.executedPlan.toString
          catch { case e: Throwable => s"PLANNING FAILED: ${e.getMessage}" }
        spark.sharedState.cacheManager.clearCache()
        if (plan.startsWith("PLANNING FAILED"))
          Some(s"$name: $plan")
        else if (!crossAllowed(name) &&
          (plan.contains("CartesianProduct") ||
            plan.contains("BroadcastNestedLoopJoin")))
          Some(s"$name: plans a cross-product node")
        else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
