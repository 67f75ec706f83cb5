package graft

import scala.collection.mutable

import org.apache.spark.GraftTestBus
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit,
  LogicalPlan}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

/** PlanGuardSpec's DRIVER-SIDE twin (VERDICT-r11 #5): no declared
  * query's construction may COLLECT corpus rows to the driver. The
  * `.collect()` sites in main are all metadata-scale today (manifest
  * headers, drift ledgers, partition keys, watermark rows) — but
  * nothing pinned that: a future builder routing corpus rows through a
  * driver loop would pass CORRECTNESS at sf0.01 and die at 100×. This
  * spec registers a QueryExecutionListener while every declared
  * query's plan is BUILT (the same work PlanGuardSpec does — builders
  * run their internal collects during construction) and flags any
  * collect-class action whose plan scans a CORPUS file (a path under
  * the sf dir) without a cardinality-bounding operator.
  *
  * Bounding operators (the "metadata-scale by construction" shapes):
  *  - Aggregate — the watermark max-by, count-style probes, GROUP BY
  *    over enumerable keys (a group-by whose key is high-cardinality
  *    would be a finding for a human; the automatable line is drawn at
  *    "reduces rows", like PlanGuard draws it at "plans a cross
  *    product");
  *  - GlobalLimit — explicitly bounded probes (`limit(1).count()`
  *    guards, `head`);
  *  - Deduplicate over ≤ 4 columns — the partition-key `distinct()`
  *    the manifest write paths collect (partition keys ARE metadata;
  *    a distinct over the full row width would NOT pass).
  *
  * STATE relations (temp-dir tables the stored/state queries maintain)
  * are deliberately out of scope: their collects are manifest headers
  * and ledgers read via the FS, not Spark actions, and state-serving
  * reads are pinned Exchange-free by their own specs. The guard's
  * contract mirrors PlanGuardSpec's: any new offender must either fix
  * the plan or argue its way into the documented whitelist below.
  */
class CollectGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose corpus-scanning collect is their documented,
    * metadata-scale contract (argued case by case, PlanGuard-style):
    *
    *  - `q_bloom_point`: the collect SYNTHESIZES the caller-supplied
    *    probe-id list (`o_orderkey % 191`, ≤ ~100 keys at bench sf) —
    *    in production that list is an INPUT, and the API it feeds
    *    (`readWhere(ZoneIn(...))`) takes driver-side literals by
    *    design, the same way any SQL IN-list is plan metadata; the
    *    probe path itself is capped (`BloomSidecar.MaxProbeKeys`).
    *    A real deployment never derives the list by scanning the
    *    table it is about to point-look-up.
    */
  private val collectAllowed = Set("q_bloom_point")

  private case class Offence(query: String, fn: String, plan: String)

  test("no declared query's construction collects UNBOUNDED corpus " +
      "rows to the driver") {
    val actions = mutable.ArrayBuffer.empty[(String, LogicalPlan)]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        synchronized { actions += ((funcName, qe.analyzed)) }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    val collectClass =
      Set("collect", "collectAsList", "collectToPython", "toLocalIterator")

    def scansCorpus(plan: LogicalPlan): Boolean =
      plan.collectFirst {
        case LogicalRelation(r: HadoopFsRelation, _, _, _, _)
            if r.location.rootPaths.exists(_.toString.contains(sf)) => ()
      }.nonEmpty

    // CARDINALITY-PATH rule, not node-presence: the collect's output
    // row count is bounded iff every path from the root down to a
    // corpus scan crosses a bounding operator. A mere Aggregate
    // SOMEWHERE in the plan must not excuse the whole collect —
    // corpus.join(small.groupBy(...).agg(...)).collect() contains an
    // Aggregate yet ships O(corpus) rows to the driver.
    def bounded(plan: LogicalPlan): Boolean = plan match {
      case _: Aggregate => true
      case _: GlobalLimit => true
      case d: org.apache.spark.sql.catalyst.plans.logical.Deduplicate
          if d.keys.size <= 4 && d.output.size <= 4 => true
      case LogicalRelation(r: HadoopFsRelation, _, _, _, _) =>
        !r.location.rootPaths.exists(_.toString.contains(sf))
      case leaf if leaf.children.isEmpty => true // state/local relations
      // joins, unions, filters, projects: output cardinality is
      // unbounded if ANY input side is (conservative for anti/semi
      // joins, which only ever under-flag nothing)
      case other => other.children.forall(bounded)
    }

    val offenders = mutable.ArrayBuffer.empty[Offence]
    spark.listenerManager.register(listener)
    try {
      SparkEntry.declared.toSeq.sortBy(_._1).foreach { case (name, q) =>
        actions.synchronized(actions.clear())
        try {
          // the SETUP phase (state seeding) is in scope too: a setup
          // routing corpus rows through the driver scales exactly as
          // badly as a query doing it. Then building the plan runs
          // every internal collect a builder performs; execution of
          // the RESULT is PlanGuard's domain.
          q.setup.foreach(st => st(spark, sf))
          q.fn(spark, sf).queryExecution.executedPlan
        } catch { case e: Throwable =>
          offenders += Offence(name, "PLANNING FAILED", e.getMessage)
        }
        spark.sharedState.cacheManager.clearCache()
        GraftTestBus.flush(spark.sparkContext)
        if (!collectAllowed(name)) actions.synchronized {
          actions.foreach { case (fnName, plan) =>
            if (collectClass(fnName) && scansCorpus(plan) &&
                !bounded(plan))
              offenders += Offence(name, fnName,
                plan.toString.linesIterator.take(12).mkString("\n"))
          }
        }
      }
    } finally spark.listenerManager.unregister(listener)
    assert(offenders.isEmpty, offenders.map(o =>
      s"${o.query}: ${o.fn} collected unbounded corpus rows to the " +
        s"driver —\n${o.plan}").mkString("\n\n"))
  }

  test("the guard itself detects an unbounded corpus collect (it is " +
      "not vacuously green)") {
    val actions = mutable.ArrayBuffer.empty[(String, LogicalPlan)]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        synchronized { actions += ((funcName, qe.analyzed)) }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      spark.read.parquet(s"$sf/region.parquet").collect()
      GraftTestBus.flush(spark.sparkContext)
    } finally spark.listenerManager.unregister(listener)
    val hit = actions.synchronized(actions.find { case (fnName, plan) =>
      fnName == "collect" && plan.collectFirst {
        case LogicalRelation(r: HadoopFsRelation, _, _, _, _)
            if r.location.rootPaths.exists(_.toString.contains(sf)) => ()
      }.nonEmpty
    })
    assert(hit.nonEmpty, "a bare corpus collect must be visible to the " +
      "listener machinery this guard is built on")
  }
}
