package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.BloomExpressions.{BloomBuildAgg, BloomMightContain}
import graft.functions.TextExpressions.{DupGramCoverage, TextHashEmbed, TextShingles}
import graft.functions.VectorExpressions.{HyperplaneSig, IntProject, LongSqDist, SortedLongIntersectCount, VectorDot, VectorNormalize}

/** Session-extension entry point for cluster deployments:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * registers the engine's native expressions (`vec_dot`, `vec_normalize`)
  * in every session, so SQL users get them too. Local code paths call
  * `VectorExpressions.register(spark)` directly, which installs the same
  * builders idempotently.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // SQL surface for manifest tables: registered names resolve to
    // GraftManifestRelation, and the optimizer converts each resolved
    // filter into the zone → bloom → file pruned scan (see
    // graft.plans.GraftSqlTables for the whole story)
    ext.injectResolutionRule(s => new graft.plans.ResolveGraftTables(s))
    // DML statements intercept in the HINT batch — before Resolution —
    // because builtin INSERT resolution fails fast on uncataloged names
    // and builtin MERGE resolution star-expands actions (see
    // graft.plans.ResolveGraftDml)
    ext.injectHintResolutionRule(s => new graft.plans.ResolveGraftDml(s))
    ext.injectOptimizerRule(s => new graft.plans.PruneGraftScans(s))
    // maintenance statements Spark's grammar has no node for
    // (OPTIMIZE [ZORDER BY] / VACUUM [RETAIN n HOURS]) — intercepted
    // only for session-registered graft names, all else delegates
    ext.injectParser((s, delegate) =>
      new graft.plans.GraftSqlParser(s, delegate))
    // the change feed as a SQL table-valued function (the Delta CDF
    // spelling): SELECT * FROM table_changes('t', 2, 5)
    ext.injectTableFunction((
      FunctionIdentifier("table_changes"),
      new ExpressionInfo(graft.plans.GraftTableChanges.getClass.getName,
        "table_changes"),
      (es: Seq[Expression]) => graft.plans.GraftTableChanges.build(es)))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (es: Seq[Expression]) => VectorDot(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_normalize"),
      new ExpressionInfo(classOf[VectorNormalize].getName, "vec_normalize"),
      (es: Seq[Expression]) => VectorNormalize(es.head)))
    ext.injectFunction((
      FunctionIdentifier("text_shingles"),
      new ExpressionInfo(classOf[TextShingles].getName, "text_shingles"),
      (es: Seq[Expression]) => TextShingles(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("text_hash_embed"),
      new ExpressionInfo(classOf[TextHashEmbed].getName, "text_hash_embed"),
      (es: Seq[Expression]) => TextHashEmbed(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("dup_gram_coverage"),
      new ExpressionInfo(classOf[DupGramCoverage].getName, "dup_gram_coverage"),
      (es: Seq[Expression]) => DupGramCoverage(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_long_intersect_count"),
      new ExpressionInfo(classOf[SortedLongIntersectCount].getName,
        "sorted_long_intersect_count"),
      (es: Seq[Expression]) => SortedLongIntersectCount(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "vec_hyperplane_sig"),
      (es: Seq[Expression]) => HyperplaneSig(es(0),
        es(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("vec_project_int"),
      new ExpressionInfo(classOf[IntProject].getName, "vec_project_int"),
      (es: Seq[Expression]) => IntProject(es(0),
        es(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("vec_l2sq_long"),
      new ExpressionInfo(classOf[LongSqDist].getName, "vec_l2sq_long"),
      (es: Seq[Expression]) => LongSqDist(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("bloom_build"),
      new ExpressionInfo(classOf[BloomBuildAgg].getName, "bloom_build"),
      (es: Seq[Expression]) => BloomBuildAgg(es(0),
        es(1).eval().asInstanceOf[Number].longValue)))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName,
        "bloom_might_contain"),
      (es: Seq[Expression]) => BloomMightContain(es(0), es(1))))
  }
}
