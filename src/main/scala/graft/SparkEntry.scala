package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are declared per-domain under `graft.queries` and aggregated here.
  */
object SparkEntry {

  private def registry: Seq[DeclaredQuery] =
    _root_.graft.queries.ReferenceQueries.all ++
      _root_.graft.queries.AnalyticsQueries.all ++
      _root_.graft.queries.TextQueries.all ++
      _root_.graft.queries.DedupQueries.all ++
      _root_.graft.queries.SimilarityQueries.all ++
      _root_.graft.queries.MultimodalQueries.all ++
      _root_.graft.queries.TemporalJoinQueries.all ++
      _root_.graft.queries.SamplingQueries.all ++
      _root_.graft.queries.CurationQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_merge_full")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Queries with a
    * declared setup phase compose it in front of `fn`, so the driver-
    * facing contract (call one function, get the result) is unchanged;
    * [[Bench]] reads [[declared]] to time the phases separately.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { q =>
      q.name -> (q.setup match {
        case Some(st) =>
          (s: SparkSession, d: String) => { st(s, d); q.fn(s, d) }
        case None => q.fn
      })
    }.toMap

  /** The raw declarations (fn + optional setup + oracle), for the bench's
    * per-phase timing.
    */
  def declared: Map[String, DeclaredQuery] =
    registry.map(q => q.name -> q).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case q if q.oracle.isDefined => q.name -> q.oracle.get }.toMap
}
