package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark query over the test corpus plus,
  * when SQL-expressible, the equivalent ANSI SQL the driver runs in DuckDB for
  * the hash-compare correctness gate. Queries without an oracle get the weaker
  * rows-only check (non-SQL-expressible ops: MinHash/SimHash signatures, approx
  * ANN, binary decode plumbing).
  *
  * Contract: result content must be deterministic (order-insensitive), column
  * names must match the oracle exactly, and no wall-clock/nondeterministic
  * functions may appear (SURVEY.md §5.2).
  *
  * `setup`: stateful queries (multi-night state chains — SCD2, partitioned
  * merges, materialized views) separate their state seeding from the
  * measured read so the bench can report `{setup_s, query_s}` instead of
  * one muddied number. When present, `setup` MUST be idempotent (it is
  * re-run before every timing sample) and `fn` assumes it has run.
  * Queries without `setup` behave exactly as before.
  */
final case class DeclaredQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    setup: Option[(SparkSession, String) => Unit] = None)
