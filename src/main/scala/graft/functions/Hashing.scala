package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, oracle-portable hashing.
  *
  * The dedup/similarity operators need a 64-bit hash that is *identical* in
  * Spark and in the DuckDB oracle, so that MinHash signatures / LSH buckets /
  * SimHash bits can be hash-compared by the driver's t2 gate, not just
  * row-counted. Spark's `xxhash64`/`hash` and DuckDB's `hash()` are different
  * algorithms, so we derive a 60-bit integer from the first 15 hex chars of
  * md5 — both engines implement md5 identically:
  *
  *   Spark : conv(substring(md5(s), 1, 15), 16, 10) :: long
  *   DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT
  *
  * 15 hex chars = 60 bits, always positive, no signed-overflow divergence.
  * Seeded families (MinHash needs k independent hashes) prepend `"seed:"`.
  */
object Hashing {

  /** 60-bit md5-derived hash of a string column. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded member of the hash family: h_i(x) = md5Long(i ":" x). */
  def md5LongSeeded(c: Column, seed: Int): Column =
    md5Long(concat(lit(s"$seed:"), c))

  /** DuckDB rendering of [[md5Long]] over SQL expression `expr`. */
  def md5LongSql(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 15))::BIGINT)"

  /** DuckDB rendering of [[md5LongSeeded]]. */
  def md5LongSeededSql(expr: String, seed: Int): String =
    md5LongSql(s"'$seed:' || $expr")
}
