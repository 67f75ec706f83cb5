package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation: the salting pattern for heavy-hitter keys.
  *
  * A plain `groupBy(k).agg(...)` sends every row of a hot key to one
  * reducer. Salting splits each key into `nSalts` deterministic sub-keys
  * (hash of a unique column, NOT rand() — reruns must reproduce), runs the
  * partial aggregate on (key, salt), then combines the partials with a
  * second tiny aggregation on the key alone. Phase 1 parallelism is
  * nSalts× per hot key; phase 2 input is |keys| × nSalts rows, negligible.
  *
  * Only algebraic aggregates compose this way — sums/counts/min/max here;
  * avg must be derived as sum/count by the caller (exactly how Spark's own
  * partial aggregation decomposes it). Results are bit-identical to the
  * direct groupBy, which is what the oracle checks.
  */
object Skew {

  /** Two-phase salted sum/count aggregation.
    *
    * @param saltSource a column whose hash spreads rows (ideally unique)
    * @param sums       (inputCol → outputName) columns summed as DECIMAL(18,2)
    *                   and emitted as double (the engine's money contract)
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], saltSource: Column,
      sums: Seq[(String, String)], countName: String, nSalts: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltSource), lit(nSalts)))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(
        count(lit(1)).as("__pc"),
        sums.map { case (c, n) =>
          sum(col(c).cast("decimal(18,2)")).as(s"__ps_$n")
        }: _*)
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("__pc")).as(countName),
        sums.map { case (_, n) =>
          sum(col(s"__ps_$n")).cast("double").as(n)
        }: _*)
  }
}
