package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-dependent ON TOP of partition layout — the same
  * seed yields different rows after a repartition, which breaks exact
  * reproducibility of a training corpus across pipeline revisions. These
  * operators key every decision on a content/id HASH instead: the sample
  * is a pure function of the data, stable across partitioning, executor
  * count, and Spark version, and exactly reproducible in the SQL oracle.
  */
object Sampling {

  val HashBuckets = 1000000L

  /** Keep ~`fraction` of rows: md5(id) mod 1M < fraction·1M. Map-only
    * (zero shuffle); complements of the same hash partition the corpus
    * into disjoint reproducible splits (train/validation via disjoint
    * fraction windows).
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction in [0,1]")
    val cut = (fraction * HashBuckets).toLong
    df.filter(Hashing.md5Long(col(idCol).cast("string")) % HashBuckets < cut)
  }

  /** Exactly `n` rows per stratum (fewer if the stratum is smaller),
    * chosen by ascending id-hash — a deterministic per-group lottery.
    * One shuffle on the stratum key; `WindowGroupLimit` keeps only n rows
    * per group below the rank, so the exchange carries candidates, not
    * whole strata.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(Hashing.md5Long(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
