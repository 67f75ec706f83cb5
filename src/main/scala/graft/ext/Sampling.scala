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

  /** Deterministic train/val/test assignment: the id-hash space is cut
    * into contiguous windows sized by integer weights, and every row gets
    * the label of its window — a pure function of (id, weights), so
    * splits are stable across partitioning, re-runs, and engine (the
    * oracle inlines the same integer cut points). Disjoint and exhaustive
    * by construction; growing one split's weight at the expense of the
    * NEXT window's moves only boundary rows (stable split growth, the
    * [[hashSample]] monotonicity generalized). Zero shuffle.
    *
    * DELIBERATELY shares the unseeded window hash with [[hashSample]]
    * (SamplingSpec pins `train window ≡ hashSample(f)`): they are the
    * same windowing family. Survival LOTTERIES ([[mixtureSample]],
    * [[Curation.qualityGate]]) use their own seeded hashes so composing
    * a lottery with a later split cannot correlate — an unseeded lottery
    * with cut ≤ the train cut would land every survivor in 'train'.
    */
  def splitAssign(df: DataFrame, idCol: String,
      splits: Seq[(String, Long)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "split weights must be non-empty and positive")
    val wTot = splits.map(_._2).sum
    // BigInt for the driver-side cut arithmetic: token-count-scale weights
    // (~1e13) would overflow c * HashBuckets in Long and wrap to NEGATIVE
    // cuts — silently assigning every row to the last split. The cut
    // itself always fits a Long (≤ HashBuckets).
    val cuts = splits.scanLeft(BigInt(0)) { case (acc, (_, w)) => acc + w }.tail
      .map(c => (c * HashBuckets / wTot).toLong)
    val h = Hashing.md5Long(col(idCol).cast("string")) % HashBuckets
    val expr = splits.map(_._1).zip(cuts).init
      .foldRight(lit(splits.last._1)) { case ((label, cut), acc) =>
        when(h < cut, lit(label)).otherwise(acc)
      }
    df.withColumn("split", expr)
  }

  /** Downsample to a target group mixture (training-mix weighting:
    * "50% en / 20% de / …"), keeping as much data as the most
    * over-demanded group allows. All sizing is INTEGER arithmetic so the
    * sample is a pure function of (data, weights) and exactly replayable
    * in the SQL oracle:
    *
    *   W   = Σ w_g                 (integer target weights)
    *   T   = min_g (n_g·W div w_g) (achievable output size: the binding
    *                                group is kept whole-ish, others shrink)
    *   m_g = T·w_g div W           (per-group target rows)
    *   cut_g = m_g·10⁶ div n_g     (per-group hash-lottery threshold)
    *
    * then a row survives iff `md5("mix:" id) mod 10⁶ < cut_g` — the
    * SEEDED member of the [[hashSample]] hash family: each lottery-style
    * operator draws from its own seed so composed stages (quality gate →
    * mixture → split) stay statistically independent; an unseeded shared
    * lottery would correlate them perfectly (e.g. every mixture survivor
    * landing in the 'train' split window). Per-group output sizes are
    * binomial around m_g (a lottery, not an exact quota; use
    * [[stratifiedSample]] for exact counts).
    *
    * Scale design: the group-count aggregation is the only shuffle and its
    * result is |groups| rows collected driver-side (metadata scale, like
    * the watermark map — NOT data-path collect); the filter itself is a
    * zero-shuffle map keyed by a broadcast-sized literal map. Groups
    * absent from `weights` are dropped (weight 0).
    */
  def mixtureSample(df: DataFrame, groupCol: String, idCol: String,
      weights: Seq[(String, Long)],
      knownCounts: Option[Map[String, Long]] = None): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be non-empty and positive")
    val wTot = weights.map(_._2).sum
    // caller-supplied counts (warehouse statistics) keep the builder lazy;
    // otherwise one |groups|-row aggregation job runs at construction time
    val counts = knownCounts.getOrElse(
      df.filter(col(groupCol).isInCollection(weights.map(_._1)))
        .groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    // zero-count groups (possible via knownCounts) are as absent as
    // missing ones — and must not reach the cut division below
    val present = weights.filter { case (g, _) => counts.getOrElse(g, 0L) > 0L }
    // A requested group with zero rows caps T at 0 → empty result, the
    // honest answer to an unsatisfiable mixture.
    // BigInt throughout the driver-side quota arithmetic: corpus-scale
    // counts × token-scale weight sums overflow Long products silently
    // (non-ANSI wrap → negative quotas). Each final cut fits a Long.
    val t =
      if (present.size < weights.size) BigInt(0)
      else present.map { case (g, w) => BigInt(counts(g)) * wTot / w }.min
    val cuts = present.map { case (g, w) =>
      val m = t * w / wTot
      g -> (m * HashBuckets / counts(g)).toLong
    }
    val cutExpr = cuts.foldLeft(lit(-1L)) { case (acc, (g, c)) =>
      when(col(groupCol) === g, lit(c)).otherwise(acc)
    }
    df.filter(
      Hashing.md5LongSeeded(col(idCol).cast("string"), MixtureSeed)
        % HashBuckets < cutExpr)
  }

  /** Deterministic WEIGHTED Bernoulli sampling: each row survives with
    * probability `min(weight, maxWeight) / maxWeight` through its own
    * seeded id-hash lottery — partition-layout-invariant like every
    * lottery here, zero shuffle. With `weight = token count` this is
    * token-proportional document sampling (doc-level draws approximate
    * token-uniform draws — the mixture-weighting primitive); with
    * `weight = quality score` it is quality-proportional downsampling.
    * Integer arithmetic throughout: the cut is
    * `min(w, maxW) · HashBuckets div maxW`, exact in both engines
    * (column values must keep `w · HashBuckets` below 2⁶³ — true for any
    * realistic token count against the 10⁶ bucket space).
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
      maxWeight: Long): DataFrame = {
    require(maxWeight > 0, "maxWeight > 0")
    val cut = least(weight.cast("long"), lit(maxWeight)) *
      lit(HashBuckets) / lit(maxWeight)
    df.filter(
      Hashing.md5LongSeeded(col(idCol).cast("string"), WeightedSeed)
        % HashBuckets < cut.cast("long"))
  }

  /** EXACT integer square root: `floor(sqrt(n))` for non-negative longs.
    * Double sqrt then a ±1 integer correction — IEEE sqrt is correctly
    * rounded, so `floor` of it is off by at most one ulp-step for
    * n < 2⁵², and the two comparison fixups make the result exact (and
    * identical in any engine with IEEE doubles, which is what lets the
    * oracle replay it).
    */
  private[ext] def isqrt(n: Column): Column = {
    val s0 = floor(sqrt(n.cast("double"))).cast("long")
    val s1 = when(s0 * s0 > n, s0 - 1).otherwise(s0)
    when((s1 + 1) * (s1 + 1) <= n, s1 + 1).otherwise(s1)
  }

  /** Per-group (n_docs, n_tokens, isqrt-weight) relation + 1-row weight
    * total — the shared head of the temperature-mix pair. Fully
    * distributed: the totals attach via a constant-key broadcast hash
    * join (never collected), unlike [[mixtureSample]]'s driver-side map
    * (caller-supplied weights are metadata; DERIVED weights stay in the
    * cluster).
    */
  private def temperatureWeights(df: DataFrame, groupCol: String,
      tokenCount: Column): DataFrame = {
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount.cast("long")).as("n_tokens"))
      .withColumn("mix_weight", isqrt(col("n_tokens")))
    val tot = g.agg(sum("mix_weight").cast("long").as("__ws"))
      .withColumn("__one", pmod(xxhash64(col("__ws")), lit(1)))
    g.withColumn("__one", pmod(xxhash64(col(groupCol)), lit(1)))
      .join(broadcast(tot), "__one")
      .drop("__one")
  }

  /** TEMPERATURE-scaled mixture PLAN (T = 2, the mT5/XLM-R sampling
    * temperature): per group, weight ∝ n_tokens^(1/T) — small groups up,
    * the head language down — plus the audit columns a mixture review
    * needs: `share_ppm` (this group's share of the sampled budget) and
    * `epochs_milli` (how many times the group's data REPEATS when its
    * budget allocation is drawn from its n_tokens — the data-constrained
    * scaling question). All integer: isqrt weights, div shares; exact in
    * the oracle. Bounds: `budgetTokens · weight` must stay below 2⁶³
    * (true for budgets ≤ ~10¹² against isqrt weights ≤ ~3·10⁷ at 10¹⁵
    * corpus tokens — beyond that, drop to per-thousand scale).
    *
    * Scale: one partial-agg shuffle on the group key; everything after is
    * |groups|-row metadata arithmetic.
    */
  def temperatureMixPlan(df: DataFrame, groupCol: String,
      tokenCount: Column, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens > 0")
    temperatureWeights(df, groupCol, tokenCount)
      .withColumn("share_ppm",
        expr(s"(${HashBuckets}L * mix_weight) div __ws"))
      .withColumn("epochs_milli",
        expr(s"(1000L * ${budgetTokens}L * mix_weight) div (__ws * n_tokens)"))
      .select(col(groupCol), col("n_docs"), col("n_tokens"),
        col("mix_weight"), col("share_ppm"), col("epochs_milli"))
  }

  /** TEMPERATURE-scaled mixture SAMPLE: draw ~`targetDocs` documents with
    * per-group expected counts ∝ the T=2 weights — the sampling half of
    * [[temperatureMixPlan]], as a seeded per-row hash lottery
    * (partition-invariant, zero data-path collect; binomial around the
    * quota like [[mixtureSample]]). Cut: keep a row of group g iff
    * `md5ppm(id) < (targetDocs · w_g · 10⁶) div (Σw · n_docs_g)`. The
    * |groups|-row cut relation broadcasts by construction.
    */
  def temperatureMixSample(df: DataFrame, groupCol: String, idCol: String,
      tokenCount: Column, targetDocs: Long): DataFrame = {
    require(targetDocs > 0, "targetDocs > 0")
    val cuts = temperatureWeights(df, groupCol, tokenCount)
      .withColumn("__cut",
        expr(s"(${targetDocs}L * mix_weight * ${HashBuckets}L) div (__ws * n_docs)"))
      .select(col(groupCol), col("__cut"))
    df.join(broadcast(cuts), groupCol)
      .filter(
        Hashing.md5LongSeeded(col(idCol).cast("string"), TempMixSeed)
          % HashBuckets < col("__cut"))
      .drop("__cut")
  }

  /** Lottery seeds: one per lottery-style operator, so composed stages
    * draw independently (see [[mixtureSample]]). The window family
    * ([[hashSample]]/[[splitAssign]]) stays unseeded by design.
    */
  val MixtureSeed = 1001
  val QualityGateSeed = 1002
  val WeightedSeed = 1003
  val TempMixSeed = 1005
}
