package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Corpus-curation operators a training-data pipeline runs between
  * dedup and tokenization: benchmark decontamination and token-budget
  * sequence packing.
  */
object Curation {

  /** Benchmark decontamination: drop every corpus document sharing ANY
    * word `n`-gram with the benchmark/eval set — the standard guard
    * against test-set leakage into training data.
    *
    * Scale design: the benchmark side reduces to its DISTINCT shingle
    * relation (eval sets are thousands of docs, so this is small — but
    * the broadcast is still gated on `maxBroadcastBenchDocs`, falling
    * back to a shuffled semi-join on `shingle`, the corpus explode's own
    * key). The corpus is never self-joined and never collected; the
    * contaminated-id relation flows into one anti-join on the id.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      text: Column, idCol: String, n: Int,
      maxBroadcastBenchDocs: Long = 100000L,
      knownBenchCount: Option[Long] = None): DataFrame = {
    val benchShingles = Dedup
      .explodedShingles(benchmark, text, idCol, n)
      .select("shingle").distinct()
    val smallBench = knownBenchCount
      .getOrElse(benchmark.select(col(idCol)).count()) <= maxBroadcastBenchDocs
    val gate: DataFrame => DataFrame = if (smallBench) broadcast else identity
    val contaminated = Dedup.explodedShingles(corpus, text, idCol, n)
      .join(gate(benchShingles), Seq("shingle"), "left_semi")
      .select(idCol).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Token-budget sequence packing: assign rows (documents or chunks) to
    * training bins of ~`capacity` tokens by cumulative-sum bucketing
    * within hash shards — `bin = prior_shard_tokens div capacity`. A row
    * may straddle a bin boundary (bins overshoot by at most one row's
    * tokens); exact first-fit packing is inherently sequential, and this
    * prefix-sum relaxation is the standard distributed form.
    *
    * Scale design: a GLOBAL ordering would serialize the window into one
    * partition; sharding by a deterministic id hash ([[Hashing.md5Long]],
    * so the oracle replays shard assignment exactly) bounds every window
    * partition to corpus/nShards rows and keeps shard assignment stable
    * under repartitioning. Emits (shard, bin_id) per row; downstream
    * writers partition output by (shard, bin_id).
    */
  def packSequences(rows: DataFrame, idCol: String, orderCols: Seq[Column],
      nTokensCol: String, capacity: Int, nShards: Int): DataFrame = {
    require(capacity > 0 && nShards > 0, "capacity and nShards must be positive")
    val w = Window.partitionBy("shard").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    rows
      .withColumn("shard",
        pmod(Hashing.md5Long(col(idCol).cast("string")), lit(nShards.toLong)))
      .withColumn("__prior", coalesce(sum(col(nTokensCol)).over(w), lit(0L)))
      .withColumn("bin_id", expr(s"__prior div ${capacity}L"))
      .drop("__prior")
  }

  /** Per-group quality-quantile gate (CCNet-style "keep the best
    * `keepNum/keepDen` of each language"): rank rows inside each group by
    * the Gopher quality score and keep approximately the top fraction,
    * deciding the boundary score's rows by the deterministic hash lottery.
    *
    * A per-group ranking WINDOW would serialize each group into one
    * partition — with groups like "language" that is the whole corpus in a
    * handful of partitions, a 100 TB non-starter. Instead the gate is
    * computed from the score HISTOGRAM (|groups|×|score values| rows —
    * metadata-scale, since the quality score has 6 values):
    *
    *   k_g     = n_g·keepNum div keepDen          (per-group quota)
    *   score s kept whole  iff  cum_g(≥s) ≤ k_g
    *   boundary score s*:  cut = (k_g − cum_g(>s*))·10⁶ div cnt_g(s*),
    *                       row survives iff md5("1002:" id) mod 10⁶ < cut
    *   (a SEEDED lottery — [[Sampling.QualityGateSeed]] — so a later
    *   mixture/split stage draws independently of this gate)
    *
    * so the corpus itself sees only map-side work: a stats projection, a
    * broadcast join against the tiny cut relation, and a hash filter. All
    * sizing is integer arithmetic — exactly replayable in the SQL oracle.
    * The corpus is scanned twice (histogram + filter); at warehouse scale
    * persist the stats projection or cache it.
    */
  def qualityGate(docs: DataFrame, textCol: String, idCol: String,
      groupCol: String, keepNum: Long, keepDen: Long): DataFrame = {
    require(keepNum >= 0 && keepDen > 0 && keepNum <= keepDen,
      "keepNum/keepDen must be a fraction in [0,1]")
    val buckets = Sampling.HashBuckets
    val stats = TextAnalysis.withTextStats(docs, textCol)
    val hist = stats.groupBy(col(groupCol), col("quality_score"))
      .agg(count(lit(1)).as("cnt"))
    // cumulative count of rows at-or-above each score, per group; scores
    // are distinct within a group post-aggregation so ROWS == RANGE here
    val wCum = Window.partitionBy(col(groupCol))
      .orderBy(col("quality_score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum_incl", sum(col("cnt")).over(wCum))
    val tot = hist.groupBy(col(groupCol)).agg(sum(col("cnt")).as("n"))
      .withColumn("k", expr(s"(n * ${keepNum}L) div ${keepDen}L"))
    val cuts = cum.join(tot, Seq(groupCol))
      .withColumn("cut",
        when(col("cum_incl") <= col("k"), lit(buckets))
          .when(col("cum_incl") - col("cnt") < col("k"),
            expr(s"((k - (cum_incl - cnt)) * ${buckets}L) div cnt"))
          .otherwise(lit(0L)))
      .select(col(groupCol), col("quality_score"), col("cut"))
    stats.join(broadcast(cuts), Seq(groupCol, "quality_score"))
      .filter(Hashing.md5LongSeeded(col(idCol).cast("string"),
        Sampling.QualityGateSeed) % buckets < col("cut"))
      .select(docs.columns.map(col) :+ col("quality_score"): _*)
  }

  /** CORPUS-RELATIVE token-rarity profile: for each document, how many of
    * its token occurrences are corpus-rare (corpus frequency < `rareBelow`)
    * and the total corpus-frequency mass of its tokens. This is the
    * corpus-statistics complement of the per-row Gopher screens in
    * [[TextAnalysis.withTextStats]] — a high `rare_ratio` flags OCR noise,
    * gibberish, and boilerplate-free junk that per-document ratios cannot
    * see (CCNet-style corpus-model scoring, with exact counts standing in
    * for the language-model perplexity this container cannot train).
    *
    * Returns (id, n_tokens, rare_count, freq_sum, rare_ratio); integer
    * counts + one exact IEEE division, so the oracle replays bit-for-bit.
    *
    * Scale design: the vocabulary relation comes from a partial-agg count
    * on the explode's own key (`tk`) and is joined back on that same key —
    * two shuffles total (token, then doc id), never a window over a hot
    * token's occurrence list (a per-token window partition serializes
    * stop-word occurrences into single reducers). The vocab side is one
    * row per distinct token with a long count; hot-key fanout on the probe
    * side is AQE skew-join territory, not a correctness concern. No
    * broadcast hint: corpus vocabularies are billions of rows at 100 TB —
    * AQE demotes/promotes the join from measured sizes.
    */
  /** Seed for [[domainCap]]'s per-domain lottery ordering — its own seed
    * so it draws independently of the other lottery stages
    * ([[Sampling.MixtureSeed]] family).
    */
  val DomainCapSeed = 1004

  /** Per-domain document cap (the RefinedWeb/C4 anti-boilerplate guard):
    * keep at most `maxPerDomain` documents of each domain, chosen by a
    * SEEDED hash lottery (id tiebreak) — a deterministic uniform draw,
    * not "whichever crawled first", and partition-invariant so re-runs
    * and the oracle agree row-for-row.
    *
    * Scale: rank-limit pushdown (WindowGroupLimit) prunes each map
    * partition to its local top-`maxPerDomain` BEFORE the shuffle, so a
    * monster domain (half the crawl behind one registrar) moves at most
    * `partitions·maxPerDomain` rows, never its full row set.
    */
  def domainCap(docs: DataFrame, domainCol: String, idCol: String,
      maxPerDomain: Int): DataFrame = {
    require(maxPerDomain > 0, "maxPerDomain must be positive")
    val w = Window.partitionBy(col(domainCol)).orderBy(
      Hashing.md5LongSeeded(col(idCol).cast("string"), DomainCapSeed).asc,
      col(idCol).asc)
    docs.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= maxPerDomain)
      .drop("__graft_rn")
  }

  /** Fixed-point scale for [[importanceWeights]]. Chosen so that
    * `Scale·(count+1)` stays far inside a long at realistic per-bucket
    * counts (≤ ~9·10¹² feature occurrences per bucket).
    */
  val DsirScale = 1000000L

  /** Hashed n-gram features (unigrams ∪ bigrams → md5-bucketed ids) —
    * the feature map of DSIR (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"). One row per feature
    * OCCURRENCE; all hashing md5-derived so the oracle replays buckets
    * exactly.
    */
  def hashedNgramFeatures(docs: DataFrame, text: Column, idCol: String,
      numBuckets: Int): DataFrame = {
    val uni = docs
      .select(col(idCol), explode(TextAnalysis.tokens(text)).as("__w"))
      .select(col(idCol),
        pmod(Hashing.md5Long(concat(lit("dsir:"), col("__w"))),
          lit(numBuckets.toLong)).as("f"))
    val bi = LangModel.bigrams(docs, text, idCol)
      .select(col(idCol),
        pmod(Hashing.md5Long(
          concat(lit("dsir:"), col("w1"), lit(" "), col("w2"))),
          lit(numBuckets.toLong)).as("f"))
    uni.unionAll(bi)
  }

  /** DSIR-style importance weights: score every `raw` document by how
    * much its hashed-n-gram profile resembles the `target` distribution
    * more than the raw distribution. Per bucket f (add-one smoothed):
    *
    *   λ_f = (Scale·(t_f+1)) div (T+B)  −  (Scale·(r_f+1)) div (R+B)
    *   weight(doc) = Σ_f c_doc[f] · λ_f
    *
    * — a fixed-point DIFFERENCE of smoothed bucket probabilities where
    * DSIR proper uses the log-ratio (libm logs cannot hash-verify across
    * engines; the ranking signal — "target-like features up, raw-typical
    * features down" — is preserved, documented deviation). Downstream,
    * feed the weights to [[Sampling]]'s weighted lottery to complete the
    * importance-RESAMPLING step.
    *
    * Scale design: two hash-shuffled counts over the exploded corpora;
    * the λ relation is ≤ numBuckets rows BY CONSTRUCTION (that is the
    * point of the hashing trick), so its broadcast is size-safe without
    * a gate; the per-doc weight is one (id,f)-keyed count plus one
    * id-keyed sum. The corpora are never self-joined or collected.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, text: Column,
      idCol: String, numBuckets: Int): DataFrame = {
    val rawFeat = hashedNgramFeatures(raw, text, idCol, numBuckets).cache()
    val tgtCnt = hashedNgramFeatures(target, text, idCol, numBuckets)
      .groupBy("f").agg(count(lit(1)).as("t"))
    val rawCnt = rawFeat.groupBy("f").agg(count(lit(1)).as("r"))
    // the 1-row totals attach via constant-key BHJs (crossJoin would plan
    // the PlanGuard-banned BroadcastNestedLoopJoin)
    val tgtTot = tgtCnt.agg(sum("t").cast("long").as("tT"))
      .withColumn("__one", pmod(xxhash64(col("tT")), lit(1)))
    val rawTot = rawCnt.agg(sum("r").cast("long").as("rT"))
      .withColumn("__one", pmod(xxhash64(col("rT")), lit(1)))
    val lam = rawCnt.join(tgtCnt, Seq("f"), "full_outer")
      .na.fill(0L, Seq("t", "r"))
      .withColumn("__one", pmod(xxhash64(col("f")), lit(1)))
      .join(broadcast(tgtTot), "__one").join(broadcast(rawTot), "__one")
      .withColumn("lam", expr(
        s"(${DsirScale}L * (t + 1L)) div (tT + ${numBuckets}L)" +
          s" - (${DsirScale}L * (r + 1L)) div (rT + ${numBuckets}L)"))
      .select("f", "lam")
    rawFeat.groupBy(col(idCol), col("f")).agg(count(lit(1)).as("c"))
      .join(broadcast(lam), Seq("f"))
      .groupBy(col(idCol))
      .agg(sum(col("c") * col("lam")).as("dsir_weight"))
  }

  def rareTokenProfile(docs: DataFrame, textCol: String, idCol: String,
      rareBelow: Long): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("tk"))
    val vocab = tok.groupBy("tk").agg(count(lit(1)).as("freq"))
    tok.join(vocab, "tk")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("freq") < rareBelow, 1L).otherwise(0L)).as("rare_count"),
        sum(col("freq")).as("freq_sum"))
      .withColumn("rare_ratio",
        col("rare_count").cast("double") / col("n_tokens"))
  }
}
