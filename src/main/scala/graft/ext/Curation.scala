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
