package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword-relevance scoring over the document corpus — the retrieval
  * primitive behind corpus curation ("pull the docs most relevant to
  * topic X") and training-mix weighting.
  *
  * Scoring is TF-IDF in FIXED-POINT integer arithmetic: the idf weight is
  * `((N + 1) · scale) div (df_t + 1)` (integer division, scale = 10⁶), so
  * every per-term weight and the final per-doc sum are exact BIGINTs —
  * bit-identical in any engine and any summation order. A float idf
  * (`ln`-based BM25) would hash-diverge across libm implementations and
  * summation orders; the fixed-point form keeps the oracle exact. BM25's
  * tf saturation / length normalization would slot into the same shape
  * (per-term weight join → per-doc sum) at the cost of the exact oracle.
  *
  * Scale design: the explode is filtered to the query's terms BEFORE any
  * shuffle, so the grouped relation carries O(matching docs × query
  * terms) rows, not the corpus token count; the per-term document
  * frequency relation is ≤ |queryTerms| rows (broadcast is size-safe by
  * construction); corpus size N attaches via a constant-key broadcast
  * hash join (1-row relation — the `centroidFanout` pattern, no
  * BroadcastNestedLoopJoin).
  */
object Relevance {

  val DefaultScale = 1000000L

  /** Per-document fixed-point TF-IDF scores for `queryTerms`: one row per
    * document containing at least one term, `score = Σ_t tf_{d,t} ·
    * ((N+1)·scale div (df_t+1))`, descending-score-ready (exact BIGINT).
    */
  def tfidfScores(docs: DataFrame, text: Column, idCol: String,
      queryTerms: Seq[String], scale: Long = DefaultScale): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val ex = docs
      .select(col(idCol), explode(TextAnalysis.tokens(text)).as("term"))
      .filter(col("term").isInCollection(queryTerms))
    val tf = ex.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    // tf is distinct per (doc, term), so counting rows per term IS the
    // document frequency — no second pass over the corpus.
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nRel = docs.select(col(idCol)).agg(count(lit(1)).as("__n"))
    // constant-key BHJ against the 1-row N relation: the key must be
    // column-derived (a bare lit folds away → keyless nested loop).
    val tfk = tf.join(broadcast(dfreq), "term")
      .withColumn("__one", pmod(xxhash64(col(idCol)), lit(1)))
    val nk = nRel.withColumn("__one", pmod(xxhash64(col("__n")), lit(1)))
    tfk.join(broadcast(nk), "__one")
      .withColumn("w",
        col("tf") * expr(s"((__n + 1) * ${scale}L) div (df + 1)"))
      .groupBy(col(idCol))
      .agg(sum(col("w")).as("score"))
  }

  /** Top-k most relevant documents: [[tfidfScores]] + global top-k
    * (TakeOrderedAndProject — per-partition heaps, never a full sort),
    * deterministic tiebreak on id.
    */
  def search(docs: DataFrame, text: Column, idCol: String,
      queryTerms: Seq[String], k: Int): DataFrame =
    tfidfScores(docs, text, idCol, queryTerms)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
}
