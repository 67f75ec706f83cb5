package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structured-record ENTITY RESOLUTION: block → fuzzy-score → mutual
  * best match. The string-field twin of [[Similarity.annJoin]] (which
  * links records by embedding): two tables describing the same real-world
  * entities with dirty keys (CRM vs billing customers, crawl source A vs
  * B) link on approximate name agreement, never on a join key.
  *
  * The classic three stages, each with a 100 TB story:
  *
  *  1. BLOCKING — candidate pairs form ONLY within a block (caller
  *     supplies the blocking expression: a phonetic code, a name suffix,
  *     a zip code). This is the LSH-banding move from [[Dedup]]: the
  *     quadratic collapses to Σ|block_l|·|block_r|, and the join is a
  *     plain equi-shuffle on the block key. Skewed blocks are the
  *     caller's knob, exactly like the LSH hot-bucket cap.
  *  2. SCORING — `levenshtein` (codegen'd built-in) on the name pair,
  *     kept when ≤ `maxDist`. Evaluated only within blocks.
  *  3. MUTUAL BEST — each side keeps its minimum-distance partner
  *     (deterministic id tiebreak) and a pair survives only if BOTH
  *     sides chose it: the standard one-to-one assignment heuristic,
  *     computed as two ranking windows over the candidate relation
  *     (candidate-sized shuffles on l_id / r_id — ≪ corpus when the
  *     blocking is selective, which is what blocking is FOR).
  *
  * Output: (l_id, r_id, dist) — one row per linked entity pair.
  */
object RecordLinkage {

  /** Link `left` to `right`: both must carry `idCol`, `nameCol`, and
    * `blockCol` (pre-computed blocking key). One-to-one by mutual best;
    * unmatched rows simply don't appear (left-anti against the result
    * gives the residue for a human queue).
    */
  def link(left: DataFrame, right: DataFrame, idCol: String,
      nameCol: String, blockCol: String, maxDist: Int): DataFrame = {
    val l = left.select(col(idCol).as("l_id"), col(nameCol).as("l_name"),
      col(blockCol).as("block"))
    val r = right.select(col(idCol).as("r_id"), col(nameCol).as("r_name"),
      col(blockCol).as("block"))
    val cand = l.join(r, "block")
      .withColumn("dist", levenshtein(col("l_name"), col("r_name")))
      .filter(col("dist") <= maxDist)
    val bestForL = Window.partitionBy("l_id")
      .orderBy(col("dist").asc, col("r_id").asc)
    val bestForR = Window.partitionBy("r_id")
      .orderBy(col("dist").asc, col("l_id").asc)
    cand
      .withColumn("__rl", row_number().over(bestForL))
      .withColumn("__rr", row_number().over(bestForR))
      .filter(col("__rl") === 1 && col("__rr") === 1)
      .select(col("l_id"), col("r_id"), col("dist").cast("long").as("dist"))
  }
}
