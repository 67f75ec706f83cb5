package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deduplication for training-data pipelines: exact, MinHash+LSH, SimHash,
  * and n-gram-Jaccard near-dup detection over the `documents` table.
  *
  * Scale design (100 TB):
  *  - Exact dedup is one hash-shuffle on the content key (not the payload):
  *    group by md5, keep min id — map-side partial agg applies.
  *  - MinHash/LSH never compares all pairs. Shingles explode → per-doc
  *    signatures (one shuffle keyed by doc), band keys → candidate pairs only
  *    inside identical-band buckets (shuffle keyed by band hash). Cost is
  *    O(docs × shingles) + O(bucket² per band bucket), never O(docs²).
  *  - SimHash blocks on signature bands the same way (pigeonhole: hamming
  *    distance ≤ d ⇒ at least one of d+1 bands identical).
  *  - All hashes are md5-derived ([[Hashing]]) so the DuckDB oracle verifies
  *    signatures and pairs bit-for-bit.
  */
object Dedup {

  /** Exact dedup on a content expression: exactly one survivor per distinct
    * content value, deterministic winner = min of `idCol`. The groupBy runs
    * on the md5 of the content, so the shuffle carries a 32-char key + id,
    * not document payloads; survivors are recovered by a semi-join on id.
    */
  def exactDedup(df: DataFrame, content: Column, idCol: String): DataFrame = {
    val winners = df
      .select(col(idCol), md5(content).as("__h"))
      .groupBy(col("__h"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    df.join(winners, Seq(idCol), "left_semi")
  }

  /** Word n-gram shingles over a token array (empty-safe: short docs yield
    * the whole-doc shingle).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))

  /** (id, shingle) pairs, distinct per doc — the input to MinHash and to the
    * exact-Jaccard join.
    */
  def explodedShingles(df: DataFrame, text: Column, idCol: String, n: Int): DataFrame =
    df.select(col(idCol),
        explode(array_distinct(shingles(TextAnalysis.tokens(text), n))).as("shingle"))

  /** MinHash signatures: k independent md5-seeded hash functions, min over
    * the doc's shingle set. One aggregation keyed by doc id; k mins computed
    * in the same pass (single shuffle, map-side combine).
    */
  def minhashSignatures(df: DataFrame, text: Column, idCol: String,
      numHashes: Int, shingleSize: Int): DataFrame = {
    val ex = explodedShingles(df, text, idCol, shingleSize)
    val mins = (0 until numHashes).map(i =>
      min(Hashing.md5LongSeeded(col("shingle"), i)).as(s"mh$i"))
    ex.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** LSH candidate pairs from banded signatures: docs sharing any band's
    * full signature slice become a candidate pair. `numHashes = bands × rows`.
    * Emits (idA < idB) pairs with the signature-estimated Jaccard
    * (fraction of agreeing hash functions).
    */
  def lshCandidatePairs(sig: DataFrame, idCol: String,
      numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val bandKeys = (0 until bands).map { b =>
      val slice = (0 until rows).map(r => col(s"mh${b * rows + r}"))
      struct(lit(b).as("band"),
        Hashing.md5Long(concat_ws(",", slice.map(_.cast("string")): _*)).as("bh"))
    }
    val buckets = sig.select(col(idCol), explode(array(bandKeys: _*)).as("bk"))
    val a = buckets.select(col("bk"), col(idCol).as("id_a"))
    val b = buckets.select(col("bk"), col(idCol).as("id_b"))
    val pairs = a.join(b, Seq("bk")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val sigA = sig.select((col(idCol).as("id_a") +:
      (0 until numHashes).map(i => col(s"mh$i").as(s"a$i"))): _*)
    val sigB = sig.select((col(idCol).as("id_b") +:
      (0 until numHashes).map(i => col(s"mh$i").as(s"b$i"))): _*)
    val agree = (0 until numHashes)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
      .reduce(_ + _)
    pairs.join(sigA, "id_a").join(sigB, "id_b")
      .withColumn("est_jaccard", agree.cast("double") / lit(numHashes))
      .select("id_a", "id_b", "est_jaccard")
  }

  /** Exact n-gram Jaccard for pairs that share at least one shingle:
    * |A∩B| via a self-join on shingle, |A|,|B| from per-doc counts.
    * At scale the shingle join is the standard inverted-index pattern;
    * hot shingles should be de-weighted upstream (stopword shingles) —
    * here the candidate generation is exact.
    */
  def jaccardPairs(df: DataFrame, text: Column, idCol: String,
      shingleSize: Int, threshold: Double): DataFrame = {
    val ex = explodedShingles(df, text, idCol, shingleSize)
    val sizes = ex.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = ex.select(col(idCol).as("id_a"), col("shingle"))
    val b = ex.select(col(idCol).as("id_b"), col("shingle"))
    val common = a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash signature width. 48 bits keeps band arithmetic inside a signed
    * long with headroom in both engines.
    */
  val SimHashBits = 48

  /** SimHash: per-shingle 60-bit hashes vote on each signature bit
    * (presence-weighted, distinct shingles). Shingles — not unigram tokens —
    * are the feature set: on small-vocabulary corpora unigram sets are
    * nearly identical across unrelated documents, which collapses every
    * signature to the same neighborhood (measured: 35% of random pairs
    * within hamming 6); bigram shingles restore independence. Implemented
    * as explode(shingle) → explode(bit) → two keyed aggregations — pure
    * shuffle/agg, no UDF, and bit-for-bit reproducible in SQL.
    */
  def simhashSignatures(df: DataFrame, text: Column, idCol: String,
      shingleSize: Int = 2): DataFrame = {
    val tok = explodedShingles(df, text, idCol, shingleSize)
      .withColumnRenamed("shingle", "tok")
    val bits = tok
      .withColumn("h", Hashing.md5Long(col("tok")))
      .select(col(idCol), explode(sequence(lit(0), lit(SimHashBits - 1))).as("bit"),
        col("h"))
      .withColumn("vote",
        when(call_function("shiftright", col("h"), col("bit"))
          .bitwiseAND(lit(1)) === 1, 1).otherwise(-1))
      .groupBy(col(idCol), col("bit"))
      .agg(sum(col("vote")).as("v"))
      .withColumn("bitval",
        when(col("v") > 0, call_function("shiftleft", lit(1L), col("bit")))
          .otherwise(lit(0L)))
    bits.groupBy(col(idCol)).agg(sum(col("bitval")).as("simhash"))
  }

  /** Near-dup pairs by SimHash hamming distance ≤ maxDist, banded for scale:
    * the signature splits into `maxDist + 1` bands; any pair within distance
    * must agree on ≥1 whole band (pigeonhole), so candidates come from
    * band-bucket joins, never all-pairs.
    */
  def simhashNearDupPairs(sig: DataFrame, idCol: String, maxDist: Int): DataFrame = {
    val bands = maxDist + 1
    val width = SimHashBits / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * width)
          .bitwiseAND((1L << width) - 1).as("bv"))
    }
    val buckets = sig.select(col(idCol), col("simhash"),
      explode(array(bandCols: _*)).as("bk"))
    val a = buckets.select(col("bk"), col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val b = buckets.select(col("bk"), col(idCol).as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("bk")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Near-dup pairs on an embedding column by cosine ≥ threshold.
    * Brute-force all-pairs here (exact); the LSH-bucketed scale path is
    * `Similarity.ivfTopK`-style cluster blocking.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
