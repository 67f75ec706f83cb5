package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary induction — the
  * tokenizer-training step of a training-data pipeline (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL
  * 2016), expressed Spark-first.
  *
  * BPE trains on the WORD VOCABULARY weighted by corpus frequency, not on
  * the corpus: the corpus is scanned once (word count), and every
  * training iteration runs over the distinct-word relation — Zipf-bounded,
  * millions of rows where the corpus has trillions of tokens. That is what
  * makes the algorithm distributable: per iteration one pair-count
  * aggregate over the vocab (map-side combine), one 1-row argmax
  * (TakeOrderedAndProject), one map-only merge pass.
  *
  * Merge application is CANONICAL single-pass left-to-right, via the
  * wrapped-symbol string representation: a word's symbol sequence is
  * stored as `" s1  s2  …  sk "` — every symbol carries its OWN leading
  * and trailing space, so consecutive occurrences of the winning pair
  * never share a delimiter character and one non-overlapping `replace`
  * merges exactly the occurrences reference BPE merges (a single-space
  * representation drops every second occurrence in runs, because the
  * matcher consumes the shared space). Symbols never contain spaces
  * (tokens are Unicode letter/digit/' runs, `TextAnalysis.TokenSplitRegex`), so the encoding is unambiguous.
  *
  * Determinism/oracle contract: argmax ties break on (freq DESC, lhs ASC,
  * rhs ASC); counts are integers; `replace` is leftmost non-overlapping in
  * both engines — the DuckDB oracle replays whole training runs
  * bit-for-bit in unrolled CTEs (the k-means-replay trick).
  */
object Bpe {

  /** (word, wfreq) — the corpus's only full scan. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wfreq"))

  /** Initial wrapped-symbol rendering: " c1  c2  …  cn " (one char per
    * symbol). `split(word, "")` keeps a trailing empty element (Java limit
    * −1), filtered out.
    */
  private def initialSyms(word: Column): Column =
    concat(lit(" "),
      concat_ws("  ", filter(split(word, ""), c => c =!= "")),
      lit(" "))

  /** Adjacent symbol pairs of one wrapped rendering, as (l, r) structs. */
  private def adjacentPairs(syms: Column): Column = {
    val arr = split(trim(syms), "  ")
    when(size(arr) >= 2,
      transform(sequence(lit(1), size(arr) - 1),
        i => struct(element_at(arr, i).as("l"), element_at(arr, i + 1).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))
  }

  /** Weighted pair counts of one word relation: (lhs, rhs, freq). */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("wfreq"), explode(adjacentPairs(col("syms"))).as("p"))
      .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
      .agg(sum(col("wfreq")).as("freq"))

  /** Vocab size above which [[train]] auto-selects incremental pair-count
    * maintenance. Below it, a fresh full recount per iteration is FASTER:
    * the whole pair aggregate is one cheap job, while the delta path adds
    * a counts-maintenance job per merge whose fixed scheduling cost
    * (~0.1 s) dwarfs the tiny aggregate it saves (measured 0.6-0.7× on
    * the 31-word test corpus). Above it, the asymptotics flip: a full
    * recount explodes and shuffles O(vocab × syms) rows per merge, the
    * delta only the affected-word pair multiset ([[BpeTiming]] measures
    * the crossover on a synthetic 200k-word vocab; at a real tokenizer's
    * 32k merges × 10M-word vocab the full recount is 32k corpus-vocab
    * aggregates and the delta is the only viable shape).
    */
  val IncrementalVocabThreshold = 100000L

  /** One full training run: k iterations of argmax → merge → recount.
    * Returns (merges, segmented words):
    *  - merges: (iter 1..k, lhs, rhs, freq) — the learned merge table, in
    *    order;
    *  - words: (word, wfreq, syms) with `syms` the wrapped rendering after
    *    all k merges.
    *
    * `incremental` picks the pair-count strategy (None = auto by
    * [[IncrementalVocabThreshold]]); both produce BIT-IDENTICAL output
    * (BpeSpec pins both against a driver-side reference on random
    * corpora; the unrolled-CTE oracle replays full recounts):
    *  - full recount (small vocab): every argmax recomputes the pair
    *    aggregate over the whole vocab — one job, optimal when the vocab
    *    relation is tiny;
    *  - incremental (large vocab): merging the winning pair only changes
    *    counts inside words CONTAINING that pair, so the standing counts
    *    absorb a delta computed over the affected words alone — each
    *    enters the delta aggregate twice, old rendering negated and merged
    *    rendering positive, untouched pairs cancelling — via a FULL OUTER
    *    join on (lhs, rhs). The counts side's hash partitioning survives
    *    localCheckpoint, so ENSURE_REQUIREMENTS shuffles only the delta:
    *    per-merge explode+exchange is O(affected pairs), not
    *    O(vocab × syms).
    *
    * The winner is read driver-side (it already is, for the stop test —
    * 1 row of tokenizer metadata) so the merge pattern is a literal and
    * the affected filter is a codegen `contains`. Each iteration's word
    * (and counts) relation is `localCheckpoint`ed (eager) to keep lineage
    * flat (the connectedComponents / kmeans pattern). Iterations stop
    * early once no pair repeats — `freq < 2` means every remaining pair
    * is unique and merging adds no compression.
    */
  def train(docs: DataFrame, textCol: String, iters: Int,
      incremental: Option[Boolean] = None): (DataFrame, DataFrame) = {
    var words = wordCounts(docs, textCol)
      .select(col("word"), col("wfreq"), initialSyms(col("word")).as("syms"))
      .localCheckpoint(true)
    val useDelta = incremental.getOrElse(
      words.count() >= IncrementalVocabThreshold)
    var counts = if (useDelta) pairCounts(words).localCheckpoint(true) else null
    val merges = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var i = 1
    var done = false
    while (i <= iters && !done) {
      val top = (if (useDelta) counts else pairCounts(words))
        .orderBy(col("freq").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < 2L) {
        done = true
      } else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += docs.sparkSession.range(1).select(
          lit(i).as("iter"), lit(l).as("lhs"), lit(r).as("rhs"),
          lit(f).as("freq"))
        val pat = s" $l  $r "
        val rep = s" $l$r "
        if (useDelta) {
          val affected = words.filter(col("syms").contains(pat))
          val delta = pairCounts(
            affected.withColumn("wfreq", -col("wfreq"))
              .unionAll(affected.withColumn("syms",
                replace(col("syms"), lit(pat), lit(rep)))))
            .withColumnRenamed("freq", "dfreq")
          counts = counts.join(delta, Seq("lhs", "rhs"), "full_outer")
            .select(col("lhs"), col("rhs"),
              (coalesce(col("freq"), lit(0L)) + coalesce(col("dfreq"), lit(0L)))
                .as("freq"))
            .filter(col("freq") >= 1)
            .localCheckpoint(true)
        }
        // words update is a map-only whole-relation replace (a no-op on
        // unaffected rows): one narrow pass, partition layout unchanged.
        words = words
          .withColumn("syms", replace(col("syms"), lit(pat), lit(rep)))
          .localCheckpoint(true)
        i += 1
      }
    }
    val mergesDf =
      if (merges.isEmpty)
        docs.sparkSession.emptyDataFrame
          .select(lit(0).as("iter"), lit("").as("lhs"), lit("").as("rhs"),
            lit(0L).as("freq")).limit(0)
      else merges.reduce(_ unionAll _)
    (mergesDf, words)
  }

  /** The learned merge table alone: (iter, lhs, rhs, freq). */
  def trainMerges(docs: DataFrame, textCol: String, iters: Int): DataFrame =
    train(docs, textCol, iters)._1

  /** Per-document subword counts under the k-merge vocabulary: the
    * token-counting operator a data pipeline runs before packing
    * sequences to a context budget. One explode + one equi-join on `word`
    * (vocab side is the segmented-word relation) + one doc-id aggregate.
    */
  def subwordCounts(docs: DataFrame, textCol: String, idCol: String,
      iters: Int): DataFrame = {
    val segmented = train(docs, textCol, iters)._2
      .select(col("word"),
        size(split(trim(col("syms")), "  ")).as("n_subwords_word"))
    docs.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .join(segmented, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("n_subwords_word")).cast("long").as("n_subwords"))
  }

  /** BPE APPLICATION: segment words by replaying a learned merge list in
    * training order — k nested `replace`s in ONE codegen projection, zero
    * shuffle, no vocab lookup. Replaying merges on a training word
    * reproduces its training segmentation exactly (BPE apply is
    * deterministic given the merge order), and out-of-vocabulary words
    * segment to whatever prefix of the merges matches — the standard
    * open-vocabulary property that makes BPE usable on unseen batches.
    * The merge list is tokenizer metadata (tens of thousands of rows for
    * real vocabs), driver-held by design — the exact analogue of every
    * tokenizer runtime shipping merges.txt.
    */
  def applyMerges(words: DataFrame, wordCol: String,
      merges: Seq[(String, String)]): DataFrame =
    words.withColumn("syms",
      merges.foldLeft(initialSyms(col(wordCol))) { case (acc, (l, r)) =>
        replace(acc, lit(s" $l  $r "), lit(s" $l$r "))
      })

  /** Train once, persist the tokenizer: `<name>_merges` (iter, lhs, rhs,
    * freq) — the portable artifact — plus `<name>_vocab` (word, wfreq,
    * syms), the pre-segmented training vocabulary for join-instead-of-
    * replay lookups on known words.
    */
  def writeVocab(docs: DataFrame, textCol: String, iters: Int,
      warehouseDir: String, name: String, numBuckets: Int): Unit = {
    val (merges, words) = train(docs, textCol, iters)
    graft.io.Tables.writeWarehouseBucketed(merges, warehouseDir,
      s"${name}_merges", "iter", 1)
    graft.io.Tables.writeWarehouseBucketed(words, warehouseDir,
      s"${name}_vocab", "word", numBuckets)
  }

  /** Per-document subword counts for a NEW batch under a STORED tokenizer
    * ([[writeVocab]]): the nightly-ingest shape — no retraining, no
    * training-corpus scan. Known words take their segmentation straight
    * from the persisted vocabulary (a left join against the word-bucketed
    * `<name>_vocab` table — no replay compute, no shuffle on the vocab
    * side); only out-of-vocabulary words run the k-replace
    * [[applyMerges]] replay of the stored merge table (k rows, tokenizer
    * metadata, driver-held like any merges.txt). Apply ≡ train on known
    * words (BpeSpec pins it), so the split is a pure optimization — the
    * output is identical either way.
    */
  def subwordCountsStored(spark: org.apache.spark.sql.SparkSession,
      name: String, batch: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    val merges = graft.io.Tables.readWarehouseBucketed(spark, s"${name}_merges")
      .orderBy("iter").collect()
      .map(r => (r.getString(r.fieldIndex("lhs")), r.getString(r.fieldIndex("rhs"))))
      .toSeq
    val vocab = graft.io.Tables.readWarehouseBucketed(spark, s"${name}_vocab")
      .select(col("word"), col("syms"))
    val batchWords = batch
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("word"))
    val looked = batchWords.select("word").distinct()
      .join(vocab, Seq("word"), "left")
    val known = looked.filter(col("syms").isNotNull)
    val oov = applyMerges(
      looked.filter(col("syms").isNull).select("word"), "word", merges)
    val segmented = known.unionByName(oov)
      .select(col("word"),
        size(split(trim(col("syms")), "  ")).as("n_subwords_word"))
    batchWords.join(segmented, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("n_subwords_word")).cast("long").as("n_subwords"))
  }
}
