package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Text analysis for training-data pipelines: tokenization, quality scoring,
  * language ID, and document fingerprinting over the `documents` table.
  *
  * All operators are pure column expressions (whole-stage-codegen'd, no UDFs)
  * so they scale to 100 TB as embarrassingly-parallel map work — no shuffle
  * anywhere in this module. Each one has an exact DuckDB mirror (see
  * `TextQueries`) so the driver's t2 gate hash-verifies the semantics.
  */
object TextAnalysis {

  /** Canonical tokenizer split class: anything not a Unicode letter, digit,
    * or apostrophe separates tokens. `\p{L}`/`\p{N}` (not `[a-z0-9]`) so
    * CJK/Cyrillic/Arabic/accented text tokenizes instead of silently
    * emptying — a web-scale corpus is majority non-English, and every
    * downstream operator (BPE, TF-IDF/BM25, shingle dedup, quality
    * screens) consumes these tokens. The class is valid and IDENTICAL in
    * Java regex (Spark) and RE2 (DuckDB), which both read `\p{L}`/`\p{N}`
    * as the full Unicode categories; [[graft.queries.DuckSql.tokens]] is
    * the oracle twin and [[graft.functions.TextExpressions]]' imperative
    * kernels compile this same constant.
    */
  val TokenSplitRegex: String = "[^\\p{L}\\p{N}']+"

  /** Lowercased word tokens: maximal runs of Unicode letters/digits/' after
    * lowercasing (see [[TokenSplitRegex]]). Twin: [[graft.queries.DuckSql.tokens]].
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), TokenSplitRegex), t => t =!= "")

  /** BPE-ish subword pre-tokenizer count (GPT-2-style pretokenization regex,
    * simplified to the RE2-compatible subset so Spark (Java regex) and DuckDB
    * (RE2) count identically): contractions, letter runs, digit runs,
    * punctuation runs.
    */
  val BpePattern: String = "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\p{L}\\p{N}\\s]+"

  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpePattern))

  /** Small English stopword list shared with the oracle (sorted, fixed). */
  val Stopwords: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from", "in",
    "is", "it", "of", "on", "or", "that", "the", "to", "with")

  /** Per-document stats: token/char/type counts, ratios, and a Gopher-style
    * rule-based quality score. Ratios are exact integer÷integer doubles so
    * the oracle reproduces them bit-for-bit (IEEE 754 division).
    */
  def withTextStats(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    df.withColumn("toks", toks)
      .withColumn("n_chars_m", length(t))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_types", size(array_distinct(col("toks"))))
      .withColumn("n_bpe_tokens", bpeTokenCount(t))
      .withColumn(
        "avg_token_len",
        when(col("n_tokens") > 0,
          aggregate(col("toks"), lit(0L), (acc, x) => acc + length(x))
            .cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)))
      .withColumn(
        "punct_ratio",
        (length(t) - length(regexp_replace(t, "[^\\p{L}\\p{N}\\s]", "")))
          .cast("double") / greatest(length(t), lit(1)))
      .withColumn(
        "stopword_ratio",
        when(col("n_tokens") > 0,
          size(filter(col("toks"), x => x.isInCollection(Stopwords)))
            .cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)))
      .withColumn(
        "type_token_ratio",
        when(col("n_tokens") > 0,
          col("n_types").cast("double") / col("n_tokens")).otherwise(lit(0.0)))
      // Gopher-style repetition/length screens, one point per passed rule.
      .withColumn(
        "quality_score",
        (when(col("n_tokens").between(10, 100000), 1).otherwise(0)
          + when(col("avg_token_len").between(2.0, 12.0), 1).otherwise(0)
          + when(col("stopword_ratio") >= 0.01, 1).otherwise(0)
          + when(col("type_token_ratio") >= 0.2, 1).otherwise(0)
          + when(col("punct_ratio") <= 0.3, 1).otherwise(0)).cast("int"))
      .drop("toks")
  }

  /** Marker stopwords per language for the n-gram/stopword-heuristic
    * language ID. CJK is detected by codepoint range first; Latin languages
    * by marker-token hits with a fixed precedence tiebreak (en>es>fr>de).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "las", "por", "una", "como"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "une", "est", "dans", "pour"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "auf", "sich"))

  def langScores(toks: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, x => x.isInCollection(markers)))
    }

  /** Heuristic language ID: 'zh' if any CJK codepoints, else the Latin
    * language with the most marker hits (precedence order on ties), else
    * 'unknown' when nothing matches.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langScores(toks)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("unknown")) { case ((lang, s), els) =>
      when(s === best && best > 0, lit(lang)).otherwise(els)
    }
    when(regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]")) > 0, lit("zh"))
      .otherwise(pick)
  }

  /** Token-prefix cap for the repetition screens. The per-row
    * most-frequent count is O(distinct × tokens); unbounded, one
    * pathological document (10k mostly-distinct tokens) costs ~10⁸
    * comparisons in a single row — a per-row CPU cliff at corpus scale.
    * Screening a fixed prefix is the Gopher-style fix: repetition is a
    * document-level property that stabilizes within the first ~2k tokens,
    * and the cap bounds the row cost at ~4·10⁶ comparisons worst-case.
    */
  val RepetitionMaxTokens = 2000

  /** Gopher-style repetition screens: the fraction of the first
    * `maxTokens` tokens (resp. word bigrams over that prefix) taken by
    * the single most frequent one. Boilerplate and keyword-stuffed
    * documents spike these; Gopher's published thresholds
    * (most-common-word ≤ 0.2, top 2-gram ≤ 0.18) become the
    * `repetition_pass` flag. Pure per-row column expressions — zero
    * shuffle like the rest of this module (the explode+groupBy
    * formulation trades that for 2 corpus-wide shuffles), with the
    * [[RepetitionMaxTokens]] prefix bounding per-row cost.
    */
  def withRepetitionStats(df: DataFrame, textCol: String,
      maxTokens: Int = RepetitionMaxTokens): DataFrame = {
    val toks = slice(tokens(col(textCol)), 1, maxTokens)
    def topFraction(arr: Column): Column =
      when(size(arr) > 0,
        array_max(transform(array_distinct(arr), d =>
          size(filter(arr, x => x === d)))).cast("double") / size(arr))
        .otherwise(lit(0.0))
    val bgs = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", slice(toks, i, lit(2)))))
      .otherwise(array().cast("array<string>"))
    df.withColumn("top_token_fraction", topFraction(toks))
      .withColumn("top_bigram_fraction", topFraction(bgs))
      .withColumn("repetition_pass",
        col("top_token_fraction") <= 0.2 && col("top_bigram_fraction") <= 0.18)
      // Surfaces the screen's DOMAIN: a doc longer than the prefix passed
      // the screen over its first maxTokens tokens only — repetition
      // living entirely past the prefix is invisible. Consumers that
      // can't tolerate that route truncated docs to a full (sharded)
      // recheck instead of trusting the pass flag.
      .withColumn("repetition_truncated",
        size(tokens(col(textCol))) > maxTokens)
  }

  /** WITHIN-doc duplicated n-gram coverage (the RefinedWeb `dup_ngram`
    * screens, complementing [[withRepetitionStats]]'s top-token/bigram
    * fractions): how many token positions sit inside an n-gram that
    * recurs in the SAME document. Zero-shuffle map — positional gram
    * hashes ([[graft.functions.TextExpressions.TextShingleHashes]]) feed
    * the O(m log m) `dup_gram_coverage` kernel, never an explode+groupBy
    * (whose shuffle would carry every gram of the corpus) and never the
    * O(m²) per-row HOF scan. Counts stay integers so the oracle compares
    * exactly; the screen fraction is `dup_covered_tokens/total_tokens`.
    */
  def withDupGramCoverage(df: DataFrame, textCol: String, n: Int): DataFrame = {
    graft.functions.TextExpressions.register(df.sparkSession)
    df.withColumn("dup_covered_tokens",
        call_function("dup_gram_coverage",
          call_function("text_shingle_hashes", col(textCol), lit(n)), lit(n)))
      .withColumn("total_tokens", size(tokens(col(textCol))))
  }

  /** Context-window chunking: split each document into overlapping token
    * windows of `chunkTokens` tokens with `overlap` tokens shared between
    * consecutive chunks — the pre-tokenization op every LLM training
    * pipeline runs so long documents fit the model context. One row per
    * (doc, chunk) with 0-based `chunk_id` and the chunk's text/token
    * count. Pure map + explode (the output explosion is the data, not a
    * shuffle); chunk count = ⌈(n − overlap) / stride⌉ (≥ 1, so short and
    * even empty docs yield exactly one chunk) — integer arithmetic, exact
    * in the oracle.
    */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val toks = tokens(col(textCol))
    df.select(col(idCol), toks.as("__toks"),
        greatest(
          ((size(toks) - overlap + (stride - 1)) / stride).cast("int"),
          lit(1)).as("__k"))
      .select(col(idCol),
        explode(sequence(lit(0), col("__k") - 1)).as("chunk_id"),
        col("__toks"))
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ",
          slice(col("__toks"), col("chunk_id") * stride + 1, lit(chunkTokens)))
          .as("chunk_text"),
        size(slice(col("__toks"), col("chunk_id") * stride + 1, lit(chunkTokens)))
          .as("n_chunk_tokens"))
  }

  /** PII redaction patterns — RE2 ∩ Java regex subset (no lookaround, no
    * backrefs) so Spark and the DuckDB oracle replace identically.
    */
  val EmailPattern: String = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhonePattern: String = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"

  /** Replace emails then phone-number-shaped digit runs with typed
    * placeholder tags. Order matters: emails first, so a phone pattern
    * can never eat digits inside an address. Pure map, zero shuffle —
    * the compliance pass a training corpus runs over every document.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Canonical text form for fingerprinting: lowercase, strip non-alnum
    * (Unicode classes, matching [[TokenSplitRegex]] minus the apostrophe)
    * to spaces, collapse runs, trim.
    */
  def normalizedText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^\\p{L}\\p{N}]+", " "), " +", " "))

  /** Exact content fingerprint: md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(normalizedText(text))

  /** Winnowing-style rolling fingerprint: min 60-bit hash over all k-char
    * windows of the normalized text (k=8). Robust to formatting noise;
    * near-identical docs collide. Char windows via sequence+substring —
    * pure codegen, no UDF.
    */
  def rollingFingerprint(text: Column, k: Int = 8): Column = {
    val norm = normalizedText(text)
    val grams = when(length(norm) >= k,
      transform(sequence(lit(1), length(norm) - (k - 1)),
        i => call_function("substring", norm, i, lit(k))))
      .otherwise(array(norm))
    array_min(transform(grams, g => Hashing.md5Long(g)))
  }

  /** COLLOCATIONS: corpus-level bigram association scores — the
    * phrase-mining primitive ("new york" is a unit, "of the" is chance)
    * behind tokenizer vocabulary seeding and phrase-aware dedup.
    *
    * The association measure is the LIFT ratio P(xy)/(P(x)·P(y)) —
    * monotone in PMI (PMI = log lift) — carried as EXACT fixed-point:
    * `lift_fp = (c_xy · n_uni · scale) div (c_x · c_y)` in integer
    * arithmetic, so both engines land on the identical long and the
    * driver's hash compare is meaningful (a float log would drift by
    * libm). Raw counts ride along so consumers can re-derive any other
    * measure (chi², log-likelihood ratio) downstream.
    *
    * Scale: bigrams are a zero-shuffle `zip_with` over each document's
    * token array (no self-join); the corpus then aggregates once on the
    * bigram and once on the token — both partial-aggregated map-side, so
    * shuffles carry distinct grams, not token instances. The two unigram
    * attachments join on each bigram's OWN word columns (natural equi-join
    * keys); the 1-row totals frame joins by a constant key — a broadcast
    * of one row, never a corpus relation. Overflow bound: the int64
    * product needs `c_xy · n_uni · scale < 2^63` — at larger corpora
    * drop `scale` or widen to decimal(38) before the multiply.
    *
    * `minCount` prunes the hapax tail BEFORE the unigram joins — at
    * web scale the c_xy=1 tail is most of the bigram relation and
    * carries no signal.
    */
  def collocations(df: DataFrame, textCol: String, minCount: Long,
      scale: Long = 10000L): DataFrame = {
    val toks = tokens(col(textCol))
    val grams = df
      .select(explode(zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
    val uni = df.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // constant-key BHJ against the 1-row totals relation: the key must
    // be column-derived (a bare lit folds away → keyless nested loop).
    val totals = uni.agg(sum("c").as("n_uni"))
      .withColumn("__k", pmod(xxhash64(col("n_uni")), lit(1)))
    val big = grams.groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    big
      .join(uni.select(col("w").as("w1"), col("c").as("c_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_y")), "w2")
      .withColumn("__k", pmod(xxhash64(col("c_xy")), lit(1)))
      .join(broadcast(totals), "__k")
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        col("n_uni"),
        expr(s"(c_xy * n_uni * ${scale}L) div (c_x * c_y)").as("lift_fp"))
  }

  /** Single-pass corpus cleaner: every per-document screen — lexical
    * stats, Gopher quality + repetition, language ID, PII redaction — in
    * ONE pass over ONE scan, returning the input columns plus
    * `clean_text` and a `quality` struct. A real pipeline runs the
    * screens together, not as five scans; since every constituent is a
    * pure column expression, Catalyst collapses the whole composition
    * into a single WholeStageCodegen stage with one FileScan and zero
    * Exchange (CleanCorpusSpec and PLANS.md §q_clean_corpus pin exactly
    * that), so the composed form costs the same as any single screen.
    */
  /** Gram width of the [[cleanCorpus]] dup-n-gram screen. */
  val DupGramN = 5

  def cleanCorpus(df: DataFrame, textCol: String,
      maxRepetitionTokens: Int = RepetitionMaxTokens): DataFrame = {
    graft.functions.TextExpressions.register(df.sparkSession)
    val enriched = withRepetitionStats(
      withTextStats(df, textCol), textCol, maxRepetitionTokens)
      .withColumn("lang_id", langId(col(textCol)))
      .withColumn("dup_covered_tokens",
        call_function("dup_gram_coverage",
          call_function("text_shingle_hashes", col(textCol), lit(DupGramN)),
          lit(DupGramN)))
    val qualityFields = Seq(
      "n_tokens", "n_types", "n_bpe_tokens", "avg_token_len",
      "punct_ratio", "stopword_ratio", "type_token_ratio", "quality_score",
      "top_token_fraction", "top_bigram_fraction", "repetition_pass",
      "repetition_truncated", "lang_id", "dup_covered_tokens")
    enriched
      .withColumn("clean_text", redactPii(col(textCol)))
      .withColumn("quality", struct(qualityFields.map(col): _*))
      .drop("n_chars_m" +: qualityFields: _*)
  }
}
