package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DeclaredQuery
import graft.ext.TextAnalysis
import graft.io.Tables

/** Text-analysis queries over the `documents` table (north-star §text):
  * token counting, quality scoring, language ID, fingerprinting. All pure
  * map work (no shuffle) with exact DuckDB mirrors.
  */
object TextQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.testTable(s, dir, name)

  private val stopList = DuckSql.sqlStringList(TextAnalysis.Stopwords)

  /** Count-min grid shape shared by the q_cms* family: 4×512 ⇒ ε = e/512
    * ≈ 0.53% of the token stream, δ = e⁻⁴ ≈ 1.8%.
    */
  private val CmsDepth = 4
  private val CmsWidth = 512

  /** q_kmv_matrix sketch size (se ~ 1/√(k−2) ≈ 8.9%). */
  private val KmvMatrixK = 128

  private def cmsWh(dir: String): String =
    s"/tmp/graft_cmswh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"

  private def hhWh(dir: String): String =
    s"/tmp/graft_hhwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"

  /** DuckDB replay of the count-min grid over the corpus slice selected
    * by `pred` (on `documents`), probed by the distinct tokens of the
    * doc_id % 97 sample — the exact twin of
    * [[graft.ext.SketchState.cmsSketch]]/`cmsEstimate` with the
    * [[CmsDepth]]×[[CmsWidth]] shape: seeded-md5 bucket per (row, key),
    * integer cell counts, min-fold with absent cells read as 0.
    */
  private def cmsOracle(pred: String): String = {
    val rowIdx = s"(SELECT unnest(${DuckSql.sqlIntList(0 until CmsDepth)}) AS row_i)"
    def bucket(keyExpr: String): String =
      s"(('0x' || substr(md5(CAST(row_i AS VARCHAR) || ':' || $keyExpr), 1, 15))::BIGINT) % $CmsWidth"
    s"""WITH tk AS (SELECT doc_id, unnest(${DuckSql.tokens("text")}) AS key
                    FROM documents WHERE $pred),
            ent AS (SELECT row_i, ${bucket("key")} AS bucket
                    FROM tk CROSS JOIN $rowIdx),
            g AS (SELECT row_i, bucket, COUNT(*) AS cnt
                  FROM ent GROUP BY row_i, bucket),
            pk AS (SELECT DISTINCT unnest(${DuckSql.tokens("text")}) AS key
                   FROM documents WHERE doc_id % 97 = 0),
            pe AS (SELECT key, row_i, ${bucket("key")} AS bucket
                   FROM pk CROSS JOIN $rowIdx)
       SELECT key, MIN(COALESCE(cnt, 0)) AS est
       FROM pe LEFT JOIN g USING (row_i, bucket)
       GROUP BY key"""
  }

  /** Fixed multilingual prefix for q_tokens_unicode — shared verbatim by
    * both engines so the fixture bytes are identical. Scripts chosen to
    * exercise distinct tokenizer behaviors with IDENTICAL case semantics
    * in Java and utf8proc lowercasing: Cyrillic upper→lower, accented
    * Latin upper→lower, caseless CJK, a fullwidth digit (\p{N}) fusing
    * into a CJK letter run, and Arabic-Indic digits (\p{N}).
    */
  private val UnicodePrefix: String =
    "Привет МИР Grüße CAFÉ 第５章 你好世界 ٣٤٥"

  val all: Seq[DeclaredQuery] = Seq(

    // Distributed BPE vocabulary induction: 6 iterations of count-pairs →
    // argmax → canonical single-pass merge over the frequency-weighted
    // WORD relation (the corpus is scanned once). The oracle replays the
    // whole training run in unrolled CTEs — the learned merge table is
    // hash-exact, iteration by iteration.
    DeclaredQuery(
      "q_bpe_merges",
      (s, dir) =>
        graft.ext.Bpe.trainMerges(
          t(s, dir, "documents").select("doc_id", "text"), "text", iters = 6),
      Some(s"""WITH ${DuckSql.bpeCtes(6)}
               ${DuckSql.bpeMergesSelect(6)}""")),

    // Subword token counting under the learned 6-merge BPE vocabulary —
    // the context-budget input a packing stage consumes. One explode +
    // one vocab join + one doc aggregate.
    DeclaredQuery(
      "q_bpe_tokens",
      (s, dir) =>
        graft.ext.Bpe.subwordCounts(
          t(s, dir, "documents").select("doc_id", "text"), "text", "doc_id",
          iters = 6),
      Some(s"""WITH ${DuckSql.bpeCtes(6)},
                    tok AS (SELECT doc_id, unnest(${DuckSql.tokens("text")}) AS word
                            FROM documents),
                    seg AS (SELECT word,
                                   len(string_split(trim(syms), '  ')) AS nsw
                            FROM s6)
               SELECT doc_id,
                      CAST(COUNT(*) AS BIGINT) AS n_tokens,
                      CAST(SUM(nsw) AS BIGINT) AS n_subwords
               FROM tok JOIN seg USING (word)
               GROUP BY doc_id""")),

    // STORED-tokenizer application: train once, persist merges + vocab
    // (writeVocab), then count subwords for a NEW batch — including an
    // out-of-vocabulary token — by replaying the stored merge table as k
    // nested replaces in one codegen projection. No retraining, no
    // training-corpus scan: the nightly-ingest tokenizer shape.
    DeclaredQuery(
      "q_bpe_apply",
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        if (!Tables.bucketedStateLive(s, s"/tmp/graft_wh$tag",
            Seq(s"bpe${tag}_merges", s"bpe${tag}_vocab")))
          graft.ext.Bpe.writeVocab(docs, "text", iters = 6,
            s"/tmp/graft_wh$tag", s"bpe$tag", numBuckets = 4)
        val batch = docs.select(col("doc_id"),
          concat(col("text"), lit(" qzzq")).as("text"))
        graft.ext.Bpe.subwordCountsStored(s, s"bpe$tag", batch, "text", "doc_id")
      },
      Some(s"""WITH ${DuckSql.bpeCtes(6)},
                    btok AS (SELECT doc_id,
                                    unnest(${DuckSql.tokens("text || ' qzzq'")}) AS word
                             FROM documents),
                    ${DuckSql.bpeApplyCtes(6)},
                    seg AS (SELECT word,
                                   len(string_split(trim(syms), '  ')) AS nsw
                            FROM a6)
               SELECT doc_id,
                      CAST(COUNT(*) AS BIGINT) AS n_tokens,
                      CAST(SUM(nsw) AS BIGINT) AS n_subwords
               FROM btok JOIN seg USING (word)
               GROUP BY doc_id""")),

    // Signed feature-hash embeddings (the hashing trick): raw text → a
    // 64-dim integer vector in one zero-shuffle codegen pass — the
    // model-free featurization that turns the whole embedding stack
    // (PQ/ADC, IVF, hyperplane LSH) into text operators. Dense exploded
    // output; the oracle replays the relational explode→bucket→sum form.
    DeclaredQuery(
      "q_hash_embed",
      (s, dir) => {
        graft.functions.TextExpressions.register(s)
        t(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(call_function("text_hash_embed", col("text"), lit(64))))
          .select(col("doc_id"), col("pos").as("dim"), col("col").as("value"))
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(${DuckSql.tokens("text")}) AS tk
                            FROM documents),
                    bs AS (SELECT doc_id,
                                  CAST(${DuckSql.md5Long("'fh:' || tk")} % 64 AS INT)
                                    AS dim,
                                  (${DuckSql.md5Long("'fs:' || tk")} % 2) * 2 - 1
                                    AS sgn
                           FROM tok),
                    nz AS (SELECT doc_id, dim, CAST(SUM(sgn) AS BIGINT) AS value
                           FROM bs GROUP BY doc_id, dim),
                    dims AS (SELECT unnest(generate_series(0, 63)) AS dim)
               SELECT d.doc_id, CAST(dims.dim AS INT) AS dim,
                      CAST(COALESCE(nz.value, 0) AS BIGINT) AS value
               FROM documents d CROSS JOIN dims
               LEFT JOIN nz ON nz.doc_id = d.doc_id AND nz.dim = dims.dim""")),

    // Token counts (word + BPE-ish), lexical ratios, Gopher-style quality.
    DeclaredQuery(
      "q_text_stats",
      (s, dir) =>
        TextAnalysis.withTextStats(t(s, dir, "documents"), "text")
          .select("doc_id", "n_tokens", "n_types", "n_bpe_tokens",
            "avg_token_len", "punct_ratio", "stopword_ratio",
            "type_token_ratio", "quality_score"),
      Some(s"""WITH tk AS (SELECT doc_id, text, ${DuckSql.tokens("text")} AS toks
                           FROM documents)
               SELECT doc_id,
                      len(toks) AS n_tokens,
                      len(list_distinct(toks)) AS n_types,
                      ${DuckSql.bpeCount("text")} AS n_bpe_tokens,
                      CASE WHEN len(toks) > 0
                           THEN (list_sum(list_transform(toks, x -> length(x))))::DOUBLE
                                / len(toks)
                           ELSE 0.0 END AS avg_token_len,
                      (length(text) - length(regexp_replace(text, '[^\\p{L}\\p{N}\\s]', '', 'g')))::DOUBLE
                        / greatest(length(text), 1) AS punct_ratio,
                      CASE WHEN len(toks) > 0
                           THEN len(list_filter(toks, x -> list_contains($stopList, x)))::DOUBLE
                                / len(toks)
                           ELSE 0.0 END AS stopword_ratio,
                      CASE WHEN len(toks) > 0
                           THEN len(list_distinct(toks))::DOUBLE / len(toks)
                           ELSE 0.0 END AS type_token_ratio,
                      (${DuckSql.qualityScore("text", "toks")})::INT AS quality_score
               FROM tk""")),

    // Gopher repetition screens: top-token / top-bigram fractions + the
    // published-threshold pass flag, over the RepetitionMaxTokens prefix
    // (bounds the O(distinct × tokens) per-row cost). Zero-shuffle map;
    // int/int divisions are IEEE-exact in both engines.
    DeclaredQuery(
      "q_repetition",
      (s, dir) =>
        TextAnalysis.withRepetitionStats(t(s, dir, "documents"), "text")
          .select("doc_id", "top_token_fraction", "top_bigram_fraction",
            "repetition_pass", "repetition_truncated"),
      Some(s"""WITH ft AS (SELECT doc_id,
                             ${DuckSql.tokens("text")} AS ftoks
                           FROM documents),
                    tk AS (SELECT doc_id,
                             len(ftoks) > ${TextAnalysis.RepetitionMaxTokens}
                               AS repetition_truncated,
                             ftoks[1:${TextAnalysis.RepetitionMaxTokens}] AS toks
                           FROM ft),
                    bg AS (SELECT doc_id, toks, repetition_truncated,
                                  CASE WHEN len(toks) >= 2
                                       THEN list_transform(generate_series(1, len(toks) - 1),
                                              i -> array_to_string(toks[i:i+1], ' '))
                                       ELSE [] END AS bgs
                           FROM tk),
                    fr AS (SELECT doc_id, repetition_truncated,
                                  CASE WHEN len(toks) > 0
                                       THEN list_max(list_transform(list_distinct(toks),
                                              d -> len(list_filter(toks, x -> x = d))))::DOUBLE
                                            / len(toks)
                                       ELSE 0.0 END AS top_token_fraction,
                                  CASE WHEN len(bgs) > 0
                                       THEN list_max(list_transform(list_distinct(bgs),
                                              d -> len(list_filter(bgs, x -> x = d))))::DOUBLE
                                            / len(bgs)
                                       ELSE 0.0 END AS top_bigram_fraction
                           FROM bg)
               SELECT doc_id, top_token_fraction, top_bigram_fraction,
                      (top_token_fraction <= 0.2 AND top_bigram_fraction <= 0.18)
                        AS repetition_pass,
                      repetition_truncated
               FROM fr""")),

    // Within-doc duplicated 5-gram coverage (RefinedWeb dup_ngram screen):
    // the Spark side is a zero-shuffle O(m log m) per-row kernel over
    // positional gram hashes; the oracle derives the same coverage
    // relationally (per-doc gram counts → covered-position union) —
    // agreement proves the kernel against an independent formulation.
    DeclaredQuery(
      "q_dup_gram_coverage",
      (s, dir) =>
        TextAnalysis.withDupGramCoverage(t(s, dir, "documents"), "text", n = 5)
          .select("doc_id", "dup_covered_tokens", "total_tokens"),
      Some(s"""WITH tk AS (SELECT doc_id, ${DuckSql.tokens("text")} AS toks
                           FROM documents),
                   sh AS (SELECT doc_id, u.st AS start, ${DuckSql.md5Long("u.g")} AS gram_hash
                          FROM (SELECT doc_id,
                                       unnest(list_transform(generate_series(1, greatest(len(toks) - 4, 1)),
                                              i -> {'st': i - 1,
                                                    'g': array_to_string(toks[i:i+4], ' ')})) AS u
                                FROM tk)),
                   dupg AS (SELECT doc_id, gram_hash FROM sh
                            GROUP BY doc_id, gram_hash HAVING COUNT(*) >= 2),
                   cov AS (SELECT DISTINCT doc_id,
                                  unnest(generate_series(start, start + 4)) AS pos
                           FROM sh JOIN dupg USING (doc_id, gram_hash)),
                   cnt AS (SELECT doc_id, COUNT(*) AS covered FROM cov
                           GROUP BY doc_id)
               SELECT t.doc_id,
                      CAST(COALESCE(c.covered, 0) AS INT) AS dup_covered_tokens,
                      CAST(len(t.toks) AS INT) AS total_tokens
               FROM tk t LEFT JOIN cnt c ON c.doc_id = t.doc_id""")),

    // Context-window chunking: 30-token windows, 10-token overlap.
    DeclaredQuery(
      "q_chunk_docs",
      (s, dir) =>
        TextAnalysis.chunkDocuments(t(s, dir, "documents"), "text", "doc_id",
          chunkTokens = 30, overlap = 10),
      Some {
        val (chunk, overlap) = (30, 10)
        val stride = chunk - overlap
        s"""WITH tk AS (SELECT doc_id, ${DuckSql.tokens("text")} AS toks
                        FROM documents),
                 k AS (SELECT doc_id, toks,
                              GREATEST((len(toks) - $overlap + ${stride - 1})
                                       // $stride, 1) AS n_chunks
                       FROM tk),
                 ch AS (SELECT doc_id, toks,
                               unnest(generate_series(0, n_chunks - 1)) AS chunk_id
                        FROM k)
            SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
                   array_to_string(
                     toks[chunk_id * $stride + 1 : chunk_id * $stride + $chunk],
                     ' ') AS chunk_text,
                   CAST(len(toks[chunk_id * $stride + 1 : chunk_id * $stride + $chunk])
                        AS INT) AS n_chunk_tokens
            FROM ch"""
      }),

    // Heuristic language ID: CJK codepoint check, then marker-token argmax.
    DeclaredQuery(
      "q_lang_id",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_id")),
      Some {
        val markers = TextAnalysis.LangMarkers.map { case (lang, ms) =>
          lang -> s"len(list_filter(toks, x -> list_contains(${DuckSql.sqlStringList(ms)}, x)))"
        }
        val hits = markers.map { case (l, e) => s"$e AS hits_$l" }.mkString(", ")
        val best = s"greatest(${markers.map(m => s"hits_${m._1}").mkString(", ")})"
        val pick = markers.map { case (l, _) =>
          s"WHEN hits_$l = best AND best > 0 THEN '$l'"
        }.mkString(" ")
        s"""WITH tk AS (SELECT doc_id, text, ${DuckSql.tokens("text")} AS toks
                        FROM documents),
                 sc AS (SELECT doc_id, text, $hits FROM tk),
                 bs AS (SELECT *, $best AS best FROM sc)
            SELECT doc_id,
                   CASE WHEN len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) > 0
                        THEN 'zh'
                        ELSE CASE $pick ELSE 'unknown' END
                   END AS lang_id
            FROM bs"""
      }),

    // Single-pass corpus cleaner: stats + quality + repetition + langId +
    // PII redaction composed into ONE projection over ONE scan (plan has
    // one FileScan and zero Exchange — CleanCorpusSpec + PLANS.md). The
    // oracle recomputes every screen and must hash-match the composition.
    DeclaredQuery(
      "q_clean_corpus",
      (s, dir) =>
        TextAnalysis.cleanCorpus(t(s, dir, "documents"), "text")
          .select(col("doc_id"), col("clean_text"), col("quality.*")),
      Some {
        val maxT = TextAnalysis.RepetitionMaxTokens
        val markers = TextAnalysis.LangMarkers.map { case (lang, ms) =>
          lang -> s"len(list_filter(toks, x -> list_contains(${DuckSql.sqlStringList(ms)}, x)))"
        }
        val hits = markers.map { case (l, e) => s"$e AS hits_$l" }.mkString(", ")
        val best = s"greatest(${markers.map(m => s"hits_${m._1}").mkString(", ")})"
        val pick = markers.map { case (l, _) =>
          s"WHEN hits_$l = best AND best > 0 THEN '$l'"
        }.mkString(" ")
        s"""WITH tk AS (SELECT doc_id, text, ${DuckSql.tokens("text")} AS toks
                        FROM documents),
                 pre AS (SELECT *, toks[1:$maxT] AS ptoks FROM tk),
                 bg AS (SELECT *,
                          CASE WHEN len(ptoks) >= 2
                               THEN list_transform(generate_series(1, len(ptoks) - 1),
                                      i -> array_to_string(ptoks[i:i+1], ' '))
                               ELSE [] END AS bgs
                        FROM pre),
                 st AS (SELECT doc_id, text, toks,
                          len(toks) AS n_tokens,
                          len(list_distinct(toks)) AS n_types,
                          ${DuckSql.bpeCount("text")} AS n_bpe_tokens,
                          CASE WHEN len(toks) > 0
                               THEN (list_sum(list_transform(toks, x -> length(x))))::DOUBLE
                                    / len(toks)
                               ELSE 0.0 END AS avg_token_len,
                          (length(text) - length(regexp_replace(text, '[^\\p{L}\\p{N}\\s]', '', 'g')))::DOUBLE
                            / greatest(length(text), 1) AS punct_ratio,
                          CASE WHEN len(toks) > 0
                               THEN len(list_filter(toks, x -> list_contains($stopList, x)))::DOUBLE
                                    / len(toks)
                               ELSE 0.0 END AS stopword_ratio,
                          CASE WHEN len(toks) > 0
                               THEN len(list_distinct(toks))::DOUBLE / len(toks)
                               ELSE 0.0 END AS type_token_ratio,
                          CASE WHEN len(ptoks) > 0
                               THEN list_max(list_transform(list_distinct(ptoks),
                                      d -> len(list_filter(ptoks, x -> x = d))))::DOUBLE
                                    / len(ptoks)
                               ELSE 0.0 END AS top_token_fraction,
                          CASE WHEN len(bgs) > 0
                               THEN list_max(list_transform(list_distinct(bgs),
                                      d -> len(list_filter(bgs, x -> x = d))))::DOUBLE
                                    / len(bgs)
                               ELSE 0.0 END AS top_bigram_fraction,
                          $hits
                        FROM bg),
                 bs AS (SELECT *, $best AS best FROM st),
                 gr AS (SELECT doc_id, u.st AS start, ${DuckSql.md5Long("u.g")} AS gh
                        FROM (SELECT doc_id,
                                     unnest(list_transform(generate_series(1, greatest(len(toks) - 4, 1)),
                                            i -> {'st': i - 1,
                                                  'g': array_to_string(toks[i:i+4], ' ')})) AS u
                              FROM tk)),
                 dupg AS (SELECT doc_id, gh FROM gr
                          GROUP BY doc_id, gh HAVING COUNT(*) >= 2),
                 gcov AS (SELECT DISTINCT doc_id,
                                 unnest(generate_series(start, start + 4)) AS pos
                          FROM gr JOIN dupg USING (doc_id, gh)),
                 dcnt AS (SELECT doc_id, COUNT(*) AS dup_covered FROM gcov
                          GROUP BY doc_id)
            SELECT bs.doc_id,
                   regexp_replace(regexp_replace(text,
                     '${TextAnalysis.EmailPattern}', '<EMAIL>', 'g'),
                     '${TextAnalysis.PhonePattern}', '<PHONE>', 'g') AS clean_text,
                   n_tokens, n_types, n_bpe_tokens, avg_token_len, punct_ratio,
                   stopword_ratio, type_token_ratio,
                   (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1 ELSE 0 END
                    + CASE WHEN avg_token_len BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END
                    + CASE WHEN stopword_ratio >= 0.01 THEN 1 ELSE 0 END
                    + CASE WHEN type_token_ratio >= 0.2 THEN 1 ELSE 0 END
                    + CASE WHEN punct_ratio <= 0.3 THEN 1 ELSE 0 END)::INT AS quality_score,
                   top_token_fraction, top_bigram_fraction,
                   (top_token_fraction <= 0.2 AND top_bigram_fraction <= 0.18)
                     AS repetition_pass,
                   len(bs.toks) > $maxT AS repetition_truncated,
                   CASE WHEN len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) > 0
                        THEN 'zh'
                        ELSE CASE $pick ELSE 'unknown' END
                   END AS lang_id,
                   CAST(COALESCE(dcnt.dup_covered, 0) AS INT) AS dup_covered_tokens
            FROM bs LEFT JOIN dcnt ON dcnt.doc_id = bs.doc_id"""
      }),

    // END-TO-END RAG-ingestion retrieval: chunk (30 tokens, overlap 10) →
    // feature-hash embed (dim 64) → integer-L2 nearest 10 chunks for a
    // query string — the whole chunk/embed/retrieve chain as ONE verified
    // query; the oracle replays every stage (chunk arithmetic, bucket/sign
    // sums, dense L2) with zero float operations.
    DeclaredQuery(
      "q_rag_retrieve",
      (s, dir) =>
        graft.ext.Relevance.chunkRetrieve(t(s, dir, "documents"), "text",
          "doc_id", "spark stream join processing pipeline",
          chunkTokens = 30, overlap = 10, embedDim = 64, k = 10),
      Some {
        val (chunk, overlap) = (30, 10)
        val stride = chunk - overlap
        s"""WITH tk AS (SELECT doc_id, ${DuckSql.tokens("text")} AS toks
                        FROM documents),
                 kk AS (SELECT doc_id, toks,
                               GREATEST((len(toks) - $overlap + ${stride - 1})
                                        // $stride, 1) AS n_chunks
                        FROM tk),
                 ch AS (SELECT doc_id,
                               unnest(generate_series(0, n_chunks - 1)) AS chunk_id,
                               toks
                        FROM kk),
                 chunks AS (SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
                                   array_to_string(
                                     toks[chunk_id * $stride + 1 : chunk_id * $stride + $chunk],
                                     ' ') AS chunk_text
                            FROM ch),
                 ctok AS (SELECT doc_id, chunk_id,
                                 unnest(${DuckSql.tokens("chunk_text")}) AS tok
                          FROM chunks),
                 cnz AS (SELECT doc_id, chunk_id,
                                CAST(${DuckSql.md5Long("'fh:' || tok")} % 64 AS INT) AS dim,
                                CAST(SUM((${DuckSql.md5Long("'fs:' || tok")} % 2) * 2 - 1)
                                     AS BIGINT) AS v
                         FROM ctok GROUP BY doc_id, chunk_id, dim),
                 dims AS (SELECT unnest(generate_series(0, 63)) AS dim),
                 cdense AS (SELECT c.doc_id, c.chunk_id, dims.dim,
                                   COALESCE(cnz.v, 0) AS v
                            FROM chunks c CROSS JOIN dims
                            LEFT JOIN cnz ON cnz.doc_id = c.doc_id
                                         AND cnz.chunk_id = c.chunk_id
                                         AND cnz.dim = dims.dim),
                 qtok AS (SELECT unnest(${DuckSql.tokens(
                            "'spark stream join processing pipeline'")}) AS tok),
                 qnz AS (SELECT CAST(${DuckSql.md5Long("'fh:' || tok")} % 64 AS INT) AS dim,
                                CAST(SUM((${DuckSql.md5Long("'fs:' || tok")} % 2) * 2 - 1)
                                     AS BIGINT) AS v
                         FROM qtok GROUP BY dim),
                 qdense AS (SELECT dims.dim, COALESCE(qnz.v, 0) AS v
                            FROM dims LEFT JOIN qnz ON qnz.dim = dims.dim),
                 d AS (SELECT c.doc_id, c.chunk_id,
                              CAST(SUM((c.v - q.v) * (c.v - q.v)) AS BIGINT)
                                AS dist
                       FROM cdense c JOIN qdense q ON c.dim = q.dim
                       GROUP BY c.doc_id, c.chunk_id)
            SELECT doc_id, chunk_id, dist
            FROM d
            ORDER BY dist ASC, doc_id ASC, chunk_id ASC
            LIMIT 10"""
      }),

    // Fixed-point TF-IDF retrieval: top-25 docs for a 3-term query. The
    // integer idf (((N+1)·10⁶) div (df+1)) keeps every weight and sum an
    // exact BIGINT — hash-identical across engines and summation orders,
    // where an ln-based idf would drift by libm ULPs.
    DeclaredQuery(
      "q_tfidf_search",
      (s, dir) =>
        graft.ext.Relevance.search(t(s, dir, "documents"), col("text"),
          "doc_id", Seq("spark", "join", "stream"), k = 25),
      Some(TfidfOracleSql)),

    // The SAME TF-IDF retrieval over a PERSISTED inverted index (postings
    // bucketed on term + lengths + 1-row totals — the Lucene-shape
    // artifact as warehouse tables): the corpus text is scanned zero
    // times at query time. Stored ≡ live bit-for-bit — same oracle.
    DeclaredQuery(
      "q_tfidf_stored",
      (s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        if (!Tables.bucketedStateLive(s, s"/tmp/graft_wh$tag",
            Seq(s"text${tag}_postings", s"text${tag}_lengths",
              s"text${tag}_totals")))
          graft.ext.Relevance.writeTextIndex(
            t(s, dir, "documents"), col("text"), "doc_id",
            s"/tmp/graft_wh$tag", s"text$tag", numBuckets = 8)
        graft.ext.Relevance.searchStored(s, s"text$tag", "doc_id",
          Seq("spark", "join", "stream"), k = 25)
      },
      Some(TfidfOracleSql)),

    // Text-index DRIFT ledger (the inverted-index twin of q_ivf_stats):
    // even docs seed the index (phase 'base'), odd docs arrive as a
    // nightly append (phase 'append'); the report folds the per-ingest
    // ledger to exact integer doc/token/posting masses per phase — the
    // inputs to Relevance.needsRebuild's growth/length/density triggers.
    // The oracle replays tokenization and per-doc distinct-term counts
    // from the raw corpus, so the ledger is verified, not just present.
    DeclaredQuery(
      "q_text_index_stats",
      (s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.ext.Relevance.appendTextIndex(s, s"tixstats$tag",
          t(s, dir, "documents").filter(col("doc_id") % 2 === 1),
          col("text"), "doc_id", s"/tmp/graft_wh$tag", numBuckets = 4)
        graft.ext.Relevance.textDriftStats(s, s"tixstats$tag")
      },
      setup = Some((s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.ext.Relevance.writeTextIndex(
          t(s, dir, "documents").filter(col("doc_id") % 2 === 0),
          col("text"), "doc_id", s"/tmp/graft_wh$tag", s"tixstats$tag",
          numBuckets = 4)
      }),
      oracle = Some(s"""WITH tk AS (SELECT doc_id, ${DuckSql.tokens("text")} AS toks
                           FROM documents)
               SELECT CASE WHEN doc_id % 2 = 0 THEN 'base' ELSE 'append' END
                        AS phase,
                      COUNT(*) AS n_docs,
                      CAST(SUM(len(toks)) AS BIGINT) AS sum_dl,
                      CAST(SUM(len(list_distinct(toks))) AS BIGINT)
                        AS n_postings
               FROM tk GROUP BY 1""")),

    // BM25 over the same persisted index (adds the lengths join) —
    // stored ≡ live, same oracle as q_bm25_search.
    DeclaredQuery(
      "q_bm25_stored",
      (s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        if (!Tables.bucketedStateLive(s, s"/tmp/graft_wh$tag",
            Seq(s"text${tag}_postings", s"text${tag}_lengths",
              s"text${tag}_totals")))
          graft.ext.Relevance.writeTextIndex(
            t(s, dir, "documents"), col("text"), "doc_id",
            s"/tmp/graft_wh$tag", s"text$tag", numBuckets = 8)
        graft.ext.Relevance.searchBm25Stored(s, s"text$tag", "doc_id",
          Seq("spark", "join", "stream"), k = 25)
      },
      Some(s"""WITH ${Bm25Ctes}
               SELECT doc_id, score FROM sc
               ORDER BY score DESC, doc_id ASC LIMIT 25""")),

    // Corpus vocabulary statistics: the 20 most frequent word trigrams
    // (ALL occurrences, not per-doc distinct) — the n-gram count primitive
    // behind vocab induction and boilerplate discovery. TakeOrderedAndProject
    // top-k over one partial-agg shuffle.
    DeclaredQuery(
      "q_top_ngrams",
      (s, dir) => {
        graft.functions.TextExpressions.register(s)
        t(s, dir, "documents")
          .select(explode(
            call_function("text_shingles_all", col("text"), lit(3)))
            .as("gram"))
          .groupBy(col("gram")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("gram").asc)
          .limit(20)
      },
      Some(s"""WITH tk AS (SELECT ${DuckSql.tokens("text")} AS toks FROM documents),
                    ex AS (SELECT unnest(${DuckSql.shingles("toks", 3)}) AS gram
                           FROM tk)
               SELECT gram, COUNT(*) AS n FROM ex GROUP BY gram
               ORDER BY n DESC, gram ASC LIMIT 20""")),

    // EXACT heavy hitters (token share > 1/31) via the two-pass
    // Misra-Gries sketch-then-confirm path — candidates from ≤30-counter
    // partition summaries (never a full-vocabulary shuffle), exact counts
    // confirmed over the pruned scan. The oracle is the plain full
    // GROUP BY + HAVING: output equality proves the sketch's superset
    // guarantee held (no heavy hitter escaped the candidate set) AND the
    // confirm filter removed every false candidate.
    DeclaredQuery(
      "q_heavy_hitters",
      (s, dir) =>
        graft.ext.SketchState.heavyHitters(
          t(s, dir, "documents")
            .select(explode(TextAnalysis.tokens(col("text"))).as("tok")),
          col("tok"), k = 30),
      Some(s"""WITH tk AS (SELECT unnest(${DuckSql.tokens("text")}) AS key
                           FROM documents),
                    tot AS (SELECT COUNT(*) AS n FROM tk)
               SELECT key, COUNT(*) AS cnt
               FROM tk, tot
               GROUP BY key, n
               HAVING COUNT(*) * 31 > n""")),

    // STORED heavy hitters: the same exact answer maintained
    // INCREMENTALLY — each nightly batch persists only its k-row
    // weighted Misra-Gries summary (O(batch) cost, zero corpus
    // rewrites); the read merges the summaries declaratively (sum →
    // subtract the (k+1)-th largest → keep positive: a guaranteed
    // candidate SUPERSET over the whole history) and exact-confirms the
    // ≤k candidates with one isin-pruned scan. Oracle = the identical
    // plain-SQL heavy hitters over everything ingested: maintained ≡
    // recomputed IS the check.
    DeclaredQuery(
      "q_heavy_hitters_stored",
      (s, dir) => {
        import graft.ext.SketchState
        val toks = t(s, dir, "documents")
          .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        val wh = hhWh(dir)
        SketchState.appendHhState(s, wh, "hh", toks.filter(col("doc_id") % 3 === 1),
          col("tok"), k = 30, batchTag = "n2")
        SketchState.appendHhState(s, wh, "hh", toks.filter(col("doc_id") % 3 === 2),
          col("tok"), k = 30, batchTag = "n3")
        SketchState.storedHeavyHitters(s, wh, "hh",
          toks, col("tok"), k = 30)
      },
      setup = Some((s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        val wh = hhWh(dir)
        graft.ext.SketchState.createHhState(s, wh, "hh",
          toks.filter(col("doc_id") % 3 === 0), col("tok"), k = 30)
      }),
      oracle = Some(s"""WITH tk AS (SELECT unnest(${DuckSql.tokens("text")}) AS key
                           FROM documents),
                    tot AS (SELECT COUNT(*) AS n FROM tk)
               SELECT key, COUNT(*) AS cnt
               FROM tk, tot
               GROUP BY key, n
               HAVING COUNT(*) * 31 > n""")),

    // PER-GROUP exact heavy hitters: each source's tokens exceeding a
    // 1/(k+1) share OF THAT SOURCE — per-group Misra-Gries summaries in
    // one pass, candidates broadcast onto the confirm scan (never
    // collected, never shuffling the corpus), per-group exact share
    // test. Oracle = the per-group plain-SQL HAVING.
    DeclaredQuery(
      "q_heavy_hitters_grouped",
      (s, dir) =>
        graft.ext.SketchState.heavyHittersGrouped(
          t(s, dir, "documents")
            .select(col("source"),
              explode(TextAnalysis.tokens(col("text"))).as("tok")),
          "source", col("tok"), k = 20),
      Some(s"""WITH tk AS (SELECT source, unnest(${DuckSql.tokens("text")}) AS key
                           FROM documents),
                    tot AS (SELECT source, COUNT(*) AS n FROM tk GROUP BY source)
               SELECT tk.source, key, COUNT(*) AS cnt
               FROM tk JOIN tot USING (source)
               GROUP BY tk.source, key, n
               HAVING COUNT(*) * 21 > n""")),

    // KMV (bottom-k) corpus-overlap sketch: 3-gram shingle overlap
    // between the even- and odd-id halves of the corpus — the
    // contamination measurement HLL cannot make (registers union but
    // never intersect; bottom-k is a uniform sample of the hash space,
    // so it estimates |A∪B|, Jaccard, AND |A∩B|). Sketches are
    // order-invariant bottom-k distinct md5 hashes, so live sketch ≡
    // the oracle's DISTINCT/ORDER/LIMIT replay bit-for-bit, and the
    // estimates are one pinned IEEE op sequence — the whole row
    // hash-verifies, estimator branches included.
    DeclaredQuery(
      "q_kmv_overlap",
      (s, dir) => {
        import graft.ext.{Dedup, SketchState}
        // shingling is the cost: fan the degenerate scan out and use the
        // native single-pass shingler (the declarative HOF twin inlines
        // the tokenizer four times into the explode — a plan-size and
        // codegen blowup measured ~6x slower)
        graft.functions.TextExpressions.register(s)
        val sh = Tables.fanOut(t(s, dir, "documents"), col("doc_id"))
          .select(col("doc_id"),
            explode(call_function("text_shingles_all", col("text"), lit(3)))
              .as("g"))
        SketchState.kmvOverlapSplit(sh, col("g"),
          col("doc_id") % 2 === 0, k = 256)
      },
      Some(s"""WITH tk AS (SELECT doc_id, ${DuckSql.tokens("text")} AS toks
                           FROM documents),
                    sh AS (SELECT doc_id, unnest(${DuckSql.shingles("toks", 3)}) AS g
                           FROM tk),
                    ha AS (SELECT DISTINCT ${DuckSql.md5Long("'kmv:' || g")} AS hv
                           FROM sh WHERE doc_id % 2 = 0 ORDER BY hv LIMIT 256),
                    hb AS (SELECT DISTINCT ${DuckSql.md5Long("'kmv:' || g")} AS hv
                           FROM sh WHERE doc_id % 2 = 1 ORDER BY hv LIMIT 256),
                    uu AS (SELECT hv FROM (SELECT hv FROM ha UNION SELECT hv FROM hb)
                           ORDER BY hv LIMIT 256),
                    u AS (SELECT hv, hv IN (SELECT hv FROM ha) AS ina,
                                 hv IN (SELECT hv FROM hb) AS inb
                          FROM uu)
               SELECT CAST(256 AS BIGINT) AS k,
                      COUNT(*) AS u_cnt,
                      MAX(hv) AS d,
                      CAST(SUM(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS BIGINT) AS m_both,
                      CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
                           ELSE (CAST(255 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE))
                                / CAST(MAX(hv) AS DOUBLE) END AS est_union,
                      CASE WHEN COUNT(*) < 256
                           THEN CAST(SUM(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS DOUBLE)
                           ELSE (CAST(SUM(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS DOUBLE)
                                 / CAST(256 AS DOUBLE))
                                * ((CAST(255 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE))
                                   / CAST(MAX(hv) AS DOUBLE)) END AS est_inter
               FROM u""")),

    // STORED KMV state: side A's sketch is maintained incrementally
    // across three nightly batches (k rows per batch, partition-replace
    // replay) and read back by a bottom-k fold over Σbatches·k rows —
    // KMV's exact mergeability means the stored chain reconstructs the
    // corpus sketch LOSSLESSLY, so the overlap row is bit-identical to
    // q_kmv_overlap's live computation and shares its oracle verbatim.
    DeclaredQuery(
      "q_kmv_stored",
      (s, dir) => {
        import graft.ext.{Dedup, SketchState}
        graft.functions.TextExpressions.register(s)
        val sh = Tables.fanOut(t(s, dir, "documents"), col("doc_id"))
          .select(col("doc_id"),
            explode(call_function("text_shingles_all", col("text"), lit(3)))
              .as("g"))
        val evens = sh.filter(col("doc_id") % 2 === 0)
        val wh = s"/tmp/graft_kmvwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        SketchState.appendKmvState(s, wh, "kmv",
          evens.filter(col("doc_id") % 6 === 2), col("g"), 256, "n2")
        SketchState.appendKmvState(s, wh, "kmv",
          evens.filter(col("doc_id") % 6 === 4), col("g"), 256, "n3")
        SketchState.kmvOverlapOfSketches(
          SketchState.readKmvSketch(s, wh, "kmv", 256),
          SketchState.kmvSketch(sh.filter(col("doc_id") % 2 === 1),
            col("g"), 256),
          k = 256)
      },
      setup = Some((s, dir) => {
        import graft.ext.{Dedup, SketchState}
        graft.functions.TextExpressions.register(s)
        val sh = Tables.fanOut(t(s, dir, "documents"), col("doc_id"))
          .select(col("doc_id"),
            explode(call_function("text_shingles_all", col("text"), lit(3)))
              .as("g"))
        val wh = s"/tmp/graft_kmvwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        SketchState.createKmvState(s, wh, "kmv",
          sh.filter(col("doc_id") % 6 === 0), col("g"), 256)
      }),
      oracle = Some(s"""WITH tk AS (SELECT doc_id, ${DuckSql.tokens("text")} AS toks
                           FROM documents),
                    sh AS (SELECT doc_id, unnest(${DuckSql.shingles("toks", 3)}) AS g
                           FROM tk),
                    ha AS (SELECT DISTINCT ${DuckSql.md5Long("'kmv:' || g")} AS hv
                           FROM sh WHERE doc_id % 2 = 0 ORDER BY hv LIMIT 256),
                    hb AS (SELECT DISTINCT ${DuckSql.md5Long("'kmv:' || g")} AS hv
                           FROM sh WHERE doc_id % 2 = 1 ORDER BY hv LIMIT 256),
                    uu AS (SELECT hv FROM (SELECT hv FROM ha UNION SELECT hv FROM hb)
                           ORDER BY hv LIMIT 256),
                    u AS (SELECT hv, hv IN (SELECT hv FROM ha) AS ina,
                                 hv IN (SELECT hv FROM hb) AS inb
                          FROM uu)
               SELECT CAST(256 AS BIGINT) AS k,
                      COUNT(*) AS u_cnt,
                      MAX(hv) AS d,
                      CAST(SUM(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS BIGINT) AS m_both,
                      CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
                           ELSE (CAST(255 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE))
                                / CAST(MAX(hv) AS DOUBLE) END AS est_union,
                      CASE WHEN COUNT(*) < 256
                           THEN CAST(SUM(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS DOUBLE)
                           ELSE (CAST(SUM(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS DOUBLE)
                                 / CAST(256 AS DOUBLE))
                                * ((CAST(255 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE))
                                   / CAST(MAX(hv) AS DOUBLE)) END AS est_inter
               FROM u""")),

    // WINDOWED stored heavy hitters: "top tokens over the last two
    // batches" — candidates and total from the window's
    // partition-pruned k-row summaries (zero corpus cost), one
    // isin-pruned confirm over the windowed corpus slice. The superset
    // guarantee holds verbatim with N restricted to the window, so the
    // answer is EXACT — the oracle is the plain GROUP BY + HAVING over
    // exactly the windowed subset.
    DeclaredQuery(
      "q_heavy_hitters_window",
      (s, dir) => {
        import graft.ext.SketchState
        val toks = t(s, dir, "documents")
          .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        SketchState.storedHeavyHittersWindow(s, hhWh(dir), "hh",
          toks.filter(col("doc_id") % 3 =!= 0), col("tok"), k = 30,
          Seq("n2", "n3"))
      },
      setup = Some((s, dir) => {
        import graft.ext.SketchState
        val toks = t(s, dir, "documents")
          .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        SketchState.createHhState(s, hhWh(dir), "hh",
          toks.filter(col("doc_id") % 3 === 0), col("tok"), k = 30)
        SketchState.appendHhState(s, hhWh(dir), "hh",
          toks.filter(col("doc_id") % 3 === 1), col("tok"), k = 30, "n2")
        SketchState.appendHhState(s, hhWh(dir), "hh",
          toks.filter(col("doc_id") % 3 === 2), col("tok"), k = 30, "n3")
      }),
      oracle = Some(s"""WITH tk AS (SELECT unnest(${DuckSql.tokens("text")}) AS key
                           FROM documents WHERE doc_id % 3 <> 0),
                    tot AS (SELECT COUNT(*) AS n FROM tk)
               SELECT key, COUNT(*) AS cnt
               FROM tk, tot
               GROUP BY key, n
               HAVING COUNT(*) * 31 > n""")),

    // PAIRWISE KMV overlap matrix: every source pair's shingle overlap
    // in one statement — the N-way contamination dashboard. One grouped
    // sketch pass over the corpus; the 190 pairs form on a constant-key
    // BHJ over the 20-row sketch relation and each cell folds two ≤k
    // arrays with O(k log k) kernels. Deterministic end to end, so all
    // 190 rows (exact integers AND IEEE estimates) hash-verify.
    DeclaredQuery(
      "q_kmv_matrix",
      (s, dir) => {
        graft.functions.TextExpressions.register(s)
        val sh = Tables.fanOut(t(s, dir, "documents"), col("doc_id"))
          .select(col("source"),
            explode(call_function("text_shingles_all", col("text"), lit(3)))
              .as("g"))
        graft.ext.SketchState.kmvOverlapMatrix(sh, "source", col("g"),
          k = KmvMatrixK)
      },
      Some {
        val k = KmvMatrixK
        s"""WITH tk AS (SELECT source, ${DuckSql.tokens("text")} AS toks
                        FROM documents),
                 sh AS (SELECT source, unnest(${DuckSql.shingles("toks", 3)}) AS g
                        FROM tk),
                 dh AS (SELECT DISTINCT source, ${DuckSql.md5Long("'kmv:' || g")} AS hv
                        FROM sh),
                 bk AS (SELECT source, hv FROM (
                          SELECT source, hv,
                                 row_number() OVER (PARTITION BY source
                                                    ORDER BY hv) AS rn
                          FROM dh)
                        WHERE rn <= $k),
                 prs AS (SELECT a.source AS g_a, b.source AS g_b
                         FROM (SELECT DISTINCT source FROM bk) a
                         JOIN (SELECT DISTINCT source FROM bk) b
                           ON a.source < b.source),
                 mer AS (SELECT p.g_a, p.g_b, s.hv,
                                BOOL_OR(s.source = p.g_a) AS ina,
                                BOOL_OR(s.source = p.g_b) AS inb
                         FROM prs p JOIN bk s
                           ON s.source = p.g_a OR s.source = p.g_b
                         GROUP BY p.g_a, p.g_b, s.hv),
                 rk AS (SELECT g_a, g_b, hv, ina, inb,
                               row_number() OVER (PARTITION BY g_a, g_b
                                                  ORDER BY hv) AS rn
                        FROM mer),
                 u AS (SELECT * FROM rk WHERE rn <= $k)
            SELECT g_a, g_b, CAST($k AS BIGINT) AS k,
                   COUNT(*) AS u_cnt, MAX(hv) AS d,
                   CAST(SUM(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS BIGINT)
                     AS m_both,
                   CASE WHEN COUNT(*) < $k THEN CAST(COUNT(*) AS DOUBLE)
                        ELSE (CAST(${k - 1} AS DOUBLE)
                              * CAST(1152921504606846976 AS DOUBLE))
                             / CAST(MAX(hv) AS DOUBLE) END AS est_union,
                   CASE WHEN COUNT(*) < $k
                        THEN CAST(SUM(CASE WHEN ina AND inb THEN 1 ELSE 0 END)
                                  AS DOUBLE)
                        ELSE (CAST(SUM(CASE WHEN ina AND inb THEN 1 ELSE 0 END)
                                   AS DOUBLE) / CAST($k AS DOUBLE))
                             * ((CAST(${k - 1} AS DOUBLE)
                                 * CAST(1152921504606846976 AS DOUBLE))
                                / CAST(MAX(hv) AS DOUBLE)) END AS est_inter
            FROM u GROUP BY g_a, g_b"""
      }),

    // COUNT-MIN point-frequency estimates: the frequency question for
    // ARBITRARY keys (Misra-Gries only answers it for the heavy tail) —
    // a fixed 4x512 counter grid built in one corpus pass, probed by the
    // tokens of a sample of documents. Deterministic md5-seeded hash
    // family + integer counters = the whole grid and min-fold replay in
    // the oracle, so `est` hash-verifies including every collision.
    DeclaredQuery(
      "q_cms",
      (s, dir) => {
        import graft.ext.SketchState
        val toks = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
        val sketch = SketchState.cmsSketch(toks, col("tok"),
          depth = CmsDepth, width = CmsWidth)
        SketchState.cmsEstimate(sketch,
          toks.filter(col("doc_id") % 97 === 0), col("tok"),
          depth = CmsDepth, width = CmsWidth)
      },
      Some(cmsOracle("TRUE"))),

    // STORED count-min state: the same grid maintained incrementally —
    // three nightly batches each persist their own grid partition
    // (O(batch) cost, partition-replace replay), the read SUM-folds.
    // Counter additivity makes the chain EXACT: stored ≡ live ≡ oracle
    // bit-for-bit at any batch split, so this shares q_cms's oracle.
    DeclaredQuery(
      "q_cms_stored",
      (s, dir) => {
        import graft.ext.SketchState
        val toks = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
        val wh = cmsWh(dir)
        SketchState.appendCmsState(s, wh, "cms",
          toks.filter(col("doc_id") % 3 === 1), col("tok"),
          CmsDepth, CmsWidth, "n2")
        SketchState.appendCmsState(s, wh, "cms",
          toks.filter(col("doc_id") % 3 === 2), col("tok"),
          CmsDepth, CmsWidth, "n3")
        SketchState.cmsEstimate(
          SketchState.readCmsSketch(s, wh, "cms"),
          toks.filter(col("doc_id") % 97 === 0), col("tok"),
          CmsDepth, CmsWidth)
      },
      setup = Some((s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
        val wh = cmsWh(dir)
        graft.ext.SketchState.createCmsState(s, wh, "cms",
          toks.filter(col("doc_id") % 3 === 0), col("tok"),
          CmsDepth, CmsWidth)
      }),
      oracle = Some(cmsOracle("TRUE"))),

    // SLIDING-WINDOW count-min read: frequencies over ONLY the last two
    // ingest batches — `_ingest_batch` is the partition column, so the
    // window filter partition-prunes (expired batches cost zero IO;
    // expiry = dropping their directories). Oracle = the grid over
    // exactly the windowed subset of the corpus.
    DeclaredQuery(
      "q_cms_window",
      (s, dir) => {
        import graft.ext.SketchState
        val toks = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
        SketchState.cmsEstimate(
          SketchState.readCmsSketchWindow(s, cmsWh(dir), "cms",
            Seq("n2", "n3")),
          toks.filter(col("doc_id") % 97 === 0), col("tok"),
          CmsDepth, CmsWidth)
      },
      setup = Some((s, dir) => {
        import graft.ext.SketchState
        val toks = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
        SketchState.createCmsState(s, cmsWh(dir), "cms",
          toks.filter(col("doc_id") % 3 === 0), col("tok"),
          CmsDepth, CmsWidth)
        SketchState.appendCmsState(s, cmsWh(dir), "cms",
          toks.filter(col("doc_id") % 3 === 1), col("tok"),
          CmsDepth, CmsWidth, "n2")
        SketchState.appendCmsState(s, cmsWh(dir), "cms",
          toks.filter(col("doc_id") % 3 === 2), col("tok"),
          CmsDepth, CmsWidth, "n3")
      }),
      oracle = Some(cmsOracle("doc_id % 3 IN (1, 2)"))),

    // Bigram collocations with exact fixed-point LIFT (monotone in PMI):
    // bigrams from a zero-shuffle zip_with per document, association as
    // the integer (c_xy·n_uni·1e4) div (c_x·c_y) so both engines land on
    // the identical long — no libm log in the comparison path. minCount
    // prunes the hapax tail before the unigram joins.
    DeclaredQuery(
      "q_collocations",
      (s, dir) =>
        TextAnalysis.collocations(t(s, dir, "documents"), "text", minCount = 5L),
      Some(s"""WITH tk AS (SELECT ${DuckSql.tokens("text")} AS toks
                           FROM documents),
                    bi AS (SELECT toks[i] AS w1, toks[i + 1] AS w2 FROM (
                             SELECT toks,
                                    unnest(generate_series(1, len(toks) - 1)) AS i
                             FROM tk)),
                    uni AS (SELECT unnest(toks) AS w FROM tk),
                    uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
                    tot AS (SELECT COUNT(*) AS n_uni FROM uni),
                    bc AS (SELECT w1, w2, COUNT(*) AS c_xy FROM bi
                           GROUP BY w1, w2 HAVING COUNT(*) >= 5)
               SELECT w1, w2, c_xy, ux.c AS c_x, uy.c AS c_y, n_uni,
                      (c_xy * n_uni * 10000) // (ux.c * uy.c) AS lift_fp
               FROM bc JOIN uc ux ON ux.w = bc.w1
                       JOIN uc uy ON uy.w = bc.w2, tot""")),

    // Dataset-card statistics: per (source, lang) doc/token/quality
    // rollup — the summary table a corpus release ships with. All-integer
    // aggregates (sums, not means) so the compare is exact.
    DeclaredQuery(
      "q_corpus_stats",
      (s, dir) =>
        TextAnalysis.withTextStats(t(s, dir, "documents"), "text")
          .groupBy(col("source"), col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("total_tokens"),
            sum(col("quality_score")).cast("long").as("quality_sum"),
            sum(when(col("quality_score") >= 4, 1).otherwise(0)).cast("long")
              .as("n_high_quality")),
      Some(s"""WITH st AS (SELECT source, lang,
                             len(${DuckSql.tokens("text")}) AS n_tokens,
                             ${DuckSql.qualityScore("text", DuckSql.tokens("text"))} AS qs
                           FROM documents)
               SELECT source, lang,
                      COUNT(*) AS n_docs,
                      CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                      CAST(SUM(qs) AS BIGINT) AS quality_sum,
                      CAST(SUM(CASE WHEN qs >= 4 THEN 1 ELSE 0 END) AS BIGINT)
                        AS n_high_quality
               FROM st GROUP BY source, lang""")),

    // BM25 retrieval (k1=6/5, b=3/4): exact rational tf-saturation +
    // length normalization — every weight an exact BIGINT in both engines.
    DeclaredQuery(
      "q_bm25_search",
      (s, dir) =>
        graft.ext.Relevance.searchBm25(t(s, dir, "documents"), col("text"),
          "doc_id", Seq("spark", "join", "stream"), k = 25),
      Some(s"""WITH ${Bm25Ctes}
               SELECT doc_id, score FROM sc
               ORDER BY score DESC, doc_id ASC LIMIT 25""")),

    // Retrieval EVALUATION: per-query exact recall/rank stats for a
    // deterministic term-frequency ranking against a positional ground
    // truth (term within the first 50 tokens) — the measurement operator
    // for the retrieval stack, all-integer so it hash-verifies. The truth
    // signal deliberately differs from the ranking signal (position vs
    // frequency) so hit counts are non-trivial.
    DeclaredQuery(
      "q_retrieval_eval",
      (s, dir) => {
        val terms = Seq("spark", "join", "stream")
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        val qd = docs.withColumn("query_id",
          explode(array(terms.map(lit): _*)))
        val scored = qd
          .withColumn("c", size(filter(col("toks"), x => x === col("query_id"))))
          .filter(col("c") > 0)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("query_id")
          .orderBy(col("c").desc, col("doc_id").asc)
        val results = scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select("query_id", "doc_id", "rank")
        val truth = qd
          .filter(array_contains(slice(col("toks"), 1, 50), col("query_id")))
          .select("query_id", "doc_id")
        graft.ext.Relevance.evalRetrieval(results, truth,
          "query_id", "doc_id", "rank", k = 10)
      },
      Some(s"""WITH tk AS (SELECT doc_id, ${DuckSql.tokens("text")} AS toks
                           FROM documents),
                    qd AS (SELECT query_id, doc_id, toks FROM tk
                           CROSS JOIN (SELECT unnest(['spark', 'join', 'stream'])
                                       AS query_id)),
                    scored AS (SELECT query_id, doc_id,
                                      len(list_filter(toks, x -> x = query_id)) AS c
                               FROM qd
                               WHERE len(list_filter(toks, x -> x = query_id)) > 0),
                    ranked AS (SELECT query_id, doc_id,
                                 ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY c DESC, doc_id ASC) AS rnk
                               FROM scored),
                    res AS (SELECT * FROM ranked WHERE rnk <= 10),
                    truth AS (SELECT query_id, doc_id FROM qd
                              WHERE list_contains(toks[1:50], query_id)),
                    nrel AS (SELECT query_id, COUNT(*) AS n_rel FROM truth
                             GROUP BY query_id),
                    hits AS (SELECT r.query_id, r.rnk FROM res r
                             JOIN truth tr ON tr.query_id = r.query_id
                                          AND tr.doc_id = r.doc_id),
                    perq AS (SELECT query_id, COUNT(*) AS n_hits,
                                    MIN(rnk) AS first_hit_rank
                             FROM hits GROUP BY query_id)
               SELECT nrel.query_id, n_rel,
                      CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits_at_k,
                      CAST(first_hit_rank AS BIGINT) AS first_hit_rank
               FROM nrel LEFT JOIN perq ON perq.query_id = nrel.query_id""")),

    // HYBRID retrieval: BM25 keyword ranks ⊕ embedding-cosine ranks via
    // Reciprocal Rank Fusion (k=60) in fixed-point integers — ranks, not
    // raw scores, cross the engine boundary, so the fusion is hash-exact.
    DeclaredQuery(
      "q_hybrid_search",
      (s, dir) =>
        graft.ext.Relevance.hybridTopK(
          t(s, dir, "documents"), col("text"), "doc_id",
          Seq("spark", "join", "stream"),
          t(s, dir, "embeddings"), "vec_id", col("embedding"),
          queryVecId = 100L, k = 10),
      Some(s"""WITH ${Bm25Ctes},
                    bmp AS (SELECT doc_id, score FROM sc
                            ORDER BY score DESC, doc_id ASC LIMIT 25),
                    bmr AS (SELECT doc_id,
                              ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rt
                            FROM bmp),
                    ${DuckSql.EmbCte},
                    q AS (SELECT e, nrm FROM emb WHERE vec_id = 100),
                    vs AS (SELECT v.vec_id, ${DuckSql.cosine("v", "q")} AS cos
                           FROM emb v CROSS JOIN q q
                           WHERE v.vec_id <> 100
                           ORDER BY cos DESC, v.vec_id ASC LIMIT 25),
                    vr AS (SELECT vec_id,
                              ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id ASC) AS rv
                            FROM vs),
                    f AS (SELECT COALESCE(bmr.doc_id, vr.vec_id) AS doc_id,
                                 COALESCE(1000000 // (60 + rt), 0)
                                   + COALESCE(1000000 // (60 + rv), 0) AS rrf
                          FROM bmr FULL OUTER JOIN vr ON bmr.doc_id = vr.vec_id)
               SELECT doc_id, CAST(rrf AS BIGINT) AS rrf FROM f
               ORDER BY rrf DESC, doc_id ASC LIMIT 10""")),

    // Content fingerprints: exact md5 of normalized text + winnowing-style
    // min-hash over 8-char rolling windows.
    DeclaredQuery(
      "q_fingerprint",
      (s, dir) =>
        t(s, dir, "documents").select(
          col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp"),
          TextAnalysis.rollingFingerprint(col("text")).as("rfp")),
      Some(s"""WITH n AS (SELECT doc_id, ${DuckSql.normText("text")} AS norm
                          FROM documents),
                    g AS (SELECT doc_id, norm,
                                 CASE WHEN length(norm) >= 8
                                      THEN list_transform(
                                             generate_series(1, length(norm) - 7),
                                             i -> substr(norm, i, 8))
                                      ELSE [norm] END AS grams
                          FROM n)
               SELECT doc_id, md5(norm) AS fp,
                      list_min(list_transform(grams,
                        x -> ${DuckSql.md5Long("x")})) AS rfp
               FROM g""")),

    // Unicode tokenization end-to-end: a fixed multilingual prefix
    // (Cyrillic with case, accented Latin, CJK + fullwidth digit, Arabic
    // digits) concatenated onto real corpus text must produce non-empty,
    // script-bearing tokens through the WHOLE stack — the declarative
    // tokenizer (n_tokens/first_tokens), the imperative text_shingles
    // kernel (n_shingles — same TokenSplitRegex constant), and the BPE
    // pre-tokenizer regex (n_bpe_tokens). Before the \p{L}\p{N} tokenizer
    // these columns were empty/zero for non-Latin text, silently no-oping
    // dedup, BPE, and retrieval on the majority of a web-scale corpus.
    // Char classes used here are identical in Java regex and RE2.
    DeclaredQuery(
      "q_tokens_unicode",
      (s, dir) => {
        graft.functions.TextExpressions.register(s)
        val docs = t(s, dir, "documents")
          .filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"),
            concat(lit(UnicodePrefix + " "), col("text")).as("mtext"))
        val toks = TextAnalysis.tokens(col("mtext"))
        docs.select(
          col("doc_id"),
          size(toks).as("n_tokens"),
          concat_ws("|", slice(toks, 1, 12)).as("first_tokens"),
          size(filter(toks, x => x.rlike("[а-яё]")))
            .as("n_cyrillic"),
          size(filter(toks, x => x.rlike("[一-龥０-９]")))
            .as("n_cjk"),
          size(call_function("text_shingles", col("mtext"), lit(3)))
            .as("n_shingles"),
          TextAnalysis.bpeTokenCount(col("mtext")).as("n_bpe_tokens"))
      },
      Some(s"""WITH m AS (SELECT doc_id, '$UnicodePrefix' || ' ' || text AS mtext
                          FROM documents WHERE doc_id % 10 = 0),
                    tk AS (SELECT doc_id, mtext,
                                  ${DuckSql.tokens("mtext")} AS toks
                           FROM m)
               SELECT doc_id,
                      len(toks) AS n_tokens,
                      array_to_string(toks[1:12], '|') AS first_tokens,
                      len(list_filter(toks,
                        x -> regexp_matches(x, '[а-яё]')))
                        AS n_cyrillic,
                      len(list_filter(toks,
                        x -> regexp_matches(x, '[一-龥０-９]')))
                        AS n_cjk,
                      len(list_distinct(${DuckSql.shingles("toks", 3)}))
                        AS n_shingles,
                      ${DuckSql.bpeCount("mtext")} AS n_bpe_tokens
               FROM tk""")),

    // Stupid-Backoff bigram LM scoring (CCNet-style quality filter): the
    // model trains on the even-doc_id half (the "trusted corpus") and
    // scores EVERY document, so the backoff branch genuinely fires on
    // odd-doc vocabulary the model never saw. Fixed-point integer scores
    // — the oracle replays training and scoring exactly.
    DeclaredQuery(
      "q_lm_score",
      (s, dir) => {
        import graft.ext.LangModel
        val d = t(s, dir, "documents")
        val train = d.filter(col("doc_id") % 2 === 0)
        LangModel.scoreDocs(d, col("text"), "doc_id",
          LangModel.unigramCounts(train, col("text")),
          LangModel.bigramCounts(train, col("text"), "doc_id"))
      },
      Some(LmOracleSql)),

    // The SAME scoring read from PERSISTED count relations (bucketed on
    // their scoring join keys) — the nightly shape: train once, score
    // every batch with zero train-corpus scans. Same oracle: stored ≡
    // live is the check.
    DeclaredQuery(
      "q_lm_score_stored",
      (s, dir) => {
        import graft.ext.LangModel
        val d = t(s, dir, "documents")
        val train = d.filter(col("doc_id") % 2 === 0)
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val wh = s"/tmp/graft_lmwh$tag"
        LangModel.writeLmState(train, col("text"), "doc_id", wh, "lm", 8)
        LangModel.scoreStored(s, "lm", d, col("text"), "doc_id")
      },
      Some(LmOracleSql)),

    // LOG-STRUCTURED LM count state: the trusted corpus arrives in TWO
    // batches of delta rows (append-only, O(batch) each — never a state
    // rewrite), with batch 2 appended TWICE to exercise the ledger's
    // replay no-op; scoring merges deltas at read time (co-located
    // per-key sums on the bucket layout). The oracle is the from-scratch
    // train on the union — delta-sum ≡ retrain is the check.
    DeclaredQuery(
      "q_lm_appended",
      (s, dir) => {
        import graft.ext.LangModel
        val d = t(s, dir, "documents")
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        LangModel.appendLmDelta(s, s"lmdelta$tag",
          d.filter(col("doc_id") % 4 === 2), col("text"), "doc_id", 8,
          batchTag = "b2")
        // at-least-once replay of batch 2: the applied-ledger makes it a
        // no-op — double-counting here would hash-fail the oracle
        LangModel.appendLmDelta(s, s"lmdelta$tag",
          d.filter(col("doc_id") % 4 === 2), col("text"), "doc_id", 8,
          batchTag = "b2")
        LangModel.scoreDeltaStored(s, s"lmdelta$tag", d, col("text"), "doc_id")
      },
      setup = Some((s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.ext.LangModel.writeLmDeltaState(
          t(s, dir, "documents").filter(col("doc_id") % 4 === 0),
          col("text"), "doc_id", s"/tmp/graft_lmdelta$tag", s"lmdelta$tag",
          8, batchTag = "b1")
      }),
      oracle = Some(LmOracleSql)),

    // Unicode NFC normalization (native expression wrapping
    // java.text.Normalizer; DuckDB's nfc_normalize is the twin — both
    // implement TR-15, so outputs are byte-identical): visually-equal
    // composed/decomposed strings hash differently and silently defeat
    // exact dedup, so this canonicalization must run before any hashing.
    // A decomposed sequence (e + U+0301) is planted on every row so the
    // normalize path (not just the already-NFC fast path) is exercised.
    DeclaredQuery(
      "q_nfc_normalize",
      (s, dir) => {
        graft.functions.TextExpressions.register(s)
        // the literal is DECOMPOSED on purpose: 'e' + U+0301 combining
        // acute (renders like "Café"; the composed form would take the
        // isNormalized fast path and never exercise the normalize)
        val planted = concat(col("text"), lit(" Cafe\u0301"))
        t(s, dir, "documents")
          .select(col("doc_id"), planted.as("__raw"),
            call_function("nfc_normalize", planted).as("nfc_text"))
          .withColumn("changed", col("nfc_text") =!= col("__raw"))
          .select("doc_id", "nfc_text", "changed")
      },
      Some("""SELECT doc_id,
                     nfc_normalize(text || ' Cafe' || chr(769)) AS nfc_text,
                     nfc_normalize(text || ' Cafe' || chr(769))
                       <> (text || ' Cafe' || chr(769)) AS changed
              FROM documents""")),

    // COMPACTION of the log-structured LM state: fold the accumulated
    // delta rows to one row per key, then score — a pure representation
    // change, pinned by scoring against the SAME from-scratch oracle
    // post-compaction.
    DeclaredQuery(
      "q_lm_compacted",
      (s, dir) => {
        import graft.ext.LangModel
        val d = t(s, dir, "documents")
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val wh = s"/tmp/graft_lmcomp$tag"
        LangModel.appendLmDelta(s, s"lmcomp$tag",
          d.filter(col("doc_id") % 4 === 2), col("text"), "doc_id", 8,
          batchTag = "b2")
        LangModel.compactLmDeltaState(s, wh, s"lmcomp$tag", 8)
        LangModel.scoreDeltaStored(s, s"lmcomp$tag", d, col("text"), "doc_id")
      },
      setup = Some((s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.ext.LangModel.writeLmDeltaState(
          t(s, dir, "documents").filter(col("doc_id") % 4 === 0),
          col("text"), "doc_id", s"/tmp/graft_lmcomp$tag", s"lmcomp$tag",
          8, batchTag = "b1")
      }),
      oracle = Some(LmOracleSql)),

    // Keyword-side hard negatives: the documents ranked 4..13 under the
    // BM25 query — lexically close to the top hits but not them, the
    // negatives a reranker trains against. Rank window over the
    // TakeOrdered-bounded 13-row pool only.
    DeclaredQuery(
      "q_text_negatives",
      (s, dir) =>
        graft.ext.Relevance.hardNegativesBm25(t(s, dir, "documents"),
          col("text"), "doc_id", Seq("spark", "join", "stream"),
          skipTop = 3, negK = 10),
      Some(s"""WITH ${Bm25Ctes},
                    pool AS (SELECT doc_id, score FROM sc
                             ORDER BY score DESC, doc_id ASC LIMIT 13),
                    rk AS (SELECT doc_id, score,
                                  ROW_NUMBER() OVER (ORDER BY score DESC,
                                                     doc_id ASC) AS rank
                           FROM pool)
               SELECT doc_id AS negative_id, score,
                      CAST(rank - 3 AS INT) AS neg_rank
               FROM rk WHERE rank > 3""")),

    // CCNet-style perplexity bucketing: tercile cuts over the LM
    // avg_score (exact interpolated percentiles, 1-row cut relation via
    // constant-key BHJ), each doc labeled head/middle/tail. The oracle
    // replays training, scoring, AND the quantile_cont cut.
    DeclaredQuery(
      "q_lm_buckets",
      (s, dir) => {
        import graft.ext.LangModel
        val d = t(s, dir, "documents")
        val train = d.filter(col("doc_id") % 2 === 0)
        LangModel.scoreBuckets(
          LangModel.scoreDocs(d, col("text"), "doc_id",
            LangModel.unigramCounts(train, col("text")),
            LangModel.bigramCounts(train, col("text"), "doc_id")),
          "doc_id")
      },
      Some(s"""WITH scored AS ($LmOracleSql),
                    cuts AS (SELECT quantile_cont(avg_score, 1.0/3) AS c_lo,
                                    quantile_cont(avg_score, 2.0/3) AS c_hi
                             FROM scored)
               SELECT doc_id, avg_score,
                      CASE WHEN avg_score >= c_hi THEN 'head'
                           WHEN avg_score >= c_lo THEN 'middle'
                           ELSE 'tail' END AS ppl_bucket
               FROM scored CROSS JOIN cuts""")),

    // Exact-phrase retrieval, LIVE path: a zero-shuffle higher-order
    // filter over each row's own token array — the predicate bag-of-words
    // scoring can't express. Top-10 by occurrence count.
    DeclaredQuery(
      "q_phrase_search",
      // the index-free path's cost IS tokenizing every document — fan
      // the degenerate single-row-group scan out so that per-doc CPU
      // parallelizes (a no-op at healthy scan parallelism; the operator
      // itself still adds zero exchanges)
      (s, dir) =>
        graft.ext.Relevance.phraseSearch(
          Tables.fanOut(t(s, dir, "documents"), col("doc_id")),
          col("text"), "doc_id", PhraseTerms, k = 10),
      Some(PhraseOracleSql)),

    // The SAME phrase query over a PERSISTED positional inverted index
    // ((term, doc, pos), bucketed on term): term-filtered posting slices
    // intersected on (doc, start) — zero corpus scans. Same oracle:
    // stored ≡ live is the check.
    DeclaredQuery(
      "q_phrase_stored",
      (s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        // gate against the SAME dir the index writes to (graft_poswh, not
        // graft_wh) — the r6 mismatch made the gate always fail and
        // silently rebuilt the index on every invocation
        if (!Tables.bucketedStateLive(s, s"/tmp/graft_poswh$tag",
            Seq(s"posidx${tag}_postings")))
          graft.ext.Relevance.writePositionalIndex(t(s, dir, "documents"),
            col("text"), "doc_id", s"/tmp/graft_poswh$tag", s"posidx$tag",
            numBuckets = 8)
        graft.ext.Relevance.phraseSearchStored(s, s"posidx$tag", "doc_id",
          PhraseTerms, k = 10)
      },
      Some(PhraseOracleSql)))

  /** The declared phrase query's terms — a trigram present in the corpus
    * at the verify and bench scale factors.
    */
  private val PhraseTerms = Seq("stream", "table", "hash")

  /** Exact-phrase oracle: position-indexed conjunction over the token
    * list, shared by q_phrase_search and q_phrase_stored (the stored
    * index is the same computation persisted).
    */
  private lazy val PhraseOracleSql: String =
    s"""WITH tk AS (SELECT doc_id, ${DuckSql.tokens("text")} AS toks FROM documents),
            pc AS (SELECT doc_id,
                          len(list_filter(generate_series(1, len(toks) - 2),
                            i -> toks[i] = 'stream' AND toks[i+1] = 'table'
                                 AND toks[i+2] = 'hash')) AS phrase_tf
                   FROM tk)
       SELECT doc_id, CAST(phrase_tf AS BIGINT) AS phrase_tf
       FROM pc WHERE phrase_tf > 0
       ORDER BY phrase_tf DESC, doc_id ASC LIMIT 10"""

  /** Stupid-Backoff LM oracle: train on even doc_ids, score all docs —
    * shared by q_lm_score and q_lm_score_stored.
    */
  private lazy val LmOracleSql: String =
    s"""WITH tk AS (SELECT doc_id, ${DuckSql.tokens("text")} AS toks FROM documents),
            pos AS (SELECT doc_id,
                           unnest(list_transform(generate_series(1, len(toks) - 1),
                             i -> {'w1': toks[i], 'w2': toks[i + 1]}),
                             recursive := true)
                    FROM tk),
            ttk AS (SELECT doc_id, toks FROM tk WHERE doc_id % 2 = 0),
            ug AS (SELECT w, COUNT(*) AS c1
                   FROM (SELECT unnest(toks) AS w FROM ttk) GROUP BY w),
            bg AS (SELECT w1, w2, COUNT(*) AS c2
                   FROM (SELECT doc_id,
                                unnest(list_transform(generate_series(1, len(toks) - 1),
                                  i -> {'w1': toks[i], 'w2': toks[i + 1]}),
                                  recursive := true)
                         FROM ttk)
                   GROUP BY w1, w2),
            tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n FROM ug),
            sc AS (SELECT p.doc_id,
                          CASE WHEN b.c2 IS NOT NULL
                               THEN (1000000 * b.c2) // u1.c1
                               ELSE (2 * 1000000 * coalesce(u2.c1, 0)) // (5 * tot.n)
                          END AS s
                   FROM pos p
                   LEFT JOIN bg b ON b.w1 = p.w1 AND b.w2 = p.w2
                   LEFT JOIN ug u1 ON u1.w = p.w1
                   LEFT JOIN ug u2 ON u2.w = p.w2
                   CROSS JOIN tot)
       SELECT doc_id, CAST(SUM(s) AS BIGINT) AS lm_score,
              COUNT(*) AS n_bigrams,
              CAST(SUM(s) AS BIGINT) // COUNT(*) AS avg_score
       FROM sc GROUP BY doc_id"""

  /** BM25 rational-arithmetic CTE chain ending in `sc(doc_id, score)` —
    * shared by q_bm25_search and q_hybrid_search so the 44/20/6/18
    * coefficients exist in exactly one rendering per engine.
    */
  /** Fixed-point TF-IDF oracle, shared by q_tfidf_search and
    * q_tfidf_stored (the stored index is the same computation persisted).
    */
  private lazy val TfidfOracleSql: String =
    s"""WITH tk AS (SELECT doc_id, ${DuckSql.tokens("text")} AS toks
                    FROM documents),
             ex AS (SELECT doc_id, unnest(toks) AS term FROM tk),
             tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM ex
                    WHERE term IN ('spark', 'join', 'stream')
                    GROUP BY doc_id, term),
             dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
             n AS (SELECT COUNT(*) AS n FROM documents),
             sc AS (SELECT doc_id,
                           CAST(SUM(tf * (((n.n + 1) * 1000000) // (df + 1)))
                                AS BIGINT) AS score
                    FROM tf JOIN dfreq USING (term) CROSS JOIN n
                    GROUP BY doc_id)
        SELECT doc_id, score FROM sc
        ORDER BY score DESC, doc_id ASC LIMIT 25"""

  private lazy val Bm25Ctes: String =
    s"""tk AS (SELECT doc_id, ${DuckSql.tokens("text")} AS toks
               FROM documents),
        dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tk),
        tot AS (SELECT CAST(SUM(dl) AS BIGINT) AS tt,
                       CAST(COUNT(*) AS BIGINT) AS n FROM dl),
        ex AS (SELECT doc_id, unnest(toks) AS term FROM tk),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM ex
               WHERE term IN ('spark', 'join', 'stream')
               GROUP BY doc_id, term),
        dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        sc AS (SELECT doc_id,
                      CAST(SUM(
                        ((((tot.n + 1) * 1000000) // (df + 1)) *
                         ((44 * tot.tt * tf * 1000000) //
                          (20 * tot.tt * tf + 6 * tot.tt + 18 * dl.dl * tot.n)))
                        // 1000000) AS BIGINT) AS score
               FROM tf JOIN dfreq USING (term)
                       JOIN dl USING (doc_id) CROSS JOIN tot
               GROUP BY doc_id)"""
}
