package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DeclaredQuery
import graft.ext.{Sampling, TextAnalysis}
import graft.functions.Hashing
import graft.io.Tables

/** Deterministic corpus-management queries (north-star §pipeline):
  * reproducible sampling and PII redaction. All decisions are pure
  * functions of the data (hash-keyed), so the oracle replays them exactly
  * and a pipeline re-run on different partitioning yields identical rows.
  */
object SamplingQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.testTable(s, dir, name)

  val all: Seq[DeclaredQuery] = Seq(

    // Hash sampling: ~20% of documents, stable across partitioning.
    DeclaredQuery(
      "q_sample_hash",
      (s, dir) =>
        Sampling.hashSample(t(s, dir, "documents"), "doc_id", 0.2)
          .select("doc_id"),
      Some(s"""SELECT doc_id FROM documents
               WHERE ${DuckSql.md5Long("doc_id::VARCHAR")} % ${Sampling.HashBuckets}
                     < ${(0.2 * Sampling.HashBuckets).toLong}""")),

    // Token-proportional (length-weighted) document sampling: survival
    // probability min(n_chars, 2000)/2000 via a seeded per-row lottery —
    // doc-level draws approximating char-uniform draws. Integer cut
    // arithmetic replayed exactly by the oracle.
    DeclaredQuery(
      "q_weighted_sample",
      (s, dir) =>
        Sampling.weightedSample(t(s, dir, "documents"), "doc_id",
            col("n_chars"), maxWeight = 2000L)
          .select("doc_id"),
      Some(s"""SELECT doc_id FROM documents
               WHERE ${Hashing.md5LongSeededSql("doc_id::VARCHAR",
                 Sampling.WeightedSeed)} % ${Sampling.HashBuckets}
                     < least(n_chars, 2000) * ${Sampling.HashBuckets} // 2000""")),

    // Stratified sample: 5 vectors per label by ascending id-hash.
    DeclaredQuery(
      "q_sample_stratified",
      (s, dir) =>
        Sampling.stratifiedSample(t(s, dir, "embeddings"), "label", "vec_id", 5)
          .select("vec_id", "label"),
      Some(s"""SELECT vec_id, label FROM (
                 SELECT vec_id, label,
                        ROW_NUMBER() OVER (
                          PARTITION BY label
                          ORDER BY ${DuckSql.md5Long("vec_id::VARCHAR")} ASC,
                                   vec_id ASC) AS rn
                 FROM embeddings)
               WHERE rn <= 5""")),

    // Training-mix weighting: downsample to a 10:4:3:2:1 language mixture
    // (en/de/fr/es/zh), integer-exact sizing + hash lottery — the oracle
    // replays the whole computation including the per-group thresholds.
    DeclaredQuery(
      "q_mixture_sample",
      (s, dir) =>
        Sampling.mixtureSample(t(s, dir, "documents"), "lang", "doc_id",
            Seq("en" -> 10L, "de" -> 4L, "fr" -> 3L, "es" -> 2L, "zh" -> 1L))
          .select("doc_id", "lang", "source"),
      Some(s"""WITH w(lang, wt) AS (VALUES ('en', 10), ('de', 4), ('fr', 3),
                                           ('es', 2), ('zh', 1)),
                    cnt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
                            FROM documents JOIN w USING (lang) GROUP BY lang),
                    tt AS (SELECT CASE WHEN COUNT(*) < 5 THEN 0
                                       ELSE MIN((n * 20) // wt) END AS t
                           FROM cnt JOIN w USING (lang)),
                    cut AS (SELECT lang, (((tt.t * wt) // 20) * ${Sampling.HashBuckets}) // n AS cut
                            FROM cnt JOIN w USING (lang) CROSS JOIN tt)
               SELECT doc_id, lang, source
               FROM documents JOIN cut USING (lang)
               WHERE ${DuckSql.md5LongSeeded("doc_id::VARCHAR", Sampling.MixtureSeed)}
                     % ${Sampling.HashBuckets} < cut""")),

    // Deterministic 8:1:1 train/val/test assignment via contiguous
    // id-hash windows — the oracle inlines the same integer cut points.
    DeclaredQuery(
      "q_split_assign",
      (s, dir) =>
        Sampling.splitAssign(t(s, dir, "documents"), "doc_id",
            Seq("train" -> 8L, "val" -> 1L, "test" -> 1L))
          .select("doc_id", "split"),
      Some {
        val c1 = 8L * Sampling.HashBuckets / 10
        val c2 = 9L * Sampling.HashBuckets / 10
        s"""SELECT doc_id,
                   CASE WHEN h < $c1 THEN 'train'
                        WHEN h < $c2 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         ${DuckSql.md5Long("doc_id::VARCHAR")} % ${Sampling.HashBuckets} AS h
                  FROM documents)"""
      }),

    // PII redaction over planted emails/phones (the raw corpus carries
    // none — planting makes every row exercise both patterns).
    DeclaredQuery(
      "q_redact_pii",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            TextAnalysis.redactPii(
              concat(col("text"), lit(" contact: user"),
                col("doc_id").cast("string"), lit("@example.com or +1 (555) 010-"),
                col("doc_id").cast("string"))).as("clean")),
      Some(s"""SELECT doc_id,
                      regexp_replace(regexp_replace(
                        text || ' contact: user' || doc_id
                             || '@example.com or +1 (555) 010-' || doc_id,
                        '${TextAnalysis.EmailPattern}', '<EMAIL>', 'g'),
                        '${TextAnalysis.PhonePattern}', '<PHONE>', 'g') AS clean
               FROM documents""")),

    // Temperature-scaled mixture PLAN (T=2): per-language isqrt(tokens)
    // weights + budget shares + repeat epochs — the multilingual
    // sampling audit (mT5/XLM-R temperature sampling made exact-integer).
    // The oracle replays tokenize, isqrt (+/-1 correction), and the div
    // arithmetic bit-for-bit.
    DeclaredQuery(
      "q_temp_mix_plan",
      (s, dir) =>
        Sampling.temperatureMixPlan(t(s, dir, "documents"), "lang",
          size(TextAnalysis.tokens(col("text"))), budgetTokens = 1000000000L),
      Some(TempWeightCtes +
        s"""SELECT lang, n_docs, n_tokens, mix_weight,
                   (${Sampling.HashBuckets}::BIGINT * mix_weight) // ws AS share_ppm,
                   (1000::BIGINT * 1000000000 * mix_weight) // (ws * n_tokens)
                     AS epochs_milli
            FROM w CROSS JOIN tot""")),

    // The sampling half: ~250 docs drawn with per-language expected
    // counts proportional to the same T=2 weights, via the seeded
    // per-row lottery (partition-invariant; binomial around the quota).
    DeclaredQuery(
      "q_temp_mix_sample",
      (s, dir) =>
        Sampling.temperatureMixSample(t(s, dir, "documents"), "lang",
            "doc_id", size(TextAnalysis.tokens(col("text"))),
            targetDocs = 250)
          .select("doc_id", "lang"),
      Some(TempWeightCtes +
        s""", cut AS (SELECT lang,
                             (250::BIGINT * mix_weight * ${Sampling.HashBuckets})
                               // (ws * n_docs) AS cut
                      FROM w CROSS JOIN tot)
            SELECT doc_id, lang FROM documents JOIN cut USING (lang)
            WHERE ${DuckSql.md5LongSeeded("doc_id::VARCHAR", Sampling.TempMixSeed)}
                  % ${Sampling.HashBuckets} < cut""")))

  /** Shared CTE chain for the temperature-mix pair: per-language token
    * totals, the exact-isqrt weight (floor(sqrt) + the two integer
    * fixups), and the 1-row weight total.
    */
  private lazy val TempWeightCtes: String =
    s"""WITH tk AS (SELECT doc_id, lang, len(${DuckSql.tokens("text")}) AS nt
                    FROM documents),
             g AS (SELECT lang, COUNT(*) AS n_docs,
                          CAST(SUM(nt) AS BIGINT) AS n_tokens
                   FROM tk GROUP BY lang),
             w0 AS (SELECT lang, n_docs, n_tokens,
                           CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                             AS s0
                    FROM g),
             w1 AS (SELECT lang, n_docs, n_tokens,
                           CASE WHEN s0 * s0 > n_tokens THEN s0 - 1 ELSE s0 END
                             AS s1
                    FROM w0),
             w AS (SELECT lang, n_docs, n_tokens,
                          CASE WHEN (s1 + 1) * (s1 + 1) <= n_tokens THEN s1 + 1
                               ELSE s1 END AS mix_weight
                   FROM w1),
             tot AS (SELECT CAST(SUM(mix_weight) AS BIGINT) AS ws FROM w)
     """
}
