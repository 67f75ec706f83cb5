package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DeclaredQuery
import graft.ext.{Curation, TextAnalysis}
import graft.io.Tables

/** Corpus-curation queries (north-star §curation): benchmark
  * decontamination and token-budget sequence packing over `documents`.
  */
object CurationQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.testTable(s, dir, name)

  private def shardDir(dir: String): String =
    s"/tmp/graft_shards${dir.replaceAll("[^a-zA-Z0-9]", "_")}"

  val all: Seq[DeclaredQuery] = Seq(

    // Shard-export INTEGRITY MANIFEST: one row per training shard with
    // its row count and two order-insensitive id checksums — what a
    // training job verifies before reading 100 TB of shards, at the cost
    // of one column-pruned id scan. Shard assignment and both folds are
    // md5/integer-deterministic, so the whole manifest hash-verifies
    // against the oracle's replay of the shard hash.
    DeclaredQuery(
      "q_shard_manifest",
      (s, dir) =>
        Tables.shardManifest(
          s.read.parquet(shardDir(dir)), "doc_id"),
      setup = Some((s, dir) =>
        Tables.writeTrainingShards(
          t(s, dir, "documents").select("doc_id", "text"), "doc_id",
          shardDir(dir), nShards = 8)),
      oracle = Some(s"""WITH h AS (SELECT ${DuckSql.md5Long("doc_id::VARCHAR")} AS hv
                          FROM documents)
               SELECT hv % 8 AS shard, COUNT(*) AS n_rows,
                      CAST(SUM(hv % 1000000007) AS BIGINT) AS id_sum,
                      bit_xor(hv) AS id_xor
               FROM h GROUP BY hv % 8""")),

    // Benchmark decontamination: every 13th doc stands in for the eval
    // set; any corpus doc sharing an 8-gram with it (including the eval
    // docs themselves) is dropped. The benchmark side reduces to distinct
    // shingles (gated broadcast); corpus flows through one semi-join +
    // one anti-join.
    DeclaredQuery(
      "q_decontaminate",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Curation.decontaminate(
            docs.select("doc_id", "text"),
            docs.filter(col("doc_id") % 13 === 0).select("doc_id", "text"),
            col("text"), "doc_id", n = 8)
          .select("doc_id")
      },
      Some(s"""WITH bn AS (SELECT doc_id, text FROM documents WHERE doc_id % 13 = 0),
                    ${DuckSql.shingleCte("documents", 8, "c")},
                    ${DuckSql.shingleCte("bn", 8, "b")},
                    bad AS (SELECT DISTINCT c.doc_id
                            FROM csh c
                            JOIN (SELECT DISTINCT shingle FROM bsh) b
                              USING (shingle))
               SELECT doc_id FROM documents d
               WHERE NOT EXISTS (SELECT 1 FROM bad WHERE bad.doc_id = d.doc_id)""")),

    // Corpus-relative token rarity: per-doc count of occurrences whose
    // CORPUS frequency is < 3, plus total corpus-frequency mass — the
    // corpus-statistics quality screen (CCNet-ish) that per-row ratios
    // can't express. Integer counts + one IEEE division → exact oracle.
    DeclaredQuery(
      "q_rare_tokens",
      (s, dir) =>
        Curation.rareTokenProfile(
          t(s, dir, "documents").select("doc_id", "text"),
          "text", "doc_id", rareBelow = 3L),
      Some(s"""WITH tok AS (SELECT doc_id, unnest(${DuckSql.tokens("text")}) AS tk
                            FROM documents),
                    vocab AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS freq
                              FROM tok GROUP BY tk)
               SELECT doc_id,
                      CAST(COUNT(*) AS BIGINT) AS n_tokens,
                      CAST(SUM(CASE WHEN freq < 3 THEN 1 ELSE 0 END) AS BIGINT)
                        AS rare_count,
                      CAST(SUM(freq) AS BIGINT) AS freq_sum,
                      SUM(CASE WHEN freq < 3 THEN 1 ELSE 0 END)::DOUBLE
                        / COUNT(*) AS rare_ratio
               FROM tok JOIN vocab USING (tk)
               GROUP BY doc_id""")),

    // Token-budget packing: 256-token bins via shard-local prefix sums
    // (md5 shard hash → oracle replays shard assignment exactly).
    DeclaredQuery(
      "q_pack_docs",
      (s, dir) =>
        Curation.packSequences(
            t(s, dir, "documents").select(col("doc_id"),
              size(TextAnalysis.tokens(col("text"))).as("n_tokens")),
            "doc_id", Seq(col("doc_id")), "n_tokens",
            capacity = 256, nShards = 8)
          .select("doc_id", "shard", "n_tokens", "bin_id"),
      Some(s"""WITH tk AS (SELECT doc_id,
                             len(${DuckSql.tokens("text")}) AS n_tokens,
                             ${DuckSql.md5Long("doc_id::VARCHAR")} % 8 AS shard
                           FROM documents),
                    pr AS (SELECT doc_id, shard, n_tokens,
                             COALESCE(SUM(n_tokens) OVER (
                               PARTITION BY shard ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                               0) AS prior
                           FROM tk)
               SELECT doc_id, shard, CAST(n_tokens AS INT) AS n_tokens,
                      CAST(prior // 256 AS BIGINT) AS bin_id
               FROM pr""")),

    // Per-language quality gate: keep the best ~60% of each language by
    // Gopher score. The gate is computed on the score HISTOGRAM (no
    // per-group ranking window); the boundary score is settled by the
    // deterministic hash lottery — the oracle replays quotas, cuts, and
    // the lottery exactly.
    DeclaredQuery(
      "q_quality_gate",
      (s, dir) =>
        Curation.qualityGate(
            t(s, dir, "documents").select("doc_id", "lang", "text"),
            "text", "doc_id", "lang", keepNum = 3L, keepDen = 5L)
          .select("doc_id", "lang", "quality_score"),
      Some(s"""WITH st AS (SELECT doc_id, lang,
                             ${DuckSql.qualityScore("text", DuckSql.tokens("text"))} AS quality_score
                           FROM documents),
                    hist AS (SELECT lang, quality_score, CAST(COUNT(*) AS BIGINT) AS cnt
                             FROM st GROUP BY 1, 2),
                    cum AS (SELECT lang, quality_score, cnt,
                              SUM(cnt) OVER (PARTITION BY lang
                                ORDER BY quality_score DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_incl
                            FROM hist),
                    tot AS (SELECT lang, (SUM(cnt) * 3) // 5 AS k
                            FROM hist GROUP BY lang),
                    cut AS (SELECT lang, quality_score,
                              CASE WHEN cum_incl <= k THEN 1000000
                                   WHEN cum_incl - cnt < k
                                     THEN ((k - (cum_incl - cnt)) * 1000000) // cnt
                                   ELSE 0 END AS cut
                            FROM cum JOIN tot USING (lang))
               SELECT doc_id, lang, CAST(quality_score AS INT) AS quality_score
               FROM st JOIN cut USING (lang, quality_score)
               WHERE ${DuckSql.md5LongSeeded("doc_id::VARCHAR", graft.ext.Sampling.QualityGateSeed)}
                     % 1000000 < cut""")),

    // FLAGSHIP curation chain: exact dedup → per-language quality gate
    // (top 3/5) → benchmark decontamination (8-grams vs every 13th doc) →
    // 10:4:3:2:1 language-mixture sample. Every stage is the library
    // operator; the oracle replays the whole chain in one CTE pipeline —
    // the end-to-end answer is hash-exact, not just each stage alone.
    DeclaredQuery(
      "q_curation_pipeline",
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "lang", "text")
        // each boundary below is consumed ≥2× by its downstream stage
        // (qualityGate: histogram + final join; decontaminate: shingle
        // semi-join + anti-join) — cache all three, not just the last
        val deduped = graft.ext.Dedup.exactDedup(docs, col("text"), "doc_id")
          .cache()
        val gated = Curation
          .qualityGate(deduped, "text", "doc_id", "lang", 3L, 5L)
          .select("doc_id", "lang", "text")
          .cache()
        val bench = docs.filter(col("doc_id") % 13 === 0)
          .select("doc_id", "text")
        val cleaned = Curation
          .decontaminate(gated, bench, col("text"), "doc_id", n = 8)
          .cache() // consumed twice below (mixture counts + final filter)
        graft.ext.Sampling.mixtureSample(cleaned, "lang", "doc_id",
            Seq("en" -> 10L, "de" -> 4L, "fr" -> 3L, "es" -> 2L, "zh" -> 1L))
          .select("doc_id", "lang")
      },
      Some(s"""WITH w1 AS (SELECT doc_id, lang, text,
                             MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
                           FROM documents),
                    dd AS (SELECT doc_id, lang, text FROM w1 WHERE doc_id = keeper),
                    st AS (SELECT doc_id, lang, text,
                             ${DuckSql.qualityScore("text", DuckSql.tokens("text"))} AS qs
                           FROM dd),
                    hist AS (SELECT lang, qs, CAST(COUNT(*) AS BIGINT) AS cnt
                             FROM st GROUP BY 1, 2),
                    cum AS (SELECT lang, qs, cnt,
                              SUM(cnt) OVER (PARTITION BY lang ORDER BY qs DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_incl
                            FROM hist),
                    tot AS (SELECT lang, (SUM(cnt) * 3) // 5 AS k
                            FROM hist GROUP BY lang),
                    qcut AS (SELECT lang, qs,
                               CASE WHEN cum_incl <= k THEN 1000000
                                    WHEN cum_incl - cnt < k
                                      THEN ((k - (cum_incl - cnt)) * 1000000) // cnt
                                    ELSE 0 END AS cut
                             FROM cum JOIN tot USING (lang)),
                    qg AS (SELECT doc_id, lang, text
                           FROM st JOIN qcut USING (lang, qs)
                           WHERE ${DuckSql.md5LongSeeded("doc_id::VARCHAR", graft.ext.Sampling.QualityGateSeed)}
                                 % 1000000 < cut),
                    bn AS (SELECT doc_id, text FROM documents WHERE doc_id % 13 = 0),
                    ${DuckSql.shingleCte("qg", 8, "c")},
                    ${DuckSql.shingleCte("bn", 8, "b")},
                    bad AS (SELECT DISTINCT c.doc_id FROM csh c
                            JOIN (SELECT DISTINCT shingle FROM bsh) b USING (shingle)),
                    dc AS (SELECT doc_id, lang FROM qg
                           WHERE NOT EXISTS (SELECT 1 FROM bad
                                             WHERE bad.doc_id = qg.doc_id)),
                    mw(lang, wt) AS (VALUES ('en', 10), ('de', 4), ('fr', 3),
                                            ('es', 2), ('zh', 1)),
                    cnt2 AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
                             FROM dc JOIN mw USING (lang) GROUP BY lang),
                    tt AS (SELECT CASE WHEN COUNT(*) < 5 THEN 0
                                       ELSE MIN((n * 20) // wt) END AS t
                           FROM cnt2 JOIN mw USING (lang)),
                    mcut AS (SELECT lang, (((tt.t * wt) // 20) * 1000000) // n AS cut
                             FROM cnt2 JOIN mw USING (lang) CROSS JOIN tt)
               SELECT doc_id, lang FROM dc JOIN mcut USING (lang)
               WHERE ${DuckSql.md5LongSeeded("doc_id::VARCHAR", graft.ext.Sampling.MixtureSeed)}
                     % 1000000 < cut""")),

    // Per-domain cap: at most 15 docs per source, chosen by the seeded
    // hash lottery (not crawl order). WindowGroupLimit prunes map-side.
    DeclaredQuery(
      "q_domain_cap",
      (s, dir) =>
        Curation.domainCap(
          t(s, dir, "documents").select("doc_id", "source"),
          "source", "doc_id", maxPerDomain = 15),
      Some(s"""SELECT doc_id, source FROM (
                 SELECT doc_id, source,
                        ROW_NUMBER() OVER (PARTITION BY source ORDER BY
                          ${DuckSql.md5LongSeeded("doc_id::VARCHAR",
                            graft.ext.Curation.DomainCapSeed)} ASC,
                          doc_id ASC) AS rn
                 FROM documents)
               WHERE rn <= 15""")),

    // DSIR-style importance weights: hashed unigram+bigram buckets, the
    // English slice as the target distribution, the whole corpus as raw.
    // Fixed-point difference-of-smoothed-probabilities variant (libm
    // log-ratios cannot hash-verify) — see Curation.importanceWeights.
    DeclaredQuery(
      "q_dsir_weights",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Curation.importanceWeights(
          docs.select("doc_id", "text"),
          docs.filter(col("lang") === "en").select("doc_id", "text"),
          col("text"), "doc_id", numBuckets = 256)
      },
      Some {
        val tk = DuckSql.tokens("text")
        s"""WITH tk AS (SELECT doc_id, lang, $tk AS toks FROM documents),
                  feats AS (
                    SELECT doc_id, lang,
                           ${DuckSql.md5Long("'dsir:' || w")} % 256 AS f
                    FROM (SELECT doc_id, lang, unnest(toks) AS w FROM tk)
                    UNION ALL
                    SELECT doc_id, lang,
                           ${DuckSql.md5Long("'dsir:' || w1 || ' ' || w2")} % 256 AS f
                    FROM (SELECT doc_id, lang,
                                 unnest(list_transform(
                                   generate_series(1, len(toks) - 1),
                                   i -> {'w1': toks[i], 'w2': toks[i + 1]}),
                                   recursive := true)
                          FROM tk)),
                  tgt AS (SELECT f, COUNT(*) AS t FROM feats
                          WHERE lang = 'en' GROUP BY f),
                  rw AS (SELECT f, COUNT(*) AS r FROM feats GROUP BY f),
                  tot AS (SELECT (SELECT CAST(SUM(t) AS BIGINT) FROM tgt) AS tt,
                                 (SELECT CAST(SUM(r) AS BIGINT) FROM rw) AS rt),
                  lam AS (SELECT COALESCE(rw.f, tgt.f) AS f,
                                 (1000000 * (COALESCE(t, 0) + 1)) // (tt + 256)
                                 - (1000000 * (COALESCE(r, 0) + 1)) // (rt + 256)
                                   AS lam
                          FROM rw FULL OUTER JOIN tgt ON rw.f = tgt.f
                          CROSS JOIN tot),
                  dc AS (SELECT doc_id, f, COUNT(*) AS c FROM feats
                         GROUP BY doc_id, f)
             SELECT dc.doc_id, CAST(SUM(c * lam) AS BIGINT) AS dsir_weight
             FROM dc JOIN lam USING (f) GROUP BY dc.doc_id"""
      }))
}
