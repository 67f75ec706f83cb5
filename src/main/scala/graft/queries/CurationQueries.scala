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

  val all: Seq[DeclaredQuery] = Seq(

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
               FROM pr""")))
}
