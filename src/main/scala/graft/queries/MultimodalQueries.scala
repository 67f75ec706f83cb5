package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DeclaredQuery
import graft.ext.Multimodal

/** Multimodal-column queries (north-star §multimodal): binary payloads with
  * typed metadata. `q_binary_meta` is the pure-expression scan path;
  * `q_multimodal_decode` exercises the typed `mapPartitions` batch-decode
  * plumbing (the JVM twin of `mapInPandas`) whose deterministic stub the
  * oracle reproduces arithmetically from md5 of the payload.
  */
object MultimodalQueries {

  /** documents → asset shape, shared by both queries and their oracles. */
  private val AssetCte: String =
    """assets AS (SELECT doc_id AS asset_id,
                         CASE WHEN doc_id % 3 = 0 THEN 'image'
                              WHEN doc_id % 3 = 1 THEN 'audio'
                              ELSE 'video' END AS modality,
                         source, text, md5(text) AS cs
                  FROM documents)"""

  val all: Seq[DeclaredQuery] = Seq(

    // Binary metadata scan: byte length, checksum, leading-bytes magic —
    // the cheap pre-decode filter path (no codec, pure codegen).
    DeclaredQuery(
      "q_binary_meta",
      (s, dir) =>
        Multimodal.withBinaryMeta(
          Multimodal.documentAssets(s, dir).toDF(), "payload")
          .select("asset_id", "modality", "source", "n_bytes", "checksum", "magic"),
      Some(s"""WITH $AssetCte
               SELECT asset_id, modality, source,
                      octet_length(encode(text)) AS n_bytes,
                      cs AS checksum,
                      hex(encode(substr(text, 1, 4))) AS magic
               FROM assets""")),

    // Partition-batched decode (stubbed codec): dimensions/frame-count/
    // checksum derived deterministically from the payload md5, so the
    // mapPartitions output is still oracle-verifiable.
    DeclaredQuery(
      "q_multimodal_decode",
      (s, dir) =>
        Multimodal.decodePartitions(Multimodal.documentAssets(s, dir))
          .toDF()
          .select("asset_id", "modality", "source", "n_bytes", "checksum",
            "width", "height", "n_frames"),
      Some(s"""WITH $AssetCte
               SELECT asset_id, modality, source,
                      octet_length(encode(text)) AS n_bytes,
                      cs AS checksum,
                      64 + ('0x' || substr(cs, 1, 2))::INT * 4 AS width,
                      64 + ('0x' || substr(cs, 3, 2))::INT * 4 AS height,
                      CASE WHEN modality = 'video'
                           THEN 1 + ('0x' || substr(cs, 5, 2))::INT % 64
                           ELSE 1 END AS n_frames
               FROM assets""")))
}
