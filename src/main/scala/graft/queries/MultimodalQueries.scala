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
               FROM assets""")),

    // REAL image codec end-to-end: each doc becomes a deterministic
    // grayscale PNG (encoded on executors), decoded back through
    // javax.imageio per partition into dimensions + exact pixel stats.
    // The oracle never sees a PNG byte — it recomputes the same stats
    // arithmetically from the pixel formula, so hash-green proves the
    // encode→decode round trip is a real, lossless codec run.
    DeclaredQuery(
      "q_image_meta",
      (s, dir) =>
        Multimodal.decodeImages(Multimodal.pngAssets(s, dir)).toDF()
          .select("asset_id", "width", "height", "n_pixels", "pixel_sum",
            "pixel_min", "pixel_max"),
      Some("""WITH dims AS (SELECT doc_id AS asset_id,
                                   8 + (doc_id % 8) AS w,
                                   8 + ((doc_id // 8) % 8) AS h
                            FROM documents),
                   px AS (SELECT asset_id, w, h,
                                 (asset_id * 31 + xs.x * 7 + ys.y * 13) % 256 AS g
                          FROM dims
                          CROSS JOIN (SELECT unnest(generate_series(0, 14)) AS x) xs
                          CROSS JOIN (SELECT unnest(generate_series(0, 14)) AS y) ys
                          WHERE xs.x < w AND ys.y < h)
              SELECT asset_id,
                     CAST(w AS INT) AS width,
                     CAST(h AS INT) AS height,
                     CAST(COUNT(*) AS INT) AS n_pixels,
                     CAST(SUM(g) AS BIGINT) AS pixel_sum,
                     CAST(MIN(g) AS INT) AS pixel_min,
                     CAST(MAX(g) AS INT) AS pixel_max
              FROM px
              GROUP BY asset_id, w, h""")),

    // REAL image RESIZE: decode + nearest-neighbor resample to 4×4 on
    // executors; source index sx = ox·w div 4 is pure integer arithmetic,
    // so the oracle replays the resampling without a PNG byte — green
    // proves decode + resample round-trip exactly.
    DeclaredQuery(
      "q_image_resize",
      (s, dir) =>
        Multimodal.resizeImages(Multimodal.pngAssets(s, dir), 4, 4).toDF()
          .select("asset_id", "out_w", "out_h", "pixel_sum",
            "pixel_min", "pixel_max"),
      Some("""WITH dims AS (SELECT doc_id AS asset_id,
                                   8 + (doc_id % 8) AS w,
                                   8 + ((doc_id // 8) % 8) AS h
                            FROM documents),
                   px AS (SELECT asset_id,
                                 (asset_id * 31 + ((xs.x * w) // 4) * 7
                                  + ((ys.y * h) // 4) * 13) % 256 AS g
                          FROM dims
                          CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS x) xs
                          CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS y) ys)
              SELECT asset_id,
                     CAST(4 AS INT) AS out_w,
                     CAST(4 AS INT) AS out_h,
                     CAST(SUM(g) AS BIGINT) AS pixel_sum,
                     CAST(MIN(g) AS INT) AS pixel_min,
                     CAST(MAX(g) AS INT) AS pixel_max
              FROM px GROUP BY asset_id""")),

    // ViT-style PATCHIFY: decode → nearest-neighbor resample to 8×8 →
    // 2×2 grid of 4×4 patches with exact per-patch pixel stats — the
    // vision-transformer token grid as one map pass. The oracle replays
    // resample index arithmetic AND patch grouping from the pixel formula;
    // per-patch sums over a lossless codec pin the full pixel mapping.
    DeclaredQuery(
      "q_image_patches",
      (s, dir) =>
        Multimodal.patchifyImages(Multimodal.pngAssets(s, dir),
            outW = 8, outH = 8, patchW = 4, patchH = 4).toDF()
          .select("asset_id", "patch_row", "patch_col", "pixel_sum",
            "pixel_min", "pixel_max"),
      Some("""WITH dims AS (SELECT doc_id AS asset_id,
                                   8 + (doc_id % 8) AS w,
                                   8 + ((doc_id // 8) % 8) AS h
                            FROM documents),
                   px AS (SELECT asset_id,
                                 ys.y // 4 AS patch_row,
                                 xs.x // 4 AS patch_col,
                                 (asset_id * 31 + ((xs.x * w) // 8) * 7
                                  + ((ys.y * h) // 8) * 13) % 256 AS g
                          FROM dims
                          CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS x) xs
                          CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS y) ys)
              SELECT asset_id,
                     CAST(patch_row AS INT) AS patch_row,
                     CAST(patch_col AS INT) AS patch_col,
                     CAST(SUM(g) AS BIGINT) AS pixel_sum,
                     CAST(MIN(g) AS INT) AS pixel_min,
                     CAST(MAX(g) AS INT) AS pixel_max
              FROM px GROUP BY asset_id, patch_row, patch_col""")),

    // REAL audio frame sampling: decode + every-8th-sample decimation
    // (the temporal-stride analogue of video frame sampling); PCM is
    // lossless and the stride is integer arithmetic, so the oracle
    // recomputes the sampled values exactly.
    DeclaredQuery(
      "q_audio_frames",
      (s, dir) =>
        Multimodal.sampleAudioFrames(Multimodal.wavAssets(s, dir), 8).toDF()
          .select("asset_id", "n_frames", "frame_sum",
            "frame_min", "frame_max"),
      Some("""WITH dims AS (SELECT doc_id AS asset_id,
                                   64 + (doc_id % 64) AS n
                            FROM documents),
                   sm AS (SELECT asset_id,
                                 (asset_id * 17 + i.i * 29) % 256 AS v
                          FROM dims
                          CROSS JOIN (SELECT unnest(generate_series(0, 127)) AS i) i
                          WHERE i.i < n AND i.i % 8 = 0)
              SELECT asset_id,
                     CAST(COUNT(*) AS INT) AS n_frames,
                     CAST(SUM(v) AS BIGINT) AS frame_sum,
                     CAST(MIN(v) AS INT) AS frame_min,
                     CAST(MAX(v) AS INT) AS frame_max
              FROM sm GROUP BY asset_id""")),

    // REAL audio codec end-to-end: deterministic 8-bit PCM WAVs encoded
    // on executors, decoded back through javax.sound.sampled into sample
    // statistics the oracle recomputes arithmetically — the audio twin of
    // q_image_meta (PCM is lossless, so the round trip is exact).
    DeclaredQuery(
      "q_audio_meta",
      (s, dir) =>
        Multimodal.decodeAudio(Multimodal.wavAssets(s, dir)).toDF()
          .select("asset_id", "n_samples", "sample_rate", "sample_sum",
            "sample_min", "sample_max"),
      Some("""WITH dims AS (SELECT doc_id AS asset_id,
                                   64 + (doc_id % 64) AS n
                            FROM documents),
                   sm AS (SELECT asset_id, n,
                                 (asset_id * 17 + i.i * 29) % 256 AS v
                          FROM dims
                          CROSS JOIN (SELECT unnest(generate_series(0, 126)) AS i) i
                          WHERE i.i < n)
              SELECT asset_id,
                     CAST(n AS INT) AS n_samples,
                     8000 AS sample_rate,
                     CAST(SUM(v) AS BIGINT) AS sample_sum,
                     CAST(MIN(v) AS INT) AS sample_min,
                     CAST(MAX(v) AS INT) AS sample_max
              FROM sm
              GROUP BY asset_id, n""")),

    // PERCEPTUAL image near-dedup: real PNG decode → 8×8 aHash → 16-bit
    // pigeonhole bands → keyed candidate join → XOR-popcount verify at
    // hamming ≤ 1. The oracle replays every aHash bit from the synthetic
    // pixel formula (lossless codec ⇒ arithmetic replay) AND the band/
    // verify pipeline — green proves decode, resample, threshold,
    // packing, banding, and hamming all round-trip exactly.
    DeclaredQuery(
      "q_image_neardup",
      (s, dir) =>
        Multimodal.aHashNearDupPairs(
          Multimodal.aHashImages(Multimodal.pngAssets(s, dir)).toDF(),
          "asset_id", maxDist = 1),
      Some("""WITH px AS (
                SELECT doc_id AS asset_id,
                       list_transform(generate_series(0, 63),
                         j -> (doc_id * 31
                               + (((j % 8) * (8 + (doc_id % 8))) // 8) * 7
                               + (((j // 8) * (8 + ((doc_id // 8) % 8))) // 8) * 13)
                              % 256) AS p
                FROM documents),
              hs AS (
                SELECT asset_id,
                       CAST(list_sum(list_transform(generate_series(1, 32),
                         j -> CASE WHEN p[j] > (list_sum(p) // 64)
                                   THEN (1::BIGINT << (j - 1)) ELSE 0 END))
                            AS BIGINT) AS lo,
                       CAST(list_sum(list_transform(generate_series(33, 64),
                         j -> CASE WHEN p[j] > (list_sum(p) // 64)
                                   THEN (1::BIGINT << (j - 33)) ELSE 0 END))
                            AS BIGINT) AS hi
                FROM px),
              bnd AS (SELECT asset_id, lo, hi, b,
                             CASE b WHEN 0 THEN lo & 65535
                                    WHEN 1 THEN (lo >> 16) & 65535
                                    WHEN 2 THEN hi & 65535
                                    ELSE (hi >> 16) & 65535 END AS bh
                      FROM hs CROSS JOIN
                        (SELECT unnest(generate_series(0, 3)) AS b)),
              cand AS (SELECT DISTINCT a.asset_id AS id_a, c.asset_id AS id_b
                       FROM bnd a JOIN bnd c
                         ON a.b = c.b AND a.bh = c.bh
                            AND a.asset_id < c.asset_id)
              SELECT id_a, id_b,
                     CAST(bit_count(xor(x.lo, y.lo))
                          + bit_count(xor(x.hi, y.hi)) AS BIGINT) AS hamming
              FROM cand
              JOIN hs x ON x.asset_id = id_a
              JOIN hs y ON y.asset_id = id_b
              WHERE bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi)) <= 1""")),

    // INCREMENTAL image near-dup over STORED band state: assets arrive
    // as three nightly batches; each night probes its hashes against
    // the bucketed band relation (state side co-located, only the batch
    // shuffles), adds its internal pairs, and appends its band rows
    // behind an id anti-join (exactly-once without a ledger). Union of
    // per-batch discoveries ≡ the full-corpus pair set — the oracle IS
    // q_image_neardup's full replay: every cross-batch pair must be
    // found exactly when its later member arrives.
    DeclaredQuery(
      "q_image_neardup_stored",
      (s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val (wh, nm) = (s"/tmp/graft_imgwh$tag", s"img$tag")
        // one PNG synth + decode pass for all three nightly slices (each
        // batch is consumed by band rows, probes, and internal pairs)
        val hashes = Multimodal.aHashImages(Multimodal.pngAssets(s, dir))
          .toDF().cache()
        def b(i: Int) = hashes.filter(col("asset_id") % 3 === i)
        val p1 = Multimodal.appendImageNearDup(s, wh, nm, b(1), "asset_id", 1)
        val p2 = Multimodal.appendImageNearDup(s, wh, nm, b(2), "asset_id", 1)
        Multimodal.aHashNearDupPairs(b(0), "asset_id", 1)
          .unionByName(p1).unionByName(p2).distinct()
      },
      setup = Some((s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val hashes = Multimodal.aHashImages(Multimodal.pngAssets(s, dir)).toDF()
        graft.ext.Multimodal.createImageHashState(s, s"/tmp/graft_imgwh$tag",
          s"img$tag", hashes.filter(col("asset_id") % 3 === 0), "asset_id", 4)
      }),
      oracle = Some("""WITH px AS (
                SELECT doc_id AS asset_id,
                       list_transform(generate_series(0, 63),
                         j -> (doc_id * 31
                               + (((j % 8) * (8 + (doc_id % 8))) // 8) * 7
                               + (((j // 8) * (8 + ((doc_id // 8) % 8))) // 8) * 13)
                              % 256) AS p
                FROM documents),
              hs AS (
                SELECT asset_id,
                       CAST(list_sum(list_transform(generate_series(1, 32),
                         j -> CASE WHEN p[j] > (list_sum(p) // 64)
                                   THEN (1::BIGINT << (j - 1)) ELSE 0 END))
                            AS BIGINT) AS lo,
                       CAST(list_sum(list_transform(generate_series(33, 64),
                         j -> CASE WHEN p[j] > (list_sum(p) // 64)
                                   THEN (1::BIGINT << (j - 33)) ELSE 0 END))
                            AS BIGINT) AS hi
                FROM px),
              bnd AS (SELECT asset_id, lo, hi, b,
                             CASE b WHEN 0 THEN lo & 65535
                                    WHEN 1 THEN (lo >> 16) & 65535
                                    WHEN 2 THEN hi & 65535
                                    ELSE (hi >> 16) & 65535 END AS bh
                      FROM hs CROSS JOIN
                        (SELECT unnest(generate_series(0, 3)) AS b)),
              cand AS (SELECT DISTINCT a.asset_id AS id_a, c.asset_id AS id_b
                       FROM bnd a JOIN bnd c
                         ON a.b = c.b AND a.bh = c.bh
                            AND a.asset_id < c.asset_id)
              SELECT id_a, id_b,
                     CAST(bit_count(xor(x.lo, y.lo))
                          + bit_count(xor(x.hi, y.hi)) AS BIGINT) AS hamming
              FROM cand
              JOIN hs x ON x.asset_id = id_a
              JOIN hs y ON y.asset_id = id_b
              WHERE bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi)) <= 1""")),

    // PERCEPTUAL audio near-dedup: real WAV decode → 16-segment energy
    // profile (cross-multiply thresholds, no division) → 4-bit pigeonhole
    // bands → keyed join → XOR-popcount verify at hamming ≤ 1. Same
    // banded shape as the image path, on the audio modality; the oracle
    // replays every bit from the synthetic-sample formula.
    DeclaredQuery(
      "q_audio_neardup",
      (s, dir) =>
        Multimodal.audioNearDupPairs(
          Multimodal.fingerprintAudio(Multimodal.wavAssets(s, dir)).toDF(),
          "asset_id", maxDist = 1),
      Some("""WITH sm AS (
                SELECT doc_id AS asset_id, 64 + (doc_id % 64) AS n,
                       list_transform(generate_series(0, 63 + (doc_id % 64)),
                         i -> (doc_id * 17 + i * 29) % 256) AS s
                FROM documents),
              fp AS (
                SELECT asset_id,
                       CAST(list_sum(list_transform(generate_series(0, 15), j ->
                         CASE WHEN list_sum(s[(j * n) // 16 + 1 : ((j + 1) * n) // 16]) * n
                                   > list_sum(s) * (((j + 1) * n) // 16 - (j * n) // 16)
                              THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT) AS afp
                FROM sm),
              bnd AS (SELECT asset_id, afp, b, (afp >> (b * 4)) & 15 AS bh
                      FROM fp CROSS JOIN
                        (SELECT unnest(generate_series(0, 3)) AS b)),
              cand AS (SELECT DISTINCT a.asset_id AS id_a, c.asset_id AS id_b
                       FROM bnd a JOIN bnd c
                         ON a.b = c.b AND a.bh = c.bh
                            AND a.asset_id < c.asset_id)
              SELECT id_a, id_b,
                     CAST(bit_count(xor(x.afp, y.afp)) AS BIGINT) AS hamming
              FROM cand
              JOIN fp x ON x.asset_id = id_a
              JOIN fp y ON y.asset_id = id_b
              WHERE bit_count(xor(x.afp, y.afp)) <= 1""")),

    // The full IMAGE-DEDUP pipeline composed from library operators:
    // aHash → hamming-0 pairs → connected components → keep the
    // HIGHEST-RESOLUTION member per duplicate cluster (n_pixels desc,
    // id tiebreak) — "keep the best copy" applied to the image modality.
    // Hamming-0 classes are exactly equal hashes, so the oracle labels
    // components as min-id-per-hash and replays the argmax.
    DeclaredQuery(
      "q_image_canonical",
      (s, dir) => {
        val assets = Multimodal.pngAssets(s, dir)
        val hashes = Multimodal.aHashImages(assets).toDF()
        val pairs = Multimodal.aHashNearDupPairs(hashes, "asset_id", maxDist = 0)
          .select("id_a", "id_b")
        val labels = graft.ext.Dedup
          .connectedComponents(pairs, "id_a", "id_b")
          .withColumnRenamed("id", "asset_id")
        val members = Multimodal.decodeImages(assets).toDF()
          .select("asset_id", "n_pixels")
          .join(labels, Seq("asset_id"), "left")
          .withColumn("comp", coalesce(col("comp"), col("asset_id")))
        graft.ext.Dedup.canonicalPerComponent(members, "comp",
            Seq(col("n_pixels").desc, col("asset_id").asc))
          .select(col("comp"), col("asset_id").as("canonical_id"),
            col("n_pixels"), col("n_members"))
      },
      Some("""WITH px AS (
                SELECT doc_id AS asset_id,
                       (8 + (doc_id % 8)) * (8 + ((doc_id // 8) % 8)) AS np,
                       list_transform(generate_series(0, 63),
                         j -> (doc_id * 31
                               + (((j % 8) * (8 + (doc_id % 8))) // 8) * 7
                               + (((j // 8) * (8 + ((doc_id // 8) % 8))) // 8) * 13)
                              % 256) AS p
                FROM documents),
              hs AS (
                SELECT asset_id, np,
                       CAST(list_sum(list_transform(generate_series(1, 32),
                         j -> CASE WHEN p[j] > (list_sum(p) // 64)
                                   THEN (1::BIGINT << (j - 1)) ELSE 0 END))
                            AS BIGINT) AS lo,
                       CAST(list_sum(list_transform(generate_series(33, 64),
                         j -> CASE WHEN p[j] > (list_sum(p) // 64)
                                   THEN (1::BIGINT << (j - 33)) ELSE 0 END))
                            AS BIGINT) AS hi
                FROM px),
              comp AS (SELECT asset_id, np,
                              MIN(asset_id) OVER (PARTITION BY hi, lo) AS comp
                       FROM hs),
              rk AS (SELECT comp, asset_id, np,
                            COUNT(*) OVER (PARTITION BY comp) AS n_members,
                            ROW_NUMBER() OVER (PARTITION BY comp
                              ORDER BY np DESC, asset_id ASC) AS rn
                     FROM comp)
              SELECT comp, asset_id AS canonical_id,
                     CAST(np AS INT) AS n_pixels,
                     n_members
              FROM rk WHERE rn = 1""")))
}
