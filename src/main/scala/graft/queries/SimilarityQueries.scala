package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DeclaredQuery
import graft.ext.Similarity
import graft.io.Tables

/** Similarity-search queries over `embeddings` (north-star §similarity).
  * Outputs are (query, neighbor, rank) triples — ranks, not raw cosines, so
  * the oracle compare is immune to cross-engine float-summation ULP noise
  * (adjacent-rank similarity gaps in this corpus are ≥1.8e-5, ten orders
  * above ULP).
  */
object SimilarityQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val raw = Tables.testTable(s, dir, name)
    // every consumer runs heavy per-vector arithmetic (dot products,
    // PQ subspace encodes, projections) before its first natural
    // shuffle — fan the degenerate single-row-group scan out first
    // (no-op at healthy scan parallelism)
    if (name == "embeddings") Tables.fanOut(raw, col("vec_id")) else raw
  }

  val all: Seq[DeclaredQuery] = Seq(

    // Exact brute-force cosine top-5 for the query set (every 50th vector).
    DeclaredQuery(
      "q_cosine_topk",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.bruteForceTopK(
          emb.filter(col("vec_id") % 50 === 0), emb, "vec_id", "embedding", k = 5)
      },
      Some(s"""WITH ${DuckSql.EmbCte}
               SELECT query_id, neighbor_id, rank FROM (
                 SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                        ROW_NUMBER() OVER (
                          PARTITION BY q.vec_id
                          ORDER BY ${DuckSql.cosine("q", "c")} DESC, c.vec_id ASC)
                          AS rank
                 FROM emb q JOIN emb c ON q.vec_id <> c.vec_id
                 WHERE q.vec_id % 50 = 0)
               WHERE rank <= 5""")),

    // IVF approximate top-3: centroids = vec_id < 8 (broadcast), every
    // vector assigned to its nearest centroid, search restricted to the
    // query's own cluster (nprobe=1).
    DeclaredQuery(
      "q_ann_ivf",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfTopK(
          emb, emb.filter(col("vec_id") < 8),
          col("vec_id") % 50 === 0, "vec_id", "embedding", k = 3)
      },
      Some(s"""WITH ${DuckSql.EmbCte},
                    cent AS (SELECT vec_id AS centroid_id, e, nrm FROM emb
                             WHERE vec_id < 8),
                    ass AS (SELECT vec_id, e, nrm, centroid_id FROM (
                              SELECT v.vec_id, v.e, v.nrm, c.centroid_id,
                                     ROW_NUMBER() OVER (
                                       PARTITION BY v.vec_id
                                       ORDER BY ${DuckSql.cosine("v", "c")} DESC,
                                                c.centroid_id ASC) AS rn
                              FROM emb v CROSS JOIN cent c)
                            WHERE rn = 1)
               SELECT query_id, neighbor_id, rank FROM (
                 SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                        ROW_NUMBER() OVER (
                          PARTITION BY q.vec_id
                          ORDER BY ${DuckSql.cosine("q", "n")} DESC, n.vec_id ASC)
                          AS rank
                 FROM ass q JOIN ass n
                   ON q.centroid_id = n.centroid_id AND q.vec_id <> n.vec_id
                 WHERE q.vec_id % 50 = 0)
               WHERE rank <= 3""")),

    // IVF with TRAINED centroids: deterministic k-means (min-md5 init,
    // 2 Lloyd's iterations) replaces the fixed-pivot inverted file. The
    // oracle replays the identical training in unrolled CTEs; output is
    // ranks, so summation-order ULP in the trained centroids cannot flip
    // the hash unless a vector is pathologically equidistant to two
    // centroids (AnnRecallSpec separately pins recall ≥ the fixed-pivot
    // baseline).
    DeclaredQuery(
      "q_ann_ivf_trained",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfTopK(
          emb,
          Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 10, iters = 2),
          col("vec_id") % 50 === 0, "vec_id", "embedding", k = 3)
      },
      Some(TrainedIvfOracleSql)),

    // The SAME search over a PERSISTED index: centroids + postings written
    // once as bucketed warehouse tables (the stored-dedup-state pattern);
    // search reads only the index relations and the query vectors. Output
    // is bit-identical to q_ann_ivf_trained — same oracle.
    DeclaredQuery(
      "q_ann_ivf_stored",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        // index build runs ONCE per session (the operator's whole point is
        // persistence); repeat invocations — Bench samples — measure the
        // search-only shape. Deterministic training, so a rebuild would
        // write identical relations anyway.
        if (!Tables.bucketedStateLive(s, s"/tmp/graft_wh$tag",
            Seq(s"ivf${tag}_postings", s"ivf${tag}_centroids")))
          Similarity.writeIvfIndex(emb, "vec_id", "embedding",
            numCentroids = 10, kmeansIters = 2,
            s"/tmp/graft_wh$tag", s"ivf$tag", numBuckets = 8)
        Similarity.ivfTopKStored(s, s"ivf$tag",
          emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", k = 3)
      },
      Some(TrainedIvfOracleSql)),

    // DELETION from the stored IVF index: ids tombstoned in
    // `{name}_deleted`, the search anti-joins candidates BEFORE ranking
    // (ghosts must not displace live neighbors from the top-k), then
    // compaction folds the tombstones into a physical rewrite and the
    // SAME search answers from the rewritten postings — path equivalence
    // rides one oracle, which replays the full pipeline minus the
    // deleted ids. Setup rebuilds the index per sample so deletions
    // never accumulate.
    DeclaredQuery(
      "q_ann_ivf_deleted",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val name = s"ivfdel$tag"
        Similarity.deleteFromIndex(s, name,
          emb.filter(col("vec_id") % 9 === 0).select("vec_id"), "vec_id")
        val tombstoned = Similarity.ivfTopKStored(s, name,
          emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", k = 3)
          .localCheckpoint(true)
        Similarity.compactIndexDeletes(s, s"/tmp/graft_wh$tag", name,
          "vec_id", numBuckets = 8)
        val compacted = Similarity.ivfTopKStored(s, name,
          emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", k = 3)
        // emit the compacted result only if it matches the tombstoned one
        // (an equivalence failure must hash-fail, not silently pass)
        compacted.exceptAll(tombstoned).unionAll(tombstoned.exceptAll(compacted))
          .unionAll(compacted)
      },
      setup = Some((s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        Similarity.writeIvfIndex(t(s, dir, "embeddings"), "vec_id",
          "embedding", numCentroids = 10, kmeansIters = 2,
          s"/tmp/graft_wh$tag", s"ivfdel$tag", numBuckets = 8)
      }),
      oracle = Some(TrainedIvfDeletedOracleSql)),

    // int8 scalar quantization, pinned through integer-only projections
    // (code sum / extrema) — per-row fixed-order arithmetic means the
    // oracle reproduces every code exactly; array columns stay out of the
    // compare surface.
    DeclaredQuery(
      "q_embed_quant",
      (s, dir) => {
        val q = Similarity.quantize(col("embedding"))
        t(s, dir, "embeddings")
          .select(col("vec_id"), q.as("q"))
          .select(col("vec_id"),
            aggregate(col("q.codes"), lit(0L), (a, x) => a + x).as("code_sum"),
            array_min(col("q.codes")).as("code_min"),
            array_max(col("q.codes")).as("code_max"))
      },
      Some("""WITH d AS (SELECT vec_id,
                                list_transform(embedding, x -> x::DOUBLE) AS e
                         FROM embeddings),
                   rng AS (SELECT vec_id, e, list_min(e) AS mn,
                                  CASE WHEN list_max(e) > list_min(e)
                                       THEN list_max(e) - list_min(e)
                                       ELSE 1.0 END AS scale
                           FROM d),
                   codes AS (SELECT vec_id,
                                    list_transform(e,
                                      x -> CAST(round((x - mn) * 255.0 / scale)
                                           AS INT)) AS c
                             FROM rng)
              SELECT vec_id,
                     CAST(list_sum(c) AS BIGINT) AS code_sum,
                     list_min(c) AS code_min,
                     list_max(c) AS code_max
              FROM codes""")),

    // Quantized sparse random projection (64 → 16 dims): int8 codes times
    // md5-derived {−1,0,1} signs, summed in BIGINT — pure integer
    // arithmetic, so the oracle replays every component bit-exactly from
    // the same md5 derivation (no summation-order ULP, unlike any float
    // projection). Exploded to (vec_id, dim, proj) scalars for the
    // compare surface.
    DeclaredQuery(
      "q_embed_project",
      (s, dir) =>
        Similarity.projectQuantized(t(s, dir, "embeddings"),
            "vec_id", "embedding", outDim = 16)
          .select(col("vec_id"), posexplode(col("proj")))
          .select(col("vec_id"), col("pos").as("dim"), col("col").as("proj")),
      Some(s"""WITH d AS (SELECT vec_id,
                                 list_transform(embedding, x -> x::DOUBLE) AS e
                          FROM embeddings),
                   rng AS (SELECT vec_id, e, list_min(e) AS mn,
                                  CASE WHEN list_max(e) > list_min(e)
                                       THEN list_max(e) - list_min(e)
                                       ELSE 1.0 END AS scale
                           FROM d),
                   codes AS (SELECT vec_id,
                                    list_transform(e,
                                      x -> CAST(round((x - mn) * 255.0 / scale)
                                           AS INT)) AS c
                             FROM rng)
              SELECT vec_id, CAST(j AS INT) AS dim,
                     CAST(list_sum(list_transform(generate_series(1, len(c)),
                       i -> c[i] * (${DuckSql.md5Long(
                         "'rp:' || j::VARCHAR || ':' || (i - 1)::VARCHAR")} % 3 - 1)))
                       AS BIGINT) AS proj
              FROM codes CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j)""")),

    // Product-quantization encode: 64-dim fixed-point vectors → 8 subspace
    // codes from a 16-entry deterministic sample codebook (min-md5 seeds,
    // the k-means-init trick). Integer L2 argmin per (vector, subspace) —
    // the oracle replays codebook and codes bit-for-bit.
    DeclaredQuery(
      "q_pq_codes",
      (s, dir) =>
        Similarity.pqEncode(t(s, dir, "embeddings"), "vec_id", "embedding",
            Similarity.pqCodebook(t(s, dir, "embeddings"), "vec_id",
              "embedding", numSubspaces = 8, codebookSize = 16),
            numSubspaces = 8)
          .select(col("vec_id"), col("subspace"), col("code")),
      Some(s"""WITH ${PqCtes(8, 16)}
               SELECT vec_id, CAST(subspace AS INT) AS subspace,
                      CAST(code AS INT) AS code
               FROM enc""")),

    // ADC (asymmetric-distance) top-5 over the PQ codes: each query keeps
    // its exact fixed-point subvectors, precomputes an 8×16 integer
    // distance table against the codebook, and every encoded corpus row
    // costs 8 table lookups summed — Jégou et al.'s PQ search expressed
    // relationally (table join + hash aggregate). All-integer distances →
    // exact oracle compare including adist itself, not just ranks.
    DeclaredQuery(
      "q_pq_adc",
      (s, dir) =>
        Similarity.pqTopK(t(s, dir, "embeddings"), col("vec_id") % 50 === 0,
          "vec_id", "embedding", numSubspaces = 8, codebookSize = 16, k = 5),
      Some(s"""WITH ${PqCtes(8, 16)},
                    dtab AS (SELECT vec_id AS query_id, subspace, code, d
                             FROM scored WHERE vec_id % 50 = 0),
                    pair AS (SELECT t.query_id, e.vec_id AS neighbor_id,
                                    SUM(t.d) AS adist
                             FROM enc e
                             JOIN dtab t ON e.subspace = t.subspace
                                        AND e.code = t.code
                             WHERE t.query_id <> e.vec_id
                             GROUP BY 1, 2)
               SELECT query_id, neighbor_id, adist, rank FROM (
                 SELECT query_id, neighbor_id, CAST(adist AS BIGINT) AS adist,
                        ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY adist ASC, neighbor_id ASC)
                          AS rank
                 FROM pair)
               WHERE rank <= 5""")),

    // ADC + exact re-rank (IVFADC+R): ADC shortlist of 20, re-scored with
    // the exact fixed-point L2 (shortlist-sized vector re-attach join),
    // exact top-5 of the shortlist. Restores the recall that pure ADC
    // loses inside quantization cells; still integer-exact in the oracle.
    DeclaredQuery(
      "q_pq_rerank",
      (s, dir) =>
        Similarity.pqTopKRefined(t(s, dir, "embeddings"),
          col("vec_id") % 50 === 0, "vec_id", "embedding",
          numSubspaces = 8, codebookSize = 16, k = 5, shortlist = 20),
      Some(s"""WITH ${PqCtes(8, 16)},
                    dtab AS (SELECT vec_id AS query_id, subspace, code, d
                             FROM scored WHERE vec_id % 50 = 0),
                    pair AS (SELECT t.query_id, e.vec_id AS neighbor_id,
                                    SUM(t.d) AS adist
                             FROM enc e
                             JOIN dtab t ON e.subspace = t.subspace
                                        AND e.code = t.code
                             WHERE t.query_id <> e.vec_id
                             GROUP BY 1, 2),
                    short AS (SELECT query_id, neighbor_id FROM (
                                SELECT query_id, neighbor_id,
                                       ROW_NUMBER() OVER (
                                         PARTITION BY query_id
                                         ORDER BY adist ASC, neighbor_id ASC)
                                         AS rnk
                                FROM pair)
                              WHERE rnk <= 20),
                    ex AS (SELECT s.query_id, s.neighbor_id,
                                  list_sum(list_transform(
                                    generate_series(1, 64),
                                    i -> (q.fx[i] - n.fx[i]) * (q.fx[i] - n.fx[i])))
                                    AS edist
                           FROM short s
                           JOIN fx q ON q.vec_id = s.query_id
                           JOIN fx n ON n.vec_id = s.neighbor_id)
               SELECT query_id, neighbor_id, edist, rank FROM (
                 SELECT query_id, neighbor_id, CAST(edist AS BIGINT) AS edist,
                        ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY edist ASC, neighbor_id ASC)
                          AS rank
                 FROM ex)
               WHERE rank <= 5""")),

    // IVFADC: IVF blocking (fixed pivots vec_id < 8, nprobe=1) restricts
    // WHICH candidates are scored; PQ/ADC decides HOW — the candidate join
    // keys on (centroid, subspace, code), so per-query work shrinks ~C×
    // vs flat ADC. The billion-scale ANN layout end to end, integer-exact.
    DeclaredQuery(
      "q_ivf_pq",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 8),
          col("vec_id") % 50 === 0, "vec_id", "embedding",
          numSubspaces = 8, codebookSize = 16, k = 5)
      },
      Some(IvfPqOracleSql)),

    // The SAME IVFADC search over a PERSISTED index (coarse centroids +
    // PQ codebook + codes bucketed on centroid_id — the FAISS IndexIVFPQ
    // layout as warehouse tables): search reads only the index relations
    // and the query vectors. Stored ≡ live bit-for-bit — same oracle.
    DeclaredQuery(
      "q_ivf_pq_stored",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        if (!Tables.bucketedStateLive(s, s"/tmp/graft_wh$tag",
            Seq(s"ivfpq${tag}_codes", s"ivfpq${tag}_centroids",
              s"ivfpq${tag}_pqcodebook")))
          Similarity.writeIvfPqIndex(emb, emb.filter(col("vec_id") < 8),
            "vec_id", "embedding", numSubspaces = 8, codebookSize = 16,
            s"/tmp/graft_wh$tag", s"ivfpq$tag", numBuckets = 8)
        Similarity.ivfPqTopKStored(s, s"ivfpq$tag",
          emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", k = 5)
      },
      Some(IvfPqOracleSql)),

    // Stored-index DRIFT MONITORING: build an IVF index over 3/4 of the
    // corpus, append the held-out 1/4 against the frozen centroids, and
    // emit the per-centroid occupancy ledger (base vs appended counts) —
    // the operational signal behind Similarity.needsRetrain. The oracle
    // replays k-means training and both assignment passes and counts
    // assignments per centroid; integer counts keep residual doubles out
    // of the compare surface (the residual half is spec-pinned in
    // IvfStoredSpec). Rebuilt deterministically each invocation (overwrite
    // write + exactly one append), unlike q_ann_ivf_stored's build-once
    // guard, because appends must not accumulate across Bench samples.
    // The rebuild is SETUP (fixture cost, timed under setup_s); the
    // measured query is what the operator actually costs nightly: the
    // k-row occupancy-ledger fold.
    DeclaredQuery(
      "q_ivf_stats",
      (s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        Similarity.ivfDriftStats(s, s"ivfdrift$tag")
          .select(col("centroid_id"), col("n_base"), col("n_appended"))
      },
      setup = Some((s, dir) => {
        val emb = t(s, dir, "embeddings")
        val base = emb.filter(col("vec_id") % 4 =!= 1)
        val batch = emb.filter(col("vec_id") % 4 === 1)
          .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val name = s"ivfdrift$tag"
        Similarity.writeIvfIndex(base, "vec_id", "embedding",
          numCentroids = 10, kmeansIters = 2,
          s"/tmp/graft_wh$tag", name, numBuckets = 8)
        Similarity.appendIvfIndex(s, name, batch, "vec_id", "embedding",
          numBuckets = 8)
      }),
      oracle = Some(s"""WITH emb AS (SELECT vec_id,
                              list_transform(embedding, x -> x::DOUBLE) AS e,
                              sqrt(list_sum(list_transform(embedding,
                                     x -> x::DOUBLE * x::DOUBLE))) AS nrm
                            FROM embeddings WHERE vec_id % 4 <> 1),
                    ${DuckSql.kmeansCtes(k = 10, iters = 2, dim = 64)},
                    ab AS (SELECT vec_id, centroid_id FROM (
                             SELECT v.vec_id, c.centroid_id,
                                    ROW_NUMBER() OVER (
                                      PARTITION BY v.vec_id
                                      ORDER BY ${DuckSql.cosine("v", "c")} DESC,
                                               c.centroid_id ASC) AS rn
                             FROM emb v CROSS JOIN cent c)
                           WHERE rn = 1),
                    nb AS (SELECT centroid_id, COUNT(*) AS n_base
                           FROM ab GROUP BY centroid_id),
                    bemb AS (SELECT vec_id,
                               list_transform(embedding, x -> x::DOUBLE) AS e,
                               sqrt(list_sum(list_transform(embedding,
                                      x -> x::DOUBLE * x::DOUBLE))) AS nrm
                             FROM embeddings WHERE vec_id % 4 = 1),
                    ab2 AS (SELECT vec_id, centroid_id FROM (
                              SELECT v.vec_id, c.centroid_id,
                                     ROW_NUMBER() OVER (
                                       PARTITION BY v.vec_id
                                       ORDER BY ${DuckSql.cosine("v", "c")} DESC,
                                                c.centroid_id ASC) AS rn
                              FROM bemb v CROSS JOIN cent c)
                            WHERE rn = 1),
                    na AS (SELECT centroid_id, COUNT(*) AS n_appended
                           FROM ab2 GROUP BY centroid_id)
               SELECT COALESCE(nb.centroid_id, na.centroid_id) AS centroid_id,
                      COALESCE(n_base, 0) AS n_base,
                      COALESCE(n_appended, 0) AS n_appended
               FROM nb FULL JOIN na ON nb.centroid_id = na.centroid_id""")),

    // HARD-NEGATIVE mining for contrastive training: per query, skip the
    // top-3 ANN neighbors (presumed positives/near-dups) and emit the
    // next 10, re-ranked 1..10 — the "close but not the same" negatives
    // that carry gradient signal. Same fixed-pivot IVF as q_ann_ivf; the
    // oracle applies the rank window to the identical ranking.
    DeclaredQuery(
      "q_hard_negatives",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.hardNegatives(
          emb, emb.filter(col("vec_id") < 8),
          col("vec_id") % 50 === 0, "vec_id", "embedding",
          skipTop = 3, negK = 10)
      },
      Some(s"""WITH ${DuckSql.EmbCte},
                    cent AS (SELECT vec_id AS centroid_id, e, nrm FROM emb
                             WHERE vec_id < 8),
                    ass AS (SELECT vec_id, e, nrm, centroid_id FROM (
                              SELECT v.vec_id, v.e, v.nrm, c.centroid_id,
                                     ROW_NUMBER() OVER (
                                       PARTITION BY v.vec_id
                                       ORDER BY ${DuckSql.cosine("v", "c")} DESC,
                                                c.centroid_id ASC) AS rn
                              FROM emb v CROSS JOIN cent c)
                            WHERE rn = 1)
               SELECT query_id, negative_id, CAST(rank - 3 AS INT) AS neg_rank
               FROM (
                 SELECT q.vec_id AS query_id, n.vec_id AS negative_id,
                        ROW_NUMBER() OVER (
                          PARTITION BY q.vec_id
                          ORDER BY ${DuckSql.cosine("q", "n")} DESC, n.vec_id ASC)
                          AS rank
                 FROM ass q JOIN ass n
                   ON q.centroid_id = n.centroid_id AND q.vec_id <> n.vec_id
                 WHERE q.vec_id % 50 = 0)
               WHERE rank BETWEEN 4 AND 13""")),

    // Cross-corpus ANN JOIN (embedding record linkage): odd-id vectors
    // are the incoming records, even-id vectors the catalog; each query
    // links to its approximate top-3 catalog neighbors through the
    // shared fixed centroids. The single-relation IVF queries can't
    // express this two-relation shape.
    DeclaredQuery(
      "q_ann_join",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfTopKBetween(
          emb.filter(col("vec_id") % 50 === 25),
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", k = 3)
      },
      Some(s"""WITH ${DuckSql.EmbCte},
                    cent AS (SELECT vec_id AS centroid_id, e, nrm FROM emb
                             WHERE vec_id < 8),
                    ca AS (SELECT vec_id, e, nrm, centroid_id FROM (
                             SELECT v.vec_id, v.e, v.nrm, c.centroid_id,
                                    ROW_NUMBER() OVER (
                                      PARTITION BY v.vec_id
                                      ORDER BY ${DuckSql.cosine("v", "c")} DESC,
                                               c.centroid_id ASC) AS rn
                             FROM emb v CROSS JOIN cent c
                             WHERE v.vec_id % 2 = 0)
                           WHERE rn = 1),
                    qa AS (SELECT vec_id, e, nrm, centroid_id FROM (
                             SELECT v.vec_id, v.e, v.nrm, c.centroid_id,
                                    ROW_NUMBER() OVER (
                                      PARTITION BY v.vec_id
                                      ORDER BY ${DuckSql.cosine("v", "c")} DESC,
                                               c.centroid_id ASC) AS rn
                             FROM emb v CROSS JOIN cent c
                             WHERE v.vec_id % 50 = 25)
                           WHERE rn = 1)
               SELECT query_id, neighbor_id, rank FROM (
                 SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                        ROW_NUMBER() OVER (
                          PARTITION BY q.vec_id
                          ORDER BY ${DuckSql.cosine("q", "n")} DESC, n.vec_id ASC)
                          AS rank
                 FROM qa q JOIN ca n
                   ON q.centroid_id = n.centroid_id AND q.vec_id <> n.vec_id)
               WHERE rank <= 3""")),

    // CLUSTER-BALANCED (coreset) sampling: ~40 vectors drawn from EACH
    // fixed-pivot IVF cluster by a seeded hash lottery — equal per-mode
    // quotas so rare modes survive a downsample. The oracle replays
    // assignment, per-cluster counts, cut arithmetic, and the lottery.
    DeclaredQuery(
      "q_coreset_sample",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.clusterBalancedSample(
          emb, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", perCluster = 40L)
      },
      Some(s"""WITH ${DuckSql.EmbCte},
                    cent AS (SELECT vec_id AS centroid_id, e, nrm FROM emb
                             WHERE vec_id < 8),
                    ass AS (SELECT vec_id, centroid_id FROM (
                              SELECT v.vec_id, c.centroid_id,
                                     ROW_NUMBER() OVER (
                                       PARTITION BY v.vec_id
                                       ORDER BY ${DuckSql.cosine("v", "c")} DESC,
                                                c.centroid_id ASC) AS rn
                              FROM emb v CROSS JOIN cent c)
                            WHERE rn = 1),
                    cut AS (SELECT centroid_id,
                                   (40::BIGINT * 1000000) // COUNT(*) AS cut
                            FROM ass GROUP BY centroid_id)
               SELECT vec_id, centroid_id FROM ass JOIN cut USING (centroid_id)
               WHERE ${DuckSql.md5LongSeeded("vec_id::VARCHAR",
                 graft.ext.Similarity.CoresetSeed)} % 1000000 < cut""")))

  /** Oracle for IVFADC, shared by q_ivf_pq and q_ivf_pq_stored (the stored
    * index is definitionally the same computation persisted).
    */
  private lazy val IvfPqOracleSql: String =
    s"""WITH ${DuckSql.EmbCte},
             cent AS (SELECT vec_id AS centroid_id, e, nrm FROM emb
                      WHERE vec_id < 8),
             ass AS (SELECT vec_id, centroid_id FROM (
                       SELECT v.vec_id, c.centroid_id,
                              ROW_NUMBER() OVER (
                                PARTITION BY v.vec_id
                                ORDER BY ${DuckSql.cosine("v", "c")} DESC,
                                         c.centroid_id ASC) AS rn
                       FROM emb v CROSS JOIN cent c)
                     WHERE rn = 1),
             ${PqCtes(8, 16)},
             dtab AS (SELECT vec_id AS query_id, subspace, code, d
                      FROM scored WHERE vec_id % 50 = 0),
             pair AS (SELECT t.query_id, e.vec_id AS neighbor_id,
                             SUM(t.d) AS adist
                      FROM enc e
                      JOIN ass na ON na.vec_id = e.vec_id
                      JOIN ass qa ON qa.centroid_id = na.centroid_id
                      JOIN dtab t ON t.query_id = qa.vec_id
                                 AND t.subspace = e.subspace
                                 AND t.code = e.code
                      WHERE t.query_id <> e.vec_id
                      GROUP BY 1, 2)
        SELECT query_id, neighbor_id, adist, rank FROM (
          SELECT query_id, neighbor_id, CAST(adist AS BIGINT) AS adist,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY adist ASC, neighbor_id ASC)
                   AS rank
          FROM pair)
        WHERE rank <= 5"""

  /** Shared PQ replay CTEs: fixed-point vectors, the min-md5 seed codebook,
    * per-(vector, subspace) integer L2 scores against every codebook entry,
    * and the argmin encoding. Twin of `Similarity.pqCodebook`/`pqEncode`
    * with dim=64, subspace width dim/m.
    */
  private def PqCtes(m: Int, k: Int): String = {
    val width = 64 / m
    s"""fx AS (SELECT vec_id,
                      list_transform(embedding,
                        x -> CAST(round(x::DOUBLE * 1000.0) AS BIGINT)) AS fx
               FROM embeddings),
        seeds AS (SELECT vec_id, fx,
                         ${DuckSql.md5Long("vec_id::VARCHAR")} AS r
                  FROM fx ORDER BY r, vec_id LIMIT $k),
        ranked AS (SELECT ROW_NUMBER() OVER (ORDER BY r, vec_id) - 1 AS code,
                          fx
                   FROM seeds),
        ss AS (SELECT unnest(generate_series(0, ${m - 1})) AS subspace),
        cb AS (SELECT ss.subspace, r.code,
                      (r.fx)[ss.subspace * $width + 1 : ss.subspace * $width + $width] AS cb
               FROM ranked r CROSS JOIN ss),
        sub AS (SELECT v.vec_id, ss.subspace,
                       (v.fx)[ss.subspace * $width + 1 : ss.subspace * $width + $width] AS sv
                FROM fx v CROSS JOIN ss),
        scored AS (SELECT s.vec_id, s.subspace, c.code,
                          list_sum(list_transform(generate_series(1, $width),
                            i -> (s.sv[i] - c.cb[i]) * (s.sv[i] - c.cb[i]))) AS d
                   FROM sub s JOIN cb c ON s.subspace = c.subspace),
        enc AS (SELECT vec_id, subspace, code FROM (
                  SELECT vec_id, subspace, code,
                         ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                                            ORDER BY d ASC, code ASC) AS rn
                  FROM scored)
                WHERE rn = 1)"""
  }

  /** Oracle for the trained-IVF search, shared by q_ann_ivf_trained and
    * q_ann_ivf_stored (the stored index is definitionally the same
    * computation persisted — one oracle pins both).
    */
  /** [[TrainedIvfOracleSql]] minus the tombstoned ids (vec_id % 9 = 0)
    * on the NEIGHBOR side — queries still query, deleted vectors just
    * never come back.
    */
  private lazy val TrainedIvfDeletedOracleSql: String =
    s"""WITH ${DuckSql.EmbCte},
             ${DuckSql.kmeansCtes(k = 10, iters = 2, dim = 64)},
             ass AS (SELECT vec_id, e, nrm, centroid_id FROM (
                       SELECT v.vec_id, v.e, v.nrm, c.centroid_id,
                              ROW_NUMBER() OVER (
                                PARTITION BY v.vec_id
                                ORDER BY ${DuckSql.cosine("v", "c")} DESC,
                                         c.centroid_id ASC) AS rn
                       FROM emb v CROSS JOIN cent c)
                     WHERE rn = 1)
        SELECT query_id, neighbor_id, rank FROM (
          SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ${DuckSql.cosine("q", "n")} DESC, n.vec_id ASC)
                   AS rank
          FROM ass q JOIN ass n
            ON q.centroid_id = n.centroid_id AND q.vec_id <> n.vec_id
          WHERE q.vec_id % 50 = 0 AND n.vec_id % 9 <> 0)
        WHERE rank <= 3"""

  private lazy val TrainedIvfOracleSql: String =
    s"""WITH ${DuckSql.EmbCte},
             ${DuckSql.kmeansCtes(k = 10, iters = 2, dim = 64)},
             ass AS (SELECT vec_id, e, nrm, centroid_id FROM (
                       SELECT v.vec_id, v.e, v.nrm, c.centroid_id,
                              ROW_NUMBER() OVER (
                                PARTITION BY v.vec_id
                                ORDER BY ${DuckSql.cosine("v", "c")} DESC,
                                         c.centroid_id ASC) AS rn
                       FROM emb v CROSS JOIN cent c)
                     WHERE rn = 1)
        SELECT query_id, neighbor_id, rank FROM (
          SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ${DuckSql.cosine("q", "n")} DESC, n.vec_id ASC)
                   AS rank
          FROM ass q JOIN ass n
            ON q.centroid_id = n.centroid_id AND q.vec_id <> n.vec_id
          WHERE q.vec_id % 50 = 0)
        WHERE rank <= 3"""
}
