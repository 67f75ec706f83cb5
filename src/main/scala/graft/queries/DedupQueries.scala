package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DeclaredQuery
import graft.ext.{Dedup, TextAnalysis}
import graft.io.Tables

/** Deduplication queries over `documents` (north-star §dedup): exact,
  * MinHash signatures, MinHash+LSH candidate pairs, n-gram Jaccard,
  * SimHash, and embedding-cosine near-dup. The corpus-with-duplicates CTE
  * plants known exact copies and near-dups so each operator provably finds
  * them; every hash is md5-derived so the oracle verifies signatures and
  * pairs bit-for-bit.
  */
object DedupQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.testTable(s, dir, name)

  val NumHashes = 8
  val Bands = 4
  val ShingleN = 3

  /** q_kcore peel threshold and the oracle's unrolled round count. */
  val KCoreK = 2
  val KCoreIters = 6

  private def ccWh(dir: String): String =
    s"/tmp/graft_ccwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"

  /** LSH pair edges feeding the incremental CC state queries. */
  private def ccPairs(s: SparkSession, dir: String): DataFrame = {
    val sig = Dedup.minhashSignatures(
      corpusWithDups(s, dir), col("text"), "doc_id", NumHashes, ShingleN)
    Dedup.lshCandidatePairs(sig, "doc_id", NumHashes, Bands)
      .filter(col("est_jaccard") >= 0.5)
  }

  /** Seed the shared CC state: bootstrap batch always; nights 1-2 when
    * `allBatches` (q_canonical_stored needs the full chain in setup,
    * q_cc_stored appends them inside the measured query). All writes are
    * deterministic partition replaces, so any interleaving of the two
    * queries' setups converges to the same state.
    */
  private def seedCcState(s: SparkSession, dir: String,
      allBatches: Boolean): Unit = {
    import graft.ext.CcState
    val pairs = ccPairs(s, dir).localCheckpoint(true)
    val night = pmod(col("id_a") + col("id_b"), lit(3))
    CcState.createCcState(s, ccWh(dir), "cc",
      pairs.filter(night === 0), "id_a", "id_b")
    if (allBatches) {
      CcState.appendCcEdges(s, ccWh(dir), "cc",
        pairs.filter(night === 1), "id_a", "id_b", seq = 1)
      CcState.appendCcEdges(s, ccWh(dir), "cc",
        pairs.filter(night === 2), "id_a", "id_b", seq = 2)
    }
  }

  /** documents ∪ exact copies (every 5th, id+100000) ∪ near-dups with the
    * last token dropped (every 7th, id+200000). Twin of DuckSql.CorpusCte.
    */
  def corpusWithDups(s: SparkSession, dir: String): DataFrame = {
    // every consumer tokenizes/shingles/hashes each text row — fan the
    // degenerate single-row-group scan out before that CPU-bound work
    val d = Tables.fanOut(
      t(s, dir, "documents").select("doc_id", "text"), col("doc_id"))
    val exact = d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val toks = TextAnalysis.tokens(col("text"))
    val near = d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat_ws(" ", slice(toks, lit(1), size(toks) - 1)).as("text"))
    d.unionAll(exact).unionAll(near)
  }

  /** The incremental-ingest batch fixture over a (doc_id, text) corpus:
    * exact copies (every 5th, id+100000) ∪ last-token near-dups (every
    * 7th, id+200000) ∪ genuinely-new token-sorted variants (every 11th,
    * id+300000). Shared by both incremental queries and their oracle.
    */
  def incrementalBatch(d: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val exact = d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val near = d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat_ws(" ", slice(toks, lit(1), size(toks) - 1)).as("text"))
    val fresh = d.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 300000).as("doc_id"),
        concat_ws(" ", sort_array(toks)).as("text"))
    exact.unionAll(near).unionAll(fresh)
  }

  private def minhashAggSql(rel: String): String = {
    val mins = (0 until NumHashes)
      .map(i => s"MIN((h * ${Dedup.MinhashA(i)} + ${Dedup.MinhashB(i)}) " +
        s"% ${Dedup.MinhashPrime}) AS mh$i")
      .mkString(", ")
    s"""SELECT doc_id, $mins
        FROM (SELECT doc_id,
                     ${DuckSql.md5Long("shingle")} & ${Dedup.MinhashMask} AS h
              FROM $rel)
        GROUP BY doc_id"""
  }

  /** SQL twin of Dedup's banded bucket keys (CASE arm per band over the
    * md5 of the signature slice) — shared by every LSH oracle.
    */
  private def bandArmsSql: String = {
    val rows = NumHashes / Bands
    (0 until Bands).map { b =>
      val cat = (0 until rows).map(r => s"mh${b * rows + r}::VARCHAR")
        .mkString(" || ',' || ")
      s"WHEN $b THEN ${DuckSql.md5Long(cat)}"
    }.mkString(" ")
  }

  /** SQL twin of the est-Jaccard agreement count between two sig aliases. */
  private def agreeSql(sa: String, sb: String): String =
    (0 until NumHashes)
      .map(i => s"CASE WHEN $sa.mh$i = $sb.mh$i THEN 1 ELSE 0 END")
      .mkString(" + ")

  /** SQL twin of [[incrementalBatch]] — the batch CTE shared by the
    * incremental-dedup oracles and the bloom anti-join oracle.
    */
  private lazy val BatchCteSql: String = {
    val tk = DuckSql.tokens("text")
    s"""batch AS (
             SELECT doc_id + 100000 AS doc_id, text
             FROM documents WHERE doc_id % 5 = 0
             UNION ALL
             SELECT doc_id + 200000,
                    array_to_string(($tk)[1:len($tk) - 1], ' ')
             FROM documents WHERE doc_id % 7 = 0
             UNION ALL
             SELECT doc_id + 300000,
                    array_to_string(list_sort($tk), ' ')
             FROM documents WHERE doc_id % 11 = 0)"""
  }

  /** Oracle for BOTH incremental forms (recompute and stored state): the
    * full batch-vs-corpus pipeline in SQL — exact dedup, md5 anti-join,
    * within-batch LSH, asymmetric batch×corpus LSH.
    */
  private lazy val IncrementalOracleSql: String = {
    val bandArms = bandArmsSql
    def agree(sa: String, sb: String) = agreeSql(sa, sb)
    s"""WITH $BatchCteSql,
           bex AS (SELECT MIN(doc_id) AS doc_id, text
                   FROM batch GROUP BY text),
           bfr AS (SELECT doc_id, text FROM bex
                   WHERE NOT EXISTS (SELECT 1 FROM documents d
                                     WHERE d.text = bex.text)),
           ${DuckSql.shingleCte("bfr", ShingleN, "b")},
           ${DuckSql.shingleCte("documents", ShingleN, "c")},
           bsig AS (${minhashAggSql("bsh")}),
           csig AS (${minhashAggSql("csh")}),
           bbnd AS (SELECT doc_id, b, CASE b $bandArms END AS bh
                    FROM bsig CROSS JOIN
                      (SELECT unnest(generate_series(0, ${Bands - 1})) AS b)),
           cbnd AS (SELECT doc_id, b, CASE b $bandArms END AS bh
                    FROM csig CROSS JOIN
                      (SELECT unnest(generate_series(0, ${Bands - 1})) AS b)),
           icand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                     FROM bbnd x JOIN bbnd y
                       ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id),
           iloser AS (SELECT DISTINCT id_b FROM icand
                      JOIN bsig sa ON sa.doc_id = id_a
                      JOIN bsig sb ON sb.doc_id = id_b
                      WHERE (${agree("sa", "sb")})::DOUBLE / $NumHashes >= 0.5),
           xcand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                     FROM bbnd x JOIN cbnd y
                       ON x.b = y.b AND x.bh = y.bh),
           xloser AS (SELECT DISTINCT id_a FROM xcand
                      JOIN bsig sa ON sa.doc_id = id_a
                      JOIN csig sb ON sb.doc_id = id_b
                      WHERE (${agree("sa", "sb")})::DOUBLE / $NumHashes >= 0.5)
        SELECT doc_id FROM bfr
        WHERE doc_id NOT IN (SELECT id_b FROM iloser)
          AND doc_id NOT IN (SELECT id_a FROM xloser)"""
  }

  /** Exact all-pairs transitive-closure oracle shared by both semantic-
    * dedup forms (live-trained and stored-centroid blocking).
    */
  private lazy val SemanticOracleSql: String =
    s"""WITH RECURSIVE ${DuckSql.EmbCte},
            pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                      FROM emb a JOIN emb b ON a.vec_id < b.vec_id
                      WHERE ${DuckSql.cosine("a", "b")} >= 0.45),
            und AS (SELECT id_a AS src, id_b AS dst FROM pairs
                    UNION ALL
                    SELECT id_b, id_a FROM pairs),
            walk(src, dst) AS (
              SELECT src, dst FROM und
              UNION
              SELECT w.src, u.dst FROM walk w JOIN und u ON w.dst = u.src),
            comp AS (SELECT src AS id, MIN(dst) AS mn
                     FROM walk GROUP BY src),
            losers AS (SELECT id FROM comp WHERE mn < id)
        SELECT vec_id FROM emb
        WHERE vec_id NOT IN (SELECT id FROM losers)"""

  val all: Seq[DeclaredQuery] = Seq(

    // Blocked fuzzy RECORD LINKAGE with mutual best match: a dirty copy
    // of every 7th customer (distance-1 name corruption, disjoint id
    // space) links back to its source through a name-suffix block +
    // levenshtein + both-sides-rank-1 assignment. Non-matching
    // same-block pairs (distance 2) enter the candidate set and must be
    // eliminated by the mutual-best filter, so the assignment logic is
    // what's verified, not just the scoring.
    DeclaredQuery(
      "q_record_linkage",
      (s, dir) => {
        import graft.ext.RecordLinkage
        val cust = t(s, dir, "customer")
        val blk = substring(col("c_name"), -3, 3)
        val leftDf = cust.select(col("c_custkey").cast("long").as("id"),
          col("c_name").as("name"), blk.as("blk"))
        val rightDf = cust.filter(col("c_custkey") % 7 === 0)
          .select((col("c_custkey") + 1000000L).cast("long").as("id"),
            regexp_replace(col("c_name"), "^Customer", "Kustomer").as("name"),
            blk.as("blk"))
        RecordLinkage.link(leftDf, rightDf, "id", "name", "blk", maxDist = 2)
      },
      Some("""WITH l AS (SELECT CAST(c_custkey AS BIGINT) AS l_id, c_name AS l_name,
                              substr(c_name, length(c_name) - 2, 3) AS block
                       FROM customer),
              r AS (SELECT CAST(c_custkey + 1000000 AS BIGINT) AS r_id,
                           regexp_replace(c_name, '^Customer', 'Kustomer') AS r_name,
                           substr(c_name, length(c_name) - 2, 3) AS block
                    FROM customer WHERE c_custkey % 7 = 0),
              cand AS (SELECT l_id, r_id, levenshtein(l_name, r_name) AS dist
                       FROM l JOIN r USING (block)
                       WHERE levenshtein(l_name, r_name) <= 2),
              rk AS (SELECT *,
                            ROW_NUMBER() OVER (PARTITION BY l_id
                              ORDER BY dist, r_id) AS rl,
                            ROW_NUMBER() OVER (PARTITION BY r_id
                              ORDER BY dist, l_id) AS rr
                     FROM cand)
              SELECT l_id, r_id, CAST(dist AS BIGINT) AS dist
              FROM rk WHERE rl = 1 AND rr = 1""")),

    // Exact dedup: one survivor (min id) per distinct text; planted exact
    // copies must vanish, near-dup variants must survive.
    DeclaredQuery(
      "q_dedup_exact",
      (s, dir) =>
        Dedup.exactDedup(corpusWithDups(s, dir), col("text"), "doc_id")
          .select("doc_id"),
      Some(s"""WITH ${DuckSql.CorpusCte}
               SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY text""")),

    // MinHash signatures (k=8 md5-seeded hash mins over 3-gram shingles).
    DeclaredQuery(
      "q_minhash_sig",
      (s, dir) =>
        Dedup.minhashSignatures(
          t(s, dir, "documents"), col("text"), "doc_id", NumHashes, ShingleN),
      Some(s"""WITH ${DuckSql.shingleCte("documents", ShingleN)}
               ${minhashAggSql("sh")}""")),

    // MinHash + LSH: banded signatures (4 bands × 2 rows) → bucket-join
    // candidates → est. Jaccard ≥ 0.5. Never compares all pairs.
    DeclaredQuery(
      "q_minhash_lsh",
      (s, dir) => {
        val sig = Dedup.minhashSignatures(
          corpusWithDups(s, dir), col("text"), "doc_id", NumHashes, ShingleN)
        Dedup.lshCandidatePairs(sig, "doc_id", NumHashes, Bands)
          .filter(col("est_jaccard") >= 0.5)
      },
      Some {
        val bandArms = bandArmsSql
        val agree = agreeSql("sa", "sb")
        s"""WITH ${DuckSql.CorpusCte},
                 ${DuckSql.shingleCte("corpus", ShingleN)},
                 sig AS (${minhashAggSql("sh")}),
                 bnd AS (SELECT doc_id, b, CASE b $bandArms END AS bh
                         FROM sig CROSS JOIN
                           (SELECT unnest(generate_series(0, ${Bands - 1})) AS b)),
                 cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                          FROM bnd x JOIN bnd y
                            ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id)
            SELECT id_a, id_b, ($agree)::DOUBLE / $NumHashes AS est_jaccard
            FROM cand
            JOIN sig sa ON sa.doc_id = id_a
            JOIN sig sb ON sb.doc_id = id_b
            WHERE ($agree)::DOUBLE / $NumHashes >= 0.5"""
      }),

    // LSH candidates VERIFIED by exact Levenshtein distance — the fuzzy
    // record-linkage confirm stage. Runs on the lang='en' slice: English
    // test docs are pure ASCII (asserted at all SFs), where Spark's
    // codepoint-based and DuckDB's byte-based levenshtein provably agree;
    // the operator itself is codepoint-correct on all languages.
    DeclaredQuery(
      "q_edit_neardup",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .filter(col("lang") === "en").select("doc_id", "text")
        val toks = TextAnalysis.tokens(col("text"))
        val exact = d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text"))
        val near = d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat_ws(" ", slice(toks, lit(1), size(toks) - 1)).as("text"))
        Dedup.editVerifiedPairs(d.unionAll(exact).unionAll(near),
          col("text"), "doc_id", NumHashes, Bands, ShingleN, maxDist = 16)
      },
      Some {
        val tk = DuckSql.tokens("text")
        s"""WITH encorpus AS (
                  SELECT doc_id, text FROM documents WHERE lang = 'en'
                  UNION ALL
                  SELECT doc_id + 100000, text FROM documents
                  WHERE lang = 'en' AND doc_id % 5 = 0
                  UNION ALL
                  SELECT doc_id + 200000,
                         array_to_string(($tk)[1:len($tk) - 1], ' ')
                  FROM documents WHERE lang = 'en' AND doc_id % 7 = 0),
                ${DuckSql.shingleCte("encorpus", ShingleN)},
                sig AS (${minhashAggSql("sh")}),
                bnd AS (SELECT doc_id, b, CASE b $bandArmsSql END AS bh
                        FROM sig CROSS JOIN
                          (SELECT unnest(generate_series(0, ${Bands - 1})) AS b)),
                cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                         FROM bnd x JOIN bnd y
                           ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id)
           SELECT id_a, id_b, levenshtein(ca.text, cb.text) AS edit_dist
           FROM cand
           JOIN encorpus ca ON ca.doc_id = id_a
           JOIN encorpus cb ON cb.doc_id = id_b
           WHERE levenshtein(ca.text, cb.text) <= 16"""
      }),

    // PageRank over the LSH candidate-pair graph in FIXED-POINT integers
    // (ranks at 1e6, damping 85/100 as a rational, integer divisions
    // everywhere) — centrality-based canonical-document scoring over the
    // duplicate graph, bit-exact in both engines; the oracle unrolls the
    // 3 iterations as chained CTEs.
    DeclaredQuery(
      "q_pagerank",
      (s, dir) => {
        val sig = Dedup.minhashSignatures(
          corpusWithDups(s, dir), col("text"), "doc_id", NumHashes, ShingleN)
        val pairs = Dedup.lshCandidatePairs(sig, "doc_id", NumHashes, Bands)
          .filter(col("est_jaccard") >= 0.5)
        graft.ext.Graph.pageRank(pairs, "id_a", "id_b", iters = 3)
          .select(col("id").as("doc_id"), col("rank"))
      },
      Some {
        val bandArms = bandArmsSql
        val agree = agreeSql("sa", "sb")
        def iter(prev: String, out: String) =
          s"""c$out AS (SELECT dst AS id, SUM(rank // deg) AS contrib
                        FROM und JOIN $prev r ON r.id = und.src
                        JOIN deg ON deg.src = und.src
                        GROUP BY dst),
              r$out AS (SELECT d.src AS id,
                               150000 + (85 * COALESCE(contrib, 0)) // 100 AS rank
                        FROM deg d LEFT JOIN c$out c ON c.id = d.src)"""
        s"""WITH ${DuckSql.CorpusCte},
                 ${DuckSql.shingleCte("corpus", ShingleN)},
                 sig AS (${minhashAggSql("sh")}),
                 bnd AS (SELECT doc_id, b, CASE b $bandArms END AS bh
                         FROM sig CROSS JOIN
                           (SELECT unnest(generate_series(0, ${Bands - 1})) AS b)),
                 cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                          FROM bnd x JOIN bnd y
                            ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id),
                 pairs AS (SELECT id_a, id_b FROM cand
                           JOIN sig sa ON sa.doc_id = id_a
                           JOIN sig sb ON sb.doc_id = id_b
                           WHERE ($agree)::DOUBLE / $NumHashes >= 0.5),
                 und AS (SELECT id_a AS src, id_b AS dst FROM pairs
                         UNION
                         SELECT id_b, id_a FROM pairs),
                 deg AS (SELECT src, COUNT(*) AS deg FROM und GROUP BY src),
                 r0 AS (SELECT src AS id, 1000000 AS rank FROM deg),
                 ${iter("r0", "1")},
                 ${iter("r1", "2")},
                 ${iter("r2", "3")}
            SELECT id AS doc_id, CAST(rank AS BIGINT) AS rank FROM r3"""
      }),

    // Per-node TRIANGLE counts over the same LSH candidate-pair graph as
    // q_pagerank — dense-cluster evidence per document. The implementation
    // orients edges by (degree, id) so wedge fan-out is hub-bounded
    // (O(√m) out-degrees); the oracle counts via plain id-ordering —
    // orientation never changes the triangle set, so equality doubles as
    // a check that the orientation logic drops/duplicates nothing.
    DeclaredQuery(
      "q_triangles",
      (s, dir) => {
        val sig = Dedup.minhashSignatures(
          corpusWithDups(s, dir), col("text"), "doc_id", NumHashes, ShingleN)
        val pairs = Dedup.lshCandidatePairs(sig, "doc_id", NumHashes, Bands)
          .filter(col("est_jaccard") >= 0.5)
        graft.ext.Graph.triangleCounts(pairs, "id_a", "id_b")
          .select(col("id").as("doc_id"), col("n_triangles"))
      },
      Some {
        val bandArms = bandArmsSql
        val agree = agreeSql("sa", "sb")
        s"""WITH ${DuckSql.CorpusCte},
                 ${DuckSql.shingleCte("corpus", ShingleN)},
                 sig AS (${minhashAggSql("sh")}),
                 bnd AS (SELECT doc_id, b, CASE b $bandArms END AS bh
                         FROM sig CROSS JOIN
                           (SELECT unnest(generate_series(0, ${Bands - 1})) AS b)),
                 cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                          FROM bnd x JOIN bnd y
                            ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id),
                 pairs AS (SELECT id_a, id_b FROM cand
                           JOIN sig sa ON sa.doc_id = id_a
                           JOIN sig sb ON sb.doc_id = id_b
                           WHERE ($agree)::DOUBLE / $NumHashes >= 0.5),
                 und AS (SELECT id_a AS u, id_b AS v FROM pairs
                         UNION
                         SELECT id_b, id_a FROM pairs),
                 deg AS (SELECT u, COUNT(*) AS deg FROM und GROUP BY u),
                 canon AS (SELECT u AS a, v AS b FROM und WHERE u < v),
                 tri AS (SELECT e1.a, e1.b, e2.b AS c
                         FROM canon e1
                         JOIN canon e2 ON e2.a = e1.b
                         JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b),
                 corners AS (SELECT a AS id FROM tri
                             UNION ALL SELECT b FROM tri
                             UNION ALL SELECT c FROM tri),
                 per AS (SELECT id, COUNT(*) AS n FROM corners GROUP BY id)
            SELECT u AS doc_id, CAST(COALESCE(n, 0) AS BIGINT) AS n_triangles
            FROM deg LEFT JOIN per ON per.id = deg.u"""
      }),

    // INCREMENTALLY-maintained component labels over the LSH pair graph:
    // the dup-cluster state that absorbs each night's new pairs without
    // recomputing the whole graph. Edges split across three "nights" by
    // endpoint arithmetic; the stored chain (bootstrap CC + two quotient-
    // graph folds) must equal the from-scratch closure over ALL pairs —
    // which is exactly what the recursive oracle computes. Labels are
    // component minima, so the whole relation hash-verifies.
    DeclaredQuery(
      "q_cc_stored",
      (s, dir) => {
        import graft.ext.CcState
        val pairs = ccPairs(s, dir).localCheckpoint(true)
        val night = pmod(col("id_a") + col("id_b"), lit(3))
        CcState.appendCcEdges(s, ccWh(dir), "cc",
          pairs.filter(night === 1), "id_a", "id_b", seq = 1)
        CcState.appendCcEdges(s, ccWh(dir), "cc",
          pairs.filter(night === 2), "id_a", "id_b", seq = 2)
        CcState.readCcLabels(s, ccWh(dir), "cc")
          .select(col("node").as("doc_id"), col("comp"))
      },
      setup = Some((s, dir) => seedCcState(s, dir, allBatches = false)),
      oracle = Some {
        val bandArms = bandArmsSql
        val agree = agreeSql("sa", "sb")
        s"""WITH RECURSIVE ${DuckSql.CorpusCte},
                 ${DuckSql.shingleCte("corpus", ShingleN)},
                 sig AS (${minhashAggSql("sh")}),
                 bnd AS (SELECT doc_id, b, CASE b $bandArms END AS bh
                         FROM sig CROSS JOIN
                           (SELECT unnest(generate_series(0, ${Bands - 1})) AS b)),
                 cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                          FROM bnd x JOIN bnd y
                            ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id),
                 pairs AS (SELECT id_a, id_b FROM cand
                           JOIN sig sa ON sa.doc_id = id_a
                           JOIN sig sb ON sb.doc_id = id_b
                           WHERE ($agree)::DOUBLE / $NumHashes >= 0.5),
                 und AS (SELECT id_a AS src, id_b AS dst FROM pairs
                         UNION ALL
                         SELECT id_b, id_a FROM pairs),
                 walk(src, dst) AS (
                   SELECT src, dst FROM und
                   UNION
                   SELECT w.src, u.dst FROM walk w JOIN und u ON w.dst = u.src),
                 comp AS (SELECT src AS id, MIN(dst) AS mn
                          FROM walk GROUP BY src)
            SELECT id AS doc_id, LEAST(id, mn) AS comp FROM comp"""
      }),

    // Canonical-document election SERVED FROM THE STORED LABELS: the
    // nightly composition the incremental CC state exists for — "keep
    // the best copy per cluster" without recomputing the graph. The
    // serving read is the label fold + one quality join + one per-
    // component window; the pair graph appears nowhere. Oracle = the
    // full closure + quality argmax from scratch: maintained ≡
    // recomputed IS the check.
    DeclaredQuery(
      "q_canonical_stored",
      (s, dir) => {
        import graft.ext.CcState
        val labels = CcState.readCcLabels(s, ccWh(dir), "cc")
        val quality = TextAnalysis.withTextStats(
            corpusWithDups(s, dir), "text")
          .select(col("doc_id"), col("quality_score"))
        Dedup.canonicalPerComponent(
            labels.join(quality, labels("node") === quality("doc_id"))
              .select(col("comp"), col("doc_id"), col("quality_score")),
            "comp",
            Seq(col("quality_score").desc, col("doc_id").asc))
          .select(col("comp"), col("doc_id").as("canonical_id"),
            col("quality_score").as("canonical_quality"), col("n_members"))
      },
      setup = Some((s, dir) => seedCcState(s, dir, allBatches = true)),
      oracle = Some {
        val bandArms = bandArmsSql
        val agree = agreeSql("sa", "sb")
        val qs = DuckSql.qualityScore("text", "toks")
        s"""WITH RECURSIVE ${DuckSql.CorpusCte},
                 ${DuckSql.shingleCte("corpus", ShingleN)},
                 sig AS (${minhashAggSql("sh")}),
                 bnd AS (SELECT doc_id, b, CASE b $bandArms END AS bh
                         FROM sig CROSS JOIN
                           (SELECT unnest(generate_series(0, ${Bands - 1})) AS b)),
                 cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                          FROM bnd x JOIN bnd y
                            ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id),
                 pairs AS (SELECT id_a, id_b FROM cand
                           JOIN sig sa ON sa.doc_id = id_a
                           JOIN sig sb ON sb.doc_id = id_b
                           WHERE ($agree)::DOUBLE / $NumHashes >= 0.5),
                 und AS (SELECT id_a AS src, id_b AS dst FROM pairs
                         UNION ALL
                         SELECT id_b, id_a FROM pairs),
                 walk(src, dst) AS (
                   SELECT src, dst FROM und
                   UNION
                   SELECT w.src, u.dst FROM walk w JOIN und u ON w.dst = u.src),
                 cmp AS (SELECT src AS id, LEAST(src, MIN(dst)) AS comp
                         FROM walk GROUP BY src),
                 tkq AS (SELECT doc_id, ${DuckSql.tokens("text")} AS toks, text
                        FROM corpus),
                 ql AS (SELECT doc_id, $qs AS quality_score FROM tkq),
                 mem AS (SELECT cmp.comp, cmp.id AS doc_id, ql.quality_score
                         FROM cmp JOIN ql ON ql.doc_id = cmp.id),
                 rk AS (SELECT comp, doc_id, quality_score,
                               COUNT(*) OVER (PARTITION BY comp) AS n_members,
                               row_number() OVER (PARTITION BY comp
                                 ORDER BY quality_score DESC, doc_id ASC) AS rn
                        FROM mem)
            SELECT comp, doc_id AS canonical_id,
                   quality_score AS canonical_quality, n_members
            FROM rk WHERE rn = 1"""
      }),

    // 2-CORE of the same LSH pair graph: documents that survive
    // iterative degree-2 peeling, with their within-core degree — the
    // density split between template families (deep cores) and
    // transitive chain artifacts (peeled away). The oracle unrolls
    // exactly KCoreIters peel rounds; the implementation stops at the
    // fixpoint — post-fixpoint peels are no-ops, so the two agree on any
    // input (the idempotence argument in Graph.kCore's scaladoc).
    DeclaredQuery(
      "q_kcore",
      (s, dir) => {
        val sig = Dedup.minhashSignatures(
          corpusWithDups(s, dir), col("text"), "doc_id", NumHashes, ShingleN)
        val pairs = Dedup.lshCandidatePairs(sig, "doc_id", NumHashes, Bands)
          .filter(col("est_jaccard") >= 0.5)
        graft.ext.Graph.kCore(pairs, "id_a", "id_b", k = KCoreK,
            maxIter = KCoreIters)
          .select(col("node").as("doc_id"), col("deg"))
      },
      Some {
        val bandArms = bandArmsSql
        val agree = agreeSql("sa", "sb")
        val peels = (1 to KCoreIters).map { i =>
          s"""k$i AS MATERIALIZED (SELECT src FROM e${i - 1} GROUP BY src
                      HAVING COUNT(*) >= $KCoreK),
              e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e${i - 1} e
                      JOIN k$i ks ON e.src = ks.src
                      JOIN k$i kd ON e.dst = kd.src)"""
        }.mkString(",\n                 ")
        s"""WITH ${DuckSql.CorpusCte},
                 ${DuckSql.shingleCte("corpus", ShingleN)},
                 sig AS (${minhashAggSql("sh")}),
                 bnd AS (SELECT doc_id, b, CASE b $bandArms END AS bh
                         FROM sig CROSS JOIN
                           (SELECT unnest(generate_series(0, ${Bands - 1})) AS b)),
                 cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                          FROM bnd x JOIN bnd y
                            ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id),
                 pairs AS (SELECT id_a, id_b FROM cand
                           JOIN sig sa ON sa.doc_id = id_a
                           JOIN sig sb ON sb.doc_id = id_b
                           WHERE ($agree)::DOUBLE / $NumHashes >= 0.5),
                 e0 AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
                        UNION
                        SELECT id_b, id_a FROM pairs),
                 $peels
            SELECT src AS doc_id, COUNT(*) AS deg
            FROM e$KCoreIters GROUP BY src"""
      }),

    // Exact n-gram Jaccard via the inverted shingle index (common-shingle
    // join), threshold 0.6.
    DeclaredQuery(
      "q_jaccard_pairs",
      (s, dir) =>
        Dedup.jaccardPairs(
          corpusWithDups(s, dir), col("text"), "doc_id", ShingleN, 0.6),
      Some(s"""WITH ${DuckSql.CorpusCte},
                    ${DuckSql.shingleCte("corpus", ShingleN)},
                    sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
                    cm AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                                  COUNT(*) AS common
                           FROM sh a JOIN sh b
                             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                           GROUP BY a.doc_id, b.doc_id)
               SELECT id_a, id_b,
                      common::DOUBLE / (za.sz + zb.sz - common) AS jaccard
               FROM cm
               JOIN sz za ON za.doc_id = id_a
               JOIN sz zb ON zb.doc_id = id_b
               WHERE common::DOUBLE / (za.sz + zb.sz - common) >= 0.6""")),

    // Directed CONTAINMENT pairs (near-subset detection): c(A→B) =
    // |A∩B|/|A| ≥ 0.9 over shingle sets. The planted truncated near-dups
    // are the canonical catch — c(truncated→original) = 1.0 even where
    // symmetric Jaccard would sit below a dedup threshold; one-sided
    // rarity-ordered prefix filtering keeps recall exact (pigeonhole).
    DeclaredQuery(
      "q_containment",
      (s, dir) =>
        Dedup.containmentPairs(
          corpusWithDups(s, dir), col("text"), "doc_id", ShingleN, 0.9),
      Some(s"""WITH ${DuckSql.CorpusCte},
                    ${DuckSql.shingleCte("corpus", ShingleN)},
                    sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
                    cm AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                                  COUNT(*) AS common
                           FROM sh a JOIN sh b
                             ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
                           GROUP BY a.doc_id, b.doc_id)
               SELECT id_a, id_b, common::DOUBLE / za.sz AS containment
               FROM cm JOIN sz za ON za.doc_id = id_a
               WHERE common::DOUBLE / za.sz >= 0.9""")),

    // SimHash signatures: 48-bit bit-majority over distinct bigram-shingle
    // hashes (unigrams collapse on small vocabularies — see Dedup scaladoc).
    DeclaredQuery(
      "q_simhash",
      (s, dir) =>
        Dedup.simhashSignatures(t(s, dir, "documents"), col("text"), "doc_id"),
      Some(s"""WITH ${DuckSql.shingleCte("documents", 2)},
                    hv AS (SELECT doc_id, ${DuckSql.md5Long("shingle")} AS h FROM sh),
                    bv AS (SELECT doc_id, b,
                                  SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
                           FROM hv CROSS JOIN
                             (SELECT unnest(generate_series(0, ${Dedup.SimHashBits - 1})) AS b)
                           GROUP BY doc_id, b)
               SELECT doc_id,
                      CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)
                           AS BIGINT) AS simhash
               FROM bv GROUP BY doc_id""")),

    // SimHash near-dup pairs: banded blocking (7 bands × 6 bits; pigeonhole
    // guarantees recall at hamming ≤ 6), then exact hamming check.
    DeclaredQuery(
      "q_simhash_neardup",
      (s, dir) =>
        Dedup.simhashNearDupPairs(
          Dedup.simhashSignatures(corpusWithDups(s, dir), col("text"), "doc_id"),
          "doc_id", maxDist = 6),
      Some {
        val maxDist = 6
        val bands = maxDist + 1
        val width = Dedup.SimHashBits / bands
        s"""WITH ${DuckSql.CorpusCte},
                 ${DuckSql.shingleCte("corpus", 2)},
                 hv AS (SELECT doc_id, ${DuckSql.md5Long("shingle")} AS h FROM sh),
                 bv AS (SELECT doc_id, b,
                               SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
                        FROM hv CROSS JOIN
                          (SELECT unnest(generate_series(0, ${Dedup.SimHashBits - 1})) AS b)
                        GROUP BY doc_id, b),
                 sig AS (SELECT doc_id,
                                SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS simhash
                         FROM bv GROUP BY doc_id),
                 bkt AS (SELECT doc_id, simhash, b,
                                (simhash >> (b * $width)) & ${(1L << width) - 1} AS bv
                         FROM sig CROSS JOIN
                           (SELECT unnest(generate_series(0, ${bands - 1})) AS b)),
                 cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
                                 bit_count(xor(x.simhash, y.simhash)) AS hamming
                          FROM bkt x JOIN bkt y
                            ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id)
            SELECT id_a, id_b, hamming FROM cand WHERE hamming <= $maxDist"""
      }),

    // End-to-end dedup: exact + MinHash-LSH, min-id survivor per detected
    // pair — the one-call operator for corpus cleaning. Planted exact
    // copies AND near-dup variants must both vanish.
    DeclaredQuery(
      "q_near_dedup",
      (s, dir) =>
        Dedup.nearDedup(corpusWithDups(s, dir), col("text"), "doc_id",
            NumHashes, Bands, ShingleN, estJaccardThreshold = 0.5)
          .select("doc_id"),
      Some {
        val bandArms = bandArmsSql
        val agree = agreeSql("sa", "sb")
        s"""WITH ${DuckSql.CorpusCte},
                 exact AS (SELECT MIN(doc_id) AS doc_id, text
                           FROM corpus GROUP BY text),
                 ${DuckSql.shingleCte("exact", ShingleN)},
                 sig AS (${minhashAggSql("sh")}),
                 bnd AS (SELECT doc_id, b, CASE b $bandArms END AS bh
                         FROM sig CROSS JOIN
                           (SELECT unnest(generate_series(0, ${Bands - 1})) AS b)),
                 cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                          FROM bnd x JOIN bnd y
                            ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id),
                 losers AS (SELECT DISTINCT id_b FROM cand
                            JOIN sig sa ON sa.doc_id = id_a
                            JOIN sig sb ON sb.doc_id = id_b
                            WHERE ($agree)::DOUBLE / $NumHashes >= 0.5)
            SELECT doc_id FROM exact
            WHERE doc_id NOT IN (SELECT id_b FROM losers)"""
      }),

    // INCREMENTAL dedup — the production ingestion shape: a new batch
    // (exact copies ∪ last-token near-dups ∪ genuinely-new token-sorted
    // variants) cleaned against the existing corpus WITHOUT corpus
    // self-joins. Exact copies must all vanish (stage-2 md5 anti-join),
    // near-dups vanish where LSH estimates ≥0.5 vs the corpus, sorted
    // variants survive (different shingles).
    DeclaredQuery(
      "q_incremental_dedup",
      (s, dir) => {
        val d = t(s, dir, "documents").select("doc_id", "text")
        Dedup.incrementalDedup(d, incrementalBatch(d),
            col("text"), "doc_id", NumHashes, Bands, ShingleN,
            estJaccardThreshold = 0.5)
          .select("doc_id")
      },
      Some(IncrementalOracleSql)),

    // Incremental dedup against STORED warehouse state: the corpus's
    // text_md5 + signature relations are bucketed warehouse tables written
    // once (writeDedupState); the nightly run reads them instead of
    // re-scanning/re-hashing the corpus — O(batch) per night. The oracle
    // is the SAME SQL as q_incremental_dedup: output equivalence of the
    // stored and recompute paths IS the check (plus IncrementalStoredSpec,
    // which pins that the stored path's plan never scans the corpus).
    DeclaredQuery(
      "q_incremental_dedup_stored",
      (s, dir) => {
        val d = t(s, dir, "documents").select("doc_id", "text")
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val wh = s"/tmp/graft_wh$tag"
        // night-0 state build runs ONCE per session (the operator's whole
        // point is that the state is persisted); repeat invocations — e.g.
        // Bench samples — measure the nightly O(batch) shape. Deterministic
        // content, so a rebuild would write identical relations anyway.
        if (!Tables.bucketedStateLive(s, wh,
            Seq(s"docs${tag}_sigs", s"docs${tag}_hashes")))
          Dedup.writeDedupState(d, col("text"), "doc_id", NumHashes, ShingleN,
            wh, s"docs$tag", numBuckets = 8)
        Dedup.incrementalDedupStored(s, s"docs$tag", incrementalBatch(d),
            col("text"), "doc_id", NumHashes, Bands, ShingleN,
            estJaccardThreshold = 0.5)
          .select("doc_id")
      },
      Some(IncrementalOracleSql)),

    // Stored-state incremental dedup with the exact stage BLOOM-prefiltered:
    // the third state relation ({name}_bloom, written once with the hash
    // and signature tables) routes definite-miss batch rows past the
    // shuffled anti-join. Same oracle as the other two incremental forms —
    // three-way path equivalence IS the check.
    DeclaredQuery(
      "q_incremental_dedup_bloom",
      (s, dir) => {
        val d = t(s, dir, "documents").select("doc_id", "text")
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val wh = s"/tmp/graft_wh$tag"
        if (!Tables.bucketedStateLive(s, wh,
            Seq(s"docs${tag}_bloom", s"docs${tag}_sigs", s"docs${tag}_hashes")))
          Dedup.writeDedupState(d, col("text"), "doc_id", NumHashes, ShingleN,
            wh, s"docs$tag", numBuckets = 8)
        Dedup.incrementalDedupStoredBloom(s, s"docs$tag", incrementalBatch(d),
            col("text"), "doc_id", NumHashes, Bands, ShingleN,
            estJaccardThreshold = 0.5)
          .select("doc_id")
      },
      Some(IncrementalOracleSql)),

    // Bloom-filtered anti-join — semi-join reduction for the incremental
    // exact stage: the corpus's distinct text-md5 set collapses to one
    // bitset row (partial-agg build, constant-key BHJ fanout); batch rows
    // the bloom clears as definite misses skip the shuffled confirm join.
    // Output is bit-identical to the direct anti-join (the oracle is the
    // plain NOT EXISTS), which IS the correctness check — the bloom never
    // decides membership, only definite absence.
    DeclaredQuery(
      "q_bloom_antijoin",
      (s, dir) => {
        val d = t(s, dir, "documents").select("doc_id", "text")
        graft.ext.BloomJoin.bloomAntiJoin(
            incrementalBatch(d), md5(col("text")), d, md5(col("text")))
          .select("doc_id")
      },
      Some(s"""WITH $BatchCteSql
               SELECT b.doc_id FROM batch b
               WHERE NOT EXISTS (SELECT 1 FROM documents d
                                 WHERE d.text = b.text)""")),

    // Random-hyperplane LSH over embeddings: 48 sign-bits per vector (one
    // codegen map pass, zero shuffle, no training), then the standard
    // SimHash band blocking + exact hamming. Integer hyperplanes make
    // every product float·int exact in double; the only cross-engine
    // divergence is summation-order ULP (~1e-10) vs a measured minimum
    // |dot| margin of 0.02 on this corpus — sign bits cannot flip.
    DeclaredQuery(
      "q_embed_lsh",
      (s, dir) => {
        // corpus ∪ planted near-dups: every 10th vector with dims 0-3
        // zeroed (id+10000) — zeroing is float-exact in both engines and
        // keeps cosine ~0.97, i.e. expected hamming ~4 of 48. The raw
        // corpus alone has NO pairs within hamming 7 (weak 0-row oracle).
        val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
        val planted = emb.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 10000).as("vec_id"),
            transform(col("embedding"),
              (x, i) => when(i < 4, lit(0.0f)).otherwise(x)).as("embedding"))
        Dedup.simhashNearDupPairs(
          Dedup.embeddingSimhash(emb.unionAll(planted), "vec_id", "embedding"),
          "vec_id", maxDist = 7)
      },
      Some {
        val maxDist = 7
        val bands = maxDist + 1
        val width = Dedup.SimHashBits / bands
        s"""WITH embv AS (SELECT vec_id, embedding FROM embeddings
                          UNION ALL
                          SELECT vec_id + 10000,
                                 list_transform(generate_series(1, len(embedding)),
                                   i -> CASE WHEN i <= 4 THEN 0::FLOAT
                                        ELSE embedding[i] END)
                          FROM embeddings WHERE vec_id % 10 = 0),
                 emb AS (SELECT vec_id,
                                list_transform(embedding, x -> x::DOUBLE) AS e
                         FROM embv),
                 planes AS (SELECT j, i,
                              (${DuckSql.md5Long("'hp:' || j || ':' || i")} % 2001) - 1000 AS h
                            FROM (SELECT unnest(generate_series(0, ${Dedup.SimHashBits - 1})) AS j)
                            CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)),
                 dots AS (SELECT v.vec_id, p.j, SUM(v.e[p.i + 1] * p.h) AS d
                          FROM emb v CROSS JOIN planes p
                          GROUP BY v.vec_id, p.j),
                 sig AS (SELECT vec_id,
                                CAST(SUM(CASE WHEN d > 0 THEN (1::BIGINT << j) ELSE 0 END)
                                     AS BIGINT) AS simhash
                         FROM dots GROUP BY vec_id),
                 bkt AS (SELECT vec_id, simhash, b,
                                (simhash >> (b * $width)) & ${(1L << width) - 1} AS bv
                         FROM sig CROSS JOIN
                           (SELECT unnest(generate_series(0, ${bands - 1})) AS b)),
                 cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b,
                                 bit_count(xor(x.simhash, y.simhash)) AS hamming
                          FROM bkt x JOIN bkt y
                            ON x.b = y.b AND x.bv = y.bv AND x.vec_id < y.vec_id)
            SELECT id_a, id_b, hamming FROM cand WHERE hamming <= $maxDist"""
      }),

    // nearDedup with TRANSITIVE CLOSURE: min-label propagation over the
    // LSH pair graph collapses whole duplicate chains (A~B~C) to the
    // min-id survivor in one run — the greedy per-pair drop only removes
    // direct LSH partners. Oracle = full transitive closure via a
    // recursive CTE; the Spark side iterates its pointer-doubled closure
    // to FIXPOINT, so both sides compute the exact closure on any corpus
    // — no diameter budget to size.
    DeclaredQuery(
      "q_near_dedup_cc",
      (s, dir) =>
        Dedup.nearDedupCC(corpusWithDups(s, dir), col("text"), "doc_id",
            NumHashes, Bands, ShingleN, estJaccardThreshold = 0.5)
          .select("doc_id"),
      Some {
        val bandArms = bandArmsSql
        val agree = agreeSql("sa", "sb")
        s"""WITH RECURSIVE ${DuckSql.CorpusCte},
                 exact AS (SELECT MIN(doc_id) AS doc_id, text
                           FROM corpus GROUP BY text),
                 ${DuckSql.shingleCte("exact", ShingleN)},
                 sig AS (${minhashAggSql("sh")}),
                 bnd AS (SELECT doc_id, b, CASE b $bandArms END AS bh
                         FROM sig CROSS JOIN
                           (SELECT unnest(generate_series(0, ${Bands - 1})) AS b)),
                 cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                          FROM bnd x JOIN bnd y
                            ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id),
                 pairs AS (SELECT id_a, id_b FROM cand
                           JOIN sig sa ON sa.doc_id = id_a
                           JOIN sig sb ON sb.doc_id = id_b
                           WHERE ($agree)::DOUBLE / $NumHashes >= 0.5),
                 und AS (SELECT id_a AS src, id_b AS dst FROM pairs
                         UNION ALL
                         SELECT id_b, id_a FROM pairs),
                 walk(src, dst) AS (
                   SELECT src, dst FROM und
                   UNION
                   SELECT w.src, u.dst FROM walk w JOIN und u ON w.dst = u.src),
                 comp AS (SELECT src AS id, MIN(dst) AS mn
                          FROM walk GROUP BY src),
                 losers AS (SELECT id FROM comp WHERE mn < id)
            SELECT doc_id FROM exact
            WHERE doc_id NOT IN (SELECT id FROM losers)"""
      }),

    // Canonical-document selection: label every exact-dedup survivor with
    // its near-dup COMPONENT, then keep the best-QUALITY member per
    // component (doc_id tiebreak) instead of the min id — "keep the best
    // copy, not the first copy". The oracle replays the closure and the
    // Gopher quality score, so component labels, member counts, and the
    // argmax winner all hash-verify.
    DeclaredQuery(
      "q_canonical_docs",
      (s, dir) => {
        val comp = Dedup.nearDedupComponents(corpusWithDups(s, dir),
          col("text"), "doc_id", NumHashes, Bands, ShingleN,
          estJaccardThreshold = 0.5)
        Dedup.canonicalPerComponent(
            TextAnalysis.withTextStats(comp, "text"), "comp",
            Seq(col("quality_score").desc, col("doc_id").asc))
          .select(col("comp"), col("doc_id").as("canonical_id"),
            col("quality_score").as("canonical_quality"), col("n_members"))
      },
      Some {
        val bandArms = bandArmsSql
        val agree = agreeSql("sa", "sb")
        val qs = DuckSql.qualityScore("text", "toks")
        s"""WITH RECURSIVE ${DuckSql.CorpusCte},
                 exact AS (SELECT MIN(doc_id) AS doc_id, text
                           FROM corpus GROUP BY text),
                 ${DuckSql.shingleCte("exact", ShingleN)},
                 sig AS (${minhashAggSql("sh")}),
                 bnd AS (SELECT doc_id, b, CASE b $bandArms END AS bh
                         FROM sig CROSS JOIN
                           (SELECT unnest(generate_series(0, ${Bands - 1})) AS b)),
                 cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                          FROM bnd x JOIN bnd y
                            ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id),
                 pairs AS (SELECT id_a, id_b FROM cand
                           JOIN sig sa ON sa.doc_id = id_a
                           JOIN sig sb ON sb.doc_id = id_b
                           WHERE ($agree)::DOUBLE / $NumHashes >= 0.5),
                 und AS (SELECT id_a AS src, id_b AS dst FROM pairs
                         UNION ALL
                         SELECT id_b, id_a FROM pairs),
                 walk(src, dst) AS (
                   SELECT src, dst FROM und
                   UNION
                   SELECT w.src, u.dst FROM walk w JOIN und u ON w.dst = u.src),
                 comp AS (SELECT src AS id, LEAST(src, MIN(dst)) AS comp
                          FROM walk GROUP BY src),
                 memb AS (SELECT e.doc_id, COALESCE(c.comp, e.doc_id) AS comp,
                                 e.text, ${DuckSql.tokens("e.text")} AS toks
                          FROM exact e LEFT JOIN comp c ON c.id = e.doc_id),
                 scored AS (SELECT doc_id, comp, $qs AS qsc FROM memb),
                 rk AS (SELECT comp, doc_id, qsc,
                               COUNT(*) OVER (PARTITION BY comp) AS n_members,
                               ROW_NUMBER() OVER (PARTITION BY comp
                                 ORDER BY qsc DESC, doc_id ASC) AS rn
                        FROM scored)
            SELECT comp, doc_id AS canonical_id, qsc AS canonical_quality,
                   n_members
            FROM rk WHERE rn = 1"""
      }),

    // Embedding-cosine near-dup pairs, IVF-blocked (k-means centroids,
    // nProbe=4 cluster assignment, candidates only within shared clusters).
    // The ORACLE stays exact all-pairs: hash-green therefore proves the
    // blocked candidate generation reaches 100% recall on this corpus, not
    // just that it mirrors itself. nProbe is generous because 0.45 is a
    // LOW threshold — genuinely cross-cluster pairs qualify (measured: 3 of
    // 14 straddle clusters at nProbe=2, 0 at nProbe=4, with probe-rank
    // margins ≥4e-5, ten orders above summation ULP).
    DeclaredQuery(
      "q_embed_neardup",
      (s, dir) =>
        Dedup.embeddingNearDupPairs(
          t(s, dir, "embeddings"), "vec_id", "embedding", 0.45,
          numCentroids = 10, kmeansIters = 2, nProbe = 4)
          .select("id_a", "id_b"),
      Some(s"""WITH ${DuckSql.EmbCte}
               SELECT a.vec_id AS id_a, b.vec_id AS id_b
               FROM emb a JOIN emb b ON a.vec_id < b.vec_id
               WHERE ${DuckSql.cosine("a", "b")} >= 0.45""")),

    // SemDeDup-style semantic dedup: IVF-blocked cosine pairs → fixpoint
    // min-label closure → min-id survivor per embedding-similarity
    // component. The oracle computes the EXACT all-pairs closure in a
    // recursive CTE, so hash-green proves 100% candidate recall (the
    // closure itself is exact by construction — it iterates to fixpoint).
    DeclaredQuery(
      "q_semantic_dedup",
      (s, dir) =>
        Dedup.semanticDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
            threshold = 0.45, numCentroids = 10, kmeansIters = 2, nProbe = 4)
          .select("vec_id"),
      Some(SemanticOracleSql)),

    // Semantic dedup against the STORED IVF index's centroids (the same
    // persisted index q_ann_ivf_stored searches): repeated runs skip the
    // k-means training jobs — blocking is a map against the centroid
    // broadcast. Same exact-closure oracle; deterministic training means
    // stored ≡ live centroids, so path equivalence and 100% recall are
    // checked at once.
    DeclaredQuery(
      "q_semantic_dedup_stored",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        if (!Tables.bucketedStateLive(s, s"/tmp/graft_wh$tag",
            Seq(s"ivf${tag}_postings", s"ivf${tag}_centroids")))
          graft.ext.Similarity.writeIvfIndex(emb, "vec_id", "embedding",
            numCentroids = 10, kmeansIters = 2,
            s"/tmp/graft_wh$tag", s"ivf$tag", numBuckets = 8)
        Dedup.semanticDedupFrom(emb,
            graft.io.Tables.readWarehouseBucketed(s, s"ivf${tag}_centroids"),
            "vec_id", "embedding", threshold = 0.45, nProbe = 4)
          .select("vec_id")
      },
      Some(SemanticOracleSql)),

    // Sub-document exact dedup (Lee et al.): every 15-token span recurring
    // in ≥2 distinct docs, with its 0-based token offset. The raw corpus
    // carries real repeated segments, so this finds organic duplication,
    // not just planted copies.
    DeclaredQuery(
      "q_dup_spans",
      (s, dir) =>
        Dedup.duplicateSpans(t(s, dir, "documents"), col("text"), "doc_id",
          k = 15),
      Some(s"""WITH ${DupSpanCtes}
               SELECT gram_hash, doc_id, CAST(start AS INT) AS start FROM sh
               JOIN dup USING (gram_hash)""")),

    // Incremental span detection against STORED gram state: batch spans
    // duplicating anything seen before — within the batch or in the
    // persisted corpus gram relation (bucketed on the probe key; the
    // corpus text is never scanned). Oracle recomputes both sources.
    DeclaredQuery(
      "q_dup_spans_stored",
      (s, dir) => {
        val d = t(s, dir, "documents").select("doc_id", "text")
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        if (!Tables.bucketedStateLive(s, s"/tmp/graft_wh$tag",
            Seq(s"spans${tag}_grams")))
          Dedup.writeSpanState(d, col("text"), "doc_id", k = 15,
            s"/tmp/graft_wh$tag", s"spans$tag", numBuckets = 8)
        Dedup.duplicateSpansIncremental(s, s"spans$tag", incrementalBatch(d),
            col("text"), "doc_id", k = 15)
          .select(col("gram_hash"), col("doc_id"), col("start"))
      },
      Some {
        val tk = DuckSql.tokens("text")
        def posGrams(rel: String): String =
          s"""SELECT doc_id, u.st AS start, ${DuckSql.md5Long("u.g")} AS gram_hash
              FROM (SELECT doc_id,
                           unnest(list_transform(generate_series(1, greatest(len(toks) - 14, 1)),
                                  i -> {'st': i - 1,
                                        'g': array_to_string(toks[i:i+14], ' ')})) AS u
                    FROM $rel)"""
        s"""WITH $BatchCteSql,
                btk AS (SELECT doc_id, $tk AS toks FROM batch),
                bsh AS (${posGrams("btk")}),
                ctk AS (SELECT doc_id, $tk AS toks FROM documents),
                csh AS (SELECT DISTINCT gram_hash FROM (${posGrams("ctk")})),
                dup AS (SELECT gram_hash FROM bsh
                        GROUP BY gram_hash HAVING COUNT(DISTINCT doc_id) >= 2
                        UNION
                        SELECT DISTINCT b.gram_hash
                        FROM bsh b JOIN csh c USING (gram_hash))
            SELECT b.gram_hash, b.doc_id, CAST(b.start AS INT) AS start
            FROM bsh b JOIN dup USING (gram_hash)"""
      }),

    // Span REMOVAL: drop every token covered by a duplicated 15-gram and
    // rejoin the remainder in order — the corpus-cleaning form.
    DeclaredQuery(
      "q_strip_dup_spans",
      (s, dir) =>
        Dedup.stripDuplicateSpans(t(s, dir, "documents"), col("text"),
          "doc_id", k = 15),
      Some(s"""WITH ${DupSpanCtes},
                    cov AS (SELECT DISTINCT doc_id, unnest(generate_series(start, start + 14)) AS pos
                            FROM sh JOIN dup USING (gram_hash)),
                    tx AS (SELECT doc_id, u.p AS pos, u.tok AS tok
                           FROM (SELECT doc_id,
                                        unnest(list_transform(generate_series(1, len(toks)),
                                               i -> {'p': i - 1, 'tok': toks[i]})) AS u
                                 FROM tk)),
                    kept AS (SELECT doc_id, pos, tok FROM tx t
                             WHERE NOT EXISTS (SELECT 1 FROM cov c
                                               WHERE c.doc_id = t.doc_id
                                                 AND c.pos = t.pos)),
                    rb AS (SELECT doc_id,
                                  array_to_string(list(tok ORDER BY pos), ' ') AS clean_text
                           FROM kept GROUP BY doc_id)
               SELECT d.doc_id, COALESCE(rb.clean_text, '') AS clean_text
               FROM documents d LEFT JOIN rb USING (doc_id)""")),

    // Span removal, KEEP-FIRST form (Lee et al.): each duplicated gram's
    // canonical occurrence (lowest doc, lowest offset) survives; only the
    // repeats are stripped — one copy of the content stays in the corpus.
    DeclaredQuery(
      "q_strip_spans_keep",
      (s, dir) =>
        Dedup.stripDuplicateSpans(t(s, dir, "documents"), col("text"),
          "doc_id", k = 15, keepFirst = true),
      Some(s"""WITH ${DupSpanCtes},
                    sp AS (SELECT gram_hash, doc_id, start,
                             ROW_NUMBER() OVER (PARTITION BY gram_hash
                               ORDER BY doc_id, start) AS rn
                           FROM sh JOIN dup USING (gram_hash)),
                    cov AS (SELECT DISTINCT doc_id, unnest(generate_series(start, start + 14)) AS pos
                            FROM sp WHERE rn > 1),
                    tx AS (SELECT doc_id, u.p AS pos, u.tok AS tok
                           FROM (SELECT doc_id,
                                        unnest(list_transform(generate_series(1, len(toks)),
                                               i -> {'p': i - 1, 'tok': toks[i]})) AS u
                                 FROM tk)),
                    kept AS (SELECT doc_id, pos, tok FROM tx t
                             WHERE NOT EXISTS (SELECT 1 FROM cov c
                                               WHERE c.doc_id = t.doc_id
                                                 AND c.pos = t.pos)),
                    rb AS (SELECT doc_id,
                                  array_to_string(list(tok ORDER BY pos), ' ') AS clean_text
                           FROM kept GROUP BY doc_id)
               SELECT d.doc_id, COALESCE(rb.clean_text, '') AS clean_text
               FROM documents d LEFT JOIN rb USING (doc_id)""")))

  /** Positional 15-gram shingles + the ≥2-distinct-doc gram relation —
    * shared by the q_dup_spans / q_strip_dup_spans family. Twin of
    * [[graft.ext.Dedup.duplicateSpans]] (start is 0-based).
    */
  private lazy val DupSpanCtes: String =
    s"""tk AS (SELECT doc_id, ${DuckSql.tokens("text")} AS toks FROM documents),
        sh AS (SELECT doc_id, u.st AS start, ${DuckSql.md5Long("u.g")} AS gram_hash
               FROM (SELECT doc_id,
                            unnest(list_transform(generate_series(1, greatest(len(toks) - 14, 1)),
                                   i -> {'st': i - 1,
                                         'g': array_to_string(toks[i:i+14], ' ')})) AS u
                     FROM tk)),
        dup AS (SELECT gram_hash FROM sh GROUP BY gram_hash
                HAVING COUNT(DISTINCT doc_id) >= 2)"""
}
