package graft.queries

import graft.ext.TextAnalysis

/** DuckDB renderings of the extension operators' column expressions.
  *
  * Every fragment here must mirror its Spark twin *bit-for-bit* — same
  * tokenizer regex, same md5-derived hashes ([[graft.functions.Hashing]]),
  * same integer→double divisions — so the driver's hash-compare gate
  * verifies semantics, not just row counts. Dialect notes:
  *  - DuckDB `regexp_replace` needs the explicit 'g' flag (Spark replaces
  *    all matches by default).
  *  - DuckDB list slicing `l[i:j]` is 1-based inclusive; Spark `slice(l,i,n)`
  *    is 1-based start + length — fragments use the inclusive-end form with
  *    matching bounds.
  *  - Both engines are leftmost-first regex (Java / RE2), so alternation
  *    patterns count identically.
  */
object DuckSql {

  private def q(s: String): String = s.replace("'", "''")

  /** list of lowercase word tokens of `expr` — twin of TextAnalysis.tokens
    * ([[graft.ext.TextAnalysis.TokenSplitRegex]]; `\p{L}`/`\p{N}` read
    * identically in Java regex and RE2).
    */
  def tokens(expr: String): String =
    s"list_filter(string_split_regex(lower($expr), '[^\\p{L}\\p{N}'']+'), x -> x <> '')"

  /** Twin of TextAnalysis.bpeTokenCount. */
  def bpeCount(expr: String): String =
    s"len(regexp_extract_all($expr, '${q(TextAnalysis.BpePattern)}'))"

  def sqlStringList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  def sqlIntList(xs: Seq[Int]): String =
    xs.mkString("[", ", ", "]")

  /** Twin of Dedup.shingles over a token-list expression. */
  def shingles(toksExpr: String, n: Int): String =
    s"""CASE WHEN len($toksExpr) >= $n
          THEN list_transform(generate_series(1, len($toksExpr) - ${n - 1}),
                 i -> array_to_string(($toksExpr)[i:i+${n - 1}], ' '))
          ELSE [array_to_string($toksExpr, ' ')] END"""

  /** Twin of TextAnalysis.normalizedText. */
  def normText(expr: String): String =
    s"trim(regexp_replace(regexp_replace(lower($expr), '[^\\p{L}\\p{N}]+', ' ', 'g'), ' +', ' ', 'g'))"

  /** Twin of TextAnalysis.withTextStats' `quality_score` (one point per
    * passed Gopher screen) given the raw text expression and its token
    * list. Shared by q_text_stats and q_quality_gate.
    */
  def qualityScore(textExpr: String, toks: String): String = {
    val stopList = sqlStringList(TextAnalysis.Stopwords)
    s"""(CASE WHEN len($toks) BETWEEN 10 AND 100000 THEN 1 ELSE 0 END
       + CASE WHEN len($toks) > 0 AND
               (list_sum(list_transform($toks, x -> length(x))))::DOUBLE / len($toks)
               BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END
       + CASE WHEN len($toks) > 0 AND
               len(list_filter($toks, x -> list_contains($stopList, x)))::DOUBLE
               / len($toks) >= 0.01 THEN 1 ELSE 0 END
       + CASE WHEN len($toks) > 0 AND
               len(list_distinct($toks))::DOUBLE / len($toks) >= 0.2
               THEN 1 ELSE 0 END
       + CASE WHEN (length($textExpr) - length(regexp_replace($textExpr, '[^\\p{L}\\p{N}\\s]', '', 'g')))::DOUBLE
               / greatest(length($textExpr), 1) <= 0.3 THEN 1 ELSE 0 END)"""
  }

  /** documents-with-duplicates corpus: exact copies of every 5th doc
    * (id + 100000) and a last-token-dropped near-dup of every 7th doc
    * (id + 200000). Twin of DedupQueries.corpusWithDups.
    */
  val CorpusCte: String = {
    val tk = tokens("text")
    s"""corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0
          UNION ALL
          SELECT doc_id + 200000,
                 array_to_string(($tk)[1:len($tk) - 1], ' ')
          FROM documents WHERE doc_id % 7 = 0)"""
  }

  /** Exploded distinct shingles of a (doc_id, text) relation — twin of
    * Dedup.explodedShingles. `prefix` disambiguates the CTE names when a
    * query shingles two relations (e.g. batch and corpus).
    */
  def shingleCte(rel: String, n: Int, prefix: String = ""): String =
    s"""${prefix}tk AS (SELECT doc_id, ${tokens("text")} AS toks FROM $rel),
        ${prefix}sh AS (SELECT doc_id,
                      unnest(list_distinct(${shingles("toks", n)})) AS shingle
               FROM ${prefix}tk)"""

  /** Twin of Hashing.md5Long / md5LongSeeded. */
  def md5Long(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 15))::BIGINT)"

  def md5LongSeeded(expr: String, seed: Int): String =
    md5Long(s"'$seed:' || $expr")

  /** Embeddings as double lists with precomputed norms. */
  val EmbCte: String =
    """emb AS (SELECT vec_id,
                      list_transform(embedding, x -> x::DOUBLE) AS e,
                      sqrt(list_sum(list_transform(embedding,
                             x -> x::DOUBLE * x::DOUBLE))) AS nrm
               FROM embeddings)"""

  /** cosine(a.e, b.e) given emb-CTE rows aliased a and b. */
  def cosine(a: String, b: String): String =
    s"""(list_sum(list_transform(generate_series(1, len($a.e)),
          i -> $a.e[i] * $b.e[i])) / ($a.nrm * $b.nrm))"""

  /** Twin of Similarity.kmeansCentroids over the emb CTE: chained CTEs
    * `cent0..cent{iters}` (cid, ce = unit centroid list) ending in a
    * `cent(centroid_id, e, nrm)` relation shaped like the emb CTE so the
    * [[cosine]] helper applies. Init = the k vectors with smallest
    * md5(vec_id); assignment tiebreak = lowest cid; empty clusters drop
    * out of the GROUP BY on both engines. Float divergence vs Spark is
    * summation-order ULP only — downstream queries must emit ranks/ids,
    * never raw centroid floats.
    */
  def kmeansCtes(k: Int, iters: Int, dim: Int): String = {
    val init =
      s"""seed AS (SELECT vec_id, e, nrm, ${md5Long("vec_id::VARCHAR")} AS r
                   FROM emb ORDER BY r, vec_id LIMIT $k),
          cent0 AS (SELECT ROW_NUMBER() OVER (ORDER BY r, vec_id) - 1 AS cid,
                           list_transform(e, x -> x / nrm) AS ce
                    FROM seed)"""
    val steps = (0 until iters).map { j =>
      s"""ass$j AS (SELECT vec_id, e, nrm, cid FROM (
                     SELECT v.vec_id, v.e, v.nrm, c.cid,
                            ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
                              list_sum(list_transform(generate_series(1, $dim),
                                i -> v.e[i] * c.ce[i])) / v.nrm DESC,
                              c.cid ASC) AS rn
                     FROM emb v CROSS JOIN cent$j c) WHERE rn = 1),
          dim$j AS (SELECT cid, i, AVG(e[i] / nrm) AS m
                    FROM ass$j CROSS JOIN
                      (SELECT unnest(generate_series(1, $dim)) AS i)
                    GROUP BY cid, i),
          mv$j AS (SELECT cid, list(m ORDER BY i) AS mv FROM dim$j GROUP BY cid),
          cent${j + 1} AS (SELECT cid,
                             list_transform(mv, x -> x /
                               sqrt(list_sum(list_transform(mv, y -> y * y)))) AS ce
                           FROM mv$j)"""
    }
    val fin =
      s"""cent AS (SELECT cid AS centroid_id, ce AS e,
                          sqrt(list_sum(list_transform(ce, x -> x * x))) AS nrm
                   FROM cent$iters)"""
    (init +: steps :+ fin).mkString(",\n")
  }

  /** Twin of `Bpe.train` over `documents`: unrolled per-iteration CTEs
    * (p_i pair counts, b_i argmax with the freq≥2 stop filter, s_i merged
    * rendering). The wrapped-symbol representation (" s1  s2 … ") makes
    * `replace` canonical single-pass BPE in both engines; an empty b_i
    * makes every later s_j a no-op via the COALESCE (matching the
    * operator's early stop). Exposes s$iters as the final segmentation
    * and b_1..b_$iters for the merge table.
    */
  def bpeCtes(iters: Int): String = {
    val tk = tokens("text")
    val init =
      s"""wc AS (SELECT tk AS word, CAST(COUNT(*) AS BIGINT) AS wfreq
                 FROM (SELECT unnest($tk) AS tk FROM documents)
                 GROUP BY tk),
          s0 AS (SELECT word, wfreq,
                        ' ' || array_to_string(string_split(word, ''), '  ')
                            || ' ' AS syms
                 FROM wc)"""
    val steps = (1 to iters).map { j =>
      s"""p$j AS (SELECT a[i.i] AS lhs, a[i.i + 1] AS rhs,
                         CAST(SUM(wfreq) AS BIGINT) AS freq
                  FROM (SELECT wfreq, string_split(trim(syms), '  ') AS a
                        FROM s${j - 1}) t,
                       unnest(generate_series(1, len(a) - 1)) AS i(i)
                  GROUP BY 1, 2),
          b$j AS (SELECT lhs, rhs, freq FROM p$j WHERE freq >= 2
                  ORDER BY freq DESC, lhs ASC, rhs ASC LIMIT 1),
          s$j AS (SELECT word, wfreq,
                         COALESCE(replace(syms,
                             ' ' || b.lhs || '  ' || b.rhs || ' ',
                             ' ' || b.lhs || b.rhs || ' '), syms) AS syms
                  FROM s${j - 1} LEFT JOIN b$j b ON TRUE)"""
    }
    (init +: steps).mkString(",\n")
  }

  /** Merge-table select over [[bpeCtes]]'s b_1..b_iters. */
  def bpeMergesSelect(iters: Int): String =
    (1 to iters).map(j =>
      s"SELECT $j AS iter, lhs, rhs, freq FROM b$j").mkString("\nUNION ALL\n")

  /** Twin of `Bpe.applyMerges` over a `btok(doc_id, word)` relation that
    * must be defined upstream (alongside [[bpeCtes]], whose b_j CTEs drive
    * each replay step): a0 = char split of the batch's distinct words,
    * a_j = one merge replay. Exposes a$iters.
    */
  def bpeApplyCtes(iters: Int): String = {
    val init =
      s"""a0 AS (SELECT word,
                        ' ' || array_to_string(string_split(word, ''), '  ')
                            || ' ' AS syms
                 FROM (SELECT DISTINCT word FROM btok))"""
    val steps = (1 to iters).map { j =>
      s"""a$j AS (SELECT word,
                         COALESCE(replace(syms,
                             ' ' || b.lhs || '  ' || b.rhs || ' ',
                             ' ' || b.lhs || b.rhs || ' '), syms) AS syms
                  FROM a${j - 1} LEFT JOIN b$j b ON TRUE)"""
    }
    (init +: steps).mkString(",\n")
  }
}
