package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions for the dedup hot path.
  *
  * The declarative form — `array_distinct(transform(sequence(...),
  * i -> concat_ws(' ', slice(tokens, i, n))))` — walks an interpreted
  * higher-order expression tree with O(n²) slice copies per document;
  * measured ~8 s per pass over sf0.1's shingle explosion, repeated in every
  * dedup operator. `text_shingles` does the same tokenize → n-gram →
  * distinct in one imperative pass per row. CodegenFallback (one virtual
  * call per row) is fine here: the win is inside the row, not in fusion.
  *
  * Semantics are pinned to the declarative twin (and the DuckDB oracle):
  * lowercase, split on `TextAnalysis.TokenSplitRegex` (Unicode letter/digit/' runs), drop empties, space-joined n-grams,
  * whole-doc fallback when fewer than n tokens, first-occurrence distinct.
  */
object TextExpressions {

  case class TextShingles(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "text_shingles"

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == StringType && right.dataType == IntegerType &&
        right.foldable)
        TypeCheckResult.TypeCheckSuccess
      else
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName(text: string, n: int literal), " +
            s"got ${left.dataType.sql} / ${right.dataType.sql}")

    @transient private lazy val splitter: Pattern = Pattern.compile(graft.ext.TextAnalysis.TokenSplitRegex)

    override def nullSafeEval(textAny: Any, nAny: Any): Any = {
      val text = textAny.asInstanceOf[UTF8String].toString
      val n = nAny.asInstanceOf[Int]
      val toks = splitter.split(text.toLowerCase(java.util.Locale.ROOT), -1)
        .filter(_.nonEmpty)
      val out = new java.util.LinkedHashSet[UTF8String]()
      if (toks.length < n) {
        out.add(UTF8String.fromString(toks.mkString(" ")))
      } else {
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i <= toks.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          out.add(UTF8String.fromString(sb.toString))
          i += 1
        }
      }
      new GenericArrayData(out.toArray[AnyRef](new Array[AnyRef](out.size)))
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): TextShingles =
      copy(left = newLeft, right = newRight)
  }

  /** Non-distinct variant of [[TextShingles]]: every n-gram IN ORDER with
    * repeats kept — the corpus-frequency counting form (distinct-per-doc
    * would undercount boilerplate). Same single imperative pass; the
    * declarative transform+slice+concat twin measured 12.6 s for the
    * trigram count at sf0.1 vs ~2 s here.
    */
  case class TextShinglesAll(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "text_shingles_all"

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == StringType && right.dataType == IntegerType &&
        right.foldable)
        TypeCheckResult.TypeCheckSuccess
      else
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName(text: string, n: int literal), " +
            s"got ${left.dataType.sql} / ${right.dataType.sql}")

    @transient private lazy val splitter: Pattern = Pattern.compile(graft.ext.TextAnalysis.TokenSplitRegex)

    override def nullSafeEval(textAny: Any, nAny: Any): Any = {
      val text = textAny.asInstanceOf[UTF8String].toString
      val n = nAny.asInstanceOf[Int]
      val toks = splitter.split(text.toLowerCase(java.util.Locale.ROOT), -1)
        .filter(_.nonEmpty)
      if (toks.length < n) {
        new GenericArrayData(Array[AnyRef](UTF8String.fromString(toks.mkString(" "))))
      } else {
        val out = new Array[AnyRef](toks.length - n + 1)
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i <= toks.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          out(i) = UTF8String.fromString(sb.toString)
          i += 1
        }
        new GenericArrayData(out)
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): TextShinglesAll =
      copy(left = newLeft, right = newRight)
  }

  /** Positional n-gram hash array: [[Hashing.md5Long]] of every n-gram IN
    * ORDER (no distinct), so a `posexplode` index is the 0-based token
    * offset of the gram. Returning array<long> instead of gram strings
    * keeps the duplicate-span explode narrow — at corpus scale the grams
    * (k tokens each) would otherwise dominate the exchange. Whole-doc
    * fallback below n tokens matches [[TextShingles]] / the declarative
    * twin; equivalence is pinned by DedupSpec.
    */
  case class TextShingleHashes(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "text_shingle_hashes"

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == StringType && right.dataType == IntegerType &&
        right.foldable)
        TypeCheckResult.TypeCheckSuccess
      else
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName(text: string, n: int literal), " +
            s"got ${left.dataType.sql} / ${right.dataType.sql}")

    @transient private lazy val splitter: Pattern = Pattern.compile(graft.ext.TextAnalysis.TokenSplitRegex)
    // one expression instance serves many concurrent tasks; MessageDigest
    // is stateful, so it must be per-thread
    @transient private lazy val digests =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))

    private def hash60(s: String): Long = {
      val d = digests.get()
      d.reset()
      val h = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = first 60 bits = big-endian first 8 bytes >>> 4
      (((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) |
        ((h(2) & 0xffL) << 40) | ((h(3) & 0xffL) << 32) |
        ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
        ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)) >>> 4
    }

    override def nullSafeEval(textAny: Any, nAny: Any): Any = {
      val text = textAny.asInstanceOf[UTF8String].toString
      val n = nAny.asInstanceOf[Int]
      val toks = splitter.split(text.toLowerCase(java.util.Locale.ROOT), -1)
        .filter(_.nonEmpty)
      if (toks.length < n) {
        new GenericArrayData(Array(hash60(toks.mkString(" "))))
      } else {
        val out = new Array[Long](toks.length - n + 1)
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i <= toks.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          out(i) = hash60(sb.toString)
          i += 1
        }
        new GenericArrayData(out)
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): TextShingleHashes =
      copy(left = newLeft, right = newRight)
  }

  /** Tokens covered by WITHIN-DOC duplicated n-grams (RefinedWeb-style
    * `dup_ngram` screen) over a POSITIONAL gram-hash array
    * ([[TextShingleHashes]] output): position i's gram is duplicated iff
    * its hash occurs ≥2× in the array; covered token positions are the
    * union of [i, i+n−1] over duplicated grams. O(m log m) per row (sort a
    * copy, binary-search each position) — NOT the O(m²) exists-scan a
    * declarative HOF form would interpret, which is a per-row CPU cliff on
    * long boilerplate documents. Returns the covered-token COUNT (an
    * integer — callers derive the fraction against their own token count,
    * keeping the oracle surface exact).
    */
  case class DupGramCoverage(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "dup_gram_coverage"

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == ArrayType(LongType, containsNull = false) ||
        left.dataType == ArrayType(LongType, containsNull = true)) {
        if (right.dataType == IntegerType && right.foldable)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName needs int literal n")
      } else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<bigint> gram hashes, got ${left.dataType.sql}")

    override def nullSafeEval(arrAny: Any, nAny: Any): Any =
      TextExpressions.dupCoverage(
        arrAny.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        nAny.asInstanceOf[Int])

    override def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val cls = TextExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, (arr, n) =>
        s"${ev.value} = $cls.dupCoverage($arr, $n);")
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DupGramCoverage =
      copy(left = newLeft, right = newRight)
  }

  /** Shared kernel for [[DupGramCoverage]] (also the codegen entry point). */
  def dupCoverage(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): Int = {
    val m = arr.numElements()
    if (m <= 1) return 0
    val sorted = new Array[Long](m)
    var i = 0
    while (i < m) { sorted(i) = arr.getLong(i); i += 1 }
    java.util.Arrays.sort(sorted)
    val covered = new Array[Boolean](m + n - 1)
    i = 0
    while (i < m) {
      val v = arr.getLong(i)
      val idx = java.util.Arrays.binarySearch(sorted, v)
      val dup = (idx > 0 && sorted(idx - 1) == v) ||
        (idx < m - 1 && sorted(idx + 1) == v)
      if (dup) {
        var j = i
        while (j < i + n) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    var c = 0
    i = 0
    while (i < covered.length) { if (covered(i)) c += 1; i += 1 }
    c
  }

  /** Signed feature-hash embedding of raw text (the "hashing trick",
    * Weinberger et al., ICML 2009): tokenize, bucket each token by
    * md5("fh:"+tok) mod dim, add sign (md5("fs:"+tok) mod 2)·2−1. The
    * second (sign) hash makes the inner product an unbiased estimator of
    * the token-count kernel, so cosine/L2 over these vectors approximates
    * lexical similarity — which turns the ENTIRE embedding stack (PQ/ADC,
    * IVF, hyperplane LSH, quantization) into text operators with no
    * pretrained model. One imperative pass per row, zero shuffle,
    * all-integer output — the DuckDB oracle replays the relational form
    * (explode → bucket/sign → sum) exactly.
    */
  case class TextHashEmbed(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "text_hash_embed"

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == StringType && right.dataType == IntegerType &&
        right.foldable)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName(text: string, dim: int literal), " +
          s"got ${left.dataType.sql} / ${right.dataType.sql}")

    override def nullSafeEval(textAny: Any, dimAny: Any): Any =
      TextExpressions.hashEmbed(textAny.asInstanceOf[UTF8String],
        dimAny.asInstanceOf[Int])

    override def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val cls = TextExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, (txt, dim) =>
        s"${ev.value} = $cls.hashEmbed($txt, $dim);")
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): TextHashEmbed =
      copy(left = newLeft, right = newRight)
  }

  @transient private lazy val embedDigests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private def embedHash60(s: String): Long = {
    val d = embedDigests.get()
    d.reset()
    val h = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) |
      ((h(2) & 0xffL) << 40) | ((h(3) & 0xffL) << 32) |
      ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)) >>> 4
  }

  @transient private lazy val embedSplitter: Pattern =
    Pattern.compile(graft.ext.TextAnalysis.TokenSplitRegex)

  /** Shared kernel for [[TextHashEmbed]] (also the codegen entry point). */
  def hashEmbed(text: UTF8String, dim: Int): GenericArrayData = {
    val toks = embedSplitter
      .split(text.toString.toLowerCase(java.util.Locale.ROOT), -1)
      .filter(_.nonEmpty)
    val vec = new Array[Long](dim)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val b = (embedHash60("fh:" + t) % dim).toInt
      val s = (embedHash60("fs:" + t) % 2L) * 2L - 1L
      vec(b) += s
      i += 1
    }
    new GenericArrayData(vec)
  }

  /** Unicode NFC normalization — the canonicalization pass that must run
    * BEFORE hashing/dedup on a real web corpus: visually-identical
    * strings arrive in composed ("é") and decomposed ("e" + U+0301)
    * forms, which hash differently and silently defeat exact dedup,
    * fingerprints, and equality joins. Spark ships no normalizer
    * function, so this wraps `java.text.Normalizer` (ICU-equivalent for
    * NFC) as a native expression; DuckDB's `nfc_normalize` is the oracle
    * twin (both implement Unicode TR-15, so outputs are byte-identical).
    * CodegenFallback like the other string producers here: the cost is
    * the normalizer pass inside the row, not expression-tree fusion.
    */
  case class NfcNormalize(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with CodegenFallback {

    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "nfc_normalize"

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName(text: string), got ${child.dataType.sql}")

    override def nullSafeEval(textAny: Any): Any = {
      val s = textAny.asInstanceOf[UTF8String].toString
      // isNormalized is a cheap scan; the common (already-NFC) case
      // avoids the allocation-heavy normalize entirely
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
        textAny
      else
        UTF8String.fromString(
          java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }

    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  /** Exact-phrase occurrence count — the hot row kernel of
    * [[graft.ext.Relevance.phraseCounts]]. The declarative twin
    * (`size(filter(sequence(...), i -> element_at(toks, i+j) = w_j ...))`)
    * is a higher-order lambda tree that Spark evaluates INTERPRETED, per
    * position, with an element_at walk per phrase term — and because the
    * consumer filters on the result, predicate pushdown replays that
    * whole tree below any repartition, serializing the corpus pass onto
    * the scan task (measured: one 4-6 s single-task stage at bench
    * scale). This is one imperative pass per row: tokenize once (the
    * [[TextShingles]] splitter, identical semantics to
    * `TextAnalysis.tokens`), then a sliding window compare. `phrase` is a
    * foldable space-joined term string; returns the LONG count of
    * positions where all m terms match consecutively (0 for docs shorter
    * than the phrase). Semantics pinned to the declarative twin in
    * DedupSpec.
    */
  case class TextPhraseTf(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {

    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "text_phrase_tf"

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == StringType && right.dataType == StringType &&
        right.foldable)
        TypeCheckResult.TypeCheckSuccess
      else
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName(text: string, phrase: string literal), " +
            s"got ${left.dataType.sql} / ${right.dataType.sql}")

    @transient private lazy val splitter: Pattern =
      Pattern.compile(graft.ext.TextAnalysis.TokenSplitRegex)

    override def nullSafeEval(textAny: Any, phraseAny: Any): Any = {
      val text = textAny.asInstanceOf[UTF8String].toString
      val terms = phraseAny.asInstanceOf[UTF8String].toString.split(' ')
      val m = terms.length
      val toks = splitter.split(text.toLowerCase(java.util.Locale.ROOT), -1)
        .filter(_.nonEmpty)
      var n = 0L
      var i = 0
      val last = toks.length - m
      while (i <= last) {
        var j = 0
        while (j < m && toks(i + j) == terms(j)) j += 1
        if (j == m) n += 1L
        i += 1
      }
      n
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): TextPhraseTf =
      copy(left = newLeft, right = newRight)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "text_phrase_tf",
      (es: Seq[Expression]) => TextPhraseTf(es(0), es(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      (es: Seq[Expression]) => NfcNormalize(es(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "text_hash_embed",
      (es: Seq[Expression]) => TextHashEmbed(es(0), es(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "text_shingles",
      (es: Seq[Expression]) => TextShingles(es(0), es(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "text_shingle_hashes",
      (es: Seq[Expression]) => TextShingleHashes(es(0), es(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "text_shingles_all",
      (es: Seq[Expression]) => TextShinglesAll(es(0), es(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dup_gram_coverage",
      (es: Seq[Expression]) => DupGramCoverage(es(0), es(1)), "built-in")
  }
}
