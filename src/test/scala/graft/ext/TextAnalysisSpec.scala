package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("langId classifies real multilingual samples") {
    val samples = Seq(
      ("en", "the cat sat on the mat and it was happy for a while"),
      ("es", "el perro corre por la calle y los gatos duermen en una casa"),
      ("fr", "le chien court dans la rue et les chats dorment dans une maison"),
      ("de", "der hund läuft auf die straße und das ist nicht so gut"),
      ("zh", "今天天气很好我们去公园散步"),
      ("unknown", "zxqy wvut plomk")).toDF("expected", "text")
    val got = samples
      .withColumn("lang_id", TextAnalysis.langId($"text"))
      .select("expected", "lang_id")
      .collect().map(r => r.getString(0) -> r.getString(1))
    got.foreach { case (expected, actual) => assert(actual === expected) }
  }

  test("tokenizer is Unicode-aware: non-Latin scripts yield real tokens") {
    val rows = Seq(
      ("Привет МИР", Seq("привет", "мир")),          // Cyrillic, case-folded
      ("Grüße CAFÉ naïve", Seq("grüße", "café", "naïve")), // accented Latin
      ("你好世界。再见!", Seq("你好世界", "再见")),      // CJK split on punct only
      ("第５章 sect ٣٤٥", Seq("第５章", "sect", "٣٤٥")), // fullwidth + Arabic digits
      ("mixедный混tok", Seq("mixедный混tok")))        // cross-script run = 1 token
      .toDF("text", "expected")
    val got = rows.withColumn("toks", TextAnalysis.tokens($"text"))
      .select("expected", "toks").as[(Seq[String], Seq[String])].collect()
    got.foreach { case (expected, actual) => assert(actual === expected) }
    // the imperative shingle kernel compiles the SAME TokenSplitRegex:
    // its unigram output must equal the declarative tokenizer's tokens
    graft.functions.TextExpressions.register(spark)
    val kern = rows
      .withColumn("sh", call_function("text_shingles", $"text", lit(1)))
      .withColumn("toks", array_distinct(TextAnalysis.tokens($"text")))
      .filter(not($"sh" <=> $"toks")).count()
    assert(kern === 0L)
    // BPE pre-tokenizer counts non-Latin words as letter runs, not punct
    val bpe = spark.range(1).select(
      TextAnalysis.bpeTokenCount(lit("Привет мир 你好")).as("n"))
      .as[Int].head()
    assert(bpe === 3)
  }

  test("withTextStats computes exact counts and ratios") {
    val df = Seq((1L, "The quick brown fox, the lazy dog!")).toDF("doc_id", "text")
    val r = TextAnalysis.withTextStats(df, "text").collect().head
    val g = r.getValuesMap[Any](Seq(
      "n_tokens", "n_types", "stopword_ratio", "punct_ratio", "quality_score"))
    assert(g("n_tokens") === 7)         // the quick brown fox the lazy dog
    assert(g("n_types") === 6)          // 'the' twice
    assert(g("stopword_ratio") === 2.0 / 7)
    assert(g("punct_ratio") === 2.0 / 34) // comma + bang over 34 chars
  }

  test("bpe-ish token count: contractions, digits and punct runs split") {
    val df = Seq(("it's 42 degrees!!", 1)).toDF("text", "id")
    val n = df.select(TextAnalysis.bpeTokenCount($"text").as("n"))
      .collect().head.getInt(0)
    // [it]['s][ 42][ degrees][!!]
    assert(n === 5)
  }

  test("fingerprint is invariant to case/punct/whitespace noise") {
    val df = Seq(
      (1L, "Hello,   World! How are you?"),
      (2L, "hello world  how are you"),
      (3L, "different content entirely")).toDF("doc_id", "text")
    val fps = df.select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"),
        TextAnalysis.rollingFingerprint($"text").as("rfp"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("rollingFingerprint survives local edits that exact fingerprint does not") {
    // winnowing-style min-hash: an appended word usually leaves the minimum
    // 8-gram hash untouched; md5 of the whole text always changes.
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq((1L, base), (2L, base + " tail")).toDF("doc_id", "text")
    val r = df.select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"),
        TextAnalysis.rollingFingerprint($"text").as("rfp"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(r(1L)._1 !== r(2L)._1, "exact fp must change")
    assert(r(1L)._2 === r(2L)._2, "rolling fp should be stable under the tail edit")
  }

  test("chunkDocuments: coverage, overlap, and short-doc invariants") {
    val words = (1 to 47).map(i => s"w$i")
    val df = Seq(
      (1L, words.mkString(" ")),   // 47 tokens → chunks of 20-stride: 2 full + 1 tail
      (2L, "just five little words here"),
      (3L, "!!!"))                 // zero tokens
      .toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocuments(df, "text", "doc_id",
        chunkTokens = 30, overlap = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val byDoc = chunks.groupBy(_._1)
    // 47 tokens: k = ceil((47-10)/20) = 2 → chunks at [1..30], [21..47]
    val d1 = byDoc(1L).sortBy(_._2)
    assert(d1.length == 2 && d1(0)._4 == 30 && d1(1)._4 == 27)
    val t0 = d1(0)._3.split(" "); val t1 = d1(1)._3.split(" ")
    assert(t0.takeRight(10).sameElements(t1.take(10)), "consecutive chunks share the overlap")
    assert((t0 ++ t1.drop(10)).sameElements(words), "chunks reconstruct the document")
    // short doc → single whole-doc chunk; empty doc → single empty chunk
    assert(byDoc(2L).toSeq == Seq((2L, 0, "just five little words here", 5)))
    assert(byDoc(3L).toSeq == Seq((3L, 0, "", 0)))
  }

  test("repetition stats: boilerplate spikes, diverse text passes, edge cases exact") {
    val df = Seq(
      (1L, "buy now buy now buy now buy now"),                  // stuffed
      (2L, "the quick brown fox jumps over a lazy sleeping dog"), // diverse
      (3L, "solo"),                                             // 1 token, no bigrams
      (4L, "!!!"))                                              // 0 tokens
      .toDF("doc_id", "text")
    val m = TextAnalysis.withRepetitionStats(df, "text")
      .select("doc_id", "top_token_fraction", "top_bigram_fraction", "repetition_pass")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(m(1L)._1 === 0.5)                       // "buy" 4 of 8
    assert(m(1L)._2 === 4.0 / 7)                   // "buy now" 4 of 7 bigrams
    assert(!m(1L)._3)
    assert(m(2L)._1 === 0.1 && m(2L)._3)           // all tokens unique (1/10)
    assert(m(3L) === ((1.0, 0.0, false)))          // single token = fraction 1
    assert(m(4L) === ((0.0, 0.0, true)))           // empty: both 0, passes
  }

  test("withDupGramCoverage counts tokens under within-doc duplicated n-grams") {
    val df = Seq(
      // "a b c" recurs → positions 0-2 and 4-6 covered (token 'x' not): 6/7
      (1L, "a b c x a b c"),
      (2L, "all tokens here are fully distinct words"),   // no dup → 0
      (3L, "r r r r r r"),                                // all grams equal → 6/6
      (4L, "tiny doc"),                                   // < n tokens → 0
      (5L, ""))                                           // empty → 0/0
      .toDF("doc_id", "text")
    val m = TextAnalysis.withDupGramCoverage(df, "text", n = 3)
      .select("doc_id", "dup_covered_tokens", "total_tokens")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(m(1L) === ((6, 7)))
    assert(m(2L) === ((0, 7)))
    assert(m(3L) === ((6, 6)))
    assert(m(4L) === ((0, 2)))
    assert(m(5L) === ((0, 0)))
  }

  test("nfc_normalize composes decomposed sequences and fixes dedup misses") {
    graft.functions.TextExpressions.register(spark)
    val composed = "Caf\u00e9"     // single codepoint e-acute
    val decomposed = "Cafe\u0301"  // e + combining acute
    assert(composed != decomposed, "fixture must start un-equal")
    val df = Seq((1L, composed), (2L, decomposed), (3L, "plain ascii"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        call_function("nfc_normalize", col("text")).as("n"))
    val m = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) === composed, "already-NFC text passes through")
    assert(m(2L) === composed, "decomposed form composes to the same bytes")
    assert(m(3L) === "plain ascii")
    // the dedup consequence: normalized forms now hash-collide
    assert(TextAnalysis.fingerprint(lit(composed)) != null) // smoke
    val fps = Seq((1L, composed), (2L, decomposed)).toDF("doc_id", "text")
      .select(TextAnalysis.fingerprint(
        call_function("nfc_normalize", col("text"))).as("fp"))
      .as[String].collect().toSet
    assert(fps.size === 1, "NFC must unify the fingerprints")
  }
}
