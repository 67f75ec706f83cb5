package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Fixed-point TF-IDF contract: hand-computed scores on a tiny corpus,
  * exact integer arithmetic, and the scale shape (no corpus-sized
  * broadcast, candidate rows filtered before the shuffle).
  */
class RelevanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    1L -> "spark spark join",
    2L -> "join stream",
    3L -> "nothing relevant here at all")
    .toDF("doc_id", "text")

  test("scores match the hand-computed fixed-point arithmetic") {
    // N=3; df: spark→1, join→2, stream→1
    // idf_scaled = ((N+1)·10⁶) div (df+1): spark/stream → 2_000_000, join → 1_333_333
    val got = Relevance.tfidfScores(docs, $"text", "doc_id",
        Seq("spark", "join", "stream"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(
      1L -> (2L * 2000000L + 1333333L),
      2L -> (1333333L + 2000000L)))
  }

  test("search returns top-k by score with deterministic id tiebreak") {
    val got = Relevance.search(docs, $"text", "doc_id",
        Seq("spark", "join", "stream"), k = 1)
      .as[(Long, Long)].collect()
    assert(got === Array(1L -> 5333333L))
  }

  test("docs without any query term never appear") {
    val ids = Relevance.tfidfScores(docs, $"text", "doc_id", Seq("stream"))
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(2L))
  }

  test("bm25 matches the hand-computed rational arithmetic") {
    // Corpus: dl = 3, 2, 5; T = 10, N = 3.
    // sat(tf, dl) = (44·T·tf·10⁶) div (20·T·tf + 6·T + 18·dl·N)
    // idf_fx(df)  = ((N+1)·10⁶) div (df+1)
    def sat(tf: Long, dl: Long): Long =
      (44L * 10 * tf * 1000000L) / (20L * 10 * tf + 6L * 10 + 18L * dl * 3)
    def idf(df: Long): Long = (4L * 1000000L) / (df + 1)
    def w(tf: Long, dl: Long, df: Long): Long = idf(df) * sat(tf, dl) / 1000000L
    val got = Relevance.bm25Scores(docs, $"text", "doc_id",
        Seq("spark", "join", "stream"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(
      1L -> (w(2, 3, 1) + w(1, 3, 2)),          // spark×2, join×1
      2L -> (w(1, 2, 2) + w(1, 2, 1))))         // join×1, stream×1
  }

  test("bm25 saturates: doubling tf less than doubles the weight") {
    val many = Seq(
      1L -> "spark spark spark spark spark spark spark spark",
      2L -> "spark word word word word word word word")
      .toDF("doc_id", "text")
    val got = Relevance.bm25Scores(many, $"text", "doc_id", Seq("spark"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) > got(2L), "more occurrences must score higher")
    assert(got(1L) < 2 * got(2L), "8× tf must score < 2× (saturation)")
  }

  test("stored inverted index: tfidf/bm25 ≡ live, plan reads only index relations") {
    val dir = java.nio.file.Files.createTempDirectory("text_wh").toString
    Relevance.writeTextIndex(docs, $"text", "doc_id", dir, "rixtest",
      numBuckets = 2)
    val terms = Seq("spark", "join", "stream")
    val liveT = Relevance.search(docs, $"text", "doc_id", terms, 10)
      .collect().map(_.toSeq).toSet
    val storedT = Relevance.searchStored(spark, "rixtest", "doc_id", terms, 10)
    assert(storedT.collect().map(_.toSeq).toSet === liveT)
    val liveB = Relevance.searchBm25(docs, $"text", "doc_id", terms, 10)
      .collect().map(_.toSeq).toSet
    val storedB = Relevance.searchBm25Stored(spark, "rixtest", "doc_id", terms, 10)
    assert(storedB.collect().map(_.toSeq).toSet === liveB)
    // query-time plans must read the index tables, never tokenize text
    val plan = storedB.queryExecution.executedPlan.toString
    assert(plan.contains("rixtest_postings") && plan.contains("rixtest_lengths")
      && plan.contains("rixtest_totals"),
      s"stored search must scan the index relations:\n$plan")
    assert(!plan.toLowerCase.contains("split"),
      "no tokenization may appear in the stored query plan")
    Seq("rixtest_postings", "rixtest_lengths", "rixtest_totals")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("appendTextIndex: append ≡ rebuild on the union corpus") {
    val dir = java.nio.file.Files.createTempDirectory("text_wh2").toString
    val day1 = docs
    val day2 = Seq(
      10L -> "spark stream spark pipeline",
      11L -> "fresh join content arrives nightly").toDF("doc_id", "text")
    Relevance.writeTextIndex(day1, $"text", "doc_id", dir, "rixapp", 2)
    Relevance.appendTextIndex(spark, "rixapp", day2, $"text", "doc_id", dir, 2)
    val terms = Seq("spark", "join", "stream")
    val appended = Relevance.searchBm25Stored(spark, "rixapp", "doc_id", terms, 10)
      .collect().map(_.toSeq).toSet
    val rebuilt = Relevance.searchBm25(day1.unionAll(day2), $"text", "doc_id",
      terms, 10).collect().map(_.toSeq).toSet
    assert(appended === rebuilt,
      "appending a batch must equal rebuilding over the union corpus")
    Seq("rixapp_postings", "rixapp_lengths", "rixapp_totals", "rixapp_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("text-index drift ledger: growth/length/density triggers; in-distribution appends stay quiet") {
    val dir = java.nio.file.Files.createTempDirectory("text_wh3").toString
    def drop(): Unit =
      Seq("rixdrift_postings", "rixdrift_lengths", "rixdrift_totals",
        "rixdrift_stats").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    drop()
    val base = (1L to 10L).map(i => i -> "alpha beta gamma delta epsilon")
      .toDF("doc_id", "text")
    Relevance.writeTextIndex(base, $"text", "doc_id", dir, "rixdrift", 2)

    // in-distribution append (same length/density, small): no trigger
    val sameDist = (11L to 12L).map(i => i -> "alpha beta gamma delta zeta")
      .toDF("doc_id", "text")
    Relevance.appendTextIndex(spark, "rixdrift", sameDist, $"text", "doc_id",
      dir, 2)
    assert(!Relevance.needsRebuild(spark, "rixdrift"),
      "small in-distribution append must not trigger a rebuild")
    val st = Relevance.textDriftStats(spark, "rixdrift").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(st("base") === ((10L, 50L, 50L)))
    assert(st("append") === ((2L, 10L, 10L)))

    // LENGTH drift: much longer documents, same vocabulary density shape
    val longDocs = (21L to 22L).map(i =>
      i -> Seq.fill(10)("alpha beta gamma delta epsilon").mkString(" "))
      .toDF("doc_id", "text")
    Relevance.appendTextIndex(spark, "rixdrift", longDocs, $"text", "doc_id",
      dir, 2)
    assert(Relevance.needsRebuild(spark, "rixdrift"),
      "10x mean document length must trip the length trigger")

    // GROWTH: a fresh index whose appends dwarf the base
    drop()
    Relevance.writeTextIndex(base.limit(2), $"text", "doc_id", dir,
      "rixdrift", 2)
    val growth = (31L to 40L).map(i => i -> "alpha beta gamma delta epsilon")
      .toDF("doc_id", "text")
    Relevance.appendTextIndex(spark, "rixdrift", growth, $"text", "doc_id",
      dir, 2)
    assert(Relevance.needsRebuild(spark, "rixdrift", maxGrowth = 1.0),
      "5x growth over the base corpus must trip the growth trigger")
    assert(!Relevance.needsRebuild(spark, "rixdrift", maxGrowth = 10.0),
      "the growth knob is honored")
    drop()
  }

  test("chunkRetrieve: a chunk equal to the query lands at distance 0, rank order is integer-exact") {
    val query = "alpha beta gamma delta"
    val corpus = Seq(
      1L -> (query + " " + ("filler " * 30).trim),            // chunk 0 contains query + filler
      2L -> query,                                            // exact one-chunk match
      3L -> ("totally different content " * 8).trim)
      .toDF("doc_id", "text")
    val out = Relevance.chunkRetrieve(corpus, "text", "doc_id", query,
      chunkTokens = 4, overlap = 0, embedDim = 32, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // both query-equal chunks sit at distance 0; the id tiebreak orders them
    assert(out.take(2).toSeq === Seq((1L, 0, 0L), (2L, 0, 0L)),
      "chunks identical to the query must rank first at distance 0")
    val plan = Relevance.chunkRetrieve(corpus, "text", "doc_id", query,
      4, 0, 32, 3).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"single-query attach must stay a hash join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k must ride per-partition heaps, not a global sort")
  }

  test("hybridTopK fuses both rank lists with exact integer RRF") {
    val d = Seq(1L -> "spark join", 2L -> "spark", 3L -> "nothing here")
      .toDF("doc_id", "text")
    val v = Seq(
      (99L, Array(1.0f, 0.0f)),   // the query vector
      (1L, Array(0.9f, 0.1f)),    // vec rank 1
      (2L, Array(0.0f, 1.0f)),    // vec rank 2
      (3L, Array(-1.0f, 0.0f)))   // vec rank 3
      .toDF("vec_id", "embedding")
    val got = Relevance.hybridTopK(d, $"text", "doc_id",
        Seq("spark", "join"), v, "vec_id", $"embedding",
        queryVecId = 99L, k = 10)
      .as[(Long, Long)].collect().toSeq
    // text ranks: doc1=1, doc2=2; vec ranks: 1, 2, 3
    // rrf = 10⁶ div (60+rt) + 10⁶ div (60+rv)
    assert(got === Seq(
      1L -> (1000000L / 61 + 1000000L / 61),
      2L -> (1000000L / 62 + 1000000L / 62),
      3L -> (1000000L / 63)))                 // vector pool only
  }

  test("hybrid plan: single-query fanout is a hash join, not a nested loop") {
    val q = Relevance.hybridTopK(docs, $"text", "doc_id", Seq("spark"),
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
      "vec_id", $"embedding", queryVecId = 100L, k = 5)
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"query-vector attach must be a constant-key hash join:\n$plan")
  }

  test("plan: no BroadcastNestedLoopJoin from the 1-row N attach") {
    val q = Relevance.tfidfScores(docs, $"text", "doc_id", Seq("spark"))
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"N must attach via a constant-key hash join:\n$plan")
  }

  private def phraseDocs = Seq(
    1L -> "big data lake house",          // 1 × "data lake"
    2L -> "data lake data lake data",     // 2 × "data lake"
    3L -> "lake data",                    // reversed — no match
    4L -> "data",                         // shorter than the phrase
    5L -> "")                             // empty
    .toDF("doc_id", "text")

  test("phraseCounts counts overlapping in-order occurrences only") {
    val got = Relevance.phraseCounts(phraseDocs, $"text", "doc_id",
        Seq("data", "lake"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L))
    // repeated-term phrase self-aligns: "data data" only in doc 2? no —
    // doc 2 has no adjacent data data; none match
    assert(Relevance.phraseCounts(phraseDocs, $"text", "doc_id",
      Seq("data", "data")).count() === 0)
  }

  test("phraseCounts property: equals a naive sliding-window count on random corpora") {
    val rnd = new scala.util.Random(813L)
    val vocab = Seq("a", "b", "c")
    val corpus = (1L to 60L).map(i =>
      (i, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(3))).mkString(" ")))
    val phrase = Seq("a", "b", "a")
    def naive(text: String): Long = {
      val t = text.split(" ").filter(_.nonEmpty)
      (0 to t.length - 3).count(i =>
        t(i) == "a" && t(i + 1) == "b" && t(i + 2) == "a").toLong
    }
    val want = corpus.map { case (id, tx) => id -> naive(tx) }
      .filter(_._2 > 0).toMap
    val got = Relevance.phraseCounts(corpus.toDF("doc_id", "text"),
        $"text", "doc_id", phrase)
      .as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("stored positional index answers phrases identically to the live path") {
    val wh = java.nio.file.Files.createTempDirectory("graft-posidx").toString
    Relevance.writePositionalIndex(phraseDocs, $"text", "doc_id",
      wh, "pspec", numBuckets = 2)
    val live = Relevance.phraseCounts(phraseDocs, $"text", "doc_id",
      Seq("data", "lake")).as[(Long, Long)].collect().toMap
    val stored = Relevance.phraseCountsStored(spark, "pspec", "doc_id",
      Seq("data", "lake")).as[(Long, Long)].collect().toMap
    assert(stored === live)
    // 3-term phrase through the same index: "lake data lake" in doc 2
    assert(Relevance.phraseCountsStored(spark, "pspec", "doc_id",
        Seq("lake", "data", "lake")).as[(Long, Long)].collect().toMap
      === Map(2L -> 1L))
  }
}
