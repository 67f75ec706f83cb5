package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the stored-state incremental-dedup contract: the nightly shape
  * reads the warehouse's hash/signature tables and NEVER rescans the
  * corpus — O(batch) per night, the whole point of persisting the state.
  */
class IncrementalStoredSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = Seq(
    1L -> "one two three four five six seven eight nine ten",
    2L -> "alpha beta gamma delta epsilon zeta eta theta",
    3L -> "red orange yellow green blue indigo violet colors",
    4L -> "lorem ipsum dolor sit amet consectetur adipiscing elit")

  private val batchRows = Seq(
    11L -> "one two three four five six seven eight nine ten",  // exact copy → drop
    12L -> "one two three four five six seven eight nine",      // near-dup → drop
    13L -> "completely novel content with no overlap anywhere at all") // keep

  test("stored path equals recompute path and never scans the corpus") {
    val dir = Files.createTempDirectory("graft_dedup_state").toString
    val corpusPath = s"$dir/corpus_src"
    base.toDF("doc_id", "text").write.parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    val batch = batchRows.toDF("doc_id", "text")
    try {
      Dedup.writeDedupState(corpus, $"text", "doc_id",
        numHashes = 8, shingleSize = 3, dir, "spec_docs", numBuckets = 4)

      val stored = Dedup.incrementalDedupStored(spark, "spec_docs", batch,
        $"text", "doc_id", 8, 4, 3, estJaccardThreshold = 0.5)
      val recompute = Dedup.incrementalDedup(corpus, batch,
        $"text", "doc_id", 8, 4, 3, estJaccardThreshold = 0.5)

      val storedIds = stored.select("doc_id").as[Long].collect().sorted
      val recomputeIds = recompute.select("doc_id").as[Long].collect().sorted
      assert(storedIds === recomputeIds,
        "stored-state path must reproduce the recompute path exactly")
      assert(storedIds === Array(13L))

      // The scale contract: the stored plan's scans read ONLY the two
      // warehouse tables — zero corpus scans (the recompute plan, by
      // contrast, scans the corpus for both its hashes and signatures).
      val storedPlan = stored.queryExecution.executedPlan.toString
      assert(!storedPlan.contains("corpus_src"),
        s"stored path must not scan the corpus:\n$storedPlan")
      assert(storedPlan.contains("spec_docs_hashes")
        && storedPlan.contains("spec_docs_sigs"),
        "stored path must read the persisted hash + signature tables")
      val recomputePlan = recompute.queryExecution.executedPlan.toString
      assert(recomputePlan.contains("corpus_src"),
        "control: the recompute path does scan the corpus")
    } finally {
      spark.sharedState.cacheManager.clearCache()
      spark.sql("DROP TABLE IF EXISTS spec_docs_hashes")
      spark.sql("DROP TABLE IF EXISTS spec_docs_sigs")
      spark.sql("DROP TABLE IF EXISTS spec_docs_bloom")
    }
  }

  test("appended batch survivors extend the stored state (append-only maintenance)") {
    val dir = Files.createTempDirectory("graft_dedup_state2").toString
    val corpus = base.toDF("doc_id", "text")
    val batch = batchRows.toDF("doc_id", "text")
    try {
      Dedup.writeDedupState(corpus, $"text", "doc_id", 8, 3, dir, "spec_docs2", 4)
      val survivors = Dedup.incrementalDedupStored(spark, "spec_docs2", batch,
        $"text", "doc_id", 8, 4, 3, 0.5).cache()
      // append survivors' hashes + signatures, exactly the nightly step
      survivors.select(md5($"text").as("text_md5")).distinct()
        .write.mode("append").insertInto("spec_docs2_hashes")
      Dedup.minhashSignatures(survivors, $"text", "doc_id", 8, 3)
        .write.mode("append").insertInto("spec_docs2_sigs")
      // re-offering the accepted batch now drops everything as exact dups
      val again = Dedup.incrementalDedupStored(spark, "spec_docs2", batch,
        $"text", "doc_id", 8, 4, 3, 0.5)
      assert(again.count() === 0L,
        "re-ingesting an accepted batch must yield zero new survivors")
    } finally {
      spark.sharedState.cacheManager.clearCache()
      spark.sql("DROP TABLE IF EXISTS spec_docs2_hashes")
      spark.sql("DROP TABLE IF EXISTS spec_docs2_sigs")
      spark.sql("DROP TABLE IF EXISTS spec_docs2_bloom")
    }
  }

  test("bloom-prefiltered stored path matches, and bloom appends prevent false negatives") {
    val dir = Files.createTempDirectory("graft_dedup_state3").toString
    val corpus = base.toDF("doc_id", "text")
    val batch = batchRows.toDF("doc_id", "text")
    try {
      Dedup.writeDedupState(corpus, $"text", "doc_id", 8, 3, dir, "spec_docs3", 4)
      val viaBloom = Dedup.incrementalDedupStoredBloom(spark, "spec_docs3",
        batch, $"text", "doc_id", 8, 4, 3, 0.5)
      val viaStored = Dedup.incrementalDedupStored(spark, "spec_docs3",
        batch, $"text", "doc_id", 8, 4, 3, 0.5)
      assert(viaBloom.select("doc_id").as[Long].collect().sorted ===
        viaStored.select("doc_id").as[Long].collect().sorted)

      // nightly accept: append hashes AND OR the bloom — then a replay of
      // the accepted batch must drop everything on the BLOOM path too (a
      // stale bloom would false-negative doc 13 straight past the
      // anti-join)
      val survivors = viaStored.localCheckpoint(true)
      val newHashes = survivors.select(md5($"text").as("text_md5")).distinct()
      newHashes.write.mode("append").insertInto("spec_docs3_hashes")
      Dedup.minhashSignatures(survivors, $"text", "doc_id", 8, 3)
        .write.mode("append").insertInto("spec_docs3_sigs")
      Dedup.appendDedupBloom(spark, dir, "spec_docs3", newHashes)
      spark.catalog.refreshTable("spec_docs3_hashes")
      spark.catalog.refreshTable("spec_docs3_sigs")
      val again = Dedup.incrementalDedupStoredBloom(spark, "spec_docs3",
        batch, $"text", "doc_id", 8, 4, 3, 0.5)
      assert(again.count() === 0L,
        "post-append bloom must see the accepted batch as duplicates")
    } finally {
      spark.sharedState.cacheManager.clearCache()
      spark.sql("DROP TABLE IF EXISTS spec_docs3_hashes")
      spark.sql("DROP TABLE IF EXISTS spec_docs3_sigs")
      spark.sql("DROP TABLE IF EXISTS spec_docs3_bloom")
    }
  }

  test("bloom re-sizes past capacity: 10x appends keep the probe FPR at the design bound") {
    import org.apache.spark.sql.functions.{call_function, concat, lit, xxhash64}
    val dir = Files.createTempDirectory("graft_dedup_state4").toString
    val corpus = spark.range(200).select($"id".as("doc_id"),
      concat(lit("seed text number "), $"id").as("text"))
    try {
      Dedup.writeDedupState(corpus, $"text", "doc_id", 8, 3, dir, "spec_docs4", 4)
      val st0 = spark.table("spec_docs4_bloom")
        .select("_bloom", "n_keys", "sized_for").head()
      val bytes0 = st0.getAs[Array[Byte]](0).length
      assert(st0.getLong(1) === 200L)
      assert(st0.getLong(2) >= 2 * 200L, "capacity must carry headroom")

      // 10 appended batches of 250 fresh keys each: 2700 keys total —
      // far past the initial sizing; without re-sizing, occupancy (and
      // the FPR) would grow unbounded at fixed width
      for (b <- 0 until 10) {
        val newHashes = spark.range(b * 250, (b + 1) * 250)
          .select(md5(concat(lit("appended key "), $"id")).as("text_md5"))
        newHashes.write.mode("append").insertInto("spec_docs4_hashes")
        spark.catalog.refreshTable("spec_docs4_hashes")
        Dedup.appendDedupBloom(spark, dir, "spec_docs4", newHashes)
      }
      val st = spark.table("spec_docs4_bloom")
        .select("_bloom", "n_keys", "sized_for").head()
      val (bits, nKeys, sizedFor) =
        (st.getAs[Array[Byte]](0), st.getLong(1), st.getLong(2))
      assert(nKeys === 200L + 2500L, "the occupancy ledger must track appends")
      assert(sizedFor >= nKeys,
        "capacity must stay ahead of occupancy (rebuild happened)")
      assert(bits.length > bytes0, "the bitset must have physically grown")

      // design-FPR bound: probe keys NEVER inserted; the positive
      // fraction is the realized false-positive rate. At the maintained
      // occupancy/capacity ratio it stays well under the bound; a
      // fixed-width bitset holding 13x its sizing would blow through it.
      graft.functions.BloomExpressions.register(spark)
      val probes = 2000L
      val fp = spark.range(probes)
        .select(md5(concat(lit("never inserted "), $"id")).as("k"))
        .filter(call_function("bloom_might_contain",
          lit(bits), xxhash64($"k")))
        .count()
      assert(fp.toDouble / probes <= 0.02,
        s"realized FPR ${fp.toDouble / probes} exceeds the design bound")

      // and the bloom has no false negatives after all the churn: every
      // inserted key must still probe positive
      val inserted = spark.table("spec_docs4_hashes")
        .filter(!call_function("bloom_might_contain",
          lit(bits), xxhash64($"text_md5")))
        .count()
      assert(inserted === 0L, "a rebuilt/appended bloom must cover every key")
    } finally {
      spark.sharedState.cacheManager.clearCache()
      spark.sql("DROP TABLE IF EXISTS spec_docs4_hashes")
      spark.sql("DROP TABLE IF EXISTS spec_docs4_sigs")
      spark.sql("DROP TABLE IF EXISTS spec_docs4_bloom")
    }
  }

  test("duplicateSpansIncremental flags batch-internal and corpus-known spans, corpus never scanned") {
    val dir = Files.createTempDirectory("graft_span_state").toString
    val corpusPath = s"$dir/span_corpus_src"
    Seq(1L -> "alpha beta gamma delta unique corpus tail words")
      .toDF("doc_id", "text").write.parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    val batch = Seq(
      10L -> "alpha beta gamma delta fresh suffix here",    // corpus 4-gram at 0
      11L -> "shared run of tokens one way",                // batch-internal …
      12L -> "shared run of tokens another way",            // … 4-gram at 0
      13L -> "entirely novel content with nothing repeated")
      .toDF("doc_id", "text")
    try {
      Dedup.writeSpanState(corpus, $"text", "doc_id", k = 4, dir, "spec_spans", 4)
      val spans = Dedup.duplicateSpansIncremental(spark, "spec_spans", batch,
        $"text", "doc_id", k = 4)
      val got = spans.select("doc_id", "start")
        .as[(Long, Int)].collect().toSet
      assert(got.contains((10L, 0)) , "corpus-known span must flag")
      assert(got.contains((11L, 0)) && got.contains((12L, 0)),
        "batch-internal duplicated span must flag on both docs")
      assert(!got.exists(_._1 == 13L), "novel doc must stay clean")
      val plan = spans.queryExecution.executedPlan.toString
      assert(!plan.contains("span_corpus_src"),
        s"stored span probe must not scan the corpus:\n$plan")
      assert(plan.contains("spec_spans_grams"))
    } finally {
      spark.sharedState.cacheManager.clearCache()
      spark.sql("DROP TABLE IF EXISTS spec_spans_grams")
    }
  }
}
