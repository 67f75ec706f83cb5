package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the stored-IVF-index contract: search over the persisted index is
  * bit-identical to a live-trained [[Similarity.ivfTopK]] run with the same
  * parameters, and the search plan reads ONLY the index relations plus the
  * query vectors — the corpus embedding parquet appears exactly once (the
  * query-side filter scan), never for postings.
  */
class IvfStoredSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val embPath = "/root/testdata/sf0.001/embeddings.parquet"

  test("stored-index search equals live-trained search and skips the corpus") {
    val dir = Files.createTempDirectory("graft_ivf").toString
    val emb = spark.read.parquet(embPath)
    val name = "ivfspec"
    try {
      Similarity.writeIvfIndex(emb, "vec_id", "embedding",
        numCentroids = 8, kmeansIters = 2, dir, name, numBuckets = 4)

      val live = Similarity.ivfTopK(
          emb,
          Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 8, iters = 2),
          col("vec_id") % 37 === 0, "vec_id", "embedding", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

      val storedDf = Similarity.ivfTopKStored(spark, name,
        emb.filter(col("vec_id") % 37 === 0), "vec_id", "embedding", k = 3)
      val stored = storedDf
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

      assert(stored === live,
        "persisted index must reproduce the live-trained search exactly")
      assert(stored.nonEmpty)

      // AQE toString prints Final AND Initial plan sections — count scans
      // in the final section only
      val plan = storedDf.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains(s"${name}_postings") && plan.contains(s"${name}_centroids"),
        s"search must read the index relations:\n$plan")
      val corpusScans = plan.linesIterator
        .count(l => l.contains("Scan parquet") && l.contains("embeddings.parquet"))
      assert(corpusScans == 1,
        s"corpus parquet must appear exactly once (query-side scan), got $corpusScans:\n$plan")
      // the kmeans update aggregation must NOT be in the search plan
      assert(!plan.contains("posexplode"),
        s"search plan must not retrain centroids:\n$plan")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_centroids")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_postings")
    }
  }

  test("appendIvfIndex equals a full rebuild under fixed centroids") {
    val dir = Files.createTempDirectory("graft_ivf_app").toString
    val emb = spark.read.parquet(embPath)
    val old = emb.filter(col("vec_id") % 3 =!= 0)
    val batch = emb.filter(col("vec_id") % 3 === 0)
    try {
      // index over the old corpus, then append the batch
      Similarity.writeIvfIndex(old, "vec_id", "embedding",
        numCentroids = 6, kmeansIters = 1, dir, "ivfa", numBuckets = 4)
      Similarity.appendIvfIndex(spark, "ivfa", batch, "vec_id", "embedding",
        numBuckets = 4)
      val appended = spark.table("ivfa_postings")
        .select("vec_id", "centroid_id")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

      // rebuild postings from scratch against the SAME stored centroids
      val cents = spark.table("ivfa_centroids")
      val rebuilt = Similarity.assignClusters(emb, cents, "vec_id", "embedding")
        .select("vec_id", "centroid_id")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

      assert(appended === rebuilt,
        "appending a batch must equal rebuilding postings under fixed centroids")
      // searches over the appended index see the new vectors
      val hits = Similarity.ivfTopKStored(spark, "ivfa",
          emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding", k = 3)
        .select("neighbor_id")
        .collect().map(_.getLong(0)).toSet
      assert(hits.exists(_ % 3 == 0), "appended vectors must be searchable")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivfa_centroids")
      spark.sql("DROP TABLE IF EXISTS ivfa_postings")
      spark.sql("DROP TABLE IF EXISTS ivfa_stats")
    }
  }

  test("deletions: tombstoned ids vanish pre-ranking; compaction preserves results; rebuild clears tombstones") {
    val dir = Files.createTempDirectory("graft_ivf_del").toString
    val emb = spark.read.parquet(embPath)
    val name = "ivfdelspec"
    def dropAll(): Unit =
      Seq("centroids", "postings", "stats", "deleted").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    dropAll()
    try {
      Similarity.writeIvfIndex(emb, "vec_id", "embedding",
        numCentroids = 6, kmeansIters = 1, dir, name, numBuckets = 4)
      val queries = emb.filter(col("vec_id") % 37 === 0)
      def search(): Set[(Long, Long, Int)] =
        Similarity.ivfTopKStored(spark, name, queries, "vec_id", "embedding",
            k = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val before = search()
      assert(before.exists(_._2 % 5 == 0),
        "fixture needs soon-to-be-deleted ids in the results")

      Similarity.deleteFromIndex(spark, name,
        emb.filter(col("vec_id") % 5 === 0).select("vec_id"), "vec_id")
      val tombstoned = search()
      assert(!tombstoned.exists(_._2 % 5 == 0),
        "deleted ids must never surface as neighbors")
      assert(tombstoned.map(t => (t._1, t._3)) === before.map(t => (t._1, t._3)),
        "every (query, rank) slot must refill — ghosts may not occupy top-k positions")
      // re-deleting is a read-side no-op
      Similarity.deleteFromIndex(spark, name,
        emb.filter(col("vec_id") % 5 === 0).select("vec_id"), "vec_id")
      assert(search() === tombstoned)

      // physical compaction: same answers, tombstone table gone
      Similarity.compactIndexDeletes(spark, dir, name, "vec_id", numBuckets = 4)
      assert(!spark.catalog.tableExists(s"${name}_deleted"))
      assert(search() === tombstoned,
        "compaction is a pure representation change")

      // a rebuild defines fresh content — old tombstones must not shadow it
      Similarity.deleteFromIndex(spark, name,
        emb.filter(col("vec_id") % 2 === 0).select("vec_id"), "vec_id")
      Similarity.writeIvfIndex(emb, "vec_id", "embedding",
        numCentroids = 6, kmeansIters = 1, dir, name, numBuckets = 4)
      assert(search() === before,
        "rebuild from the full corpus must clear the previous generation's tombstones")
    } finally dropAll()
  }

  test("drift stats: appends update the stats relation; growth and drift trip needsRetrain") {
    val dir = Files.createTempDirectory("graft_ivf_drift").toString
    val emb = spark.read.parquet(embPath)
    val old = emb.filter(col("vec_id") % 3 =!= 0)
    val batch = emb.filter(col("vec_id") % 3 === 0)
    try {
      Similarity.writeIvfIndex(old, "vec_id", "embedding",
        numCentroids = 6, kmeansIters = 1, dir, "ivfd", numBuckets = 4)
      val base = Similarity.ivfDriftStats(spark, "ivfd")
      assert(base.agg(sum("n_base")).head().getLong(0) === old.count())
      assert(base.agg(sum("n_appended")).head().getLong(0) === 0L)
      assert(!Similarity.needsRetrain(spark, "ivfd"),
        "a fresh index must not demand retraining")

      // in-distribution append, smaller than the base corpus: stats gain
      // the batch, neither trigger fires
      Similarity.appendIvfIndex(spark, "ivfd", batch, "vec_id", "embedding",
        numBuckets = 4)
      val after = Similarity.ivfDriftStats(spark, "ivfd")
      assert(after.agg(sum("n_appended")).head().getLong(0) === batch.count())
      assert(after.agg(sum("n_base")).head().getLong(0) === old.count(),
        "appends must not disturb the base stats")
      assert(!Similarity.needsRetrain(spark, "ivfd"),
        "an in-distribution append below the growth bound must not retrain")

      // GROWTH trigger: keep appending until appended > maxGrowth × base
      Similarity.appendIvfIndex(spark, "ivfd", old, "vec_id", "embedding",
        numBuckets = 4)
      assert(Similarity.needsRetrain(spark, "ivfd"),
        "appended volume past the base corpus must demand retraining")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivfd_centroids")
      spark.sql("DROP TABLE IF EXISTS ivfd_postings")
      spark.sql("DROP TABLE IF EXISTS ivfd_stats")
    }
  }

  test("drift stats: a distribution-shifted append trips the residual trigger without growth") {
    val dir = Files.createTempDirectory("graft_ivf_drift2").toString
    val emb = spark.read.parquet(embPath)
    val old = emb.filter(col("vec_id") % 3 =!= 0)
    // drifted population: a large mean shift on dimension 0 collapses the
    // batch toward one direction the base corpus never concentrated on.
    // (The synthetic embeddings are near-random, so the BASE residual is
    // already ~0.77 of the [0,2] cosine-residual range — the achievable
    // drift RATIO is structurally modest; measured 1.18× for this
    // fixture. The thresholds below bracket it, pinning the mechanism:
    // the ratio is computed and compared, fires above, stays quiet below.
    // Production thresholds are domain-tuned against real, clustered
    // embeddings where base residuals are far smaller.)
    val drifted = emb.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"),
        transform(sequence(lit(0), size(col("embedding")) - 1),
          i => when(i === 0, element_at(col("embedding"), 1) + 10.0f)
            .otherwise(element_at(col("embedding"), i + 1))).as("embedding"))
    try {
      Similarity.writeIvfIndex(old, "vec_id", "embedding",
        numCentroids = 6, kmeansIters = 1, dir, "ivfd2", numBuckets = 4)
      Similarity.appendIvfIndex(spark, "ivfd2", drifted, "vec_id", "embedding",
        numBuckets = 4)
      assert(drifted.count() < old.count(),
        "fixture sanity: the drifted batch must be below the growth bound")
      assert(Similarity.needsRetrain(spark, "ivfd2",
          maxGrowth = 1.0, maxResidualRatio = 1.1),
        "a distribution-shifted append must trip the residual trigger")
      assert(!Similarity.needsRetrain(spark, "ivfd2",
          maxGrowth = 1.0, maxResidualRatio = 1.3),
        "the same batch must NOT trip a bar above its measured drift — " +
          "the trigger must compare the actual ratio, not fire on any append")
      // the drifted mass lands on few centroids; each one it hits must
      // show the residual rise that makes the drift visible per-centroid
      val stats = Similarity.ivfDriftStats(spark, "ivfd2")
        .filter(col("n_appended") > 0)
      assert(stats.count() > 0)
      assert(stats.filter(col("mean_res_appended") <= col("mean_res_base"))
        .count() === 0L,
        "every centroid receiving drifted vectors must show a residual rise")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivfd2_centroids")
      spark.sql("DROP TABLE IF EXISTS ivfd2_postings")
      spark.sql("DROP TABLE IF EXISTS ivfd2_stats")
    }
  }
}
