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
    }
  }
}
