package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Approximate-NN quality gate: IVF trades recall for a ~C× candidate-set
  * reduction; this spec pins the trade-off on the real corpus so a
  * regression in cluster assignment or search shows up as a recall drop,
  * not silently.
  */
class AnnRecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("IVF top-k recall vs brute force stays above the floor on the real corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queryFilter = col("vec_id") % 10 === 0
    val k = 5
    val exact = Similarity.bruteForceTopK(
        emb.filter(queryFilter), emb, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    def meanRecall(nProbe: Int): Double = {
      val approx = Similarity.ivfTopK(
          emb, emb.filter(col("vec_id") < 8), queryFilter, "vec_id",
          "embedding", k, nProbe)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      val recalls = exact.keys.toSeq.map { q =>
        (approx.getOrElse(q, Set.empty) intersect exact(q)).size.toDouble / exact(q).size
      }
      recalls.sum / recalls.size
    }
    val r1 = meanRecall(1)
    val r3 = meanRecall(3)
    // nprobe=1 over 8 random-ish clusters: recall well above random
    // (k/n ≈ 10%) proves the cluster restriction is actually finding
    // neighbors; it is NOT expected to approach 1.0 on uniform vectors.
    assert(r1 >= 0.2, s"mean recall@$k $r1 below floor at nprobe=1")
    assert(r3 >= r1, s"recall must not degrade with wider probing: $r3 < $r1")
  }

  test("trained k-means centroids beat fixed-pivot centroids on recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queryFilter = col("vec_id") % 10 === 0
    val k = 5
    val exact = Similarity.bruteForceTopK(
        emb.filter(queryFilter), emb, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    def meanRecall(centroids: org.apache.spark.sql.DataFrame): Double = {
      val approx = Similarity.ivfTopK(
          emb, centroids, queryFilter, "vec_id", "embedding", k, nProbe = 1)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      val recalls = exact.keys.toSeq.map { q =>
        (approx.getOrElse(q, Set.empty) intersect exact(q)).size.toDouble / exact(q).size
      }
      recalls.sum / recalls.size
    }
    val fixed = meanRecall(emb.filter(col("vec_id") < 8))
    val trained = meanRecall(
      Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 10, iters = 2))
    // The corpus has 10 planted label clusters; Lloyd's over 10 centroids
    // should recover them and dominate 8 arbitrary pivots.
    assert(trained >= fixed,
      s"trained recall $trained below fixed-pivot baseline $fixed")
  }
}
