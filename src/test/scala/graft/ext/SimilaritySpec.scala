package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VectorExpressions

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(rows: (Long, Array[Float])*) = rows.toDF("vec_id", "embedding")

  test("vec_dot / vec_normalize match the interpreted HOF forms") {
    VectorExpressions.register(spark)
    val df = vecs(
      1L -> Array(1.0f, 2.0f, 3.0f),
      2L -> Array(-0.5f, 0.0f, 4.25f),
      3L -> Array(0.0f, 0.0f, 0.0f))
    val a = df.select($"vec_id", $"embedding".as("x"))
    val b = df.select($"vec_id".as("vid2"), $"embedding".as("y"))
    val both = a.crossJoin(b).select(
      call_function("vec_dot", $"x", $"y").as("native"),
      Similarity.dot($"x", $"y").as("hof"))
    both.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
    val n = df.select(call_function("vec_normalize", $"embedding").as("nv"))
      .collect().map(_.getSeq[Double](0))
    assert(math.abs(n(0).map(x => x * x).sum - 1.0) < 1e-12)
    assert(n(2).forall(_ == 0.0), "zero vector normalizes to zero, not NaN")
  }

  test("bruteForceTopK returns exact neighbors in similarity order") {
    val df = vecs(
      1L -> Array(1.0f, 0.0f),
      2L -> Array(0.9f, 0.1f),
      3L -> Array(0.5f, 0.5f),
      4L -> Array(0.0f, 1.0f))
    val out = Similarity.bruteForceTopK(
      df.filter($"vec_id" === 1), df, "vec_id", "embedding", k = 3)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(out === Array((2L, 1), (3L, 2), (4L, 3)))
  }

  test("assignClusters picks the nearest centroid with id tiebreak") {
    val df = vecs(
      10L -> Array(1.0f, 0.05f),
      11L -> Array(0.05f, 1.0f),
      12L -> Array(0.7f, 0.7f)) // equidistant → lowest centroid id wins
    val cents = vecs(1L -> Array(1.0f, 0.0f), 2L -> Array(0.0f, 1.0f))
    val m = Similarity.assignClusters(df, cents, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(m(10L) === 1L)
    assert(m(11L) === 2L)
    assert(m(12L) === 1L)
  }

  test("ivfTopK searches only within the query's cluster") {
    val df = vecs(
      1L -> Array(1.0f, 0.0f), 2L -> Array(0.95f, 0.1f),
      3L -> Array(0.9f, 0.2f), 4L -> Array(0.0f, 1.0f),
      5L -> Array(0.1f, 0.95f))
    val cents = vecs(1L -> Array(1.0f, 0.0f), 4L -> Array(0.0f, 1.0f))
    val out = Similarity.ivfTopK(df, cents, $"vec_id" === 1, "vec_id", "embedding", k = 4)
      .collect().map(r => r.getLong(1)).toSet
    assert(out === Set(2L, 3L), "cluster-restricted: 4 and 5 are unreachable")
  }

  test("ivfTopKBetween links queries to the other corpus only, within shared clusters") {
    val corpus = vecs(
      10L -> Array(1.0f, 0.0f), 11L -> Array(0.95f, 0.1f),
      12L -> Array(0.0f, 1.0f))
    val queries = vecs(1L -> Array(0.99f, 0.05f), 2L -> Array(0.05f, 0.99f))
    val cents = vecs(10L -> Array(1.0f, 0.0f), 12L -> Array(0.0f, 1.0f))
    val got = Similarity.ivfTopKBetween(queries, corpus, cents,
        "vec_id", "embedding", k = 2)
      .as[(Long, Long, Int)].collect().toSet
    // query 1 lands in cluster 10 -> neighbors {10, 11}; query 2 in 12 -> {12}
    assert(got === Set((1L, 10L, 1), (1L, 11L, 2), (2L, 12L, 1)))
  }

  test("clusterBalancedSample draws ~perCluster per cluster, partition-invariantly") {
    val rows = (1L to 300L).map { i =>
      if (i % 2 == 0) (i, Array(1.0f, (i % 7).toFloat / 100f))
      else (i, Array((i % 7).toFloat / 100f, 1.0f))
    }
    val df = vecs(rows: _*)
    val cents = vecs(0L -> Array(1.0f, 0.0f), 1L -> Array(0.0f, 1.0f))
    val got = Similarity.clusterBalancedSample(df, cents, "vec_id", "embedding", 50L)
      .as[(Long, Long)].collect().toSet
    val byCluster = got.groupBy(_._2).view.mapValues(_.size).toMap
    // binomial around 50 of 150 per cluster; generous tolerance
    assert(byCluster.keySet === Set(0L, 1L))
    byCluster.values.foreach(n => assert(n > 25 && n < 75, s"per-cluster $n"))
    val again = Similarity.clusterBalancedSample(df.repartition(7), cents,
        "vec_id", "embedding", 50L)
      .as[(Long, Long)].collect().toSet
    assert(again === got)
    // a cluster-covering quota keeps everything
    assert(Similarity.clusterBalancedSample(df, cents, "vec_id", "embedding",
      1000L).count() === 300L)
  }

  test("hardNegatives skips the positive zone and re-ranks the next band") {
    val df = vecs(
      1L -> Array(1.0f, 0.0f), 2L -> Array(0.98f, 0.05f),
      3L -> Array(0.95f, 0.1f), 4L -> Array(0.9f, 0.2f),
      5L -> Array(0.85f, 0.3f), 6L -> Array(0.0f, 1.0f))
    val cents = vecs(1L -> Array(1.0f, 0.0f), 6L -> Array(0.0f, 1.0f))
    // full ANN order for query 1 within its cluster: 2, 3, 4, 5
    val got = Similarity.hardNegatives(df, cents, $"vec_id" === 1,
        "vec_id", "embedding", skipTop = 2, negK = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 4L, 1), (1L, 5L, 2)))
  }

  test("projectQuantized matches the driver-side integer twin and keeps identical rows identical") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 20L).map(i =>
      (i, Array.fill(32)(rnd.nextFloat() * 2 - 1))) :+
      (99L, Array.fill(32)(0.25f))
    val withCopy = rows :+ (100L, rows.last._2.clone()) // 99 ≡ 100
    val df = withCopy.toDF("vec_id", "embedding")
    val outDim = 8
    val got = Similarity.projectQuantized(df, "vec_id", "embedding", outDim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    // driver-side twin: quantize (round-half-up like Spark's round) then
    // integer-sign projection from the same md5 derivation
    val signs = graft.functions.VectorExpressions.IntProject.signs(outDim, 32)
    withCopy.foreach { case (id, v) =>
      val d = v.map(_.toDouble)
      val mn = d.min; val mx = d.max
      val scale = if (mx > mn) mx - mn else 1.0
      val codes = d.map(x => math.round((x - mn) * 255.0 / scale).toInt)
      val want = signs.map(row =>
        codes.zip(row).map { case (c, s) => c.toLong * s }.sum)
      assert(got(id) === want, s"vec $id")
    }
    assert(got(99L) === got(100L))
  }
}
