package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the k-means trainer's contract: deterministic output (the oracle
  * replays training in SQL, so any nondeterminism breaks the hash gate),
  * recovery of the corpus's planted label clusters, and the blocked
  * embedding near-dup reaching full recall vs the exact all-pairs baseline.
  */
class KmeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("centroid ids are 0..k-1 and vectors are unit-norm") {
    val cent = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 10, iters = 2)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Double])].collect()
    assert(cent.map(_._1).sorted.toSeq == (0L until 10L))
    cent.foreach { case (cid, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"centroid $cid norm $n not unit")
    }
  }

  test("training is deterministic across invocations") {
    def run(): Seq[(Long, Seq[Double])] =
      Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 10, iters = 2)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    val a = run()
    val b = run()
    // Bit-exact equality would overconstrain (shuffle fetch order can permute
    // double summation); the oracle contract only needs stability well above
    // assignment margins (measured ≥4e-5 on this corpus).
    a.zip(b).foreach { case ((ida, va), (idb, vb)) =>
      assert(ida == idb)
      va.zip(vb).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-9, s"centroid $ida drifted: $x vs $y")
      }
    }
  }

  test("Lloyd's iterations improve the spherical k-means objective") {
    // Objective = mean cosine of each vector to its assigned centroid.
    // (The corpus's `label` column is NOT cosine-separable — measured
    // intra-label cosine 0.019 vs inter-label -0.000 — so purity-vs-label
    // is not a valid oracle; monotone objective improvement is.)
    def objective(iters: Int): Double = {
      val cent = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        k = 10, iters = iters)
      Similarity.assignClusters(emb, cent, "vec_id", "embedding")
        .join(Similarity.kmeansCentroids(emb, "vec_id", "embedding", 10, iters)
          .select(col("vec_id").as("centroid_id"), col("embedding")), "centroid_id")
        .select(graft.ext.Similarity.cosine(col("nv"), col("embedding")).as("c"))
        .agg(avg("c")).as[Double].head()
    }
    val o0 = objective(0)
    val o2 = objective(2)
    assert(o2 > o0, s"objective did not improve: iters=2 $o2 <= iters=0 $o0")
  }

  test("deep training is safe: plan depth stays flat as iters grows (lineage truncation)") {
    def planLines(iters: Int): Int =
      Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 10, iters = iters)
        .queryExecution.optimizedPlan.numberedTreeString.linesIterator.size
    val d2 = planLines(2)
    val d8 = planLines(8)
    // each iteration ends in an eager localCheckpoint, so the returned
    // relation's plan is rooted at the LAST checkpoint regardless of depth
    assert(d8 == d2, s"plan depth grew with iters: iters=2 → $d2 lines, iters=8 → $d8")
    // and the deep run still produces valid unit centroids
    val cent = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 10, 8)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Double])].collect()
    assert(cent.map(_._1).sorted.toSeq == (0L until cent.length.toLong))
    cent.foreach { case (cid, v) =>
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
    }
  }

  test("int8 quantization: round-trip error bounded, top-k mostly preserved") {
    import org.apache.spark.sql.functions.{col, transform => atransform, aggregate => aagg, lit, greatest, abs => aabs, array_max, zip_with}
    val q = Similarity.quantize(col("embedding"))
    val rt = emb.select(col("vec_id"), col("embedding"), q.as("q"))
      .select(col("vec_id"),
        array_max(zip_with(
          atransform(col("embedding"), x => x.cast("double")),
          Similarity.dequantize(col("q")),
          (a, b) => aabs(a - b))).as("max_err"),
        (col("q.qmax") - col("q.qmin")).as("range"))
    // per-dim reconstruction error ≤ range/510 (half a code step)
    val bad = rt.filter(col("max_err") > col("range") / 510.0 + 1e-12).count()
    assert(bad == 0, s"$bad vectors exceed the half-step error bound")
    // cosine top-5 on dequantized vectors overlaps the exact top-5 heavily
    val dq = emb.select(col("vec_id"),
      Similarity.dequantize(Similarity.quantize(col("embedding"))).as("embedding"))
    def topk(c: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(
          c.filter(col("vec_id") % 10 === 0), c, "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id").as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val exact = topk(emb.select(col("vec_id"),
      atransform(col("embedding"), x => x.cast("double")).as("embedding")))
    val approx = topk(dq)
    val recall = exact.keys.toSeq.map(k =>
      (approx(k) intersect exact(k)).size.toDouble / 5).sum / exact.size
    assert(recall >= 0.9, s"int8 top-5 recall $recall below 0.9")
  }

  test("blocked embedding near-dup matches the exact all-pairs baseline") {
    val exact = Dedup.embeddingNearDupPairsExact(emb, "vec_id", "embedding", 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val blocked = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.45,
        numCentroids = 10, kmeansIters = 2, nProbe = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(blocked.subsetOf(exact), "blocked emitted a non-pair (precision must be 1)")
    assert(blocked == exact,
      s"blocked recall ${blocked.size}/${exact.size}: missing ${exact -- blocked}")
  }
}
