package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Product quantization + ADC search: encoding correctness, recall vs the
  * exact fixed-point L2 ranking, composition with TRAINED per-subspace
  * codebooks, and the scale shape (no cross-product nodes; shuffle carries
  * code rows, not the encode fanout).
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16
  private val m = 4

  /** Clustered synthetic corpus: 4 well-separated direction clusters with
    * small deterministic jitter, so nearest-neighbor structure is
    * unambiguous and PQ (which quantizes within-subspace structure) can
    * recover it.
    */
  private lazy val corpus = {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(4)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    (0L until 80L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }.toDF("vec_id", "embedding")
  }

  test("pqEncode: every vector gets one code per subspace, codebook rows encode to themselves") {
    val cb = Similarity.pqCodebook(corpus, "vec_id", "embedding", m, 8)
    assert(cb.count() === m * 8)
    val codes = Similarity.pqEncode(corpus, "vec_id", "embedding", cb, m)
    val counts = codes.groupBy("vec_id").count().collect()
    assert(counts.length === 80 && counts.forall(_.getLong(1) === m))
    // a seed row's subvector is IN the codebook, so its distance-0 argmin
    // must pick itself (modulo an identical earlier entry)
    val seedIds = corpus
      .withColumn("r", graft.functions.Hashing.md5Long($"vec_id".cast("string")))
      .orderBy("r", "vec_id").limit(8).select("vec_id")
      .as[Long].collect().toSet
    val selfDist = Similarity.pqEncode(
        corpus.filter($"vec_id".isin(seedIds.toSeq: _*)), "vec_id", "embedding", cb, m)
      .join(cb, Seq("subspace", "code"))
      .join(corpus.filter($"vec_id".isin(seedIds.toSeq: _*)), Seq("vec_id"))
      .withColumn("fx", Similarity.fixedPoint($"embedding"))
      .withColumn("w", (size($"fx") / m).cast("int"))
      .withColumn("sv", slice($"fx", $"subspace" * $"w" + 1, $"w"))
      .withColumn("d", call_function("vec_l2sq_long", $"sv", $"cb"))
    assert(selfDist.agg(max($"d")).as[Long].head() === 0L,
      "seed rows must encode at distance zero")
  }

  test("pure ADC finds the right cluster; ADC + exact re-rank restores recall@5") {
    graft.functions.VectorExpressions.register(spark)
    val queryFilter = $"vec_id" % 20 === 0
    // Pure ADC guarantee at this quantization granularity: the shortlist
    // lands in the query's true cluster (within-cluster rank order is
    // noise once candidates share codes — that is WHY re-ranking exists).
    val adc = Similarity.pqTopK(corpus, queryFilter, "vec_id", "embedding",
        numSubspaces = m, codebookSize = 16, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(adc.nonEmpty)
    assert(adc.forall { case (q, n) => q % 4 === n % 4 },
      "every ADC top-5 candidate must come from the query's own cluster")
    // Refined guarantee: exact re-rank of the ADC shortlist ≈ exact top-5.
    val refined = Similarity.pqTopKRefined(corpus, queryFilter, "vec_id",
        "embedding", numSubspaces = m, codebookSize = 16, k = 5, shortlist = 20)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val fx = corpus.select($"vec_id", Similarity.fixedPoint($"embedding").as("fx"))
    val exact = fx.filter(queryFilter).select($"vec_id".as("qid"), $"fx".as("qv"))
      .crossJoin(fx.select($"vec_id".as("nid"), $"fx".as("nv")))
      .filter($"qid" =!= $"nid")
      .withColumn("d", call_function("vec_l2sq_long", $"qv", $"nv"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid")
          .orderBy($"d".asc, $"nid".asc)))
      .filter($"rk" <= 5).select("qid", "nid")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = exact.map { case (q, truth) =>
      refined.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }.toSeq
    assert(recalls.nonEmpty)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"refined mean recall@5 $mean below 0.8 (per-query: $recalls)")
  }

  test("trained per-subspace codebooks (Lloyd's on subvectors) compose, and training reduces distortion") {
    graft.functions.VectorExpressions.register(spark)
    // Production path: each subspace's codebook from kmeansCentroids on its
    // subvector relation — pqEncode accepts any (subspace, code, cb). The
    // trainer is SPHERICAL (unit centroids), so this test uses a corpus
    // whose every subvector is unit-norm: codebook entries and subvectors
    // live on the same sphere and distortion is comparable across iters.
    val width = dim / m
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(4)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    val unitCorpus = (0L until 80L).map { i =>
      val raw = centers((i % 4).toInt)
        .map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
      val slices = raw.grouped(width).map { s =>
        val n = math.sqrt(s.map(x => x.toDouble * x).sum)
        s.map(x => (x / n).toFloat)
      }
      (i, slices.flatten.toArray)
    }.toDF("vec_id", "embedding")
    val subv = unitCorpus
      .select($"vec_id", posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice($"embedding", s * width + 1, lit(width)))))
      .select(($"vec_id" * m + $"pos").as("svid"), $"pos".as("subspace"),
        $"col".as("sv"))
    def trainedCb(iters: Int) = (0 until m).map { s =>
      Similarity.kmeansCentroids(
          subv.filter($"subspace" === s).select($"svid", $"sv"),
          "svid", "sv", k = 8, iters = iters)
        .select(lit(s).as("subspace"), $"svid".cast("int").as("code"),
          Similarity.fixedPoint($"sv").as("cb"))
    }.reduce(_ unionAll _)
    def distortion(cb: org.apache.spark.sql.DataFrame): Long = {
      val fx = unitCorpus.select($"vec_id",
        Similarity.fixedPoint($"embedding").as("fx"))
      Similarity.pqEncode(unitCorpus, "vec_id", "embedding", cb, m)
        .join(cb, Seq("subspace", "code")).join(fx, Seq("vec_id"))
        .withColumn("w", (size($"fx") / m).cast("int"))
        .withColumn("sv", slice($"fx", $"subspace" * $"w" + 1, $"w"))
        .agg(sum(call_function("vec_l2sq_long", $"sv", $"cb")))
        .as[Long].head()
    }
    val trained = trainedCb(iters = 2)
    val codes = Similarity.pqEncode(unitCorpus, "vec_id", "embedding", trained, m)
    assert(codes.groupBy("vec_id").count().collect().forall(_.getLong(1) === m))
    // Lloyd's monotonicity vs the SAME min-md5 init (iters=0), with 1%
    // slack for the spherical re-normalization + fixed-point rounding
    val d2 = distortion(trained)
    val d0 = distortion(trainedCb(iters = 0))
    assert(d2 <= (d0 * 1.01).toLong,
      s"2 Lloyd's iterations must not increase distortion: $d2 vs init $d0")
  }

  test("ivfPqTopK scores only same-cluster candidates and agrees with flat ADC on them") {
    graft.functions.VectorExpressions.register(spark)
    val cents = corpus.filter($"vec_id" < 4)
    val out = Similarity.ivfPqTopK(corpus, cents, $"vec_id" % 20 === 0,
      "vec_id", "embedding", numSubspaces = m, codebookSize = 16, k = 5)
    val rows = out.select("query_id", "neighbor_id", "adist")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val ass = Similarity.assignClusters(corpus, cents, "vec_id", "embedding")
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    rows.foreach { case (q, n, _) =>
      assert(ass(q) === ass(n), s"neighbor $n outside query $q's cluster")
    }
    // blocking changes WHICH pairs are scored, never the score: adist must
    // equal flat ADC's for every pair both emit
    val flat = Similarity.pqTopK(corpus, $"vec_id" % 20 === 0, "vec_id",
        "embedding", numSubspaces = m, codebookSize = 16, k = 80)
      .select("query_id", "neighbor_id", "adist")
      .as[(Long, Long, Long)].collect()
      .map { case (q, n, d) => (q, n) -> d }.toMap
    rows.foreach { case (q, n, d) =>
      assert(flat((q, n)) === d, s"ADC distance drift for pair ($q,$n)")
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("stored IVFPQ index: search ≡ live, plan reads only index relations for the corpus side") {
    graft.functions.VectorExpressions.register(spark)
    val cents = corpus.filter($"vec_id" < 4)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_wh").toString
    Similarity.writeIvfPqIndex(corpus, cents, "vec_id", "embedding",
      numSubspaces = m, codebookSize = 16, dir, "ivfpqtest", numBuckets = 4)
    val queries = corpus.filter($"vec_id" % 20 === 0)
    val stored = Similarity.ivfPqTopKStored(spark, "ivfpqtest", queries,
      "vec_id", "embedding", k = 5)
    val live = Similarity.ivfPqTopK(corpus, cents, $"vec_id" % 20 === 0,
      "vec_id", "embedding", numSubspaces = m, codebookSize = 16, k = 5)
    assert(stored.collect().map(_.toSeq).toSet ===
      live.collect().map(_.toSeq).toSet,
      "persisted index must reproduce the live computation bit-for-bit")
    // the corpus relation feeds the plan ONLY through the query filter —
    // encode/assign/train stages must come from the stored tables
    val scans = stored.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Scan")).mkString("\n")
    assert(scans.contains("ivfpqtest_codes") &&
      scans.contains("ivfpqtest_pqcodebook") &&
      scans.contains("ivfpqtest_centroids"),
      s"search must read the three index relations:\n$scans")
    Seq("ivfpqtest_codes", "ivfpqtest_pqcodebook", "ivfpqtest_centroids")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("appendIvfPqIndex: append ≡ rebuild under fixed centroids and codebook") {
    graft.functions.VectorExpressions.register(spark)
    val cents = corpus.filter($"vec_id" < 4)
    val day1 = corpus.filter($"vec_id" < 60)
    val day2 = corpus.filter($"vec_id" >= 60)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_wh2").toString
    // NB: the codebook seeds come from day1's min-md5 rows; the rebuild
    // control below must use the SAME quantizers, so it re-reads them
    Similarity.writeIvfPqIndex(day1, cents, "vec_id", "embedding",
      numSubspaces = m, codebookSize = 8, dir, "ivfpqapp", numBuckets = 4)
    Similarity.appendIvfPqIndex(spark, "ivfpqapp", day2, "vec_id",
      "embedding", numBuckets = 4)
    val appended = spark.table("ivfpqapp_codes")
      .collect().map(_.toSeq).toSet
    // rebuild control: encode the FULL corpus against the stored quantizers
    val cb = spark.table("ivfpqapp_pqcodebook")
    val storedCents = spark.table("ivfpqapp_centroids")
    val rebuilt = Similarity.pqEncode(corpus, "vec_id", "embedding", cb, m)
      .select($"vec_id".as("neighbor_id"), $"subspace", $"code")
      .join(Similarity.assignClusters(corpus, storedCents, "vec_id", "embedding")
        .select($"vec_id".as("neighbor_id"), $"centroid_id"), "neighbor_id")
      .select(appended.head.indices.map(i =>
        col(spark.table("ivfpqapp_codes").columns(i))): _*)
      .collect().map(_.toSeq).toSet
    assert(appended === rebuilt,
      "appending day2 must equal encoding the union corpus with the stored quantizers")
    Seq("ivfpqapp_codes", "ivfpqapp_pqcodebook", "ivfpqapp_centroids")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("pqTopK plans without cross-product nodes and is partition-layout invariant") {
    val q = Similarity.pqTopK(corpus, $"vec_id" % 20 === 0, "vec_id",
      "embedding", numSubspaces = m, codebookSize = 8, k = 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"ADC search must never plan a cross product:\n$plan")
    val a = q.collect().map(_.toSeq).toSet
    val b = Similarity.pqTopK(corpus.repartition(13), $"vec_id" % 20 === 0,
      "vec_id", "embedding", numSubspaces = m, codebookSize = 8, k = 3)
      .collect().map(_.toSeq).toSet
    assert(a === b, "result must not depend on input partition layout")
  }
}
