package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property-based invariants for the dedup operators (SURVEY §5.2).
  * Spark-side properties run on sampled batches (one Spark job per case is
  * too slow for 100 ScalaCheck cases); the pure-JVM twin of text_shingles
  * gets the full randomized treatment.
  */
class DedupPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 30)
    toks <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaLowerStr.map(_.take(6)),
      Gen.oneOf("the", "a", "Table!", "X9", "don't", "", "  ")))
  } yield toks.mkString(" ")

  /** Pure-JVM reference of the shingle pipeline (same as the spec oracle). */
  private def refShingles(text: String, n: Int): Vector[String] = {
    val toks = text.toLowerCase(java.util.Locale.ROOT)
      .split(graft.ext.TextAnalysis.TokenSplitRegex).filter(_.nonEmpty)
    val all = if (toks.length < n) Vector(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toVector
    all.distinct
  }

  test("text_shingles equals the reference for random texts (property, via one batch)") {
    graft.functions.TextExpressions.register(spark)
    val samples = Gen.listOfN(300, textGen).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val got = samples.toDF("id", "text")
      .select($"id", call_function("text_shingles", $"text", lit(3)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    samples.foreach { case (id, t) =>
      assert(got(id) === refShingles(t, 3), s"text=$t")
    }
  }

  test("exactDedup invariants: no duplicate content, min-id winners, subset (property batch)") {
    val texts = Gen.listOfN(120, textGen).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    val out = Dedup.exactDedup(df, $"text", "doc_id")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // subset of input
    val inMap = texts.toMap
    out.foreach { case (id, t) => assert(inMap(id) === t) }
    // no two survivors share content
    assert(out.map(_._2).distinct.length === out.length)
    // every survivor is the minimum id for its content
    val minId = texts.groupBy(_._2).view.mapValues(_.map(_._1).min)
    out.foreach { case (id, t) => assert(id === minId(t)) }
    // every distinct input content has exactly one survivor
    assert(out.length === texts.map(_._2).distinct.length)
  }

  test("minhash signature agreement is monotone in true Jaccard (statistical property)") {
    // For pairs with J(a,b)=1 signatures agree fully; est_jaccard is an
    // unbiased estimator so across many random near/far pairs the mean
    // agreement of near pairs must exceed far pairs.
    val rng = new scala.util.Random(42) // seeded: statistical, not flaky
    val base = Gen.listOfN(40, Gen.alphaLowerStr.map(_.take(5)))
      .sample.get.filter(_.nonEmpty)
    val rows = (0 until 30).flatMap { i =>
      val t = rng.shuffle(base).take(20).mkString(" ")
      Seq((i * 2L, t), (i * 2L + 1, t.split(" ").dropRight(2).mkString(" ")))
    }
    val sig = Dedup.minhashSignatures(
        rows.toDF("doc_id", "text"), $"text", "doc_id", 8, 2)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    val nearAgree = (0 until 30).map { i =>
      sig(i * 2L).zip(sig(i * 2L + 1)).count { case (a, b) => a == b }
    }.sum / 30.0
    val farAgree = (0 until 29).map { i =>
      sig(i * 2L).zip(sig(i * 2L + 2)).count { case (a, b) => a == b }
    }.sum / 29.0
    assert(nearAgree > farAgree,
      s"near-pair agreement $nearAgree must exceed far-pair $farAgree")
    assert(nearAgree >= 4.0, s"near pairs should agree on most hashes: $nearAgree")
  }

  test("stored-state incremental dedup equals the recompute form on random corpora (property batch)") {
    val rng = new scala.util.Random(7)
    val dir = java.nio.file.Files.createTempDirectory("graft_prop_state").toString
    try {
      for (round <- 0 until 3) {
        val corpusRows = Gen.listOfN(40, textGen).sample.get.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }
        // batch = fresh random docs ∪ exact copies ∪ near-variants of corpus rows
        val batchRows =
          Gen.listOfN(10, textGen).sample.get.zipWithIndex
            .map { case (t, i) => (1000L + i, t) } ++
          rng.shuffle(corpusRows).take(8).zipWithIndex.map { case ((_, t), i) =>
            (2000L + i, t) } ++
          rng.shuffle(corpusRows).take(8).zipWithIndex.map { case ((_, t), i) =>
            (3000L + i, t.split(" ").dropRight(1).mkString(" ")) }
        val corpus = corpusRows.toDF("doc_id", "text")
        val batch = batchRows.toDF("doc_id", "text")
        val name = s"prop_state_$round"
        Dedup.writeDedupState(corpus, $"text", "doc_id", 8, 3, dir, name, 4)
        val stored = Dedup.incrementalDedupStored(spark, name, batch,
            $"text", "doc_id", 8, 4, 3, 0.5)
          .select("doc_id").as[Long].collect().sorted
        val recompute = Dedup.incrementalDedup(corpus, batch,
            $"text", "doc_id", 8, 4, 3, 0.5)
          .select("doc_id").as[Long].collect().sorted
        assert(stored === recompute, s"round=$round corpus=$corpusRows batch=$batchRows")
        spark.sql(s"DROP TABLE IF EXISTS ${name}_hashes")
        spark.sql(s"DROP TABLE IF EXISTS ${name}_sigs")
      }
    } finally spark.sharedState.cacheManager.clearCache()
  }

  test("saltedJoin equals the direct join on random skewed data (property batch)") {
    val rng = new scala.util.Random(11)
    for (round <- 0 until 3) {
      val nKeys = 1 + rng.nextInt(6)
      val big = (1L to 500L).map { i =>
        // zipf-ish: most rows on key 0
        val k = if (rng.nextDouble() < 0.8) 0L else rng.nextInt(nKeys).toLong
        (i, k)
      }.toDF("row_id", "k")
      // dim with a missing key and a DUPLICATE key row (fan-out case)
      val dim = ((0L until nKeys.toLong).filter(_ != 1L).map(i => (i, s"d$i")) :+
        (0L, "d0_dup")).toDF("k", "label")
      for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
        def norm(df: org.apache.spark.sql.DataFrame) = jt match {
          case "left_semi" | "left_anti" =>
            df.select("row_id").as[Long].collect().sorted.map(_.toString)
          case _ =>
            df.select($"row_id", $"k", $"label")
              .collect().map(r => s"${r.getLong(0)}|${r.getLong(1)}|${Option(r.getString(2))}")
              .sorted
        }
        val salted = norm(Skew.saltedJoin(big, dim, Seq("k"), $"row_id",
          1 + rng.nextInt(16), jt))
        val direct = norm(big.join(dim, Seq("k"), jt))
        assert(salted.toSeq === direct.toSeq, s"round=$round joinType=$jt")
      }
    }
  }

  test("bloomAntiJoin equals the direct anti join for random key overlaps (sampled rounds)") {
    val rng = new scala.util.Random(19)
    for (round <- 1 to 4) {
      val keySpace = 1 + rng.nextInt(500)
      val big = (1L to 400L)
        .map(i => (i, s"k${rng.nextInt(keySpace)}")).toDF("id", "k")
      val keys = (1 to 200).map(_ => s"k${rng.nextInt(keySpace)}").toDF("kk")
      val viaBloom = BloomJoin.bloomAntiJoin(big, $"k", keys, $"kk")
        .select("id").as[Long].collect().sorted
      val direct = big.join(keys, $"k" === $"kk", "left_anti")
        .select("id").as[Long].collect().sorted
      assert(viaBloom.toSeq === direct.toSeq, s"round=$round keySpace=$keySpace")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("scdHistory version ranges chain per key: one current, valid_from chains to valid_to (sampled)") {
    val rng = new scala.util.Random(23)
    val rows = (1L to 300L).map(i =>
      (s"key${rng.nextInt(40)}", rng.nextInt(50).toLong, i))
      .toDF("k", "ver", "uid")
    val hist = graft.core.Merge.scdHistory(rows, Seq("k"), "ver", $"uid")
      .select("k", "ver", "uid", "valid_to", "is_current")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
    hist.groupBy(_._1).foreach { case (k, vs) =>
      assert(vs.count(_._5) === 1, s"key $k must have exactly one current")
      // sorted by (ver, uid), each valid_to equals the NEXT version's ver
      val sorted = vs.sortBy(v => (v._2, v._3))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._2), s"key $k chain break")
        case _ =>
      }
      assert(sorted.last._4.isEmpty)
    }
  }

  test("prefix length formula stays sound for all sizes/thresholds (pure property)") {
    // plen = sz - ceil(t*sz) + 1 must be >= 1 and the excluded suffix must
    // be coverable by a t-overlap: ceil(t*sz) <= sz for t <= 1.
    val prop = Prop.forAll(Gen.choose(1, 1000), Gen.choose(0.01, 1.0)) {
      (sz: Int, t: Double) =>
        val plen = sz - math.ceil(t * sz).toInt + 1
        plen >= 1 && plen <= sz
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("containmentPairs equals the naive directed containment on random corpora (property batch)") {
    // small vocab + short docs → dense overlap, subsets and supersets arise
    // naturally; the one-sided prefix filter must lose NOTHING (pigeonhole)
    val vocab = Vector("ash", "birch", "cedar", "dawn", "elm", "fern", "glen")
    val docGen = for {
      n <- Gen.choose(1, 10)
      toks <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield toks.mkString(" ")
    val rows = Gen.listOfN(60, docGen).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("doc_id", "text")
    val threshold = 0.7
    val got = Dedup.containmentPairs(df, $"text", "doc_id", 2, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def sh(t: String): Set[String] = {
      val toks = t.toLowerCase.split(graft.ext.TextAnalysis.TokenSplitRegex).filter(_.nonEmpty)
      if (toks.length < 2) Set(toks.mkString(" "))
      else toks.sliding(2).map(_.mkString(" ")).toSet
    }
    val m = rows.map { case (id, t) => id -> sh(t) }.toMap
    val naive = (for {
      a <- rows.map(_._1); b <- rows.map(_._1) if a != b
      c = (m(a) intersect m(b)).size
      cont = c.toDouble / m(a).size if cont >= threshold
    } yield (a, b, cont)).toSet
    assert(got === naive, "prefix-filtered containment must equal all-pairs")
  }
}
