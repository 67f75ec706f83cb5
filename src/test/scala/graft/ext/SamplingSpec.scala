package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the reproducibility contract of the deterministic samplers: the
  * sample is a pure function of the DATA — invariant to partition layout —
  * and disjoint fraction windows of the same hash never overlap.
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("hashSample is invariant to repartitioning") {
    val a = Sampling.hashSample(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs.repartition(17), "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    assert(a.nonEmpty && a.size < docs.count())
  }

  test("complementary fractions partition the corpus disjointly") {
    val n = docs.count()
    val lo = Sampling.hashSample(docs, "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    // complement window [0.25, 1.0) expressed via the full-sample difference
    val all = Sampling.hashSample(docs, "doc_id", 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(all.size.toLong == n, "fraction 1.0 must keep everything")
    val hi = all -- lo
    assert(lo.intersect(hi).isEmpty && (lo ++ hi).size.toLong == n)
  }

  test("stratifiedSample keeps exactly n per stratum and is deterministic") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val s1 = Sampling.stratifiedSample(emb, "label", "vec_id", 3)
      .select("vec_id", "label").as[(Long, Int)].collect().toSet
    val s2 = Sampling.stratifiedSample(emb.repartition(13), "label", "vec_id", 3)
      .select("vec_id", "label").as[(Long, Int)].collect().toSet
    assert(s1 == s2)
    val perLabel = s1.groupBy(_._2).view.mapValues(_.size)
    assert(perLabel.values.forall(_ == 3))
  }

  test("hashSample fractions are monotone: sample(f1) is a subset of sample(f2) for f1 <= f2") {
    val s20 = Sampling.hashSample(docs, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    val s50 = Sampling.hashSample(docs, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(s20.subsetOf(s50),
      "growing the fraction must only ADD rows (stable train-set growth)")
  }

  test("mixtureSample hits the target mixture within lottery noise and is deterministic") {
    val s1 = Sampling.mixtureSample(docs, "lang", "doc_id",
        Seq("en" -> 3L, "de" -> 1L))
      .select("doc_id", "lang").as[(Long, String)].collect().toSet
    val s2 = Sampling.mixtureSample(docs.repartition(11), "lang", "doc_id",
        Seq("en" -> 3L, "de" -> 1L))
      .select("doc_id", "lang").as[(Long, String)].collect().toSet
    assert(s1 == s2, "sample must be partition-layout-invariant")
    assert(s1.map(_._2).subsetOf(Set("en", "de")), "unweighted groups dropped")
    val en = s1.count(_._2 == "en").toDouble
    val de = s1.count(_._2 == "de").toDouble
    // 3:1 target; hash lottery is binomial, so allow generous noise bounds.
    assert(en / de > 1.5 && en / de < 6.0, s"mixture off: en=$en de=$de")
  }

  test("mixtureSample keeps the binding group nearly whole") {
    // With weights matched to the observed counts' most-demanded group,
    // T = min_g(n_g·W div w_g); the argmin group's cut is ~10⁶ (keep all).
    val counts = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Sampling.mixtureSample(docs, "lang", "doc_id",
        Seq("en" -> 1L, "zh" -> 1L))
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // equal weights → the smaller group is binding and kept in full
    val binding = if (counts("en") <= counts("zh")) "en" else "zh"
    assert(out(binding) == counts(binding),
      s"binding group $binding must survive whole: $out vs $counts")
  }

  test("mixtureSample with an absent requested group is empty") {
    val out = Sampling.mixtureSample(docs, "lang", "doc_id",
      Seq("en" -> 1L, "xx" -> 1L))
    assert(out.count() == 0L,
      "unsatisfiable mixture (a requested group has no rows) must be empty")
  }

  test("splitAssign is disjoint, exhaustive, and partition-invariant") {
    val w = Seq("train" -> 8L, "val" -> 1L, "test" -> 1L)
    val a = Sampling.splitAssign(docs, "doc_id", w)
      .select("doc_id", "split").as[(Long, String)].collect()
    assert(a.length.toLong == docs.count(), "every row gets exactly one label")
    assert(a.map(_._2).toSet == Set("train", "val", "test"))
    val b = Sampling.splitAssign(docs.repartition(17), "doc_id", w)
      .select("doc_id", "split").as[(Long, String)].collect()
    assert(a.toSet == b.toSet)
    // ~8:1:1 within lottery noise
    val n = a.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    assert(n("train") / a.length > 0.7 && n("train") / a.length < 0.9,
      s"train fraction off: $n")
  }

  test("splitAssign windows align with hashSample: train window = sample(0.8)") {
    // the first window [0, 0.8) is definitionally hashSample(0.8)
    val train = Sampling.splitAssign(docs, "doc_id",
        Seq("train" -> 4L, "rest" -> 1L))
      .filter($"split" === "train").select("doc_id").as[Long].collect().toSet
    val sample = Sampling.hashSample(docs, "doc_id", 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(train == sample)
  }

  test("redactPii replaces emails and phones, leaves clean text alone") {
    val df = Seq(
      (1L, "reach me at jane.doe+spam@sub.example.co.uk today"),
      (2L, "call +1 (555) 010-9999 or 555 010 8888 now"),
      (3L, "no pii here at all"))
      .toDF("doc_id", "text")
    val m = df.select($"doc_id", TextAnalysis.redactPii($"text").as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "reach me at <EMAIL> today")
    assert(m(2L) == "call <PHONE> or <PHONE> now")
    assert(m(3L) == "no pii here at all")
  }

  test("weightedSample: per-row weight monotonicity, full weight keeps all, zero drops all") {
    val df = (1L to 500L).map(i => (i, (i % 11).toInt)).toDF("id", "w")
    def kept(scale: Int) = Sampling
      .weightedSample(df.withColumn("w2", $"w" * scale), "id", $"w2", 10L)
      .select("id").as[Long].collect().toSet
    val low = kept(1)
    // doubling every weight (capped at maxWeight) can only ADD survivors:
    // same per-row hash, higher cut
    assert(low.subsetOf(kept(2)))
    assert(Sampling.weightedSample(df, "id", lit(10), 10L).count() === 500L)
    assert(Sampling.weightedSample(df, "id", lit(0), 10L).count() === 0L)
  }

  test("isqrt is exact across perfect squares and their neighbors") {
    val ns = Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 10L, 99L, 100L, 101L,
      999999L, 1000000L, 1000001L, (1L << 40) - 1, 1L << 40)
    val got = ns.toDF("n").select($"n", Sampling.isqrt($"n").as("s"))
      .as[(Long, Long)].collect().toMap
    ns.foreach { n =>
      val s = got(n)
      assert(s * s <= n && (s + 1) * (s + 1) > n, s"isqrt($n) = $s")
    }
  }

  test("isqrt property: exact floor-sqrt on 500 seeded random longs up to 2^52") {
    val rnd = new scala.util.Random(20260813L)
    val ns = Seq.fill(500)(math.abs(rnd.nextLong()) % (1L << 52))
    val got = ns.toDF("n").select($"n", Sampling.isqrt($"n").as("s"))
      .as[(Long, Long)].collect()
    got.foreach { case (n, s) =>
      assert(s >= 0 && s * s <= n && (s + 1) * (s + 1) > n, s"isqrt($n) = $s")
    }
  }

  test("temperatureMixPlan flattens the head group and computes exact shares") {
    // two groups, token counts 9 and 81: weights isqrt -> 3 and 9,
    // shares 250000 / 750000 ppm (vs 100000/900000 unflattened)
    val df = Seq.tabulate(9)(i => (i.toLong, "small", 1L)) ++
      Seq.tabulate(27)(i => (100L + i, "big", 3L))
    val plan = Sampling.temperatureMixPlan(
        df.toDF("id", "g", "nt"), "g", $"nt", budgetTokens = 1000L)
      .select("g", "n_docs", "n_tokens", "mix_weight", "share_ppm", "epochs_milli")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(plan("small") === (("small", 9L, 9L, 3L, 250000L,
      1000L * 1000 * 3 / (12 * 9))))
    assert(plan("big") === (("big", 27L, 81L, 9L, 750000L,
      1000L * 1000 * 9 / (12 * 81))))
  }

  test("temperatureMixSample is partition-invariant and respects the cut lottery") {
    val df = (1L to 400L).map(i => (i, if (i % 4 == 0) "a" else "b", 2L))
      .toDF("id", "g", "nt")
    val one = Sampling.temperatureMixSample(df, "g", "id", $"nt", 100L)
      .select("id").as[Long].collect().toSet
    val two = Sampling.temperatureMixSample(df.repartition(7), "g", "id", $"nt", 100L)
      .select("id").as[Long].collect().toSet
    assert(one === two && one.nonEmpty)
    // a target covering everything keeps every row
    assert(Sampling.temperatureMixSample(df, "g", "id", $"nt", 4000000L)
      .count() === 400L)
  }
}
