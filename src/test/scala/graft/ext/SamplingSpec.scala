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
}
