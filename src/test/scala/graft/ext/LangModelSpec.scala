package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LangModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Train: unigrams a:3 b:3 c:1 (T=7); bigrams (a,b):2 (b,a):1 (a,c):1 (b,b):1.
  private def train = Seq((0L, "a b a c"), (2L, "a b b")).toDF("doc_id", "text")

  private def scores(docs: org.apache.spark.sql.DataFrame) =
    LangModel.scoreDocs(docs, col("text"), "doc_id",
        LangModel.unigramCounts(train, col("text")),
        LangModel.bigramCounts(train, col("text"), "doc_id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("seen bigrams score c2/c1, unseen back off to alpha*c(w2)/T, OOV scores 0") {
    val out = scores(Seq((1L, "a b x c")).toDF("doc_id", "text"))
    // (a,b) seen: 1e6*2 div 3 = 666666; (b,x): x unseen -> 0;
    // (x,c) backoff: 2*1e6*1 div (5*7) = 57142.
    assert(out(1L) === ((666666L + 0L + 57142L, 3L, 241269L)))
  }

  test("in-corpus document scores sum its transition ratios") {
    val out = scores(train)
    // doc 0 = a b a c: 666666 + (1e6 div 3 = 333333) + 333333
    assert(out(0L) === ((1333332L, 3L, 444444L)))
  }

  test("documents with fewer than two tokens emit no row") {
    val out = scores(Seq((5L, "solo"), (6L, ""), (7L, "a b")).toDF("doc_id", "text"))
    assert(out.keySet === Set(7L))
  }

  test("stored counts score identically to live training") {
    val wh = Files.createTempDirectory("graft_lmspec").toString
    val docs = train.unionAll(Seq((1L, "a b x c")).toDF("doc_id", "text"))
    LangModel.writeLmState(train, col("text"), "doc_id", wh, "lm_spec", 4)
    val stored = LangModel.scoreStored(spark, "lm_spec", docs, col("text"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stored === scores(docs).map { case (k, v) => k -> v._1 })
  }
}
