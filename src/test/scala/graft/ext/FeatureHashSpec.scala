package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Hashing

/** Signed feature-hash embeddings: kernel vs the declarative relational
  * twin, lexical-similarity structure, and composition with the PQ/ADC
  * search stack (model-free text ANN).
  */
class FeatureHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def embed(df: org.apache.spark.sql.DataFrame) = {
    graft.functions.TextExpressions.register(spark)
    df.select($"doc_id",
      call_function("text_hash_embed", $"text", lit(64)).as("vec"))
  }

  test("kernel matches the relational explode→bucket→sum twin") {
    val df = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "empty punctuation !!! only ???",
      3L -> "",
      4L -> "repeat repeat repeat repeat").toDF("doc_id", "text")
    val kernel = embed(df)
      .select($"doc_id", posexplode($"vec"))
      .select($"doc_id", $"pos".as("dim"), $"col".as("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val twin = df
      .select($"doc_id", explode(TextAnalysis.tokens($"text")).as("tk"))
      .select($"doc_id",
        pmod(Hashing.md5Long(concat(lit("fh:"), $"tk")), lit(64)).cast("int").as("dim"),
        (pmod(Hashing.md5Long(concat(lit("fs:"), $"tk")), lit(2)) * 2 - 1).as("sgn"))
      .groupBy("doc_id", "dim").agg(sum($"sgn").as("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    twin.foreach { case (k, v) => assert(kernel(k) === v, s"at $k") }
    // all non-listed dims are zero
    kernel.filterNot { case (k, _) => twin.contains(k) }
      .foreach { case (k, v) => assert(v === 0L, s"at $k") }
    // the empty doc is an all-zero vector, not a missing row
    assert((0 until 64).forall(d => kernel((3L, d)) === 0L))
  }

  test("identical texts collide exactly; shared-vocabulary texts are closer than disjoint ones") {
    val df = Seq(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha beta gamma delta epsilon zeta",
      3L -> "alpha beta gamma delta epsilon theta",
      4L -> "one two three four five six").toDF("doc_id", "text")
    val v = embed(df).collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(v(1L) === v(2L), "identical text ⇒ identical vector")
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Seq[Long], b: Seq[Long]): Double =
      dot(a, b).toDouble / (math.sqrt(dot(a, a).toDouble) * math.sqrt(dot(b, b).toDouble))
    assert(cos(v(1L), v(3L)) > cos(v(1L), v(4L)) + 0.3,
      "5/6 shared tokens must dominate a disjoint vocabulary")
  }

  test("composition: PQ/ADC over hash embeddings finds the exact lexical duplicate at distance 0") {
    val base = (1L to 30L).map(i =>
      (i, s"document number $i talks about topic${i % 7} and subject${i % 5} extensively"))
    val withDup = base :+ (99L, base.head._2) // 99 duplicates doc 1
    val vecs = embed(withDup.toDF("doc_id", "text"))
      .select($"doc_id".as("vec_id"), $"vec".as("embedding"))
    val adc = Similarity.pqTopK(vecs, $"vec_id" === 99L, "vec_id", "embedding",
        numSubspaces = 8, codebookSize = 8, k = 1)
      .collect().map(r => r.getLong(1)).head
    assert(adc === 1L, "the duplicate's nearest neighbor must be its twin")
    // ADC distance to an identical vector is the query's own quantization
    // distortion (not 0); the exact re-rank is where 0 appears
    val refined = Similarity.pqTopKRefined(vecs, $"vec_id" === 99L, "vec_id",
        "embedding", numSubspaces = 8, codebookSize = 8, k = 1, shortlist = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(refined === ((1L, 0L)), "exact re-rank: identical vectors at edist 0")
  }
}
