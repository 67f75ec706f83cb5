package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** cleanCorpus contract: the composed single-pass cleaner equals the
  * individually-chained screens AND plans as one scan with zero shuffle.
  */
class CleanCorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and the cat"),
    (2L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
    (3L, "reach me at jane.doe@example.com or +1 (555) 123-4567 today"),
    (4L, "el la de que y los las por una como texto en espanol aqui"),
    (5L, ""),
    (6L, "short"))
    .toDF("doc_id", "text")

  test("cleanCorpus equals the separately-chained screens") {
    val composed = TextAnalysis.cleanCorpus(docs, "text")
      .select($"doc_id", $"clean_text", $"quality.*")
    val chained = TextAnalysis.withDupGramCoverage(
        TextAnalysis.withRepetitionStats(
          TextAnalysis.withTextStats(docs, "text"), "text"),
        "text", TextAnalysis.DupGramN)
      .withColumn("lang_id", TextAnalysis.langId($"text"))
      .withColumn("clean_text", TextAnalysis.redactPii($"text"))
      .select(composed.columns.map(col): _*)
    assert(composed.collect().sortBy(_.getLong(0)).map(_.toString)
      === chained.collect().sortBy(_.getLong(0)).map(_.toString))
  }

  test("PII is redacted and quality fields populated") {
    val row = TextAnalysis.cleanCorpus(docs, "text")
      .filter($"doc_id" === 3L)
      .select($"clean_text", $"quality.lang_id", $"quality.n_tokens")
      .head()
    assert(row.getString(0).contains("<EMAIL>"))
    assert(row.getString(0).contains("<PHONE>"))
    assert(!row.getString(0).contains("example.com"))
    assert(row.getInt(2) > 0)
  }

  test("composition stays one FileScan with zero Exchange over parquet") {
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cleaned = TextAnalysis.cleanCorpus(src, "text")
    cleaned.count()
    val plan = cleaned.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") || l.contains("FileScan parquet"))
    assert(scans == 1, s"expected exactly one scan:\n$plan")
    assert(!plan.contains("Exchange"),
      s"composed cleaner must not shuffle:\n$plan")
  }
}
