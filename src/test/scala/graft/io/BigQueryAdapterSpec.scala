package graft.io

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The OFFLINE-testable pins for the BigQuery adapter skeleton
  * (VERDICT-r12 #5): no live service, no connector jar, no test claims
  * about either — just the two contracts that ARE decidable in this
  * sandbox:
  *  1. every verb invoked without the connector fails with the
  *     actionable deploy message, never a bare ClassNotFoundException
  *     from deep inside DataSource resolution;
  *  2. the exists() failure classifier maps ONLY table-scoped
  *     not-found shapes to "absent" — auth/transient failures, 404s on
  *     other resources, and unrelated messages embedding "404" all
  *     rethrow (ADVICE-r12 #2: a swallowed transient would steer the
  *     pipeline onto the first-sight WRITE_TRUNCATE path and truncate
  *     the table to one night's batch).
  */
class BigQueryAdapterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def adapter =
    new BigQueryWarehouseAdapter("proj", "ds", "tmp-bucket")

  test("constructor requires the reference's three coordinates") {
    val e = intercept[IllegalArgumentException] {
      new BigQueryWarehouseAdapter("proj", "", "bucket")
    }
    assert(e.getMessage.contains("three coordinates"))
  }

  test("without the connector on the classpath, every verb fails with " +
      "the actionable deploy message (this sandbox HAS no connector — " +
      "the guard is exercised for real, not mocked)") {
    val a = adapter
    assert(!a.connectorPresent,
      "this environment must not carry the spark-bigquery connector — " +
        "if it ever does, these guard pins need a different seam")
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("k", "v")
    Seq[() => Any](
      () => a.exists(spark, "", "t"),
      () => a.read(spark, "", "t"),
      () => a.overwrite(df, "", "t"),
      () => a.append(df, "", "t"),
      () => a.replace(spark, "", "t", df)
    ).foreach { verb =>
      val e = intercept[IllegalStateException] { verb() }
      assert(e.getMessage.contains("--packages") &&
        e.getMessage.contains("WarehouseContractKit"),
        s"the guard message must tell the operator how to deploy, got: " +
          e.getMessage)
    }
    // recoverAll is the documented no-op — callable anywhere
    a.recoverAll(spark, "")
  }

  test("exists() classifier: only table-scoped not-found maps to " +
      "absent; everything else rethrows") {
    val a = adapter
    def notFound(msg: String, nested: Boolean = false): Boolean = {
      val e = if (nested)
        new RuntimeException("wrapper", new RuntimeException(msg))
      else new RuntimeException(msg)
      a.tableNotFound(e, "customerledger")
    }
    // BigQuery's stable table-scoped phrasing → absent
    assert(notFound("Not found: Table proj:ds.customerledger"))
    // the same shape buried in a cause chain → absent
    assert(notFound("Not found: Table proj:ds.customerledger",
      nested = true))
    // a not-found wording that names THIS table's reference → absent
    assert(notFound("404 table proj.ds.customerledger was notFound"))
    assert(notFound("resource ds.customerledger: Not found"))
    // a 404 on a DIFFERENT resource → rethrow (present table must not
    // be misread as absent)
    assert(!notFound("Not found: Dataset proj:other_ds"))
    assert(!notFound("404 Not Found: bucket tmp-bucket"))
    // an unrelated message merely embedding '404' → rethrow
    assert(!notFound("row count mismatch: expected 404 rows"))
    // auth / quota / transient → rethrow
    assert(!notFound("Access Denied: Table proj:ds.customerledger"))
    assert(!notFound("quota exceeded for project proj"))
    assert(!notFound("503 Service Unavailable"))
    // a not-found for ANOTHER table → rethrow for this one
    assert(!notFound("Not found: Table proj:ds.othertable") ||
      !a.tableNotFound(
        new RuntimeException("404 othertable notFound"), "customerledger"))
    assert(!a.tableNotFound(
      new RuntimeException("ds.othertable was notFound (404)"),
      "customerledger"))
    // null-message and deep chains never NPE or loop
    assert(!a.tableNotFound(new RuntimeException(null: String), "t"))
  }
}
