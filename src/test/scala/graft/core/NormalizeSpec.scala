package graft.core

import org.scalacheck.{Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("normalizeName strips Dynamics field-ID suffixes and lowercases") {
    assert(Normalize.normalizeName("Name-2000000000") === "name")
    assert(Normalize.normalizeName("systemcreatedat-2000000001") === "systemcreatedat")
    assert(Normalize.normalizeName("PostingDate-4") === "postingdate")
    assert(Normalize.normalizeName("$company") === "$company")
    assert(Normalize.normalizeName("No-1") === "no")
  }

  test("normalizeName is idempotent (property)") {
    val prop = Prop.forAll { (s: String) =>
      val once = Normalize.normalizeName(s)
      Normalize.normalizeName(once) == once
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("duplicateNames finds every name occurring more than once") {
    assert(Normalize.duplicateNames(Seq("a", "b", "a", "c", "b")) === Set("a", "b"))
    assert(Normalize.duplicateNames(Seq("a", "b")) === Set.empty[String])
  }

  test("normalizeColumns drops ALL copies of a duplicated normalized name") {
    val df = Seq((1, "x", "y", 2.0)).toDF("Id-1", "Name-2", "name-3", "Amount-4")
    val out = Normalize.normalizeColumns(df)
    assert(out.columns.toSeq === Seq("id", "amount"))
    assert(out.collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq === Seq((1, 2.0)))
  }

  test("normalizeColumns keepFirst keeps the first copy") {
    val df = Seq((1, "x", "y")).toDF("Id-1", "Name-2", "name-3")
    val out = Normalize.normalizeColumns(df, keepFirst = true)
    assert(out.columns.toSeq === Seq("id", "name"))
    assert(out.collect().head.getString(1) === "x")
  }

  test("renameReserved renames $company to _company") {
    val df = Seq((1, "CRONUS")).toDF("id", "$company")
    assert(Normalize.renameReserved(df).columns.toSeq === Seq("id", "_company"))
  }

  test("tableName sanitizes the last path segment") {
    assert(Normalize.tableName("gs://bucket/Customer-Ledger_Entry") === "customerledgerentry")
    assert(Normalize.tableName("a/b/G_L-Account") === "glaccount")
  }
}
