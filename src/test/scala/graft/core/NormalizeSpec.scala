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

  test("flattenStructs: recursive flatten, arrays intact, scalars untouched") {
    import org.apache.spark.sql.functions._
    val df = spark.range(2).toDF("id")
      .withColumn("address", struct(
        lit("rome").as("city"),
        struct(lit(1.5).as("lat"), lit(2.5).as("lon")).as("geo")))
      .withColumn("tags", array(lit("x"), lit("y")))
    val flat = Normalize.flattenStructs(df)
    assert(flat.columns.toSeq ===
      Seq("id", "address_city", "address_geo_lat", "address_geo_lon", "tags"))
    val row = flat.select("address_city", "address_geo_lat").head()
    assert(row.getString(0) === "rome" && row.getDouble(1) === 1.5)
    // arrays survive un-exploded
    assert(flat.select(size(col("tags"))).head().getInt(0) === 2)
    // null struct rows flatten to null leaves, not errors
    val withNull = df.withColumn("address",
      when(col("id") === 0, col("address")))
    val nulled = Normalize.flattenStructs(withNull)
      .select("id", "address_geo_lat")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(nulled(1L) === None && nulled(0L) === Some(1.5))
  }
}
