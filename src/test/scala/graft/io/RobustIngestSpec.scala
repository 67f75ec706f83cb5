package graft.io

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the hardened ingest contract: rows that fail the typed parse are
  * CAPTURED whole in `_corrupt_record` (quarantine-able), clean rows parse
  * normally — versus the reference's inferred read, which silently nulls
  * unparseable cells.
  */
class RobustIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("malformed rows land in _corrupt_record; clean rows parse") {
    val dir = Files.createTempDirectory("graft_robust_csv")
    // the warehouse schema types amount as int; row 3's "oops" fails the
    // typed parse (an inferred read would just make the column string)
    Files.writeString(Paths.get(dir.toString, "a.csv"),
      """id,amount
        |1,100
        |2,200
        |3,oops
        |4,400
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("amount",
        org.apache.spark.sql.types.IntegerType)))
    val df = Tables.readCsvFolderRobust(spark, dir.toString, schema).cache()
    try {
      val bad = df.filter("_corrupt_record IS NOT NULL")
        .select("_corrupt_record")
        .collect().map(_.getString(0))
      assert(bad.length == 1 && bad.head.contains("oops"),
        s"the malformed row must be captured whole, got ${bad.toSeq}")
      val clean = df.filter("_corrupt_record IS NULL")
        .select("id", "amount")
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      assert(clean === Map(1 -> 100, 2 -> 200, 4 -> 400))
    } finally df.unpersist()
  }
}
