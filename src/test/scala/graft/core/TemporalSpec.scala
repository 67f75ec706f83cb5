package graft.core

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions.{lit, to_timestamp}
import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stringifyTemporals pins the reference format on dates and timestamps") {
    val df = Seq((1, Date.valueOf("2024-03-05"), Timestamp.valueOf("2024-03-05 07:08:09")))
      .toDF("id", "d", "ts")
    val out = Temporal.stringifyTemporals(df)
    assert(out.schema("d").dataType === StringType)
    assert(out.schema("ts").dataType === StringType)
    val r = out.collect().head
    assert(r.getString(1) === "2024-03-05 00:00:00")
    assert(r.getString(2) === "2024-03-05 07:08:09")
  }

  test("stringifyTemporals leaves non-temporal columns untouched") {
    val df = Seq((1, "2024-03-05")).toDF("id", "s")
    val out = Temporal.stringifyTemporals(df)
    assert(out.schema === df.schema)
  }

  test("withExtractedAt shifts the pinned clock into Nairobi (+3, no DST)") {
    val df = Seq(1).toDF("id")
    val out = Temporal.withExtractedAt(
      df, clock = to_timestamp(lit("2026-01-01 00:00:00")))
    assert(out.select("extracted_at").as[Timestamp].head() ===
      Timestamp.valueOf("2026-01-01 03:00:00"))
  }
}
