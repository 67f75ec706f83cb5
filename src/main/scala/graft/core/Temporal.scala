package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, current_timestamp, date_format, from_utc_timestamp}
import org.apache.spark.sql.types.{DataType, DateType, TimestampNTZType, TimestampType}

/** Temporal-column operators (SURVEY.md §2.2 rows P4, P5, P7).
  *
  * The reference degrades every date/timestamp column to a string because "some
  * tables have weird dates which throws errors" (`helper_functions.py:25-52`).
  * Here that is an explicit, configurable transform applied as ONE projection
  * (the reference folds N `withColumn`s). Format is pinned so results are
  * reproducible under the harness's UTC session timezone.
  */
object Temporal {

  /** The reference's pinned format (`helper_functions.py:36,50`). */
  val StringifyFormat = "yyyy-MM-dd HH:mm:ss"

  private def stringify(df: DataFrame, matches: DataType => Boolean): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (matches(f.dataType)) date_format(col(f.name), StringifyFormat).as(f.name)
      else col(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  /** P4 — every DateType column -> `yyyy-MM-dd HH:mm:ss` string. */
  def stringifyDates(df: DataFrame): DataFrame = stringify(df, _ == DateType)

  /** P5 — every timestamp column (with or without timezone — parquet written
    * without `isAdjustedToUTC` surfaces as TIMESTAMP_NTZ in Spark 4) ->
    * `yyyy-MM-dd HH:mm:ss` string.
    */
  def stringifyTimestamps(df: DataFrame): DataFrame =
    stringify(df, dt => dt == TimestampType || dt == TimestampNTZType)

  /** P4+P5 in the reference's application order (timestamps first:
    * `helper_functions.py:179-180`).
    */
  def stringifyTemporals(df: DataFrame): DataFrame =
    stringifyDates(stringifyTimestamps(df))

  /** P7 — audit column: wall-clock shifted into the warehouse timezone.
    * Reference: `helper_functions.py:186-189`, `incremental_etl_v1.py:117`.
    * `clock` is injectable so declared queries can pin a literal instant
    * (a live `current_timestamp()` is untestable against an oracle).
    */
  def withExtractedAt(
      df: DataFrame,
      tz: String = "Africa/Nairobi",
      clock: Column = current_timestamp()): DataFrame =
    df.withColumn("extracted_at", from_utc_timestamp(clock, tz))
}
