package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Incremental aggregate maintenance — the materialized-view half of the
  * reference's nightly shape. The reference recomputes everything it
  * serves from full table scans each night; at 100 TB the standing
  * aggregates a warehouse actually serves (per-segment counts/sums/
  * min/max) must be MAINTAINED: aggregate the night's batch alone,
  * combine with the stored per-group state, write the state back.
  * Nightly cost is O(batch + |groups|), zero corpus re-scans — the same
  * decomposable-aggregate (partial/merge) contract Spark's own
  * hash-aggregate uses across partitions, lifted across RUNS.
  *
  * Sums are carried as FIXED-POINT longs (caller supplies the scaled
  * column, e.g. `floor(value * 100)::bigint` for cents): long addition
  * is associative-commutative, so state after any batch order is
  * bit-identical to a from-scratch aggregate — double sums would drift
  * by accumulation order and could never hash-verify. count/min/max
  * are order-invariant as-is.
  */
object IncrementalAgg {

  /** One batch's partial-aggregate state: (groups, cnt, sum_fp, min_fp,
    * max_fp). Decomposable by construction — [[combine]] merges any two.
    */
  def partials(batch: DataFrame, groupCols: Seq[String], valueFp: Column): DataFrame =
    batch.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("cnt"),
      sum(valueFp).as("sum_fp"),
      min(valueFp).as("min_fp"),
      max(valueFp).as("max_fp"))

  /** Merge two state relations. Shuffles |state| + |delta| rows — both
    * are |groups|-bounded, metadata-scale next to the corpus.
    */
  def combine(state: DataFrame, delta: DataFrame, groupCols: Seq[String]): DataFrame =
    state.unionByName(delta).groupBy(groupCols.map(col): _*).agg(
      sum("cnt").as("cnt"),
      sum("sum_fp").as("sum_fp"),
      min("min_fp").as("min_fp"),
      max("max_fp").as("max_fp"))

  /** Seed the stored state from the first batch. */
  def createStored(warehouseDir: String, name: String, batch: DataFrame,
      groupCols: Seq[String], valueFp: Column): Unit =
    Tables.writeWarehouse(partials(batch, groupCols, valueFp), warehouseDir, name)

  /** Nightly maintenance: aggregate ONLY the batch, merge with stored
    * state, write back. The batch is the only non-metadata input scanned.
    * The combined frame is localCheckpoint-materialized before the write
    * because it reads the same files it overwrites (state is
    * |groups|-rows, so materializing it is metadata-cost).
    */
  def appendStored(spark: SparkSession, warehouseDir: String, name: String,
      batch: DataFrame, groupCols: Seq[String], valueFp: Column): Unit = {
    val state = Tables.readWarehouse(spark, warehouseDir, name)
    val next = combine(state, partials(batch, groupCols, valueFp), groupCols)
      .localCheckpoint(true)
    Tables.writeWarehouse(next, warehouseDir, name)
  }

  def readStored(spark: SparkSession, warehouseDir: String, name: String): DataFrame =
    Tables.readWarehouse(spark, warehouseDir, name)
}
