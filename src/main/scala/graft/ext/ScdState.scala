package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Merge
import graft.io.Tables

/** Incrementally-maintained SCD TYPE-2 dimension state — the stored-state
  * form of [[graft.core.Merge.scdHistory]] (which derives the full
  * validity history from ALL versions in one pass; at 100 TB the nightly
  * job must instead fold the night's versions into standing state).
  *
  * The state splits on the one structural fact of SCD2: a CLOSED version
  * never changes again. So:
  *
  *   - `{name}_hist` — closed versions, APPEND-ONLY, bucketed on the key
  *     (nightly cost: insert the night's closed rows, never rewrite);
  *   - `{name}_cur`  — the current row per key (the only mutable slice),
  *     rewritten via read-modify-write with checkpoint isolation, exactly
  *     the [[IncrementalAgg.appendStored]] pattern. At key cardinalities
  *     where even this slice is too big to rewrite, it is the shape
  *     [[graft.core.Merge.mergePartitioned]] exists for — partition
  *     `_cur` and let the night rewrite only touched partitions.
  *
  * A nightly batch may carry SEVERAL versions of a key: the batch's own
  * chain closes internally ([[graft.core.Merge.scdHistory]] on the batch),
  * its first version closes the stored current row (valid_to = the
  * incoming valid_from), and its last version becomes the new current.
  *
  * Contract (standard SCD2): versions arrive in nondecreasing version
  * order per key across nights — late data needs a history rebuild for
  * the affected keys (`ScdStateSpec` documents the failure shape).
  * Under that contract, chain-of-appends ≡ scdHistory over the union of
  * all batches, bit for bit (`q_scd_stored`'s oracle IS the from-scratch
  * derivation).
  */
object ScdState {

  private def histName(name: String) = s"${name}_hist"
  private def curPath(name: String) = s"${name}_cur"

  /** Seed state from the first batch. */
  def createStored(spark: SparkSession, warehouseDir: String, name: String,
      batch: DataFrame, keyCol: String, versionCol: String, tiebreak: Column,
      numBuckets: Int): Unit = {
    val b = Merge.scdHistory(batch, Seq(keyCol), versionCol, tiebreak)
    Tables.writeWarehouseBucketed(b.filter(!col("is_current")),
      warehouseDir, histName(name), keyCol, numBuckets)
    Tables.writeWarehouse(b.filter(col("is_current")),
      warehouseDir, curPath(name))
  }

  /** Nightly fold: close out superseded versions (stored current rows of
    * re-arriving keys + the batch's own internal chain), append them to
    * the history, replace the current slice. One key-shuffle over the
    * batch + one over the |keys|-bounded current slice; the closed
    * history is never read, let alone rewritten.
    */
  def appendStored(spark: SparkSession, warehouseDir: String, name: String,
      batch: DataFrame, keyCol: String, versionCol: String,
      tiebreak: Column): Unit = {
    val b = Merge.scdHistory(batch, Seq(keyCol), versionCol, tiebreak)
      .localCheckpoint(true)
    val cur = Tables.readWarehouse(spark, warehouseDir, curPath(name))
    val firstNew = batch.groupBy(col(keyCol))
      .agg(min(col(versionCol)).as("__first_vf"))
    val oldClosed = cur.drop("valid_to", "is_current")
      .join(firstNew, keyCol)
      .withColumn("valid_to", col("__first_vf"))
      .withColumn("is_current", lit(false))
      .drop("__first_vf")
    val histCols = Tables.readWarehouseBucketed(spark, histName(name)).columns
    val closed = b.filter(!col("is_current"))
      .unionByName(oldClosed)
      .selectExpr(histCols.map(c => s"`$c`"): _*)
      .localCheckpoint(true)
    if (!closed.isEmpty)
      closed.write.mode("append").insertInto(histName(name))
    // current slice: untouched keys keep their row, re-arrived keys take
    // the batch's last version; checkpoint BEFORE overwriting the files
    // the plan reads
    val nextCur = cur
      .join(firstNew.select(keyCol), Seq(keyCol), "left_anti")
      .unionByName(b.filter(col("is_current")))
      .localCheckpoint(true)
    Tables.writeWarehouse(nextCur, warehouseDir, curPath(name))
  }

  /** The full SCD2 view: closed history ∪ current rows. */
  def readStored(spark: SparkSession, warehouseDir: String, name: String): DataFrame = {
    val hist = Tables.readWarehouseBucketed(spark, histName(name))
    Tables.readWarehouse(spark, warehouseDir, curPath(name))
      .selectExpr(hist.columns.map(c => s"`$c`"): _*)
      .unionByName(hist)
  }
}
