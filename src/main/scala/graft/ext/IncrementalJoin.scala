package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.Tables

/** Incremental JOIN maintenance — the join half of the materialized-view
  * story ([[IncrementalAgg]] is the aggregate half). A warehouse serves
  * standing joined views (fact ⋈ dimension, orders ⋈ customers); the
  * reference's nightly shape would recompute the full join per run. For
  * APPEND-ONLY inputs the classic delta rule makes maintenance
  * incremental:
  *
  *   Δ(L ⋈ R) = ΔL ⋈ R₀  ∪  L₀ ⋈ ΔR  ∪  ΔL ⋈ ΔR
  *
  * (L₀/R₀ = state BEFORE the batch). Each new (l, r) pair has exactly one
  * of its sides in a delta-first position, so the three terms partition
  * the new output rows — appending them keeps the stored join exactly the
  * join of the accumulated inputs ([[graft.ext]] IncrementalJoinSpec pins
  * chain ≡ from-scratch).
  *
  * Scale: all three state relations live BUCKETED on the join key —
  * `{name}_left`, `{name}_right` (the accumulated inputs) and
  * `{name}_out` (the materialized join, bucketed for downstream
  * consumers). The two big delta terms therefore plan with an Exchange on
  * the DELTA side only — the stored side reads co-located buckets
  * (`SelectedBucketsCount`, zero state-side shuffle), so nightly cost is
  * O(Δ ⋈ touched buckets), never O(L ⋈ R); the materialized output is
  * never rescanned (append-only `insertInto`). Tombstones/updates are out
  * of scope by design — retractions need counted (multiset) state; route
  * deleting tables through [[graft.core.Merge]] and re-derive instead.
  *
  * Contract: `left`/`right` column sets must be disjoint apart from
  * `keyCol` (standard join-view hygiene; enforced at create).
  */
object IncrementalJoin {

  private def joined(l: DataFrame, r: DataFrame, keyCol: String): DataFrame =
    l.join(r, Seq(keyCol))

  /** Seed the three bucketed state relations from the first batches. */
  def createStored(spark: SparkSession, warehouseDir: String, name: String,
      left: DataFrame, right: DataFrame, keyCol: String, numBuckets: Int): Unit = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet) - keyCol
    require(overlap.isEmpty, s"non-key column overlap: $overlap")
    Tables.writeWarehouseBucketed(left, warehouseDir, s"${name}_left",
      keyCol, numBuckets)
    Tables.writeWarehouseBucketed(right, warehouseDir, s"${name}_right",
      keyCol, numBuckets)
    val l0 = Tables.readWarehouseBucketed(spark, s"${name}_left")
    val r0 = Tables.readWarehouseBucketed(spark, s"${name}_right")
    Tables.writeWarehouseBucketed(joined(l0, r0, keyCol), warehouseDir,
      s"${name}_out", keyCol, numBuckets)
  }

  /** Nightly maintenance: append the delta-rule terms to the stored join,
    * then the deltas to the stored inputs. The delta output is
    * localCheckpoint-materialized BEFORE any append so no term can
    * observe a state relation mid-append; inserts are position-based, so
    * every write re-projects into the stored column order.
    */
  def appendStored(spark: SparkSession, warehouseDir: String, name: String,
      dLeft: DataFrame, dRight: DataFrame, keyCol: String): Unit = {
    val l0 = Tables.readWarehouseBucketed(spark, s"${name}_left")
    val r0 = Tables.readWarehouseBucketed(spark, s"${name}_right")
    val outCols = Tables.readWarehouseBucketed(spark, s"${name}_out").columns
    val delta = joined(dLeft, r0, keyCol)
      .unionByName(joined(l0, dRight, keyCol))
      .unionByName(joined(dLeft, dRight, keyCol))
      .selectExpr(outCols.map(c => s"`$c`"): _*)
      .localCheckpoint(true)
    if (!delta.isEmpty)
      delta.write.mode("append").insertInto(s"${name}_out")
    appendSide(spark, name, "left", dLeft)
    appendSide(spark, name, "right", dRight)
  }

  private def appendSide(spark: SparkSession, name: String, side: String,
      d: DataFrame): Unit = {
    val cols = Tables.readWarehouseBucketed(spark, s"${name}_$side").columns
    val proj = d.selectExpr(cols.map(c => s"`$c`"): _*)
    if (!proj.isEmpty)
      proj.write.mode("append").insertInto(s"${name}_$side")
  }

  /** The maintained join view (bucketed on the key for downstream reuse). */
  def readStored(spark: SparkSession, name: String): DataFrame =
    Tables.readWarehouseBucketed(spark, s"${name}_out")
}
