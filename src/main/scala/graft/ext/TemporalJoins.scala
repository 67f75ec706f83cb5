package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: as-of join and range join.
  *
  * Both avoid the naive theta-join (which Catalyst plans as a broadcast
  * nested loop — quadratic and single-stage):
  *
  *  - As-of: the union-and-window trick. Tag both sides, union them, and
  *    run one window over (key, time): `last(right attrs) IGNORE NULLS`
  *    carries the most recent right row forward onto each left row.
  *    Cost = ONE shuffle on the key (same as an equi-join), no pair
  *    explosion, skew-safe under AQE — the pattern that scales to 100 TB.
  *
  *  - Range join: bucketize the time axis. Each right row replicates to
  *    every bucket its window can reach (≤ range/bucketWidth + 1 copies);
  *    the join becomes an equi-join on (key, bucket) plus the exact range
  *    predicate. Replication factor is the tuning knob: bucketWidth ≈
  *    range ⇒ ≤2 copies per row.
  */
object TemporalJoins {

  /** For every left row, attach the latest right row with the same key and
    * `rightTime <= leftTime` (left-outer as-of semantics: right values are
    * null when no prior right row exists).
    *
    * @param valueCols right-side columns to carry (names must not collide
    *                  with left column names)
    * @param tiebreakCol one of valueCols, unique per right row — orders
    *                    right rows sharing a timestamp so the survivor is
    *                    deterministic (max tiebreak wins)
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, valueCols: Seq[String],
      tiebreakCol: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val taggedLeft = left
      .select((leftCols.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__isL")) ++
        valueCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"__v_$c"))): _*)
    val taggedRight = right
      .select((leftCols.map(c =>
        if (c == keyCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__isL")) ++
        valueCols.map(c => col(c).as(s"__v_$c"))): _*)
    // right rows sort before left rows at the same instant (__isL asc) so a
    // right row AT the left timestamp is visible (<= semantics); the
    // tiebreak column orders same-timestamp right rows deterministically
    // (nulls first ⇒ left rows are unaffected).
    val order = Seq(col("__t").asc, col("__isL").asc) ++
      tiebreakCol.map(c => col(s"__v_$c").asc_nulls_first)
    val w = Window.partitionBy(keyCol)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.unionAll(taggedRight)
      .select((leftCols.map(col) ++ Seq(col("__isL")) ++
        valueCols.map(c =>
          last(col(s"__v_$c"), ignoreNulls = true).over(w).as(c))): _*)
      .filter(col("__isL") === 1)
      .drop("__isL")
  }

  /** FORWARD as-of: for every left row, attach the EARLIEST right row
    * with the same key and `rightTime >= leftTime` — "the next purchase
    * after each view" (attribution), "the next reading at or after the
    * probe". Same union-and-window shape as [[asOfJoin]], mirrored:
    * left rows sort BEFORE right rows at the same instant (so an
    * equal-timestamp right row is visible — `>=` semantics) and the
    * carry runs over a currentRow→unboundedFollowing frame with
    * `first(_, ignoreNulls)`. One key shuffle, no pair explosion.
    */
  def asOfJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, valueCols: Seq[String],
      tiebreakCol: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val taggedLeft = left
      .select((leftCols.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__isL")) ++
        valueCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"__v_$c"))): _*)
    val taggedRight = right
      .select((leftCols.map(c =>
        if (c == keyCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__isL")) ++
        valueCols.map(c => col(c).as(s"__v_$c"))): _*)
    // left rows sort FIRST at the same instant (__isL desc) so a right row
    // AT the left timestamp falls inside the following frame (>= semantics);
    // the tiebreak orders same-timestamp right rows so `first` is
    // deterministic (nulls first keeps left rows inert).
    val order = Seq(col("__t").asc, col("__isL").desc) ++
      tiebreakCol.map(c => col(s"__v_$c").asc_nulls_first)
    val w = Window.partitionBy(keyCol)
      .orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    taggedLeft.unionAll(taggedRight)
      .select((leftCols.map(col) ++ Seq(col("__isL")) ++
        valueCols.map(c =>
          first(col(s"__v_$c"), ignoreNulls = true).over(w).as(c))): _*)
      .filter(col("__isL") === 1)
      .drop("__isL")
  }

  /** Equi-key + time-range join: all (left, right) pairs with the same key
    * and `rightTime` in `[leftTime - rangeSec, leftTime]`, via bucket
    * replication on an exact epoch-microsecond axis (no sub-second
    * truncation drift vs the oracle). Right columns are returned as-is;
    * supply disjoint names.
    */
  def rangeJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: Column, rightTime: Column,
      rangeSec: Long, bucketSec: Long): DataFrame = {
    val rangeUs = rangeSec * 1000000L
    val bucketUs = bucketSec * 1000000L
    val l = left
      .withColumn("__lt", unix_micros(leftTime))
      .withColumn("__lb", floor(col("__lt") / bucketUs))
    val r = right
      .withColumn("__rt", unix_micros(rightTime))
      .withColumn("__rb",
        explode(sequence(
          floor(col("__rt") / bucketUs),
          floor((col("__rt") + rangeUs) / bucketUs))))
    l.join(r,
        col(leftKey) === col(rightKey) && col("__lb") === col("__rb") &&
          col("__rt") >= col("__lt") - rangeUs && col("__rt") <= col("__lt"))
      .drop("__lt", "__lb", "__rt", "__rb")
  }
}
