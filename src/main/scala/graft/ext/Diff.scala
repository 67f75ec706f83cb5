package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level DIFF between two versions of a keyed relation — the data
  * regression audit every warehouse rebuild needs ("the pipeline change
  * rewrote the table; what actually moved?"). Complements the pipeline's
  * forward path (`Merge` applies changes; `diff` recovers them): diffing
  * a table against its pre-merge snapshot should reproduce exactly the
  * applied change batch, and diffing two independent rebuilds should be
  * empty — both are one query instead of an eyeball pass over 100 TB.
  *
  * Shape: one full-outer equi-join on the key, so the whole diff costs a
  * single co-shuffle of the two versions (bucketed/co-located layouts
  * join with zero Exchange — the house warehouse layout). Every non-key
  * column rides inside ONE struct per side, so the join carries two
  * columns however wide the table is, and the per-column change list is
  * computed post-join only for rows that differ. Null-safe (`<=>`)
  * comparison throughout: a NULL→value transition is a change, not a
  * match (the reference's 3VL `NOT IN` bug class, SURVEY §2.12).
  */
object Diff {

  /** Diff `neu` against `old` by `keyCols`. Output: key columns +
    * `status` ∈ {'added','removed','changed'} + `changed_cols` (sorted
    * names of the columns whose values differ; empty for added/removed).
    * Unchanged rows are dropped — the diff of two equal tables is empty.
    * Both inputs must share the key+data schema (the caller aligns first
    * — [[graft.core.Merge.alignedUnion]]'s cast does it).
    */
  def diff(old: DataFrame, neu: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val dataCols = old.columns.filterNot(keyCols.contains).toSeq
    require(dataCols.nonEmpty, "need at least one non-key column to compare")

    def packed(df: DataFrame, side: String): DataFrame =
      df.select((keyCols.map(col) :+
        struct(dataCols.map(col): _*).as(side)): _*)

    val joined = packed(old, "__o")
      .join(packed(neu, "__n"), keyCols, "full_outer")

    val changedCols = array_sort(filter(
      array(dataCols.map(c =>
        when(!(col(s"__o.$c") <=> col(s"__n.$c")), lit(c))): _*),
      x => x.isNotNull))

    val status: Column = when(col("__o").isNull, lit("added"))
      .when(col("__n").isNull, lit("removed"))
      .when(!(col("__o") <=> col("__n")), lit("changed"))

    joined
      .withColumn("status", status)
      .filter(col("status").isNotNull)
      .withColumn("changed_cols",
        when(col("status") === "changed", changedCols)
          .otherwise(array().cast("array<string>")))
      .select((keyCols.map(col) :+ col("status") :+ col("changed_cols")): _*)
  }

  /** Aggregate view of [[diff]]: per status the row count plus, for
    * changes, how often each column moved (the "what did the rebuild
    * touch" dashboard row). Runs on the diff relation — already reduced
    * to changed rows only.
    */
  def diffSummary(d: DataFrame): DataFrame =
    d.select(col("status"), explode_outer(col("changed_cols")).as("col_name"))
      .groupBy("status", "col_name")
      .agg(count(lit(1)).as("n"))

  /** [[diff]] between two MANIFEST-versioned snapshots, PARTITION-PRUNED
    * off the manifests: the free metadata pre-pass
    * ([[graft.io.ManifestVersioned.manifestDiff]]'s comparison) finds
    * the partitions whose mapping changed between `v1` and `v2`, and
    * only THOSE partitions are scanned on either side — the untouched
    * 99% of a 100 TB nightly-versioned table contributes zero IO to the
    * "what actually moved last night" audit (a plain two-snapshot diff
    * co-shuffles both full versions). Identical file references imply
    * identical rows (generation dirs are immutable), so pruning can
    * never hide a row-level change.
    */
  def diffVersions(spark: org.apache.spark.sql.SparkSession,
      warehouseDir: String, table: String, v1: Int, v2: Int,
      keyCols: Seq[String]): DataFrame = {
    import graft.io.ManifestVersioned
    // compare FULL entries, not just data dirs: a delete-vector append
    // changes a partition's visible rows while its generation dir stays
    // put — a dir-only comparison would prune the partition and hide the
    // deleted rows from the diff
    val a = ManifestVersioned.manifestEntries(spark, warehouseDir, table,
      Some(v1))
    val b = ManifestVersioned.manifestEntries(spark, warehouseDir, table,
      Some(v2))
    val changed = (a.keySet ++ b.keySet)
      .filter(k => a.get(k) != b.get(k))
      .toSeq.sorted.map(ManifestVersioned.partValuesOf)
    def side(m: Map[String, ManifestVersioned.Entry], v: Int) = {
      val vals = changed.filter(x => m.contains(ManifestVersioned.keyOf(x)))
      if (vals.isEmpty)
        ManifestVersioned.read(spark, warehouseDir, table, Some(v)).limit(0)
      else
        ManifestVersioned.readPartitionsMulti(spark, warehouseDir, table,
          vals, Some(v))
    }
    val (sa, sb) = (side(a, v1), side(b, v2))
    // schemas may have (additively) evolved between the versions: align
    // the OLD side to the NEW side's recorded schema (authoritative), so
    // a widened column diffs as changed where v2 carries values instead
    // of silently dropping out of the comparison
    val aAligned =
      if (sa.columns.toSeq == sb.columns.toSeq) sa
      else graft.core.SchemaGuard.conform(sb.schema, sa, align = true,
        s"$table@v$v1")
    diff(aAligned, sb, keyCols)
  }
}
