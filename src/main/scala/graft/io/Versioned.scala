package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SNAPSHOT-VERSIONED warehouse tables — the reference's full-overwrite
  * sink (`incremental_etl_v1.py:184-188`) upgraded to MVCC: every write
  * lands as an immutable version directory and a one-file pointer commit
  * makes it visible ATOMICALLY, so
  *  - a reader mid-query keeps its snapshot while a writer commits (the
  *    overwrite's read-torn-table window is gone),
  *  - any historical version stays addressable (time travel / audits /
  *    "what did the model train on"),
  *  - a bad load ROLLS BACK by moving the pointer — no data movement,
  *  - a crash between data write and pointer commit leaves the table
  *    exactly at the previous version (orphan data dirs are swept by the
  *    next writer or [[vacuumVersions]]).
  *
  * Layout: `{table}.v/v%05d/` immutable parquet snapshots plus
  * APPEND-ONLY pointer epochs `_ptr.%09d` (each holding a committed
  * version id; the live pointer is the highest epoch). A commit is a
  * tmp-write + ONE atomic rename of a brand-new epoch file — no
  * delete-then-recreate, so there is never an instant without a
  * committed pointer. Single-writer contract: concurrent committers
  * race at the epoch numbering and the last rename wins — serialize
  * writers externally (the nightly-pipeline shape already does).
  *
  * At 100 TB: versions share NOTHING (each write is a full snapshot), so
  * this layer suits dimension/state tables and curated exports rewritten
  * wholesale; the fact tables keep the partitioned/bucketed incremental
  * paths (`Merge`, partition replace) where a full copy per night would
  * be write-amplification — the two compose (a versioned table can hold
  * the OUTPUT of a merge).
  */
object Versioned {

  private def root(warehouseDir: String, table: String) =
    new Path(s"$warehouseDir/$table.v")

  private def vdir(base: Path, v: Int) = new Path(base, f"v$v%05d")

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Pointer files are APPEND-ONLY epochs: `_ptr.%09d` containing the
    * committed version id; the live pointer is the highest epoch. A
    * commit is ONE atomic rename of a new epoch file — there is never a
    * moment without a committed pointer (the delete-then-recreate scheme
    * this replaced had one), and rollback is just a newer epoch pointing
    * at an older version.
    */
  private def ptrEpochs(fs: FileSystem, base: Path): Seq[(Long, Path)] =
    if (!fs.exists(base)) Nil
    else fs.listStatus(base).toSeq.map(_.getPath)
      .filter(_.getName.matches("_ptr\\.\\d{9}"))
      .map(p => (p.getName.stripPrefix("_ptr.").toLong, p))
      .sortBy(_._1)

  private def readPtr(fs: FileSystem, p: Path): Int = {
    val in = fs.open(p)
    try new java.io.BufferedReader(
      new java.io.InputStreamReader(in, "UTF-8")).readLine().trim.toInt
    finally in.close()
  }

  /** Committed version id, or None for a table that never committed. */
  def currentVersion(spark: SparkSession, warehouseDir: String,
      table: String): Option[Int] = {
    val base = root(warehouseDir, table)
    val fs = fsOf(spark, base)
    ptrEpochs(fs, base).lastOption.map { case (_, p) => readPtr(fs, p) }
  }

  /** Every version present on disk (committed or orphaned), ascending. */
  def listVersions(spark: SparkSession, warehouseDir: String,
      table: String): Seq[Int] = {
    val base = root(warehouseDir, table)
    val fs = fsOf(spark, base)
    if (!fs.exists(base)) Nil
    else fs.listStatus(base).toSeq.map(_.getPath.getName)
      .filter(_.matches("v\\d{5}"))
      .map(_.drop(1).toInt).sorted
  }

  private def commitPointer(fs: FileSystem, base: Path, v: Int): Unit = {
    val epoch = ptrEpochs(fs, base).lastOption.map(_._1).getOrElse(0L) + 1
    val tmp = new Path(base, f"._ptr.$epoch%09d.tmp")
    val ptr = new Path(base, f"_ptr.$epoch%09d")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, ptr))
      throw new java.io.IOException(s"version pointer commit failed: $ptr")
  }

  /** Write `df` as the next version and commit it. Orphan dirs from
    * crashed earlier writes are swept first (they are above the
    * committed pointer, so sweeping can never touch visible data).
    * Returns the committed version id.
    */
  def writeVersioned(spark: SparkSession, warehouseDir: String,
      table: String, df: DataFrame): Int = {
    val base = root(warehouseDir, table)
    val fs = fsOf(spark, base)
    fs.mkdirs(base)
    val cur = currentVersion(spark, warehouseDir, table)
    // sweep uncommitted orphans (> current) from crashed writers
    listVersions(spark, warehouseDir, table)
      .filter(v => v > cur.getOrElse(0))
      .foreach(v => fs.delete(vdir(base, v), true))
    val next = cur.getOrElse(0) + 1
    df.write.mode("overwrite").parquet(vdir(base, next).toString)
    commitPointer(fs, base, next)
    next
  }

  /** Read the current snapshot, or `asOf` a specific committed version.
    * Reading a version above the pointer (an orphan) is refused — it may
    * be half-written.
    */
  def readVersioned(spark: SparkSession, warehouseDir: String,
      table: String, asOf: Option[Int] = None): DataFrame = {
    val cur = currentVersion(spark, warehouseDir, table).getOrElse(
      throw new java.util.NoSuchElementException(
        s"$table has no committed version"))
    val v = asOf.getOrElse(cur)
    require(v <= cur, s"version $v is not committed (current: $cur)")
    require(v >= 1, s"versions start at 1, got $v")
    spark.read.parquet(vdir(root(warehouseDir, table), v).toString)
  }

  /** Roll the table back to an earlier committed version — one pointer
    * commit, zero data movement. Versions ABOVE the new pointer stay on
    * disk but are NOT readable through the API ([[readVersioned]] refuses
    * anything above the pointer — it cannot distinguish a rolled-back
    * version from a half-written orphan), and the NEXT [[writeVersioned]]
    * sweeps them before writing. Copy a version directory aside BEFORE
    * rolling back if it is needed for forensics — do not rely on
    * post-rollback leftovers surviving the next nightly write.
    */
  def rollback(spark: SparkSession, warehouseDir: String, table: String,
      to: Int): Unit = {
    val cur = currentVersion(spark, warehouseDir, table).getOrElse(
      throw new java.util.NoSuchElementException(
        s"$table has no committed version"))
    require(to >= 1 && to <= cur, s"rollback target $to outside [1, $cur]")
    commitPointer(fsOf(spark, root(warehouseDir, table)),
      root(warehouseDir, table), to)
  }

  /** Delete all versions except the current one and the newest
    * `keepHistory` below it — the retention knob. The current version is
    * never deleted; versions above the pointer (rollback leftovers /
    * orphans) always are.
    */
  def vacuumVersions(spark: SparkSession, warehouseDir: String,
      table: String, keepHistory: Int): Unit = {
    require(keepHistory >= 0, "keepHistory >= 0")
    val base = root(warehouseDir, table)
    val fs = fsOf(spark, base)
    val cur = currentVersion(spark, warehouseDir, table).getOrElse(return)
    listVersions(spark, warehouseDir, table)
      .filter(v => v > cur || v < cur - keepHistory)
      .foreach(v => fs.delete(vdir(base, v), true))
    // retire superseded pointer epochs (all but the live one)
    ptrEpochs(fs, base).dropRight(1).foreach { case (_, p) =>
      fs.delete(p, false)
    }
  }
}
