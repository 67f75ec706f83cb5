package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MANIFEST-versioned partitioned tables — MVCC with FILE REUSE, the
  * Delta/Iceberg shape that makes versioning affordable for FACT tables:
  * a version is a MANIFEST (one line per partition → immutable data
  * dir), so a nightly write that touches one partition commits a new
  * version writing exactly that partition's bytes and REUSES every
  * untouched partition's files. [[Versioned]] (full snapshots) pays
  * full-table write amplification per version — right for dimension and
  * state tables; this layer is the 100 TB path for partitioned corpora
  * (a nightly-versioned 10 TB table writes GBs per night, not 10 TB).
  *
  * Layout under `{table}.mv/`:
  *  - `parts/<key>/<uuid>/` — immutable partition-GENERATION dirs
  *    (plain parquet; the partition column is RETAINED in the files, so
  *    reads are simple unions with no directory-inference tricks);
  *  - `_manifest.v%05d` — TSV `key<TAB>relative-dir`, one line per live
  *    partition of that version.
  *
  * COMMIT = the atomic CREATE-IF-ABSENT of the next `_manifest.v%05d`
  * WITH its full content (hard-link publish on local filesystems,
  * create-exclusive on HDFS/object stores) — there is no separate
  * pointer, so a version either exists completely or not at all, and a
  * crash at any point leaves only unreferenced data dirs (swept by
  * [[vacuum]]), never a torn table.
  *
  * OPTIMISTIC CONCURRENCY falls out of the commit primitive: a writer
  * bases its merged manifest on the current committed version and tries
  * to commit as the next number; if a peer won that number, the writer
  * re-reads the NEW base, re-merges its (already staged, still valid)
  * partition dirs against it, and retries. Interleaved committers
  * therefore serialize in version order with partition-level last-wins
  * on true overlaps; no committer ever overwrites another's manifest
  * and no version is ever half-visible.
  *
  * Partition keys: the partition column's STRING value, hex-encoded
  * (prefix `x`, `xNULL` for null) so any value — spaces, unicode,
  * separators — is a safe directory name with zero escaping ambiguity.
  *
  * Rollback is [[restore]]: commit a NEW version whose manifest equals
  * the old one — zero data movement (pure file reuse), and history
  * stays forward-only (no pointer to regress, no forensics window).
  */
object ManifestVersioned {

  private def root(warehouseDir: String, table: String) =
    new Path(s"$warehouseDir/$table.mv")

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(base: Path, v: Int) =
    new Path(base, f"_manifest.v$v%05d")

  /** Hex partition key for a raw string value (null-safe) — public so
    * audits/tests can address manifest entries by value.
    */
  def keyOf(value: String): String =
    if (value == null) "xNULL"
    else "x" + value.getBytes("UTF-8").map("%02X".format(_)).mkString

  /** Inverse of [[keyOf]] for audit/diff output. */
  def valueOf(key: String): String = {
    val h = key.stripPrefix("x")
    if (h == "NULL") null
    else new String(h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray,
      "UTF-8")
  }

  /** Committed version ids, ascending (a version exists ⟺ its manifest
    * file exists — the manifest IS the commit record).
    */
  def listVersions(spark: SparkSession, warehouseDir: String,
      table: String): Seq[Int] = {
    val base = root(warehouseDir, table)
    val fs = fsOf(spark, base)
    if (!fs.exists(base)) Nil
    else fs.listStatus(base).toSeq.map(_.getPath.getName)
      .filter(_.matches("_manifest\\.v\\d{5}"))
      .map(_.stripPrefix("_manifest.v").toInt).sorted
  }

  def currentVersion(spark: SparkSession, warehouseDir: String,
      table: String): Option[Int] =
    listVersions(spark, warehouseDir, table).lastOption

  /** The (key → relative data dir) manifest of a committed version. */
  def manifest(spark: SparkSession, warehouseDir: String, table: String,
      asOf: Option[Int] = None): Map[String, String] = {
    val base = root(warehouseDir, table)
    val fs = fsOf(spark, base)
    val v = asOf.orElse(currentVersion(spark, warehouseDir, table)).getOrElse(
      throw new java.util.NoSuchElementException(
        s"$table has no committed manifest version"))
    val p = manifestPath(base, v)
    require(fs.exists(p), s"version $v of $table is not committed")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { line =>
        val Array(k, d) = line.split("\t", 2); k -> d
      }.toMap
    finally in.close()
  }

  /** The version's AUTHORITATIVE schema, recorded in the manifest
    * header at commit time (None only for pre-schema-header manifests).
    * Reads apply it explicitly, so a version whose partitions were
    * written under different (additively evolved) schemas still reads
    * as ONE coherent relation — old files surface later columns as
    * NULL — without the per-file footer cost of `mergeSchema` and
    * without the plain reader's pick-a-random-file schema roulette.
    */
  def manifestSchema(spark: SparkSession, warehouseDir: String,
      table: String, asOf: Option[Int] = None)
      : Option[org.apache.spark.sql.types.StructType] =
    headerLine(spark, warehouseDir, table, asOf, "#schema\t").map(j =>
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** The committer-supplied NOTE of a committed version (None when the
    * commit carried none) — provenance the streaming sink uses for its
    * exactly-once replay guard (the note records the micro-batch id).
    */
  def manifestNote(spark: SparkSession, warehouseDir: String, table: String,
      asOf: Option[Int] = None): Option[String] =
    headerLine(spark, warehouseDir, table, asOf, "#note\t")

  private def headerLine(spark: SparkSession, warehouseDir: String,
      table: String, asOf: Option[Int], prefix: String): Option[String] = {
    val base = root(warehouseDir, table)
    val fs = fsOf(spark, base)
    val v = asOf.orElse(currentVersion(spark, warehouseDir, table))
      .getOrElse(return None)
    val p = manifestPath(base, v)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .find(_.startsWith(prefix)).map(_.stripPrefix(prefix))
    finally in.close()
  }

  /** Read a committed version — the union of its manifest's immutable
    * partition dirs (current version when `asOf` is None).
    */
  def read(spark: SparkSession, warehouseDir: String, table: String,
      asOf: Option[Int] = None): DataFrame = {
    val base = root(warehouseDir, table)
    val dirs = manifest(spark, warehouseDir, table, asOf).values.toSeq.sorted
      .map(rel => new Path(base, rel).toString)
    readDirs(spark, warehouseDir, table, asOf, dirs)
  }

  /** Scan `dirs` under the version's RECORDED schema (additive-evolution
    * safe: a partition written before a widening surfaces the later
    * columns as NULL; no per-file mergeSchema cost, no sample-file
    * schema roulette).
    */
  private def readDirs(spark: SparkSession, warehouseDir: String,
      table: String, asOf: Option[Int], dirs: Seq[String]): DataFrame =
    manifestSchema(spark, warehouseDir, table, asOf) match {
      case Some(sch) => spark.read.schema(sch).parquet(dirs: _*)
      case None => spark.read.parquet(dirs: _*)
    }

  /** MANIFEST-pruned read of specific partition values: only the named
    * partitions' dirs are listed or scanned — metadata-level pruning
    * that never touches the rest of the table (stronger than directory
    * or footer pruning: the planner never even sees the other files).
    */
  def readPartitions(spark: SparkSession, warehouseDir: String,
      table: String, values: Seq[String],
      asOf: Option[Int] = None): DataFrame = {
    val base = root(warehouseDir, table)
    val m = manifest(spark, warehouseDir, table, asOf)
    val dirs = values.map(keyOf).distinct.flatMap(m.get)
      .map(rel => new Path(base, rel).toString)
    require(dirs.nonEmpty,
      s"none of the requested partitions exist in $table: $values")
    readDirs(spark, warehouseDir, table, asOf, dirs)
  }

  /** Stage `df`'s partitions as immutable generation dirs: ONE
    * partitioned write job to a unique staging dir, then a metadata-only
    * rename per partition into `parts/<key>/<uuid>`. The partition
    * column stays in the data files (the helper `__pv` hex column is
    * what `partitionBy` consumes and drops). Returns key → relative dir.
    */
  private def stagePartitions(df: DataFrame, base: Path, fs: FileSystem,
      partCol: String): Map[String, String] = {
    val gen = java.util.UUID.randomUUID().toString.take(12)
    val stage = new Path(base, s"._stage.$gen")
    df.withColumn("__pv",
        concat(lit("x"), coalesce(
          hex(encode(col(partCol).cast("string"), "UTF-8")), lit("NULL"))))
      .write.mode("overwrite").partitionBy("__pv").parquet(stage.toString)
    val entries = fs.listStatus(stage).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("__pv="))
      .map { src =>
        val key = src.getName.stripPrefix("__pv=")
        val dest = new Path(base, s"parts/$key/$gen")
        fs.mkdirs(dest.getParent)
        if (!fs.rename(src, dest))
          throw new java.io.IOException(s"partition stage failed: $src -> $dest")
        key -> s"parts/$key/$gen"
      }.toMap
    fs.delete(stage, true)
    entries
  }

  /** Atomically publish `content` as `target` iff `target` does not
    * exist — the commit primitive. Local filesystems: write a tmp file,
    * HARD-LINK it to the target (atomic create-if-absent WITH content,
    * O(1)); others: create-exclusive stream (atomic on HDFS and
    * precondition-backed object stores).
    */
  private def commitFile(fs: FileSystem, base: Path, target: Path,
      content: String): Boolean =
    if (fs.getScheme == "file") {
      val tmp = new Path(base,
        s"._m.${java.util.UUID.randomUUID().toString.take(12)}.tmp")
      val out = fs.create(tmp, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      val ok =
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(target.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      fs.delete(tmp, false)
      ok
    } else
      try {
        val out = fs.create(target, false)
        try out.write(content.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }

  private def render(m: Map[String, String], note: String,
      schemaJson: String): String = {
    val sh = if (schemaJson.isEmpty) "" else s"#schema\t$schemaJson\n"
    val nh = if (note.isEmpty) "" else s"#note\t$note\n"
    sh + nh + m.toSeq.sortBy(_._1).map { case (k, d) => s"$k\t$d" }.mkString("\n")
  }

  /** ADDITIVE schema merge for delta commits: new columns append
    * (nullable — old files surface them as NULL), common columns must
    * keep their type; a retype/undeclared-rename rejects loudly (the
    * SchemaGuard contract — silent coercion is a policy decision, not a
    * default). All recorded fields normalize to nullable: any partition
    * may predate any column.
    */
  private def mergedSchema(base: org.apache.spark.sql.types.StructType,
      delta: org.apache.spark.sql.types.StructType,
      what: String): org.apache.spark.sql.types.StructType = {
    val baseMap = base.fields.map(f => f.name -> f).toMap
    delta.fields.foreach { f =>
      baseMap.get(f.name).foreach { b =>
        if (!org.apache.spark.sql.types.DataType.equalsStructurally(
            b.dataType, f.dataType, ignoreNullability = true))
          throw new IllegalArgumentException(
            s"retyped column appending to $what: " +
              s"${f.name} ${b.dataType.simpleString} -> ${f.dataType.simpleString} " +
              "(rename/retype is not evolution)")
      }
    }
    org.apache.spark.sql.types.StructType(
      (base.fields ++ delta.fields.filterNot(f => baseMap.contains(f.name)))
        .map(_.copy(nullable = true)))
  }

  /** Commit `entries` merged over the current manifest via the OCC loop:
    * base on the committed head, try the next number, on a lost race
    * re-read the NEW head and re-merge (staged dirs stay valid — only
    * the reused entries change). `merge` receives the base manifest
    * (empty for a first version) and returns the full new manifest;
    * `schemaFor` receives the base version's RECORDED schema and returns
    * the one to record — both are re-evaluated per attempt against the
    * live head, so a lost race can never drop a concurrent commit's
    * partitions OR its schema widening (the lost-update the pre-loop
    * computation would allow).
    */
  private def commitMerged(spark: SparkSession, warehouseDir: String,
      table: String, merge: Map[String, String] => Map[String, String],
      note: String = "",
      schemaFor: Option[org.apache.spark.sql.types.StructType] => String =
        _ => ""): Int = {
    val base = root(warehouseDir, table)
    val fs = fsOf(spark, base)
    val MaxAttempts = 1000
    var attempt = 0
    while (attempt < MaxAttempts) {
      val cur = currentVersion(spark, warehouseDir, table)
      val baseMan = cur
        .map(v => manifest(spark, warehouseDir, table, Some(v)))
        .getOrElse(Map.empty[String, String])
      val baseSch = cur.flatMap(v =>
        manifestSchema(spark, warehouseDir, table, Some(v)))
      val next = cur.getOrElse(0) + 1
      if (commitFile(fs, base, manifestPath(base, next),
          render(merge(baseMan), note, schemaFor(baseSch))))
        return next
      attempt += 1
    }
    throw new java.io.IOException(
      s"manifest commit lost $MaxAttempts version races in a row: $base")
  }

  /** Write every partition of `df` as a new version (bootstrap or full
    * rewrite). Partitions absent from `df` are DROPPED from the new
    * version (full-snapshot semantics); they remain in history.
    */
  def writeFull(spark: SparkSession, warehouseDir: String, table: String,
      df: DataFrame, partCol: String): Int = {
    val base = root(warehouseDir, table)
    val fs = fsOf(spark, base)
    fs.mkdirs(base)
    val entries = stagePartitions(df, base, fs, partCol)
    // full rewrite: the recorded schema is df's own (a full snapshot may
    // legitimately DROP columns), independent of the base
    val sch = org.apache.spark.sql.types.StructType(
      df.schema.fields.map(_.copy(nullable = true))).json
    commitMerged(spark, warehouseDir, table, _ => entries,
      schemaFor = _ => sch)
  }

  /** Commit a new version REPLACING only the partitions present in
    * `delta` (plus dropping `dropParts`); every other partition of the
    * current version is REUSED by reference — zero new bytes. The
    * partition-replace contract matches `writeWarehousePartitioned`'s
    * dynamic overwrite: `delta` must carry each touched partition's
    * FULL intended content.
    */
  def writeDelta(spark: SparkSession, warehouseDir: String, table: String,
      delta: DataFrame, partCol: String, dropParts: Seq[String] = Nil,
      note: String = ""): Int = {
    val base = root(warehouseDir, table)
    val fs = fsOf(spark, base)
    require(currentVersion(spark, warehouseDir, table).isDefined,
      s"writeDelta needs an existing version of $table — bootstrap with writeFull")
    // fail FAST on a retype against the schema visible now (before any
    // staging bytes are written); the commit loop re-merges against the
    // live head per attempt, so a concurrent widening is never dropped
    // and a concurrent retype conflict still aborts loudly mid-loop
    manifestSchema(spark, warehouseDir, table)
      .foreach(b => mergedSchema(b, delta.schema, table))
    val entries = stagePartitions(delta, base, fs, partCol)
    val dropKeys = dropParts.map(keyOf).toSet
    commitMerged(spark, warehouseDir, table,
      baseMan => (baseMan -- dropKeys) ++ entries, note,
      schemaFor = baseSch => baseSch
        .map(b => mergedSchema(b, delta.schema, table))
        .getOrElse(org.apache.spark.sql.types.StructType(
          delta.schema.fields.map(_.copy(nullable = true)))).json)
  }

  /** The NIGHTLY-MERGE composition — the reason this layer exists: run
    * the reference's incremental merge (latest-wins + tombstones,
    * [[graft.core.Merge.merge]]) against the current snapshot, PRUNED to
    * the partitions the change-set actually touches, and commit the
    * result as the next version. Untouched partitions are reused by
    * reference (zero new bytes), partitions whose every key tombstoned
    * are dropped from the new manifest, and the whole night is ONE
    * atomic manifest commit — so a 10 TB nightly-versioned corpus pays
    * GBs of write amplification per night AND keeps every pre-merge
    * night time-travelable.
    *
    * Shape mirrors `Merge.mergePartitionedPlan`: touched set = partitions
    * holding any change key (column-pruned semi-join) ∪ partitions of
    * non-tombstone change rows (both metadata-scale collects — partition
    * VALUES); the merge itself runs over slice ∪ change only.
    *
    * @return (touched partition values as strings, committed version)
    */
  def mergeVersioned(spark: SparkSession, warehouseDir: String,
      table: String, change: DataFrame, keyCol: String, partitionCol: String,
      order: Seq[org.apache.spark.sql.Column],
      isTombstone: org.apache.spark.sql.Column): (Seq[String], Int) = {
    // pin the WHOLE merge (key locate, slice, manifest base) to one
    // committed snapshot — a concurrent commit mid-merge cannot skew
    // the read set (the final writeDelta still OCC-merges against
    // whatever head exists at commit time)
    val baseV = currentVersion(spark, warehouseDir, table).getOrElse(
      throw new java.util.NoSuchElementException(
        s"$table has no committed version to merge into"))
    val target = read(spark, warehouseDir, table, Some(baseV))
    val changeKeys = change.select(col(keyCol).as("__mv_key")).distinct()
    val fromTarget = target
      .join(changeKeys, col(keyCol) <=> col("__mv_key"), "left_semi")
      .select(col(partitionCol).cast("string")).distinct()
    val fromChange = change.filter(!isTombstone)
      .select(col(partitionCol).cast("string")).distinct()
    val touched = fromTarget.union(fromChange).distinct()
      .collect().map(_.getString(0)).toSeq
    if (touched.isEmpty) return (Nil, baseV)
    // the slice read is MANIFEST-pruned: only the touched partitions'
    // generation dirs are listed or scanned — the untouched 99% of a
    // 100 TB table contributes zero listing and zero tasks (directory-
    // level pruning, stronger than the footer skipping a filter over
    // the full dir list would get); touched values present only in the
    // change (brand-new partitions) have no dir yet and are skipped
    val m = manifest(spark, warehouseDir, table, Some(baseV))
    val existing = touched.filter(v => m.contains(keyOf(v)))
    val slice =
      if (existing.isEmpty) target.limit(0)
      else readPartitions(spark, warehouseDir, table, existing, Some(baseV))
    // survivors of slice ∪ change — consumed twice (emptied-partition
    // probe + the delta write), so materialize once
    val merged = graft.core.Merge
      .merge(slice, change, keyCol, order, isTombstone)
      .localCheckpoint(true)
    val present = merged.select(col(partitionCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val drops = touched.filterNot(present.contains)
    (touched,
      writeDelta(spark, warehouseDir, table, merged, partitionCol,
        dropParts = drops))
  }

  /** Roll the table to an earlier version's CONTENT by committing a new
    * version with that manifest — zero data movement (pure file reuse),
    * forward-only history (the "rollback" is itself an auditable
    * version, and nothing above any pointer gets swept).
    */
  def restore(spark: SparkSession, warehouseDir: String, table: String,
      to: Int): Int = {
    val old = manifest(spark, warehouseDir, table, Some(to))
    val sch = manifestSchema(spark, warehouseDir, table, Some(to))
    commitMerged(spark, warehouseDir, table, _ => old,
      schemaFor = _ => sch.map(_.json).getOrElse(""))
  }

  /** PARTITION-level diff of two committed versions — the audit the
    * manifest makes free (no data read at all): one row per partition
    * whose mapping changed, (value, status ∈ added|removed|changed).
    */
  def manifestDiff(spark: SparkSession, warehouseDir: String, table: String,
      v1: Int, v2: Int): DataFrame = {
    import spark.implicits._
    val a = manifest(spark, warehouseDir, table, Some(v1))
    val b = manifest(spark, warehouseDir, table, Some(v2))
    val rows =
      (b.keySet -- a.keySet).toSeq.map(k => (valueOf(k), "added")) ++
      (a.keySet -- b.keySet).toSeq.map(k => (valueOf(k), "removed")) ++
      a.keySet.intersect(b.keySet).toSeq.collect {
        case k if a(k) != b(k) => (valueOf(k), "changed")
      }
    rows.toDF("part_value", "status")
  }

  /** Per-partition file statistics of a committed version — the
    * manifest layer's compaction trigger (driver-side metadata listing,
    * zero data reads): (partition value, generation dir, n_files,
    * bytes). A delta written off a wide shuffle can leave one partition
    * as dozens of small files; this relation is what a nightly job
    * consults to decide WHERE to run [[compactPartitions]].
    */
  def partitionFileStats(spark: SparkSession, warehouseDir: String,
      table: String, asOf: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val base = root(warehouseDir, table)
    val fs = fsOf(spark, base)
    manifest(spark, warehouseDir, table, asOf).toSeq.map { case (k, rel) =>
      val files = fs.listStatus(new Path(base, rel)).toSeq
        .filter(s => !s.getPath.getName.startsWith("_"))
      (valueOf(k), rel, files.size.toLong, files.map(_.getLen).sum)
    }.toDF("part_value", "gen_dir", "n_files", "bytes")
  }

  /** Rewrite the named partitions as fresh single-ish-file generation
    * dirs, committed as ONE new version — content bit-identical, purely
    * a file-layout fold (repartition by the partition column gives ~one
    * output file per partition). Readers of older versions keep their
    * files; [[vacuum]] reclaims the sprawled generations once they age
    * out of retention.
    */
  def compactPartitions(spark: SparkSession, warehouseDir: String,
      table: String, partCol: String, values: Seq[String]): Int = {
    val slice = readPartitions(spark, warehouseDir, table, values)
      .repartition(col(partCol))
    writeDelta(spark, warehouseDir, table, slice, partCol)
  }

  /** Delete manifests older than the newest `keepHistory`+1 versions and
    * every data dir no retained manifest references (crashed writers'
    * orphans included), plus staging debris. Run in a no-writer window.
    */
  def vacuum(spark: SparkSession, warehouseDir: String, table: String,
      keepHistory: Int): Unit = {
    require(keepHistory >= 0, "keepHistory >= 0")
    val base = root(warehouseDir, table)
    val fs = fsOf(spark, base)
    val versions = listVersions(spark, warehouseDir, table)
    if (versions.isEmpty) return
    val retained = versions.takeRight(keepHistory + 1)
    val referenced = retained
      .flatMap(v => manifest(spark, warehouseDir, table, Some(v)).values)
      .toSet
    versions.filterNot(retained.contains)
      .foreach(v => fs.delete(manifestPath(base, v), false))
    val parts = new Path(base, "parts")
    if (fs.exists(parts))
      fs.listStatus(parts).foreach { keyDir =>
        fs.listStatus(keyDir.getPath).foreach { genDir =>
          val rel = s"parts/${keyDir.getPath.getName}/${genDir.getPath.getName}"
          if (!referenced.contains(rel)) fs.delete(genDir.getPath, true)
        }
      }
    fs.listStatus(base).map(_.getPath)
      .filter(p => p.getName.startsWith("._stage.") ||
        p.getName.startsWith("._m."))
      .foreach(p => fs.delete(p, true))
  }
}
