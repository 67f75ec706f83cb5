package graft.io

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** Sources and sinks (SURVEY.md §2.1 S1/S2/S4/K2).
  *
  * The reference reads bc2adls CSV exports and loads BigQuery
  * (`helper_functions.py:115,192-196`); locally the warehouse is parquet behind
  * the same interface. NOTE the reference's `multiline=true` makes CSV
  * non-splittable (1 task per file — its real parallelism ceiling, SURVEY.md §6);
  * we keep it for fidelity on the ingest path but everything downstream is
  * format-agnostic columnar.
  */
object Tables {

  /** The reference's CSV read options (`helper_functions.py:115`). */
  val CsvOptions: Map[String, String] = Map(
    "header" -> "true",
    "inferSchema" -> "true",
    "multiLine" -> "true",
    "quote" -> "\"")

  private def csvReader(spark: SparkSession): DataFrameReader =
    spark.read.options(CsvOptions)

  /** S1 — all CSVs under a folder, one DataFrame, inferred schema. */
  def readCsvFolder(spark: SparkSession, path: String): DataFrame =
    csvReader(spark).csv(path)

  /** S2 — an explicit file list (the post-watermark-filter shape,
    * `incremental_etl_v1.py:82`).
    */
  def readCsvFiles(spark: SparkSession, paths: Seq[String]): DataFrame =
    csvReader(spark).csv(paths: _*)

  /** S1 sibling for JSON-lines drops (API exports land as JSONL at least
    * as often as CSV). One object per line — the SPLITTABLE layout; a
    * single pretty-printed array would force `multiLine` and one task
    * per file, the same parallelism cliff as the reference's
    * `multiline=True` CSVs (SURVEY §4.1). Schema inference samples like
    * CSV's; production paths pass `schema` for a single-pass read.
    */
  def readJsonFolder(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).json(path)
  }

  /** S1/S2 hardened: parse against a KNOWN schema (the warehouse's — the
    * incremental path already casts to it, `incremental_etl_v1.py:139-143`)
    * and CAPTURE rows that fail the typed parse in `_corrupt_record`
    * instead of silently nulling their cells (what the reference's
    * inferred read does — silent data loss at ingest scale). The pipeline
    * quarantines `WHERE _corrupt_record IS NOT NULL` and loads the rest.
    * Inference can't do this: a bad cell makes the whole column infer as
    * string and nothing ever fails. Spark requires the corrupt column to
    * be part of the read schema, hence the explicit add.
    *
    * Spark restriction: a query referencing ONLY `_corrupt_record` (and
    * no data column) on the raw CSV relation throws AnalysisException —
    * `.cache()` the returned frame (what RobustIngestSpec does) or keep
    * a data column in the projection when quarantining.
    */
  def readCsvFolderRobust(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record",
      org.apache.spark.sql.types.StringType, nullable = true)
    spark.read.options(CsvOptions - "inferSchema")
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
  }

  /** S4 — current warehouse table (BigQuery in the reference; parquet here). */
  def readWarehouse(spark: SparkSession, warehouseDir: String, table: String): DataFrame =
    spark.read.parquet(s"$warehouseDir/$table")

  def warehouseExists(spark: SparkSession, warehouseDir: String, table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$warehouseDir/$table")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Liveness gate for build-once-per-session catalog state: every named
    * table is REGISTERED and its data files still hold at least one
    * parquet part. Catalog registration alone is not enough — a /tmp
    * sweep or an external path-level rewrite can remove the files while
    * the registration (and its cached listing) survives, which turns a
    * "skip the rebuild, it exists" gate into a permanently broken reader.
    * When everything is live the registrations are REFRESHED, dropping
    * any stale cached file listing left by a staged swap; when anything
    * is missing the caller rebuilds (deterministic builders write
    * identical relations, so a rebuild is always safe).
    */
  def bucketedStateLive(spark: SparkSession, warehouseDir: String,
      tables: Seq[String]): Boolean = {
    val live = tables.forall { t =>
      if (!spark.catalog.tableExists(t)) false
      else {
        val p = new org.apache.hadoop.fs.Path(s"$warehouseDir/$t")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.exists(p) && fs.listStatus(p)
          .exists(_.getPath.getName.endsWith(".parquet"))
      }
    }
    if (live) tables.foreach(spark.catalog.refreshTable)
    live
  }

  /** K2 — full-overwrite load (the reference's read-modify-overwrite pattern,
    * `incremental_etl_v1.py:184-188`).
    */
  def writeWarehouse(df: DataFrame, warehouseDir: String, table: String): Unit =
    df.write.mode("overwrite").parquet(s"$warehouseDir/$table")

  /** K2 append variant: incremental corpus growth — accepted batch
    * survivors extend the table without rewriting it (the shape the
    * streaming dedup sink and nightly ingest share).
    */
  def appendWarehouse(df: DataFrame, warehouseDir: String, table: String): Unit =
    df.write.mode("append").parquet(s"$warehouseDir/$table")

  /** K2 at scale: partitioned overwrite. A 100 TB warehouse table is never
    * one flat directory — partitioning by a low-cardinality predicate
    * column turns full-table scans into partition-pruned reads
    * (`PartitionFilters` in the plan), and `partitionOverwriteMode=dynamic`
    * rewrites only the partitions present in `df` instead of the whole
    * table (the reference's full-overwrite pattern, made incremental).
    */
  def writeWarehousePartitioned(df: DataFrame, warehouseDir: String,
      table: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(s"$warehouseDir/$table")

  /** K2 at 100 TB, scan-side: RANGE-CLUSTERED rewrite for min/max data
    * skipping. `repartitionByRange` + `sortWithinPartitions` lays rows out
    * so each parquet file owns a narrow, (mostly) disjoint slice of the
    * cluster key's domain; parquet footers then carry tight min/max stats
    * and a selective range/point predicate prunes whole files and row
    * groups at planning/scan time instead of reading 100 TB to filter it.
    * Complement to [[writeWarehousePartitioned]] (directory-level pruning
    * on LOW-cardinality keys): range clustering handles high-cardinality
    * keys — timestamps, ids — where a directory per value is untenable.
    * The range exchange samples key quantiles, so skewed domains still
    * split into balanced files. Secondary `moreSortCols` tighten stats for
    * a second key within each file (poor-man's Z-order; a true space-
    * filling curve would trade some primary-key tightness for it).
    */
  def writeWarehouseRangeClustered(df: DataFrame, warehouseDir: String,
      table: String, clusterCol: String, numFiles: Int,
      moreSortCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(numFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol, moreSortCols: _*)
      .write.mode("overwrite").parquet(s"$warehouseDir/$table")
  }

  /** Morton (Z-order) key over two numeric columns: each value min/max-
    * scales to 16 bits, then the classic bit-spreading ladder interleaves
    * them — all Spark bit BUILT-INS (shiftleft / bitwiseAND / OR), fully
    * codegen'd, no custom expression needed. Caller supplies the column
    * domains (warehouse statistics; or one cheap agg).
    */
  def mortonKey(a: org.apache.spark.sql.Column, aMin: Double, aMax: Double,
      b: org.apache.spark.sql.Column, bMin: Double, bMax: Double)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    def bucket16(c: org.apache.spark.sql.Column, mn: Double, mx: Double) = {
      val scale = if (mx > mn) mx - mn else 1.0
      least(greatest(
        floor((c.cast("double") - lit(mn)) * 65535.0 / lit(scale)), lit(0.0)),
        lit(65535.0)).cast("long")
    }
    def spread16(c: org.apache.spark.sql.Column) = {
      val s1 = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
      val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
      s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread16(bucket16(a, aMin, aMax))
      .bitwiseOR(shiftleft(spread16(bucket16(b, bMin, bMax)), 1))
  }

  /** N-column Morton key: each column min/max-scales to `32/n` bits
    * (16 for 2 columns — identical to [[mortonKey]]'s layout — 10 for
    * 3, 8 for 4), then bit i of column j lands at position `i*n + j`
    * of the interleaved key. All Spark bit built-ins (shiftright /
    * shiftleft / AND / OR folded over the bit positions), fully
    * codegen'd; the expression tree is n·bits OR terms — ~30 nodes
    * regardless of n, well inside codegen limits. Every file of a
    * layout ordered by this key owns a small HYPER-RECTANGLE of the
    * n-D key space, so per-file min/max stats prune on ANY of the
    * columns; per-key ranges widen as files^((n-1)/n), the standard
    * space-filling-curve trade.
    */
  def mortonKeyN(cols: Seq[(org.apache.spark.sql.Column, Double, Double)])
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(cols.size >= 2 && cols.size <= 8, "mortonKeyN wants 2..8 columns")
    val n = cols.size
    val bits = 32 / n
    def bucket(c: org.apache.spark.sql.Column, mn: Double, mx: Double) = {
      val scale = if (mx > mn) mx - mn else 1.0
      val top = (1L << bits) - 1
      least(greatest(
        floor((c.cast("double") - lit(mn)) * top / lit(scale)), lit(0.0)),
        lit(top.toDouble)).cast("long")
    }
    cols.zipWithIndex.map { case ((c, mn, mx), j) =>
      val b = bucket(c, mn, mx)
      (0 until bits).map(i =>
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + j))
        .reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** K2 at 100 TB, scan-side for TWO-dimensional predicates: Z-ORDERED
    * rewrite. Range-clustering one key leaves the other key spanning its
    * full domain in every file (no skipping on it); ordering by the
    * Morton interleave of both keys gives every file a small RECTANGLE of
    * the 2-D key space, so footer min/max stats prune on EITHER column.
    * The trade: per-key ranges are ~√(files) wider than single-key
    * clustering — Z-order when queries filter both dimensions,
    * [[writeWarehouseRangeClustered]] when one dominates. Domains come
    * from one agg over the input (or warehouse statistics at scale).
    */
  def writeWarehouseZOrdered(df: DataFrame, warehouseDir: String,
      table: String, colA: String, colB: String, numFiles: Int): Unit = {
    import org.apache.spark.sql.functions._
    val s = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    // empty input / all-null cluster column → no domain to cluster on;
    // (0,0) degenerates mortonKey to a constant (bucket16's scale guard),
    // i.e. a plain write, instead of an opaque NPE off the null aggregate
    def stat(i: Int): Double = if (s.isNullAt(i)) 0.0 else s.getDouble(i)
    val z = mortonKey(col(colA), stat(0), stat(1),
      col(colB), stat(2), stat(3))
    df.withColumn("__graft_z", z)
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode("overwrite").parquet(s"$warehouseDir/$table")
  }

  /** K2 at 100 TB, join-side: bucketed warehouse table. Bucketing
    * pre-shuffles the data ONCE at write time — every future equi-join or
    * aggregation on the bucket key reads co-located buckets and plans with
    * NO Exchange on that side (verified in `BucketedTableSpec`). The
    * write-once cost amortizes across every downstream consumer, which is
    * exactly the warehouse usage pattern (fact tables joined on the same
    * key by many queries). `sortBy` additionally lets sort-merge joins
    * skip their sort. Registered as an external table at
    * `warehouseDir/table` (path option), so files stay warehouse-owned.
    */
  def writeWarehouseBucketed(df: DataFrame, warehouseDir: String,
      table: String, bucketCol: String, numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .option("path", s"$warehouseDir/$table")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Catalog read of a bucketed table (bucket metadata lives in the
    * catalog, not the files — a plain parquet read of the same path loses
    * the co-location guarantee).
    */
  def readWarehouseBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Small-file compaction: rewrite a warehouse table into right-sized
    * files. Incremental appends ([[appendWarehouse]], the streaming dedup
    * sink) proliferate tiny files; at warehouse scale that is one task
    * per KB-sized file and crushing name-node/listing pressure. The
    * REBALANCE hint lets AQE split oversized and coalesce undersized
    * shuffle partitions toward `spark.sql.adaptive.advisoryPartitionSizeInBytes`
    * — the adaptive form of a hand-tuned `repartition(n)`, with optional
    * clustering columns so rewritten files are also read-locality-friendly.
    *
    * Durability: the compacted copy is FULLY written to a sibling staging
    * path before the original is touched, then swapped in with filesystem
    * renames — the table's only copy is never an in-memory checkpoint,
    * and a crash mid-rewrite leaves the original intact. The remaining
    * exposure is the delete→rename metadata window; a transactional table
    * format would close even that.
    *
    * PATH-BASED tables only: a catalog-BUCKETED table
    * ([[writeWarehouseBucketed]]) must never be compacted this way — the
    * plain rewrite drops the bucket-id file layout while the catalog
    * keeps claiming it, and subsequent bucketed reads fail. Rebucket via
    * a fresh [[writeWarehouseBucketed]] instead.
    */
  def compactWarehouse(spark: SparkSession, warehouseDir: String,
      table: String, clusterCols: Seq[String] = Nil): Unit = {
    val srcPath = new org.apache.hadoop.fs.Path(s"$warehouseDir/$table")
    val tmpPath = new org.apache.hadoop.fs.Path(s"$warehouseDir/$table._compacting")
    val df = readWarehouse(spark, warehouseDir, table)
    val re =
      if (clusterCols.isEmpty) df.hint("REBALANCE")
      else df.hint("REBALANCE", clusterCols: _*)
    re.write.mode("overwrite").parquet(tmpPath.toString)
    val fs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(srcPath, true)
    if (!fs.rename(tmpPath, srcPath))
      throw new java.io.IOException(
        s"compaction swap failed: $tmpPath -> $srcPath (compacted data is at $tmpPath)")
  }

  /** Small-file compaction for a catalog-BUCKETED table — the layout
    * [[compactWarehouse]] must never touch (its plain rewrite drops the
    * bucket-id file layout the catalog still declares). Nightly
    * append-mode `saveAsTable`s add at least one file per bucket per
    * batch, so every bucketed state relation (dedup hashes/sigs, LM
    * deltas, index postings/codes, SCD2 history, counted join state)
    * accumulates `batches × buckets` small files; this folds them back to
    * ~one file per bucket with a fresh bucketed write, preserving
    * co-location (the whole point of the layout).
    *
    * Durability: the table is FULLY staged to a `._fold` sibling (plain
    * parquet, `_SUCCESS`-marked) before the bucketed rewrite reads from
    * that on-disk copy; [[recoverBucketedCompaction]] repairs a crash
    * mid-rewrite. Row content is preserved bit-for-bit — this is a pure
    * file-layout change, so it is safe for ledgered/delta state whose
    * replay guards key on row CONTENT; state whose guards key on batch
    * PROVENANCE (the counted join) documents its own maintenance window.
    */
  def compactWarehouseBucketed(spark: SparkSession, warehouseDir: String,
      table: String, bucketCol: String, numBuckets: Int): Unit = {
    val stage = new org.apache.hadoop.fs.Path(s"$warehouseDir/$table._fold")
    readWarehouseBucketed(spark, table)
      .write.mode("overwrite").parquet(stage.toString)
    rewriteBucketedFromStage(spark, warehouseDir, table, bucketCol, numBuckets)
  }

  private def rewriteBucketedFromStage(spark: SparkSession,
      warehouseDir: String, table: String, bucketCol: String,
      numBuckets: Int): Unit = {
    val stage = new org.apache.hadoop.fs.Path(s"$warehouseDir/$table._fold")
    // one output task per bucket file target: the rewrite's whole point
    // is collapsing the per-append file sprawl
    writeWarehouseBucketed(
      spark.read.parquet(stage.toString).repartition(numBuckets,
        org.apache.spark.sql.functions.col(bucketCol)),
      warehouseDir, table, bucketCol, numBuckets)
    stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(stage, true)
  }

  /** Repair a [[compactWarehouseBucketed]] interrupted mid-run: a
    * complete (`_SUCCESS`-marked) staging redoes the rewrite; an
    * incomplete one is swept (the live table was never touched). Safe to
    * call unconditionally on startup.
    */
  def recoverBucketedCompaction(spark: SparkSession, warehouseDir: String,
      table: String, bucketCol: String, numBuckets: Int): Unit = {
    val stage = new org.apache.hadoop.fs.Path(s"$warehouseDir/$table._fold")
    val fs = stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(stage)) {
      if (fs.exists(new org.apache.hadoop.fs.Path(stage, "_SUCCESS")))
        rewriteBucketedFromStage(spark, warehouseDir, table, bucketCol,
          numBuckets)
      else fs.delete(stage, true)
    }
  }

  /** DURABLE replace of a path-based warehouse table: the replacement is
    * FULLY written to a `._swap` sibling before the original is touched,
    * then swapped in by rename — the read-modify-write rewrite shape
    * (mutable state slices: SCD2 current rows, compacted delta state)
    * without the in-place overwrite's data-loss window. An in-place
    * `mode("overwrite")` of a localCheckpoint-ed frame briefly holds the
    * ONLY copy in executor memory (localCheckpoint blocks die with the
    * executor); here the only copy is always on disk. The remaining
    * exposure is the delete→rename metadata window, which
    * [[recoverWarehouseSwap]] closes by rolling forward.
    */
  def replaceWarehouse(spark: SparkSession, warehouseDir: String,
      table: String, df: DataFrame, partitionCols: Seq[String] = Nil): Unit = {
    val live = new org.apache.hadoop.fs.Path(s"$warehouseDir/$table")
    val swap = new org.apache.hadoop.fs.Path(s"$warehouseDir/$table._swap")
    val w = df.write.mode("overwrite")
    (if (partitionCols.isEmpty) w else w.partitionBy(partitionCols: _*))
      .parquet(swap.toString)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(live, true)
    if (!fs.rename(swap, live))
      throw new java.io.IOException(
        s"replace swap failed: $swap -> $live (replacement data is at $swap)")
    // a path-level swap bypasses the write paths that invalidate the
    // session catalog's cached relation — if this path is ALSO registered
    // as a catalog table (bucketed state families), a later spark.table
    // read would list the deleted pre-swap files and fail persistently
    if (spark.catalog.tableExists(table)) spark.catalog.refreshTable(table)
    // ... and the shared FILE-LISTING cache: DataFrameWriter writes
    // invalidate the target path's cached leaf-file listing themselves,
    // but an fs.rename does not — without this, the very next
    // spark.read of the live path can serve the pre-swap listing and
    // fail FAILED_READ_FILE on the deleted files (found by the
    // warehouse contract kit's replace-from-self property)
    spark.catalog.refreshByPath(live.toString)
  }

  /** Read a warehouse table whose appended files carry DRIFTED schemas —
    * the 100 TB schema-evolution contract: parquet supports ADDITIVE
    * drift natively (new columns appear, old files read them as NULL),
    * so widening a table is a ZERO-rewrite operation — new appends just
    * carry the new column, and this read unions the schemas by name.
    * The plain [[readWarehouse]] takes the schema from a sample file and
    * silently DROPS columns absent there — use this reader on any table
    * that has ever widened. Renames/retypes/drops are NOT evolution (the
    * [[graft.core.SchemaGuard]] reject-by-default contract applies on
    * the write side); a retyped column fails this read loudly rather
    * than coercing.
    */
  def readWarehouseEvolved(spark: SparkSession, warehouseDir: String,
      table: String): DataFrame =
    spark.read.option("mergeSchema", "true")
      .parquet(s"$warehouseDir/$table")

  /** Complete a [[replaceWarehouse]] interrupted between its delete and
    * rename: if the live path is missing and a fully-written `._swap`
    * copy exists, the swap rolls forward. Call before reading or
    * rewriting a replace-managed table after a crash; a no-op otherwise.
    */
  def recoverWarehouseSwap(spark: SparkSession, warehouseDir: String,
      table: String): Boolean = {
    val live = new org.apache.hadoop.fs.Path(s"$warehouseDir/$table")
    val swap = new org.apache.hadoop.fs.Path(s"$warehouseDir/$table._swap")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // roll forward ONLY a COMPLETE stage (the parquet job's _SUCCESS
    // marker is its last artifact): live-missing + INCOMPLETE swap is
    // a first-sight overwrite that died mid-staging — there was never
    // a table, and renaming the partial stage in would mint one whose
    // exists() is true but whose read throws (found by the r13
    // crash-point sweep). Live-missing + complete swap is the
    // delete-committed replace window, the one case to roll forward.
    if (!fs.exists(live) && fs.exists(swap) &&
        fs.exists(new org.apache.hadoop.fs.Path(swap, "_SUCCESS"))) {
      val ok = fs.rename(swap, live)
      if (ok) spark.catalog.refreshByPath(live.toString) // see replaceWarehouse
      ok
    } else false
  }

  /** Training-shard export: the final sink of the curation pipeline.
    * Rows are assigned to `nShards` shards by id-hash and written
    * `partitionBy(shard)`; within each task the rows are sorted by an
    * independent id-hash, giving a deterministic pseudo-random global
    * shuffle (training order must not follow ingest/source order, and a
    * re-run must produce the identical layout — `df.sample`-style RNG
    * shuffles change under repartitioning). Shard assignment is the
    * partition-invariant [[graft.functions.Hashing.md5Long]], so shard
    * membership is a pure function of the data; TrainingShardSpec pins
    * layout and invariance.
    */
  def writeTrainingShards(df: DataFrame, idCol: String, outDir: String,
      nShards: Int): Unit = {
    import org.apache.spark.sql.functions._
    val h = graft.functions.Hashing.md5Long(col(idCol).cast("string"))
    val ord = graft.functions.Hashing.md5Long(
      concat(lit("ord:"), col(idCol).cast("string")))
    df.withColumn("shard", pmod(h, lit(nShards.toLong)))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), ord)
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }

  /** Integrity MANIFEST for a sharded export: one row per shard with its
    * row count and two order-insensitive id checksums (SUM and BIT_XOR
    * of the md5-derived id hash — sum catches duplicated/missing rows,
    * xor catches swapped ids that happen to preserve the sum). The
    * manifest is what a training job verifies BEFORE reading 100 TB of
    * shards: recompute per shard, compare |shards| rows. Deterministic
    * (md5 ids, integer folds), so it oracle-verifies.
    */
  def shardManifest(shards: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val h = graft.functions.Hashing.md5Long(col(idCol).cast("string"))
    // sum the hash MOD a ~2^30 prime so the fold stays inside exact long
    // range (ANSI sum would throw past 2^63) for any shard under ~10^9
    // rows — shards are file-sized by construction; xor never overflows
    shards.select(col("shard").cast("long").as("shard"), h.as("__h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        sum(pmod(col("__h"), lit(1000000007L))).cast("long").as("id_sum"),
        expr("bit_xor(__h)").as("id_xor"))
  }

  /** Verify a shard directory against its stored manifest: recompute
    * [[shardManifest]] and full-outer compare — empty result = intact;
    * otherwise one row per damaged/missing/extra shard with both sides'
    * figures. The verification cost is one id-column scan (column-pruned
    * parquet read), not a byte-level reread.
    */
  def verifyShards(shards: DataFrame, idCol: String,
      manifest: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val fresh = shardManifest(shards, idCol)
      .select(col("shard"), col("n_rows").as("got_rows"),
        col("id_sum").as("got_sum"), col("id_xor").as("got_xor"))
    val want = manifest.select(col("shard"), col("n_rows").as("want_rows"),
      col("id_sum").as("want_sum"), col("id_xor").as("want_xor"))
    fresh.join(want, Seq("shard"), "full_outer")
      .filter(!(col("got_rows") <=> col("want_rows")) ||
        !(col("got_sum") <=> col("want_sum")) ||
        !(col("got_xor") <=> col("want_xor")))
  }

  /** Reader for the driver test corpus (`TESTDATA.md`). `events.ts` has
    * shipped as a NANOSECOND parquet timestamp in some corpus generations
    * (rejected by Spark's vectorized reader — read as raw nanos via
    * `nanosAsLong` and floored to micros, matching the oracle's
    * `epoch_ns(ts)//1000`) and as a plain microsecond timestamp in others
    * (surfaces as TIMESTAMP_NTZ; cast to TimestampType — an identity on
    * the instant under the harness's UTC session timezone). Normalizing on
    * the observed SCHEMA keeps every events consumer working across
    * regenerations.
    */
  def testTable(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      import org.apache.spark.sql.functions.{col, expr}
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampType => raw
        case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** DEGENERATE-PARALLELISM guard for CPU-heavy narrow pipelines: when
    * the source exposes far fewer partitions than the cluster has cores
    * (the single-row-group parquet file — unsplittable no matter what
    * `maxPartitionBytes` says — or any tiny-file source feeding an
    * expensive per-row derivation: tokenize+shingle, codec decode,
    * synthetic rendering), hash-repartition on a stable key so the
    * derivation fans across the cluster. At healthy scan parallelism
    * (real corpora: thousands of splits) the guard is a NO-OP — it
    * never adds an exchange to a well-split 100 TB scan; it exists for
    * the genuinely skewed shape where input bytes are tiny but
    * downstream CPU is not. Hash (not round-robin) keeps placement a
    * pure function of the data — no retry-determinism sort, results
    * partition-invariant as every operator already requires.
    */
  def fanOut(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 4 < target) df.repartition(target, key)
    else df
  }

  // ------------------------------------------------------------------
  // Warehouse maintenance: file-sprawl ledger + TTL partition expiry
  // ------------------------------------------------------------------

  /** Per-(partition directory) file statistics of a warehouse table —
    * the FILE-SPRAWL ledger completing the maintenance-trigger family
    * (IVF drift, text-index drift, bloom occupancy): incremental
    * appends proliferate small files, and at warehouse scale that is
    * one task per KB-sized file plus listing pressure; this relation is
    * what a nightly job consults to decide WHERE to run
    * [[compactWarehouse]]/[[compactWarehouseBucketed]] instead of
    * rewriting everything on a timer.
    *
    * Driver-side recursive listing (metadata catalog work, the same
    * class as the object-store listing in
    * [[graft.core.Watermark]]) — rows are (relative dir, n_files,
    * bytes, small_files under `smallBytes`). No data is read.
    */
  def fileStats(spark: SparkSession, warehouseDir: String, table: String,
      smallBytes: Long): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val base = new org.apache.hadoop.fs.Path(s"$warehouseDir/$table")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows = scala.collection.mutable.Map
      .empty[String, (Long, Long, Long)].withDefaultValue((0L, 0L, 0L))
    if (fs.exists(base)) {
      val basePrefix = fs.makeQualified(base).toString
      val it = fs.listFiles(base, true)
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) {
          val rel = f.getPath.getParent.toString
            .stripPrefix(basePrefix).stripPrefix("/")
          val (n, b, s) = rows(rel)
          rows(rel) = (n + 1, b + f.getLen,
            s + (if (f.getLen < smallBytes) 1L else 0L))
        }
      }
    }
    rows.toSeq.map { case (d, (n, b, s)) => (d, n, b, s) }
      .toDF("part_dir", "n_files", "bytes", "small_files")
  }

  /** Partition directories whose file sprawl warrants compaction: more
    * than `maxFiles` files, or a majority of files under the small-file
    * bound. The trigger is a pure fold of [[fileStats]].
    */
  def needsCompaction(spark: SparkSession, warehouseDir: String,
      table: String, smallBytes: Long, maxFiles: Long)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    fileStats(spark, warehouseDir, table, smallBytes)
      .filter(col("n_files") > maxFiles ||
        col("small_files") * 2 > col("n_files"))
  }

  /** TTL RETENTION enforcement on a partitioned warehouse table: drop
    * the `partCol=value` directories in `expired` ATOMICALLY — a
    * manifest (`_ttl_manifest`, written then atomically renamed into
    * place) is the commit point; the directory deletes that follow are
    * idempotent metadata ops, and [[recoverExpiry]] rolls a crashed
    * delete pass forward from the manifest (the
    * [[graft.core.Merge]] stage-manifest-swap discipline). A reader
    * therefore sees either every expired partition or — after recovery
    * — none; never a torn subset with no record of intent.
    *
    * The caller computes `expired` from partition VALUES (e.g. date
    * strings older than the horizon) — a pure metadata decision, no
    * data scan.
    */
  def expirePartitions(spark: SparkSession, warehouseDir: String,
      table: String, partCol: String, expired: Seq[String]): Unit = {
    if (expired.isEmpty) return
    val base = new org.apache.hadoop.fs.Path(s"$warehouseDir/$table")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(base, "._ttl_manifest.tmp")
    val manifest = new org.apache.hadoop.fs.Path(base, "_ttl_manifest")
    val out = fs.create(tmp, true)
    out.write(expired.map(v => s"$partCol=$v").mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    if (!fs.rename(tmp, manifest))
      throw new java.io.IOException(s"ttl manifest commit failed: $manifest")
    expired.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(base, s"$partCol=$v"), true)
    }
    fs.delete(manifest, false)
  }

  /** Complete an [[expirePartitions]] interrupted after its manifest
    * commit: re-delete every listed directory and clear the manifest.
    * Safe to call unconditionally (no manifest → no-op); pre-commit
    * crashes left only a `.tmp` file, which is swept.
    */
  def recoverExpiry(spark: SparkSession, warehouseDir: String,
      table: String): Boolean = {
    val base = new org.apache.hadoop.fs.Path(s"$warehouseDir/$table")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base, "._ttl_manifest.tmp"), false)
    val manifest = new org.apache.hadoop.fs.Path(base, "_ttl_manifest")
    if (!fs.exists(manifest)) return false
    val in = fs.open(manifest)
    val dirs = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    in.close()
    dirs.filter(_.nonEmpty).foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(base, d), true)
    }
    fs.delete(manifest, false)
    true
  }
}
