package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, IntegerType, LongType,
  StringType, StructType}

import graft.io.ManifestVersioned

/** SQL surface for table MAINTENANCE — the two statements a SQL-only
  * operator needs to keep a manifest table healthy, in the spellings
  * Delta/lakehouse users already know:
  *
  * {{{
  *   OPTIMIZE t                      -- fold flagged partitions
  *                                   -- (sprawl / DVs / small files)
  *   OPTIMIZE t WHERE p = 'a'        -- scope maintenance to the
  *                                   -- predicate's (pruned) partitions
  *   OPTIMIZE t ZORDER BY (a, b)     -- rewrite ALL live partitions
  *                                   -- multi-dimensionally clustered
  *   VACUUM t                        -- reclaim history > 168h old
  *   VACUUM t RETAIN 24 HOURS        -- explicit retention
  *   VACUUM t [RETAIN n HOURS] DRY RUN  -- the report, nothing swept
  *   RESTORE t TO VERSION AS OF 3    -- roll the head back (new commit)
  *   RESTORE t TIMESTAMP AS OF '2026-08-15 00:00:00'
  *   DESCRIBE HISTORY t [LIMIT n]    -- the commit audit, newest first
  *   DESCRIBE DETAIL t               -- the one-row table card
  *   CREATE TABLE b SHALLOW CLONE t [VERSION AS OF 3]  -- zero-copy branch
  *   CREATE TABLE c DEEP CLONE t     -- materialized copy
  *   COPY INTO t FROM '/lake/in' FILEFORMAT = CSV
  *     PATTERN = '*.csv' FORMAT_OPTIONS ('header' = 'true')
  * }}}
  *
  * Spark's grammar has no node for either statement, so
  * [[GraftSqlParser]] (installed via `injectParser`) intercepts the
  * raw SQL text BEFORE the builtin parser — but only when the named
  * table is REGISTERED in this session ([[GraftSqlTables]]); anything
  * else falls through to the delegate, so ordinary statements (and
  * ordinary parse errors) are untouched. The commands delegate to the
  * engine paths that own the semantics ([[ManifestVersioned
  * .compactSuggested]] / [[ManifestVersioned.optimizeClustered]] /
  * [[ManifestVersioned.optimizeZOrderedMulti]] /
  * [[ManifestVersioned.vacuumOlderThan]]) — one code path with the
  * Scala API, same conflict detection, same retention planner.
  *
  * SQL `VACUUM` always passes a ONE-HOUR staging grace: the engine
  * API leaves `stagingGraceMs` to the caller (a test can pass 0), but
  * a SQL statement is an operator action that may run beside live
  * writers, and sweeping a concurrent writer's fresh `._stage.*` dir
  * would fail its commit for no reason.
  */
object GraftMaintenance {

  private val NameRe = """(?:`[^`]+`|[\w]+)(?:\.(?:`[^`]+`|[\w]+)){0,2}"""
  private val DescribeHistoryRe =
    ("""(?is)\s*DESC(?:RIBE)?\s+HISTORY\s+(""" + NameRe +
      """)\s*(?:LIMIT\s+(\d+))?\s*;?\s*""").r
  private val DescribeDetailRe =
    ("""(?is)\s*DESC(?:RIBE)?\s+DETAIL\s+(""" + NameRe +
      """)\s*;?\s*""").r
  private val CloneRe =
    ("""(?is)\s*CREATE\s+TABLE\s+(""" + NameRe +
      """)\s+(SHALLOW|DEEP)\s+CLONE\s+(""" + NameRe +
      """)\s*(?:VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""").r
  private val CopyIntoRe =
    ("""(?is)\s*COPY\s+INTO\s+(""" + NameRe +
      """)\s+FROM\s+'([^']+)'\s+FILEFORMAT\s*=\s*(\w+)""" +
      """(?:\s+PATTERN\s*=\s*'([^']+)')?""" +
      """(?:\s+FORMAT_OPTIONS\s*\(([^)]*)\))?\s*;?\s*""").r
  private val ReplaceWhereRe =
    ("""(?is)\s*INSERT\s+INTO\s+(""" + NameRe +
      """)\s+REPLACE\s+WHERE\s+(.+?)\s+((?:SELECT|WITH|TABLE|VALUES)\b.*)""").r
  private val OptimizeRe =
    """(?is)\s*OPTIMIZE\s+((?:`[^`]+`|[\w]+)(?:\.(?:`[^`]+`|[\w]+)){0,2})\s*(?:WHERE\s+(.+?)\s*)??(?:ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*""".r
  private val VacuumRe =
    """(?is)\s*VACUUM\s+((?:`[^`]+`|[\w]+)(?:\.(?:`[^`]+`|[\w]+)){0,2})\s*(?:RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS?)?\s*(DRY\s+RUN)?\s*;?\s*""".r
  private val RestoreVersionRe =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?((?:`[^`]+`|[\w]+)(?:\.(?:`[^`]+`|[\w]+)){0,2})\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val RestoreTimestampRe =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?((?:`[^`]+`|[\w]+)(?:\.(?:`[^`]+`|[\w]+)){0,2})\s+(?:TO\s+)?TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""".r

  private def unquote(name: String): String =
    if (name.startsWith("`")) name.stripPrefix("`").stripSuffix("`")
    else name

  /** Split a possibly-multipart, possibly-backticked table reference
    * into parts — `graft.prod.orders` and plain `orders` both resolve
    * through [[GraftSqlTables.lookupAny]] (session registration or
    * catalog address).
    */
  private def partsOf(name: String): Seq[String] =
    """`[^`]+`|[\w]+""".r.findAllIn(name).toSeq.map(unquote)

  /** The maintenance plan for `sqlText`, or None when the text is not
    * a maintenance statement over a graft-addressable table.
    */
  def parse(session: SparkSession, sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case CopyIntoRe(name0, src, fmt, pattern, opts) =>
        val parts = partsOf(name0)
        GraftSqlTables.lookupAny(session, parts).map { case (wh, t) =>
          val options = Option(opts).toSeq.flatMap(
            """'([^']*)'\s*=\s*'([^']*)'""".r.findAllMatchIn(_)
              .map(m => m.group(1) -> m.group(2)))
          GraftCopyIntoCommand(wh, t, parts.mkString("."), src,
            fmt.toLowerCase, Option(pattern), options.toMap)
        }
      case ReplaceWhereRe(name0, condSql, querySql) =>
        val parts = partsOf(name0)
        GraftSqlTables.lookupAny(session, parts).map { case (wh, t) =>
          GraftReplaceWhereCommand(wh, t, parts.mkString("."),
            condSql.trim, querySql.trim)
        }
      case OptimizeRe(name0, where, zcols) =>
        val parts = partsOf(name0)
        GraftSqlTables.lookupAny(session, parts).map { case (wh, t) =>
          val cols = Option(zcols).toSeq.flatMap(_.split(",").toSeq)
            .map(c => unquote(c.trim)).filter(_.nonEmpty)
          GraftOptimizeCommand(wh, t, parts.mkString("."), cols,
            Option(where).map(_.trim).filter(_.nonEmpty))
        }
      case VacuumRe(name0, hours, dry) =>
        val parts = partsOf(name0)
        GraftSqlTables.lookupAny(session, parts).map { case (wh, t) =>
          GraftVacuumCommand(wh, t, parts.mkString("."),
            Option(hours).map(_.toDouble).getOrElse(168.0),
            dryRun = dry != null)
        }
      case RestoreVersionRe(name0, v) =>
        val parts = partsOf(name0)
        GraftSqlTables.lookupAny(session, parts).map { case (wh, t) =>
          GraftRestoreCommand(wh, t, parts.mkString("."),
            Left(v.toInt))
        }
      case RestoreTimestampRe(name0, ts) =>
        val parts = partsOf(name0)
        GraftSqlTables.lookupAny(session, parts).map { case (wh, t) =>
          GraftRestoreCommand(wh, t, parts.mkString("."), Right(ts))
        }
      case DescribeHistoryRe(name0, limit) =>
        val parts = partsOf(name0)
        GraftSqlTables.lookupAny(session, parts).map { case (wh, t) =>
          GraftDescribeHistoryCommand(wh, t, parts.mkString("."),
            Option(limit).map(_.toInt))
        }
      case DescribeDetailRe(name0) =>
        val parts = partsOf(name0)
        GraftSqlTables.lookupAny(session, parts).map { case (wh, t) =>
          GraftDescribeDetailCommand(wh, t, parts.mkString("."))
        }
      case CloneRe(dst0, mode, src0, v) =>
        val srcParts = partsOf(src0)
        GraftSqlTables.lookupAny(session, srcParts).flatMap {
          case (wh, srcT) =>
            val dstParts = partsOf(dst0)
            // dst resolves like a CREATE target: a bare name lands in
            // the SOURCE's warehouse (clone references are relative —
            // same warehouse is the shallow contract anyway); a
            // catalog-addressed name must map to that same warehouse.
            val dst: Option[String] = dstParts match {
              case Seq(name) => Some(name)
              case Seq(cat, alias, table) =>
                GraftSqlTables.catalogDir(session, cat, alias)
                  .filter(_ == wh).map(_ => table)
              case Seq(cat, table) =>
                GraftSqlTables.catalogDir(session, cat, "default")
                  .filter(_ == wh).map(_ => table)
              case _ => None
            }
            dst.map(d => GraftCloneCommand(wh, srcT, d,
              srcParts.mkString("."), dstParts,
              deep = mode.equalsIgnoreCase("DEEP"),
              asOf = Option(v).map(_.toInt)))
        }
      case _ => None
    }
}

/** `DESC[RIBE] HISTORY t [LIMIT n]` — the commit audit as a relation
  * ([[ManifestVersioned.history]]: one row per retained version,
  * newest first — commit wall-clock, writer note, partition count,
  * recorded row total, partition layout). Manifest headers only: zero
  * data reads, zero listing, any table size.
  */
case class GraftDescribeHistoryCommand(warehouseDir: String,
    table: String, sqlName: String, limit: Option[Int])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("committed_at",
      org.apache.spark.sql.types.TimestampType)(),
    AttributeReference("note", StringType)(),
    AttributeReference("n_partitions", LongType, nullable = false)(),
    AttributeReference("n_rows", LongType)(),
    AttributeReference("part_cols", StringType)())

  override def run(spark: SparkSession): Seq[Row] = {
    require(ManifestVersioned
        .currentVersion(spark, warehouseDir, table).isDefined,
      s"$sqlName has no committed version")
    val h = ManifestVersioned.history(spark, warehouseDir, table)
    limit.map(h.limit).getOrElse(h).collect().toSeq
  }
}

/** `DESC[RIBE] DETAIL t` — the one-row table card (the Delta
  * `DESCRIBE DETAIL` shape): format, location, head version + commit
  * stamp, partition layout, live partition/row/byte totals, sidecar
  * policies, and the durable properties — every field from manifest
  * headers alone (rows/bytes honestly NULL when any live entry
  * predates the recorded counts).
  */
case class GraftDescribeDetailCommand(warehouseDir: String,
    table: String, sqlName: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("name", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("committed_at",
      org.apache.spark.sql.types.TimestampType)(),
    AttributeReference("partition_columns", StringType)(),
    AttributeReference("num_partitions", LongType, nullable = false)(),
    AttributeReference("num_rows", LongType)(),
    AttributeReference("size_bytes", LongType)(),
    AttributeReference("bloom_columns", StringType)(),
    AttributeReference("ndv_columns", StringType)(),
    AttributeReference("properties", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val v = ManifestVersioned
      .currentVersion(spark, warehouseDir, table)
      .getOrElse(throw new java.util.NoSuchElementException(
        s"$sqlName has no committed version"))
    val entries = ManifestVersioned
      .manifestEntries(spark, warehouseDir, table)
    val props = ManifestVersioned
      .tableProperties(spark, warehouseDir, table)
      .toSeq.sortBy(_._1)
      .map { case (k, value) => s"$k=$value" }.mkString(",")
    Seq(Row("graft", sqlName, s"$warehouseDir/$table.mv", v,
      ManifestVersioned.commitTimestamp(spark, warehouseDir, table)
        .map(new java.sql.Timestamp(_)).orNull,
      ManifestVersioned.partitionColumns(spark, warehouseDir, table)
        .map(_.mkString(",")).orNull,
      entries.size.toLong,
      ManifestVersioned.rowCountUpper(spark, warehouseDir, table)
        .map(java.lang.Long.valueOf).orNull,
      ManifestVersioned.byteSize(spark, warehouseDir, table)
        .map(java.lang.Long.valueOf).orNull,
      ManifestVersioned.bloomColumns(spark, warehouseDir, table)
        .map(_.mkString(",")).orNull,
      ManifestVersioned.ndvColumns(spark, warehouseDir, table)
        .map(_.mkString(",")).orNull,
      props))
  }
}

/** `CREATE TABLE dst SHALLOW|DEEP CLONE src [VERSION AS OF n]` — the
  * Delta clone spellings over [[ManifestVersioned.cloneTable]].
  * SHALLOW is the zero-copy branch (dst's v1 references src's
  * generation dirs relatively; copy-on-write divergence; the source-
  * vacuum caveat is cloneTable's documented contract); DEEP
  * materializes an independent table. The new name registers in the
  * session so follow-on SQL addresses it immediately; the durable
  * `graft.mergeKey` property travels with the cloned headers, so
  * fresh sessions recover DML-ability the same way registerAll does.
  */
case class GraftCloneCommand(warehouseDir: String, srcTable: String,
    dstTable: String, srcName: String, dstParts: Seq[String],
    deep: Boolean, asOf: Option[Int]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("source_version", IntegerType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val srcV = asOf.getOrElse(ManifestVersioned
      .currentVersion(spark, warehouseDir, srcTable)
      .getOrElse(throw new java.util.NoSuchElementException(
        s"$srcName has no committed version to clone")))
    val v = ManifestVersioned.cloneTable(spark, warehouseDir, srcTable,
      dstTable, asOf = asOf, deep = deep)
    // session-register bare dst names (catalog-addressed ones resolve
    // from configuration alone); the merge key rides the cloned
    // graft.mergeKey property
    if (dstParts.size == 1)
      GraftSqlTables.register(spark, warehouseDir, dstTable,
        keyCol = ManifestVersioned
          .tableProperties(spark, warehouseDir, dstTable)
          .get("graft.mergeKey"))
    Seq(Row(v, srcV))
  }
}

/** `OPTIMIZE` resolved against a manifest table. Without ZORDER:
  * measure-then-fold ([[ManifestVersioned.compactSuggested]] — only
  * partitions with generation sprawl, outstanding delete vectors, or
  * small-files disease rewrite; a healthy table is a no-op and no new
  * version). With `ZORDER BY (cols)`: every live partition rewrites
  * clustered ([[ManifestVersioned.optimizeClustered]] for one column,
  * [[ManifestVersioned.optimizeZOrderedMulti]] for 2+ — each rewritten
  * file owns a small hyper-rectangle of the key space, so the per-file
  * zone maps prune on ANY of the columns). Data is bit-identical
  * through either rewrite — layout is the only thing that changes.
  * Returns one row (committed version, partitions rewritten).
  */
case class GraftOptimizeCommand(warehouseDir: String, table: String,
    sqlName: String, zCols: Seq[String],
    where: Option[String] = None) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("rewritten_partitions", LongType,
      nullable = false)())

  /** The partition keys a `WHERE` clause scopes maintenance to:
    * zone-pruned off the manifest exactly like a read (conservative —
    * an unprunable predicate keeps every partition, which for
    * maintenance means "optimize everything the predicate COULD
    * touch", never less).
    */
  private def scopedKeys(spark: SparkSession): Option[Seq[String]] =
    where.map { w =>
      import org.apache.spark.sql.functions.expr
      val branches = ManifestVersioned
        .read(spark, warehouseDir, table).filter(expr(w))
        .queryExecution.analyzed
        .collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            graft.io.ZoneMaps.fromExpressionOr(f.condition)
        }.getOrElse(Seq(Nil))
      val all = ManifestVersioned
        .manifestEntries(spark, warehouseDir, table).keys.toSeq.sorted
      if (branches.isEmpty || branches.exists(_.isEmpty)) all
      else branches.flatMap(b => ManifestVersioned
        .readWhereEntries(spark, warehouseDir, table, b)
        .map(_._1)).distinct.sorted
    }

  override def run(spark: SparkSession): Seq[Row] = {
    require(ManifestVersioned
        .currentVersion(spark, warehouseDir, table).isDefined,
      s"$sqlName has no committed version to optimize")
    val scope = scopedKeys(spark)
    val rewritten: Long =
      if (zCols.isEmpty) {
        val suggested = ManifestVersioned.suggestCompaction(spark,
            warehouseDir, table)
          .select("part_key").collect().map(_.getString(0)).toSeq
        val picked = scope match {
          case None => suggested
          case Some(keys) => suggested.filter(keys.contains)
        }
        if (picked.nonEmpty) {
          val partCols = ManifestVersioned
            .partitionColumns(spark, warehouseDir, table)
            .getOrElse(throw new IllegalStateException(
              s"$sqlName records no #partcols header"))
          ManifestVersioned.compactPartitionsMulti(spark, warehouseDir,
            table, partCols, picked.map(ManifestVersioned.partValuesOf))
        }
        picked.size.toLong
      } else {
        val partCols = ManifestVersioned
          .partitionColumns(spark, warehouseDir, table)
          .getOrElse(throw new IllegalStateException(
            s"$sqlName records no #partcols header — OPTIMIZE needs it"))
        val schema = ManifestVersioned
          .manifestSchema(spark, warehouseDir, table)
          .getOrElse(throw new IllegalStateException(
            s"$sqlName records no #schema header"))
        zCols.foreach(c => require(schema.fieldNames.contains(c),
          s"ZORDER BY column '$c' is not in $sqlName's schema"))
        val values = scope.getOrElse(ManifestVersioned
            .manifestEntries(spark, warehouseDir, table).keys.toSeq.sorted)
          .map(ManifestVersioned.partValuesOf)
        if (values.nonEmpty) {
          if (zCols.size == 1)
            ManifestVersioned.optimizeClustered(spark, warehouseDir,
              table, partCols, values, zCols)
          else
            ManifestVersioned.optimizeZOrderedMulti(spark, warehouseDir,
              table, partCols, values, zCols)
        }
        values.size.toLong
      }
    val v = ManifestVersioned.currentVersion(spark, warehouseDir, table).get
    Seq(Row(v, rewritten))
  }
}

/** `VACUUM [RETAIN n HOURS]` resolved against a manifest table:
  * translate the time retention into a version count
  * ([[ManifestVersioned.retentionFor]] — every read-as-of instant
  * inside the window keeps resolving) and reclaim everything older,
  * with the one-hour staging grace (see [[GraftMaintenance]]).
  * Returns the reclaimed (kind, path) report — [[ManifestVersioned
  * .vacuumPlan]]'s dry-run rows, computed by the same planner
  * immediately before the sweep, so the statement's output IS what it
  * removed.
  */
case class GraftVacuumCommand(warehouseDir: String, table: String,
    sqlName: String, retainHours: Double,
    dryRun: Boolean = false) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("kind", StringType, nullable = false)(),
    AttributeReference("path", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    require(retainHours >= 0, "RETAIN must be >= 0 hours")
    require(ManifestVersioned
        .currentVersion(spark, warehouseDir, table).isDefined,
      s"$sqlName has no committed version to vacuum")
    val graceMs = 60L * 60 * 1000
    val since = System.currentTimeMillis() -
      (retainHours * 3600 * 1000).toLong
    val keep = ManifestVersioned.retentionFor(spark, warehouseDir, table,
      since)
    val report = ManifestVersioned.vacuumPlan(spark, warehouseDir, table,
      keep, graceMs).collect().toSeq
    // DRY RUN: the same planner's report, NOTHING swept — the operator
    // preview before an irreversible reclaim (the Delta spelling)
    if (!dryRun)
      ManifestVersioned.vacuum(spark, warehouseDir, table, keep, graceMs)
    report.map(r => Row(r.getString(0), r.getString(1)))
  }
}

/** `RESTORE [TABLE] t [TO] VERSION AS OF n | TIMESTAMP AS OF 'ts'` —
  * roll the table's HEAD back to a historical version as a NEW commit
  * ([[ManifestVersioned.restore]]: the old manifest's entries and
  * headers re-commit at head+1, so nothing is lost — the rolled-back
  * versions stay time-travelable and the restore itself is an audited,
  * restorable event). A timestamp resolves through
  * [[ManifestVersioned.versionAtTime]] (newest version at-or-before
  * the instant, wall-clock commit stamps). Returns (restored-to
  * version, new head version).
  */
case class GraftRestoreCommand(warehouseDir: String, table: String,
    sqlName: String, to: Either[Int, String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_version", IntegerType,
      nullable = false)(),
    AttributeReference("version", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val v = to match {
      case Left(n) => n
      case Right(ts) =>
        val millis = java.sql.Timestamp.valueOf(ts).getTime
        ManifestVersioned.versionAtTime(spark, warehouseDir, table, millis)
          .getOrElse(throw new java.util.NoSuchElementException(
            s"$sqlName has no version committed at or before $ts"))
    }
    require(ManifestVersioned.listVersions(spark, warehouseDir, table)
        .contains(v),
      s"version $v of $sqlName is not available (never committed, or " +
        "reclaimed by vacuum) — see the retained versions in " +
        s"${table}__history")
    val newHead = ManifestVersioned.restore(spark, warehouseDir, table, v)
    Seq(Row(v, newHead))
  }
}

/** `table_changes('t', from_version[, to_version])` — the change feed
  * as a SQL TABLE-VALUED FUNCTION (the Delta CDF spelling), installed
  * by [[graft.GraftExtensions]] via `injectTableFunction`. Emits the
  * engine's change relation ([[ManifestVersioned.readChangesSince]]):
  * one row per key-level change per version in [from, to] — columns
  * `version`, the key, `change_type` ∈ insert|update|delete, and
  * `old_<c>`/`new_<c>` per data column; the scan is partition-pruned
  * off the manifest diffs (untouched partitions contribute zero IO).
  * The table name resolves like every graft statement (session
  * registration or catalog multipart); the merge key comes from the
  * registration or the durable `graft.mergeKey` property. Versions
  * out of vacuum retention fail with the bootstrap instruction, not a
  * raw missing file ([[ManifestVersioned.earliestFeedVersion]]).
  */
object GraftTableChanges {

  def build(args: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : LogicalPlan = {
    require(args.size == 2 || args.size == 3,
      s"table_changes(table, from_version[, to_version]) takes 2 or 3 " +
        s"arguments, got ${args.size}")
    val spark = SparkSession.active
    def valOf(e: org.apache.spark.sql.catalyst.expressions.Expression,
        what: String): Any = {
      require(e.foldable, s"table_changes: $what must be a literal")
      e.eval()
    }
    val name = String.valueOf(valOf(args(0), "the table name"))
    val parts = name.split('.').toSeq
    val (wh, t) = GraftSqlTables.lookupAny(spark, parts).getOrElse(
      throw new java.util.NoSuchElementException(
        s"table_changes: '$name' is not a graft-addressable table " +
          "(register it in the session or use its catalog name)"))
    def intOf(e: org.apache.spark.sql.catalyst.expressions.Expression,
        what: String): Int = valOf(e, what) match {
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"table_changes: $what must be an integer, got $other")
    }
    val from = intOf(args(1), "from_version")
    val to = args.lift(2).map(intOf(_, "to_version"))
    require(from >= 1,
      "table_changes: from_version must be >= 1 (the changes OF " +
        "version v are the v-1 -> v diff; version 1's changes are the " +
        "bootstrap inserts)")
    val keyCol = GraftSqlTables.lookupKeyAny(spark, parts).getOrElse(
      throw new IllegalStateException(
        s"table_changes: '$name' records no merge key — register with " +
          "keyCol or SET TBLPROPERTIES ('graft.mergeKey' = '<col>')"))
    // the span [from, to] diffs manifests from-1 .. to; manifest 0
    // never existed (version 1's changes ARE the bootstrap inserts),
    // so from=1 is servable while version 1 is retained — only a
    // VACUUMED history pushes the earliest servable version up
    val earliest = ManifestVersioned.listVersions(spark, wh, t)
      .headOption.map(h => if (h == 1) 1 else h + 1)
    earliest.foreach(o => require(from >= o,
      s"table_changes: from_version $from of '$name' is out of vacuum " +
        s"retention (earliest servable version is $o) — consume a " +
        s"bootstrap snapshot of version $o instead"))
    ManifestVersioned.readChangesSince(spark, wh, t, from - 1, keyCol, to)
      .queryExecution.analyzed
  }
}

/** `ANALYZE TABLE t COMPUTE STATISTICS` resolved against a manifest
  * table — the ZERO-READ answer (Spark's own ANALYZE scans; the
  * manifest already knows): one row of table-level statistics from
  * headers and recorded counts alone. `n_rows`/`size_bytes` are NULL
  * when any live entry predates the recorded counts (honest, never
  * wrong); `rows_exact` is false while delete vectors make the count
  * an upper bound.
  */
case class GraftAnalyzeTableCommand(warehouseDir: String, table: String,
    sqlName: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("n_partitions", LongType, nullable = false)(),
    AttributeReference("n_rows", LongType)(),
    AttributeReference("size_bytes", LongType)(),
    AttributeReference("rows_exact", org.apache.spark.sql.types
      .BooleanType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val v = ManifestVersioned.currentVersion(spark, warehouseDir, table)
      .getOrElse(throw new java.util.NoSuchElementException(
        s"$sqlName has no committed version"))
    val exact = ManifestVersioned.rowCount(spark, warehouseDir, table)
    Seq(Row(v,
      ManifestVersioned.manifestEntries(spark, warehouseDir, table)
        .size.toLong,
      exact.orElse(ManifestVersioned.rowCountUpper(spark, warehouseDir,
        table)).map(java.lang.Long.valueOf).orNull,
      ManifestVersioned.byteSize(spark, warehouseDir, table)
        .map(java.lang.Long.valueOf).orNull,
      exact.isDefined))
  }
}

/** `ANALYZE TABLE t COMPUTE STATISTICS FOR [ALL] COLUMNS ...` — per-
  * column statistics from the manifest's zone stats, null counts and
  * NDV sketches, ZERO data reads: (column, min, max, null_count, ndv,
  * range_exact, ndv_exact). min/max render as strings (one schema for
  * every column type); NULL where the stats are honestly unknown
  * (unsupported type, pre-stats generations, no NDV policy).
  */
case class GraftAnalyzeColumnsCommand(warehouseDir: String, table: String,
    sqlName: String, cols: Option[Seq[String]], allColumns: Boolean)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("col_name", StringType, nullable = false)(),
    AttributeReference("min_value", StringType)(),
    AttributeReference("max_value", StringType)(),
    AttributeReference("null_count", LongType)(),
    AttributeReference("ndv", LongType)(),
    AttributeReference("range_exact", org.apache.spark.sql.types
      .BooleanType, nullable = false)(),
    AttributeReference("ndv_exact", org.apache.spark.sql.types
      .BooleanType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val schema = ManifestVersioned
      .manifestSchema(spark, warehouseDir, table)
      .getOrElse(throw new IllegalStateException(
        s"$sqlName records no #schema header — ANALYZE needs it"))
    val names = cols.getOrElse(schema.fieldNames.toSeq)
    names.foreach(c => require(schema.fieldNames.contains(c),
      s"ANALYZE column '$c' is not in $sqlName's schema"))
    import org.apache.spark.sql.functions.col
    val rangeRow = ManifestVersioned.columnRanges(spark, warehouseDir,
        table, names)
      .select(names.flatMap(c => Seq(col(s"min_$c").cast(StringType),
        col(s"max_$c").cast(StringType))) :+ col("is_exact"): _*)
      .head()
    val rangeExact = rangeRow.getBoolean(2 * names.size)
    val ndv = ManifestVersioned.columnNdv(spark, warehouseDir, table,
        names).collect()
      .map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))),
          !r.isNullAt(2) && r.getBoolean(2))).toMap
    names.zipWithIndex.map { case (c, i) =>
      val (nv, nvExact) = ndv.getOrElse(c, (null, false))
      Row(c,
        if (rangeRow.isNullAt(2 * i)) null else rangeRow.getString(2 * i),
        if (rangeRow.isNullAt(2 * i + 1)) null
        else rangeRow.getString(2 * i + 1),
        ManifestVersioned.nullCount(spark, warehouseDir, table, c)
          .map(java.lang.Long.valueOf).orNull,
        nv, rangeExact, nvExact)
    }
  }
}

/** `SHOW PARTITIONS t` resolved against a manifest table: one row per
  * LIVE partition of the head — the partition value (the columns'
  * `c=v` rendering, Spark's SHOW PARTITIONS shape), recorded row
  * count and byte size, and exactness (false while delete vectors
  * make the count an upper bound, NULL count for pre-stats
  * generations). Manifest-only: zero data reads, zero listing.
  */
case class GraftShowPartitionsCommand(warehouseDir: String,
    table: String, sqlName: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", StringType, nullable = false)(),
    AttributeReference("n_rows", LongType)(),
    AttributeReference("bytes", LongType, nullable = false)(),
    AttributeReference("is_exact", org.apache.spark.sql.types
      .BooleanType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val partCols = ManifestVersioned
      .partitionColumns(spark, warehouseDir, table)
      .getOrElse(throw new IllegalStateException(
        s"$sqlName records no #partcols header"))
    ManifestVersioned.manifestEntries(spark, warehouseDir, table)
      .toSeq.sortBy(_._1).map { case (k, e) =>
        val vs = ManifestVersioned.partValuesOf(k)
        Row(partCols.zip(vs).map { case (c, v) => s"$c=$v" }
            .mkString("/"),
          if (e.rows < 0) null else java.lang.Long.valueOf(e.rows),
          e.bytes,
          e.rows >= 0 && e.deletes.isEmpty)
      }
  }
}

/** `SHOW CREATE TABLE t` resolved against a manifest table: the
  * reproducible DDL — recorded schema (generated columns annotated in
  * a comment), partition layout, warehouse location, merge key, CHECK
  * constraints and user TBLPROPERTIES — reconstructed from manifest
  * headers alone. Running the emitted statement against an empty
  * warehouse recreates the table's shape (data travels via CLONE or
  * INSERT, as everywhere).
  */
case class GraftShowCreateTableCommand(warehouseDir: String,
    table: String, sqlName: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("createtab_stmt", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val schema = ManifestVersioned
      .manifestSchema(spark, warehouseDir, table)
      .getOrElse(throw new IllegalStateException(
        s"$sqlName records no #schema header"))
    val partCols = ManifestVersioned
      .partitionColumns(spark, warehouseDir, table).getOrElse(Nil)
    val props = ManifestVersioned
      .tableProperties(spark, warehouseDir, table)
    val gens = graft.io.GenCols.parse(props).map(_.genCol).toSet
    val checks = ManifestVersioned.checks(spark, warehouseDir, table)
    val colLines = schema.fields.map { f =>
      val gen = if (gens(f.name)) "  -- generated: " +
        props(graft.io.GenCols.Prefix + f.name) else ""
      s"  ${f.name} ${f.dataType.sql}$gen"
    } ++ checks.toSeq.sortBy(_._1).map { case (n, e) =>
      s"  CONSTRAINT $n CHECK ($e)"
    }
    val keyOpt = props.get("graft.mergeKey")
      .map(k => s", keyCol '$k'").getOrElse("")
    val tblProps = props.toSeq.sortBy(_._1)
      .map { case (k, v) => s"'$k' = '$v'" }
    val stmt =
      s"CREATE TABLE $table (\n${colLines.mkString(",\n")}\n)\n" +
        s"USING graft\nPARTITIONED BY (${partCols.mkString(", ")})\n" +
        s"OPTIONS (warehouse '$warehouseDir'$keyOpt)" +
        (if (tblProps.isEmpty) ""
         else s"\nTBLPROPERTIES (${tblProps.mkString(", ")})")
    Seq(Row(stmt))
  }
}

/** `INSERT INTO t REPLACE WHERE <cond> <query>` — predicate-scoped
  * atomic overwrite (the Delta `replaceWhere` spelling) over
  * [[ManifestVersioned.replaceWhere]]: rows satisfying the predicate
  * are replaced by the query's rows in ONE commit, and the manifest's
  * zone/bloom pruning decides which partitions are touched — a
  * date-range backfill rewrites the range's sliver, never the table.
  * Query columns resolve positionally against the recorded schema
  * (generated columns hidden, like INSERT); every query row must
  * itself satisfy the predicate (loud reject otherwise — the scope
  * contract). The predicate text ends at the first
  * SELECT/WITH/TABLE/VALUES keyword; a predicate containing a
  * subquery is not supported on this surface (use the engine API).
  */
case class GraftReplaceWhereCommand(warehouseDir: String, table: String,
    sqlName: String, condSql: String, querySql: String)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("touched_partitions", LongType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val schema = ManifestVersioned
      .manifestSchema(spark, warehouseDir, table)
      .getOrElse(throw new IllegalStateException(
        s"$sqlName records no #schema header — REPLACE WHERE needs it"))
    val genCols = ManifestVersioned
      .generatedColumns(spark, warehouseDir, table).map(_.genCol).toSet
    val q = spark.sql(querySql)
    val positional = schema.fields.toSeq
      .filterNot(f => genCols.contains(f.name))
    require(q.columns.length == positional.length,
      s"REPLACE WHERE query must produce ${positional.length} columns " +
        s"(${positional.map(_.name).mkString(", ")}), got " +
        s"${q.columns.length}")
    import org.apache.spark.sql.functions.{col, expr}
    val aligned = q.toDF(positional.map(_.name): _*)
      .select(positional.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*)
    val (touched, v) = ManifestVersioned.replaceWhere(spark,
      warehouseDir, table, expr(condSql), aligned,
      note = "sql replace where")
    Seq(Row(v, touched.size.toLong))
  }
}

/** `COPY INTO t FROM '<dir>' FILEFORMAT = CSV|PARQUET|JSON
  * [PATTERN = '<glob>'] [FORMAT_OPTIONS ('k' = 'v', ...)]` —
  * IDEMPOTENT incremental folder loading, the SQL spelling of the
  * engine's (and the reference's) watermark ingest model: list the
  * folder, load only files whose modification time is STRICTLY after
  * the table's recorded source watermark, append them, and advance
  * the watermark IN THE SAME COMMIT (`appendRows(extraProps)` — a
  * crash can never leave files loaded but unmarked, so re-running the
  * statement is always safe; a run with nothing new commits nothing).
  *
  * The watermark is a durable table property keyed by (source dir,
  * pattern), so several COPY sources feed one table independently.
  * Contract (the reference's own): source folders are append-only —
  * rewriting an already-loaded file in place re-loads it only if its
  * mtime moves forward, and equal-mtime late arrivals are skipped
  * (`incremental_etl_v1.py:74`'s strict `>`, reproduced faithfully).
  * Loaded frames align to the recorded schema BY NAME with ANSI casts
  * (CSV's strings cast to the recorded types and fail loudly on
  * junk); unknown columns reject; omitted columns load as NULL;
  * generated columns derive exactly like every other write.
  */
case class GraftCopyIntoCommand(warehouseDir: String, table: String,
    sqlName: String, srcDir: String, fileFormat: String,
    pattern: Option[String], formatOptions: Map[String, String])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("files_loaded", LongType, nullable = false)(),
    AttributeReference("rows_loaded", LongType, nullable = false)())

  private def wmKey: String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$srcDir ${pattern.getOrElse("")}".getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
    s"graft.copyWatermark.$tag"
  }

  override def run(spark: SparkSession): Seq[Row] = {
    require(Seq("csv", "parquet", "json").contains(fileFormat),
      s"COPY INTO supports CSV/PARQUET/JSON, got $fileFormat")
    // idempotent under CONCURRENCY, not just re-runs: the watermark
    // property this derivation read is an expectation on the commit
    // (checked per OCC attempt against the live head), so two
    // concurrent runs of the same statement can never both load the
    // same files — the loser's commit aborts with a property conflict
    // and this loop re-reads the advanced watermark and re-derives
    // (typically finding nothing fresh and committing nothing).
    val MaxDerives = 20
    var attempt = 0
    while (true) {
      try return runOnce(spark)
      catch {
        case e: graft.io.ConcurrentPropertyConflictException =>
          attempt += 1
          if (attempt >= MaxDerives) throw new java.io.IOException(
            s"COPY INTO $sqlName lost $MaxDerives watermark races in a " +
              "row — a livelocked concurrent loader?", e)
        // a RENAME/DROP COLUMN landed between this statement's schema
        // read and its commit: appendRows cannot retry (its fold is
        // pinned to stale names), but THIS level can — runOnce
        // re-reads the live schema and re-aligns the source files to
        // the new column language
        case e: graft.io.SchemaMappingConflictException =>
          attempt += 1
          if (attempt >= MaxDerives) throw new java.io.IOException(
            s"COPY INTO $sqlName lost $MaxDerives schema races in a " +
              "row — a livelocked concurrent schema changer?", e)
      }
    }
    sys.error("unreachable")
  }

  private def runOnce(spark: SparkSession): Seq[Row] = {
    val head = ManifestVersioned.currentVersion(spark, warehouseDir, table)
      .getOrElse(throw new java.util.NoSuchElementException(
        s"$sqlName has no committed version to copy into"))
    val schema = ManifestVersioned
      .manifestSchema(spark, warehouseDir, table)
      .getOrElse(throw new IllegalStateException(
        s"$sqlName records no #schema header — COPY INTO needs it"))
    val matcher = pattern.map(p => java.nio.file.FileSystems.getDefault
      .getPathMatcher(s"glob:$p"))
    val listed = graft.core.WatermarkStore.listFiles(spark, srcDir)
      .filter { case (name, _) => matcher.forall(_.matches(
        java.nio.file.Paths.get(name.split('/').last))) }
    val wmRaw = ManifestVersioned
      .tableProperties(spark, warehouseDir, table).get(wmKey)
    val wm = wmRaw.map(ms => new java.sql.Timestamp(ms.toLong))
    val fresh = graft.core.WatermarkStore.newFiles(listed, wm)
    if (fresh.isEmpty) return Seq(Row(head, 0L, 0L))
    val raw = spark.read.format(fileFormat)
      .options(formatOptions).load(fresh: _*)
    val unknown = raw.columns.filterNot(schema.fieldNames.contains)
    require(unknown.isEmpty,
      s"COPY INTO $sqlName: source carries unknown column(s) " +
        s"${unknown.mkString(", ")} — the recorded schema is " +
        s"(${schema.fieldNames.mkString(", ")})")
    val genCols = ManifestVersioned
      .generatedColumns(spark, warehouseDir, table).map(_.genCol).toSet
    import org.apache.spark.sql.functions.{col, lit}
    val aligned = raw.select(schema.fields.toSeq.flatMap { f =>
      if (raw.columns.contains(f.name))
        Some(col(f.name).cast(f.dataType).as(f.name))
      else if (genCols.contains(f.name)) None // derive at staging
      else Some(lit(null).cast(f.dataType).as(f.name))
    }: _*)
    val rows = aligned.count()
    val freshSet = fresh.toSet
    val newWm = listed.filter { case (n, _) => freshSet(n) }
      .map(_._2.getTime).max
    if (rows == 0L) {
      // fresh files with ZERO rows (header-only CSV, empty parquet):
      // appendRows would short-circuit on the empty batch WITHOUT
      // committing the watermark, re-listing and re-reading the same
      // files on every future run — advance it as a metadata-only
      // commit instead, under the same concurrency expectation
      val v = ManifestVersioned.setTableProperties(spark, warehouseDir,
        table, Map(wmKey -> newWm.toString),
        note = s"copy into: ${fresh.size} empty files",
        expectProps = Map(wmKey -> wmRaw))
      return Seq(Row(v, fresh.size.toLong, 0L))
    }
    // the drift pin covers DERIVATION-to-commit: the schema this
    // statement read and aligned the source files under is the
    // expectation, not appendRows' own entry snapshot — a DROP/RENAME
    // landing between the read above and appendRows' entry must
    // surface as SchemaMappingConflictException (caught by run()'s
    // re-derive loop), never as a silent column resurrection or an
    // uncaught physical-name reservation error
    val v = ManifestVersioned.appendRows(spark, warehouseDir, table,
      aligned, note = s"copy into: ${fresh.size} files",
      extraProps = Map(wmKey -> newWm.toString),
      expectProps = Map(wmKey -> wmRaw),
      expectSchema0 = Some(schema))
    Seq(Row(v, fresh.size.toLong, rows))
  }
}

/** Session parser wrapper installed by [[graft.GraftExtensions]]:
  * intercepts the maintenance statements ([[GraftMaintenance.parse]])
  * and delegates EVERYTHING else — plans, expressions, identifiers,
  * schemas — verbatim to the builtin parser.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
  extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftMaintenance.parse(session, sqlText)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)

  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)

  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)

  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)

  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
