package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel,
  UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode,
  LogicalPlan, Project, Statistics}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.io.{ManifestVersioned, ZoneMaps}

/** SQL surface for [[ManifestVersioned]] tables — `spark.sql("SELECT …
  * FROM my_table WHERE k = 5")` with the full manifest pruning stack,
  * the Spark-first shape: declare the table once
  * ([[GraftSqlTables.register]]), then plain SQL (or
  * `spark.table(name)`) resolves it, and the optimizer converts each
  * resolved filter into the zone → bloom → file pruned scan.
  *
  * Mechanics (all standard `SparkSessionExtensions` seams, installed
  * by [[graft.GraftExtensions]]):
  *  - [[ResolveGraftTables]] (resolution rule): an [[UnresolvedRelation]]
  *    whose single-part name is registered resolves to a
  *    [[GraftManifestRelation]] leaf carrying the HEAD version's
  *    recorded schema — re-read per query, so commits between queries
  *    are visible (MVCC read-latest semantics) and additive evolution
  *    just appears. Runs after the built-in resolvers, so real
  *    catalog tables and temp views keep precedence.
  *  - [[PruneGraftScans]] (optimizer rule, user batch — i.e. AFTER
  *    filter pushdown has parked each table's conjuncts directly above
  *    its relation and constant folding has normalized literals):
  *    `Filter(cond, rel)` extracts the implied
  *    [[graft.io.ZonePred]]s from the RESOLVED condition
  *    ([[ZoneMaps.fromExpression]]) and splices in the pruned scan,
  *    KEEPING the Filter as the residual — extraction misses cost
  *    pruning, never correctness. A bare relation (no predicate)
  *    splices the plain manifest read. Spliced attributes are
  *    re-aliased to the relation's original expression ids, so the
  *    surrounding plan stays resolved untouched.
  *
  * The relation also reports manifest [[Statistics]] (on-disk bytes +
  * recorded row counts, both zero-read) so join planning above it —
  * broadcast thresholds, reorder — sees real sizes even BEFORE the
  * splice.
  */
object GraftSqlTables {

  private def confKey(name: String) = s"spark.graft.sqltable.$name"

  /** Make a manifest table resolvable by `name` in this session's SQL.
    * The registration is session-conf-backed (survives `newSession()`
    * clones, dies with the session) and lazy — each query reads the
    * CURRENT head. `keyCol` declares the table's MERGE KEY (the upsert
    * key its nightly merges maintain one row per) — required for the
    * DML statements whose semantics are key-based (`MERGE INTO`,
    * `DELETE FROM`); read-only SQL works without it. Returns `name`.
    */
  def register(spark: SparkSession, warehouseDir: String, table: String,
      asName: Option[String] = None, keyCol: Option[String] = None): String = {
    val name = asName.getOrElse(table)
    require(!warehouseDir.contains('\t') && !table.contains('\t') &&
      keyCol.forall(!_.contains('\t')), "tab in a registration value")
    spark.conf.set(confKey(name),
      (Seq(warehouseDir, table) ++ keyCol).mkString("\t"))
    name
  }

  def unregister(spark: SparkSession, name: String): Unit =
    spark.conf.unset(confKey(name))

  /** Attach this session to EVERY manifest table under `warehouseDir`
    * in one call — the "open the warehouse" entry point a fresh
    * session (or a recovered driver) wants instead of N register
    * calls with out-of-band knowledge. Tables are discovered by their
    * `<name>.mv` directories (committed head required); each merge key
    * is recovered from the DURABLE `graft.mergeKey` table property
    * ([[graft.io.ManifestVersioned.tableProperties]] — recorded by
    * `CREATE TABLE ... OPTIONS (keyCol ...)` and surviving full
    * rewrites), so the DML/stream surfaces work immediately with no
    * session-conf folklore. Returns the registered names, sorted.
    */
  def registerAll(spark: SparkSession, warehouseDir: String)
      : Seq[String] = {
    val base = new org.apache.hadoop.fs.Path(warehouseDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Nil
    fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.endsWith(".mv"))
      .map(_.getPath.getName.stripSuffix(".mv")).sorted
      .flatMap { t =>
        if (graft.io.ManifestVersioned
            .currentVersion(spark, warehouseDir, t).isEmpty) None
        else Some(register(spark, warehouseDir, t,
          keyCol = graft.io.ManifestVersioned
            .tableProperties(spark, warehouseDir, t).get("graft.mergeKey")))
      }
  }

  /** Names currently registered in this session, with their
    * (warehouseDir, table) bindings — the SHOW-TABLES answer for the
    * graft surface.
    */
  def registered(spark: SparkSession): Map[String, (String, String)] =
    spark.conf.getAll.collect {
      case (k, _) if k.startsWith("spark.graft.sqltable.") =>
        val name = k.stripPrefix("spark.graft.sqltable.")
        name -> lookup(spark, name).get
    }

  private[plans] def lookup(spark: SparkSession, name: String)
      : Option[(String, String)] =
    spark.conf.getOption(confKey(name)).map { v =>
      val f = v.split("\t", -1)
      (f(0), f(1))
    }

  /** Is `cat` a session catalog name bound to [[graft.catalog
    * .GraftCatalog]]? The extension rules use this to resolve
    * CATALOG-ADDRESSED multipart names (`graft.<alias>.<table>`)
    * before the V2 machinery, with zero per-session registration —
    * configuration alone.
    */
  private def graftCatalog(spark: SparkSession, cat: String): Boolean =
    spark.conf.getOption(s"spark.sql.catalog.$cat")
      .contains(classOf[graft.catalog.GraftCatalog].getName)

  private[plans] def catalogDir(spark: SparkSession, cat: String,
      alias: String): Option[String] =
    if (!graftCatalog(spark, cat)) None
    else spark.conf
      .getOption(s"spark.sql.catalog.$cat.warehouse.$alias")
      .orElse(if (alias == "default")
        spark.conf.getOption(s"spark.sql.catalog.$cat.warehouse")
      else None)

  /** Resolve ANY graft-addressable name to (warehouseDir, table):
    * 1-part = session registration ([[register]]); `cat.alias.table` =
    * catalog-addressed (the alias's configured warehouse);
    * `cat.table` = the catalog's `default` alias. The table must have
    * a committed head (a catalog is a view over directories — an
    * unmaterialized name is not a table).
    */
  private[plans] def lookupAny(spark: SparkSession, parts: Seq[String])
      : Option[(String, String)] = parts match {
    case Seq(name) => lookup(spark, name)
    case Seq(cat, alias, table) =>
      catalogDir(spark, cat, alias)
        .filter(d => ManifestVersioned
          .currentVersion(spark, d, table).isDefined)
        .map(d => (d, table))
    case Seq(cat, table) =>
      catalogDir(spark, cat, "default")
        .filter(d => ManifestVersioned
          .currentVersion(spark, d, table).isDefined)
        .map(d => (d, table))
    case _ => None
  }

  /** The merge key for any graft-addressable name: the session
    * registration's (1-part names), else the DURABLE `graft.mergeKey`
    * table property — the same recovery [[registerAll]] performs, so
    * catalog-addressed DML works in a fresh session with zero code.
    */
  private[plans] def lookupKeyAny(spark: SparkSession,
      parts: Seq[String]): Option[String] = parts match {
    case Seq(name) => lookupKey(spark, name)
    case _ => lookupAny(spark, parts).flatMap { case (wh, t) =>
      ManifestVersioned.tableProperties(spark, wh, t).get("graft.mergeKey")
    }
  }

  /** The registered merge key of `name` (None = registered without
    * one — reads work, key-based DML refuses loudly).
    */
  private[graft] def lookupKey(spark: SparkSession, name: String)
      : Option[String] =
    spark.conf.getOption(confKey(name)).flatMap { v =>
      val f = v.split("\t", -1)
      if (f.length > 2 && f(2).nonEmpty) Some(f(2)) else None
    }

  /** The registered name bound to (warehouseDir, table), if any — the
    * reverse lookup the DML commands use to re-enter the SQL read path
    * (and its full pruning stack) for their probe scans.
    */
  private[plans] def nameOf(spark: SparkSession, warehouseDir: String,
      table: String): Option[String] =
    registered(spark).collectFirst {
      case (n, (wh, t)) if wh == warehouseDir && t == table => n
    }
}

/** Resolved leaf standing for "the head version of a manifest table":
  * carries the recorded schema as output attributes and zero-read
  * manifest statistics; replaced by [[PruneGraftScans]] before
  * physical planning.
  */
case class GraftManifestRelation(warehouseDir: String, table: String,
    asOf: Option[Int], output: Seq[Attribute]) extends LeafNode {

  /** ONE manifest parse per relation instance: the optimizer calls
    * computeStats repeatedly through planning (join reorder, broadcast
    * threshold checks, AQE), and the pre-r9 shape re-read AND re-parsed
    * the manifest on every call — twice (bytes + rows) — which for a
    * 100k-entry manifest meant megabytes of planning-time IO per query,
    * partially defeating the zero-listing goal. The head the stats
    * describe is pinned at first use; commits landing mid-planning only
    * shift ADVISORY numbers (reads resolve their own head), so caching
    * is safe. `@transient lazy`: never serialized, re-derived if a copy
    * crosses a boundary.
    */
  @transient private lazy val cachedStats: Statistics = {
    val spark = SparkSession.active
    // manifest-RECORDED bytes: zero listing per query (the pre-r8-late
    // listing fallback would touch every partition dir of a 100k-
    // partition table at PLANNING time); unknowable sizes report the
    // conservative maximum — never a guess that under-sizes a build
    // side
    val entries =
      try Some(ManifestVersioned
        .manifestEntries(spark, warehouseDir, table, asOf).values.toSeq)
      catch { case scala.util.control.NonFatal(_) => None }
    val bytes = entries
      .filter(_.forall(_.bytes >= 0))
      .map(es => BigInt(es.map(_.bytes).sum).max(BigInt(1)))
      .getOrElse(BigInt(Long.MaxValue))
    // recorded rows are an UPPER bound under outstanding delete vectors
    // — the safe direction for a size gate (matches rowCountUpper)
    val rows = entries.filter(_.forall(_.rows >= 0))
      .map(es => BigInt(es.map(_.rows).sum))
    Statistics(sizeInBytes = bytes, rowCount = rows)
  }

  override def computeStats(): Statistics = cachedStats
}

/** Resolution: registered single-part names → [[GraftManifestRelation]]
  * under the head version's recorded schema.
  */
class ResolveGraftTables(session: SparkSession) extends Rule[LogicalPlan] {

  private def registered(u: UnresolvedRelation): Option[(String, String)] =
    if (u.multipartIdentifier.size == 1)
      GraftSqlTables.lookup(session, u.multipartIdentifier.head)
    else None

  private def relation(wh: String, t: String, asOf: Option[Int])
      : GraftManifestRelation = {
    val schema = ManifestVersioned.manifestSchema(session, wh, t, asOf)
      .getOrElse(throw new IllegalStateException(
        s"registered graft table $t records no #schema header"))
    GraftManifestRelation(wh, t, asOf,
      schema.fields.toSeq.map(f =>
        AttributeReference(f.name, f.dataType, f.nullable)()))
  }

  /** `TIMESTAMP AS OF <expr>` → the newest version at-or-before the
    * instant ([[ManifestVersioned.versionAtTime]]'s contract). The
    * parser hands a literal: TIMESTAMP-typed (internal micros) or a
    * string (parsed as a wall-clock in the JVM zone — UTC everywhere
    * in this engine, the build-level invariant).
    */
  private def millisOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, dt)
        if dt == org.apache.spark.sql.types.TimestampType ||
          dt == org.apache.spark.sql.types.TimestampNTZType =>
      Math.floorDiv(v, 1000L)
    case org.apache.spark.sql.catalyst.expressions.Literal(s, dt)
        if dt == org.apache.spark.sql.types.StringType && s != null =>
      java.sql.Timestamp.valueOf(s.toString).getTime
    case other => throw new IllegalArgumentException(
      s"TIMESTAMP AS OF needs a timestamp or string literal, got $other")
  }

  /** `<name>__history` / `__files` / `__stats` resolve to the table's
    * AUDIT relations (commit history, per-partition file profile,
    * per-partition row counts) — all manifest-metadata-only, so
    * `SELECT * FROM t__history` costs no data reads. The suffix parse
    * only fires when the BASE name is registered, so ordinary tables
    * whose names merely end in `__stats` are untouched.
    */
  private def audit(name: String): Option[org.apache.spark.sql.DataFrame] = {
    val i = name.lastIndexOf("__")
    if (i <= 0) return None
    val (base, kind) = (name.substring(0, i), name.substring(i + 2))
    GraftSqlTables.lookup(session, base).flatMap { case (wh, t) =>
      kind match {
        case "history" => Some(ManifestVersioned.history(session, wh, t))
        case "files" =>
          Some(ManifestVersioned.partitionFileStats(session, wh, t))
        case "stats" =>
          Some(ManifestVersioned.partitionRowStats(session, wh, t))
        case _ => None
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case RelationTimeTravel(u: UnresolvedRelation, ts, v)
        if registered(u).isDefined =>
      val (wh, t) = registered(u).get
      val asOf = v.map(_.toInt).orElse(ts.map(e =>
        ManifestVersioned.versionAtTime(session, wh, t, millisOf(e))
          .getOrElse(throw new java.util.NoSuchElementException(
            s"$t has no version committed at or before the requested instant"))))
      relation(wh, t, asOf)
    case u: UnresolvedRelation if registered(u).isDefined =>
      val (wh, t) = registered(u).get
      relation(wh, t, None)
    case u: UnresolvedRelation if u.multipartIdentifier.size > 1 &&
        GraftSqlTables.lookupAny(session, u.multipartIdentifier)
          .isDefined =>
      // catalog-addressed multipart name (graft.<alias>.<table>):
      // resolve straight to the engine relation — configuration-only,
      // no per-session registration (see graft.catalog.GraftCatalog)
      val (wh, t) = GraftSqlTables
        .lookupAny(session, u.multipartIdentifier).get
      relation(wh, t, None)
    case r: org.apache.spark.sql.execution.datasources.v2
        .DataSourceV2Relation
        if r.table.isInstanceOf[graft.catalog.GraftTable] =>
      // the builtin resolver won the race and produced the V2 handle —
      // swap in the engine relation (the Delta pattern: the catalog
      // serves metadata, the extension owns the plan), preserving the
      // V2 relation's attribute ids so the surrounding plan stays
      // resolved
      val gt = r.table.asInstanceOf[graft.catalog.GraftTable]
      val rel = relation(gt.warehouseDir, gt.table, None)
      val byName = rel.output.map(a => a.name -> a).toMap
      Project(r.output.map(o =>
        Alias(byName(o.name), o.name)(exprId = o.exprId)), rel)
    case u: UnresolvedRelation if u.multipartIdentifier.size == 1 &&
        audit(u.multipartIdentifier.head).isDefined =>
      // audit relations are driver-computed and tiny: the resolved
      // DataFrame's plan splices in directly (fresh leaf — parent
      // attributes resolve against its output)
      audit(u.multipartIdentifier.head).get.queryExecution.analyzed
  }
}

/** Optimizer: convert each (filtered) [[GraftManifestRelation]] into
  * the pruned concrete scan. Runs in the user-provided batch — filter
  * pushdown and constant folding have already normalized the tree, so
  * the table's own conjuncts sit directly above the leaf.
  */
class PruneGraftScans(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformDown {
    // METADATA-ONLY aggregates: an ungrouped count(*)/count(col)/
    // min/max over the bare relation answers from the manifest when —
    // and only when — the recorded stats are EXACT (every entry
    // carries counts/ranges, no outstanding delete vectors; the same
    // honesty ledger rowCount/columnRanges keep). `SELECT count(*)
    // FROM a 100 TB table` then plans ZERO files. Any unsupported
    // shape (sum, distinct, filters, group-bys) or inexact stats
    // leaves the plan alone — the ordinary pruned scan answers.
    case agg @ org.apache.spark.sql.catalyst.plans.logical.Aggregate(
        Seq(), aggExprs, BareRelation(g), _) =>
      metaAggregate(g, aggExprs) match {
        case Some(answer) =>
          val child = answer.queryExecution.optimizedPlan
          Project(agg.output.zip(child.output).map { case (o, n) =>
            Alias(n, o.name)(exprId = o.exprId) }, child)
        case None => agg // fall through: the child case splices a scan
      }
    case Filter(cond, g: GraftManifestRelation) =>
      // OR-aware: a top-level OR of conjunct arms prunes with the union
      // of per-branch survivors (date-range-union shape); a single
      // branch degenerates to the plain conjunct path
      val branches = ZoneMaps.fromExpressionOr(cond)
      val (scan, allPruned) = ManifestVersioned.readPrunedOr(
        session, g.warehouseDir, g.table, branches, g.asOf)
      if (allPruned)
        // metadata DISPROVED every partition for predicates the whole
        // condition implies ⇒ provably zero matching rows
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation(g.output)
      else Filter(cond, splice(g, scan))
    case g: GraftManifestRelation =>
      splice(g,
        ManifestVersioned.read(session, g.warehouseDir, g.table, g.asOf))
  }

  /** The relation itself, or behind the pass-through Project column
    * pruning inserts under an Aggregate (attribute-only — any computed
    * projection means the aggregate no longer reads raw columns and
    * the metadata answer would be wrong).
    */
  private object BareRelation {
    def unapply(p: LogicalPlan): Option[GraftManifestRelation] = p match {
      case g: GraftManifestRelation => Some(g)
      case Project(projList, g: GraftManifestRelation)
          if projList.forall(_.isInstanceOf[AttributeReference]) => Some(g)
      case _ => None
    }
  }

  /** The 1-row metadata answer for an ungrouped aggregate list, or
    * None when any expression is unsupported or any needed stat is
    * inexact. Supported: `count(<literal>)` (= count(*), exact row
    * counts), `count(col)` (rows − the recorded null count),
    * `min(col)` / `max(col)` (the zone-map fold, via [[ManifestVersioned
    * .columnRanges]]'s typed rendering and exactness ledger).
    */
  private def metaAggregate(g: GraftManifestRelation,
      aggExprs: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression])
      : Option[org.apache.spark.sql.DataFrame] = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference,
      Literal, NamedExpression}
    import org.apache.spark.sql.catalyst.expressions.aggregate._
    import org.apache.spark.sql.functions.{lit, col => fcol}
    lazy val rowsOpt =
      ManifestVersioned.rowCount(session, g.warehouseDir, g.table, g.asOf)
    // one columnRanges call for every min/max column, exactness-gated
    val mmCols = aggExprs.flatMap {
      case Alias(org.apache.spark.sql.catalyst.expressions.aggregate
          .AggregateExpression(Min(a: AttributeReference), _, false, None, _),
          _) => Seq(a.name)
      case Alias(org.apache.spark.sql.catalyst.expressions.aggregate
          .AggregateExpression(Max(a: AttributeReference), _, false, None, _),
          _) => Seq(a.name)
      case _ => Nil
    }.distinct
    lazy val rangeRow: Option[org.apache.spark.sql.Row] =
      if (mmCols.isEmpty) None
      else try {
        val r = ManifestVersioned.columnRanges(session, g.warehouseDir,
          g.table, mmCols, g.asOf).head()
        if (r.getBoolean(r.length - 1)) Some(r) else None
      } catch { case scala.util.control.NonFatal(_) => None }
    def typed(v: Any, a: AttributeReference): org.apache.spark.sql.Column =
      (if (v == null) lit(null) else lit(v)).cast(a.dataType)
    val cols = aggExprs.map {
      case Alias(AggregateExpression(fn, _, false, None, _), name) =>
        fn match {
          case Count(Seq(l: Literal)) if l.value != null =>
            rowsOpt.map(n => lit(n).as(name))
          case Count(Seq(a: AttributeReference)) =>
            for {
              rows <- rowsOpt
              nulls <- ManifestVersioned.nullCount(session, g.warehouseDir,
                g.table, a.name, g.asOf)
            } yield lit(rows - nulls).as(name)
          case Min(a: AttributeReference) =>
            rangeRow.map(r => typed(r.getAs[Any](s"min_${a.name}"), a)
              .as(name))
          case Max(a: AttributeReference) =>
            rangeRow.map(r => typed(r.getAs[Any](s"max_${a.name}"), a)
              .as(name))
          case _ => None
        }
      case _ => None
    }
    if (cols.forall(_.isDefined))
      Some(session.range(1).select(cols.map(_.get): _*))
    else None
  }

  /** Re-alias the concrete scan's output to the relation's original
    * attribute ids (matched by name — the scan reads the recorded
    * schema, the relation's attributes ARE the recorded schema), so
    * everything above stays resolved. The subtree is the scan's
    * OPTIMIZED plan: this rule runs in the user batch, after the outer
    * optimizer's finish-analysis/operator batches — a merely-analyzed
    * subtree would carry RuntimeReplaceable expressions (e.g. the DV
    * anti-join's `encode`) that nothing downstream would replace, and
    * physical codegen would refuse them. The inner optimization cannot
    * recurse here: the subtree contains no GraftManifestRelation.
    */
  private def splice(g: GraftManifestRelation,
      scan: org.apache.spark.sql.DataFrame): LogicalPlan = {
    val child = scan.queryExecution.optimizedPlan
    val byName = child.output.map(a => a.name -> a).toMap
    Project(g.output.map(o =>
      Alias(byName(o.name), o.name)(exprId = o.exprId)), child)
  }
}
