package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute,
  UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction,
  DeleteFromTable, InsertIntoStatement, InsertStarAction, LogicalPlan,
  MergeAction, MergeIntoTable, SubqueryAlias, UpdateStarAction,
  UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{col, lit, when}
import org.apache.spark.sql.graftbridge.DslBridge
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.io.ManifestVersioned

/** SQL DML over registered manifest tables — the reference's whole job
  * (`incremental_etl_v1.py:120-181` is one conceptual MERGE) expressible
  * as the statement it is:
  *
  *   MERGE INTO wh USING changes s ON wh.id = s.id
  *     WHEN MATCHED AND s.is_deleted THEN DELETE
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *
  *   UPDATE wh SET <col> = <expr>, ... [WHERE <cond>]
  *   DELETE FROM wh WHERE <cond>
  *   INSERT INTO / INSERT OVERWRITE wh SELECT ...
  *   TRUNCATE TABLE wh
  *
  * plus the DDL lifecycle (CREATE TABLE [AS SELECT] / DROP TABLE
  * [PURGE] — see [[GraftDdl]]), resolved by the same early rule.
  *
  * [[ResolveGraftDml]] rewrites the parsed statements (Spark's own
  * `MergeIntoTable` / `DeleteFromTable` / `InsertIntoStatement` nodes)
  * into these runnable commands, each delegating to the engine API that
  * owns the semantics — [[ManifestVersioned.mergeVersionedMulti]] (in
  * ANSI source-wins mode), [[ManifestVersioned.deleteRowsLocate]],
  * [[ManifestVersioned.appendRows]] / [[ManifestVersioned.writeDeltaMulti]]
  * — so SQL and the DataFrame API are ONE code path with one
  * concurrency story (expectation-carrying commits, conflict re-run).
  *
  * The rule is injected into the HINT-resolution batch (it runs BEFORE
  * the Resolution batch), for two reasons rooted in how the builtin
  * analyzer treats DML: `InsertIntoStatement` over an uncataloged name
  * fails FAST in builtin resolution (our swap must win the race), and
  * a resolved-target `MergeIntoTable` gets its `UPDATE SET *` star-
  * expanded into per-column assignments this surface would then have
  * to reject. Intercepting while the target is still an
  * [[UnresolvedRelation]] sidesteps both. Statement conditions are
  * captured as [[Column]]s (attribute names re-resolve against the
  * frames the commands build) — never as raw `Expression` fields,
  * which CheckAnalysis would walk and reject as unresolved.
  *
  * Supported shapes (everything else rejects LOUDLY at resolution, with
  * the DataFrame-API spelling in the message — silent semantic drift
  * from ANSI would be worse than a missing feature):
  *  - MERGE: any first-match-wins chain of `WHEN MATCHED [AND c] THEN
  *    UPDATE SET *` / `WHEN MATCHED [AND c] THEN DELETE`, any chain of
  *    `WHEN NOT MATCHED [AND c] THEN INSERT *`, plus `WHEN NOT MATCHED
  *    BY SOURCE [AND c] THEN DELETE` — a matched/unmatched row hitting
  *    no clause leaves the target untouched (ANSI). Clause conditions
  *    evaluate over the SOURCE row (the NOT-MATCHED-BY-SOURCE
  *    condition, which has no source row, over the TARGET row); ON
  *    must be a single same-named key equality. `UPDATE SET *` takes
  *    the FULL source row (extra source columns evolve the schema
  *    additively — exactly how the reference's CDC op columns land in
  *    its warehouse); column-list assignments stay DataFrame-API-only.
  *  - UPDATE: plain-column assignments (values may reference the
  *    pre-update row), any predicate; assigning the merge key rejects
  *    (a key change is a delete+insert). Pruned matching-row scan →
  *    one atomic source-wins merge (copy-on-write).
  *  - DELETE: any row predicate; rows are erased BY KEY (the table's
  *    registered merge key), which equals row erasure under the
  *    one-row-per-key invariant the merge surface maintains.
  *  - INSERT: positional or column-list, static PARTITION specs;
  *    INTO = append ([[ManifestVersioned.appendRows]]), OVERWRITE =
  *    dynamic partition replace (the house writeDelta contract — only
  *    the partitions the rows land in are replaced).
  */
class ResolveGraftDml(session: SparkSession) extends Rule[LogicalPlan] {

  /** A DML target over a REGISTERED name (possibly aliased), while
    * still unresolved — (sql name, warehouseDir, table, alias).
    */
  private object Target {
    def unapply(p: LogicalPlan)
        : Option[(String, String, String, Option[String])] = p match {
      case u: UnresolvedRelation if u.multipartIdentifier.size == 1 =>
        val name = u.multipartIdentifier.head
        GraftSqlTables.lookup(session, name).map { case (wh, t) =>
          (name, wh, t, None)
        }
      case SubqueryAlias(id, u: UnresolvedRelation)
          if u.multipartIdentifier.size == 1 =>
        val name = u.multipartIdentifier.head
        GraftSqlTables.lookup(session, name).map { case (wh, t) =>
          (name, wh, t, Some(id.name))
        }
      case _ => None
    }
  }

  /** A MERGE's matched-action list as the first-match-wins CHAIN the
    * command classifies source rows with: `("U"|"D", optional source-row
    * condition)` per clause, in statement order. Supported actions are
    * `UPDATE SET * [AND c]` and `DELETE [AND c]` — conditions evaluate
    * over the SOURCE row (ANSI allows target references too; those
    * reject loudly in [[GraftDml.bareAttrs]] rather than silently
    * meaning the wrong side).
    */
  private def matchedChainOf(actions: Seq[MergeAction],
      srcAlias: Set[String], tgtAlias: Set[String])
      : Seq[(String, Option[Column])] = actions.map {
    case UpdateStarAction(c) =>
      ("U", c.map(x => DslBridge.column(GraftDml.bareAttrs(x, srcAlias,
        tgtAlias, "MERGE WHEN MATCHED ... UPDATE condition"))))
    case DeleteAction(c) =>
      ("D", c.map(x => DslBridge.column(GraftDml.bareAttrs(x, srcAlias,
        tgtAlias, "MERGE WHEN MATCHED ... DELETE condition"))))
    case other => throw new IllegalArgumentException(
      s"unsupported MERGE matched action: $other — this surface " +
        "supports WHEN MATCHED [AND cond] THEN UPDATE SET * and " +
        "WHEN MATCHED [AND cond] THEN DELETE (column assignments: " +
        "use the DataFrame API, e.g. mergeVersionedMulti)")
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case DeleteFromTable(Target(name, wh, t, alias), cond) =>
      val keyCol = GraftSqlTables.lookupKey(session, name)
        .getOrElse(throw new IllegalArgumentException(
          s"DELETE FROM $name needs the table's merge key — register " +
            "with GraftSqlTables.register(..., keyCol = Some(\"<key>\")) " +
            "(key-based delete vectors are how the engine erases rows)"))
      // qualified refs in a single-table DELETE are unambiguous —
      // allow the table name/alias as qualifier, then re-resolve bare
      GraftDeleteCommand(wh, t, name, keyCol,
        DslBridge.column(GraftDml.bareAttrs(cond,
          allowed = Set(name, t) ++ alias, reject = Set.empty,
          "DELETE WHERE condition")))
    case m: MergeIntoTable
        if Target.unapply(m.targetTable).isDefined =>
      val (name, wh, t, alias) = Target.unapply(m.targetTable).get
      val keyCol = GraftDml.mergeKeyOf(m.mergeCondition)
      GraftSqlTables.lookupKey(session, name).foreach(k =>
        require(k == keyCol,
          s"MERGE ON equates '$keyCol' but $name is registered with " +
            s"merge key '$k' — merging on a non-key column would " +
            "violate the one-row-per-key invariant"))
      val srcAlias: Set[String] = m.sourceTable match {
        case SubqueryAlias(id, _) => Set(id.name)
        case u: UnresolvedRelation => Set(u.multipartIdentifier.last)
        case _ => Set.empty
      }
      val tgtAlias = alias.toSet ++ Set(name, t)
      val matchedChain = matchedChainOf(m.matchedActions, srcAlias,
        tgtAlias)
      val insertChain: Seq[Option[Column]] = m.notMatchedActions.map {
        case InsertStarAction(c) =>
          c.map(x => DslBridge.column(GraftDml.bareAttrs(x, srcAlias,
            tgtAlias, "MERGE WHEN NOT MATCHED ... INSERT condition")))
        case other => throw new IllegalArgumentException(
          s"unsupported MERGE not-matched action: $other — this " +
            "surface supports WHEN NOT MATCHED [AND cond] THEN " +
            "INSERT * (column-list INSERT: use the DataFrame API)")
      }
      // NOT MATCHED BY SOURCE has no source row — its condition
      // evaluates over the TARGET row (qualifier policing flips)
      val nmbsDelete: Option[Option[Column]] =
        m.notMatchedBySourceActions match {
          case Seq() => None
          case Seq(DeleteAction(c)) => Some(c.map(x =>
            DslBridge.column(GraftDml.bareAttrs(x, tgtAlias, srcAlias,
              "MERGE WHEN NOT MATCHED BY SOURCE ... DELETE condition"))))
          case other => throw new IllegalArgumentException(
            s"unsupported MERGE not-matched-by-source actions: $other " +
              "— this surface supports WHEN NOT MATCHED BY SOURCE " +
              "[AND cond] THEN DELETE (UPDATE by source absence: use " +
              "the DataFrame API)")
        }
      require(matchedChain.nonEmpty || insertChain.nonEmpty ||
        nmbsDelete.isDefined, "MERGE with no supported action")
      GraftMergeCommand(wh, t, name, keyCol, m.sourceTable, matchedChain,
        insertChain, nmbsDelete)
    case UpdateTable(Target(name, wh, t, alias), assignments, cond) =>
      val keyCol = GraftSqlTables.lookupKey(session, name)
        .getOrElse(throw new IllegalArgumentException(
          s"UPDATE $name needs the table's merge key — register with " +
            "GraftSqlTables.register(..., keyCol = Some(\"<key>\")) " +
            "(updated rows replace their key through the merge path)"))
      val allowed = Set(name, t) ++ alias
      val sets = assignments.map { a =>
        val target = GraftDml.bareAttrs(a.key, allowed, Set.empty,
          "UPDATE SET target column") match {
          case u: UnresolvedAttribute if u.nameParts.size == 1 =>
            u.nameParts.head
          case other => throw new IllegalArgumentException(
            s"UPDATE SET target must be a plain column, got $other " +
              "(nested-field assignment: use the DataFrame API)")
        }
        require(target != keyCol,
          s"UPDATE SET may not assign the merge key '$keyCol' — a key " +
            "change is a delete+insert; express it as MERGE or " +
            "DELETE + INSERT")
        target -> DslBridge.column(GraftDml.bareAttrs(a.value, allowed,
          Set.empty, "UPDATE SET value"))
      }
      require(sets.map(_._1).distinct.size == sets.size,
        "UPDATE SET assigns the same column twice")
      GraftUpdateCommand(wh, t, name, keyCol, sets,
        cond.map(c => DslBridge.column(GraftDml.bareAttrs(c, allowed,
          Set.empty, "UPDATE WHERE condition"))))
    case c: org.apache.spark.sql.catalyst.plans.logical.CreateTableAsSelect
        if GraftDdl.isGraft(c.tableSpec) =>
      val spec = c.tableSpec.asInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.UnresolvedTableSpec]
      val (wh, keyCol) = GraftDdl.specOptions(session, spec)
      val t = GraftDdl.singlePartName(c.name match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier =>
          u.nameParts
        case other => throw new IllegalArgumentException(
          s"unexpected CREATE TABLE name shape: $other")
      })
      GraftCreateTableCommand(wh, t,
        GraftDdl.identityPartCols(c.partitioning), keyCol, Some(c.query),
        None, c.ignoreIfExists)
    case c: org.apache.spark.sql.catalyst.plans.logical.CreateTable
        if GraftDdl.isGraft(c.tableSpec) =>
      val spec = c.tableSpec.asInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.UnresolvedTableSpec]
      val (wh, keyCol) = GraftDdl.specOptions(session, spec)
      val t = GraftDdl.singlePartName(c.name match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier =>
          u.nameParts
        case other => throw new IllegalArgumentException(
          s"unexpected CREATE TABLE name shape: $other")
      })
      GraftCreateTableCommand(wh, t,
        GraftDdl.identityPartCols(c.partitioning), keyCol, None,
        Some(c.tableSchema), c.ignoreIfExists)
    case a: org.apache.spark.sql.catalyst.plans.logical.AddColumns =>
      a.table match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable
            if u.multipartIdentifier.size == 1 &&
              GraftSqlTables.lookup(session,
                u.multipartIdentifier.head).isDefined =>
          val (wh, t) = GraftSqlTables.lookup(session,
            u.multipartIdentifier.head).get
          val cols = a.columnsToAdd.map { c =>
            require(c.path.isEmpty && c.position.isEmpty &&
              c.default.isEmpty,
              "ALTER TABLE ... ADD COLUMNS on a graft table supports " +
                "plain top-level columns (no nested paths, FIRST/AFTER " +
                "positions, or DEFAULT values) — new columns append, " +
                "nullable, per the additive-evolution contract")
            org.apache.spark.sql.types.StructField(c.colName, c.dataType,
              nullable = true)
          }
          GraftAddColumnsCommand(wh, t,
            org.apache.spark.sql.types.StructType(cols))
        case _ => a // not a registered graft name — builtin path
      }
    case sp: org.apache.spark.sql.catalyst.plans.logical.SetTableProperties =>
      sp.table match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable
            if u.multipartIdentifier.size == 1 &&
              GraftSqlTables.lookup(session,
                u.multipartIdentifier.head).isDefined =>
          val (wh, t) = GraftSqlTables.lookup(session,
            u.multipartIdentifier.head).get
          GraftSetPropertiesCommand(wh, t, sp.properties, unsetKeys = Nil,
            unsetIfExists = false)
        case _ => sp
      }
    case up: org.apache.spark.sql.catalyst.plans.logical.UnsetTableProperties =>
      up.table match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable
            if u.multipartIdentifier.size == 1 &&
              GraftSqlTables.lookup(session,
                u.multipartIdentifier.head).isDefined =>
          val (wh, t) = GraftSqlTables.lookup(session,
            u.multipartIdentifier.head).get
          GraftSetPropertiesCommand(wh, t, Map.empty,
            unsetKeys = up.propertyKeys, unsetIfExists = up.ifExists)
        case _ => up
      }
    case dc: org.apache.spark.sql.catalyst.plans.logical.DropColumns =>
      dc.table match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable
            if u.multipartIdentifier.size == 1 &&
              GraftSqlTables.lookup(session,
                u.multipartIdentifier.head).isDefined =>
          val name = u.multipartIdentifier.head
          val (wh, t) = GraftSqlTables.lookup(session, name).get
          val cols = dc.columnsToDrop.map { f =>
            require(f.name.size == 1,
              s"ALTER TABLE ... DROP COLUMNS on a graft table supports " +
                s"plain top-level columns, got ${f.name.mkString(".")}")
            f.name.head
          }
          GraftSqlTables.lookupKey(session, name).foreach(k =>
            require(!cols.contains(k),
              s"cannot drop '$k': it is $name's registered merge key " +
                "(the DML surface upserts/deletes by it)"))
          GraftDropColumnsCommand(wh, t, cols, dc.ifExists)
        case _ => dc // not a registered graft name — builtin path
      }
    case tr: org.apache.spark.sql.catalyst.plans.logical.TruncateTable =>
      tr.table match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable
            if u.multipartIdentifier.size == 1 &&
              GraftSqlTables.lookup(session,
                u.multipartIdentifier.head).isDefined =>
          val (wh, t) = GraftSqlTables.lookup(session,
            u.multipartIdentifier.head).get
          GraftTruncateCommand(wh, t)
        case _ => tr // not a registered graft name — builtin path
      }
    case d: org.apache.spark.sql.catalyst.plans.logical.DropTable =>
      d.child match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier
            if u.nameParts.size == 1 &&
              GraftSqlTables.lookup(session, u.nameParts.head).isDefined =>
          val (wh, t) = GraftSqlTables.lookup(session, u.nameParts.head).get
          GraftDropTableCommand(wh, t, u.nameParts.head, d.purge)
        case _ => d // not a registered graft name — builtin path
      }
    case i: InsertIntoStatement
        if Target.unapply(i.table).isDefined =>
      val (_, wh, t, _) = Target.unapply(i.table).get
      require(!i.ifPartitionNotExists,
        "INSERT ... IF NOT EXISTS is not supported on this surface")
      val static = i.partitionSpec.toSeq.collect { case (c, Some(v)) =>
        c -> v }
      GraftInsertCommand(wh, t, i.query, i.userSpecifiedCols, static,
        i.overwrite, i.byName)
  }
}

private[plans] object GraftDml {

  /** Rewrite every attribute in a captured DML expression to its BARE
    * name so it re-resolves against the frame the command applies it
    * to. Qualifiers are POLICED, not silently dropped: a name
    * qualified by anything in `reject` (the TARGET alias, for a
    * condition defined to test the source row) throws; `allowed`
    * qualifiers (the source alias) strip; unknown qualifiers throw —
    * guessing a side would be a silent wrong answer.
    */
  def bareAttrs(e: Expression, allowed: Set[String],
      reject: Set[String], what: String): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    case u: UnresolvedAttribute if u.nameParts.size > 1 =>
      val q = u.nameParts.init.mkString(".")
      if (reject.contains(q)) throw new IllegalArgumentException(
        s"$what references target-qualified column ${u.nameParts.mkString(".")} — " +
          "this condition is evaluated against the SOURCE row only " +
          "(ANSI WHEN MATCHED ... DELETE tests the source); " +
          "reference source columns, or use the DataFrame API")
      if (!allowed.contains(q)) throw new IllegalArgumentException(
        s"$what references unknown qualifier '$q' in ${u.nameParts.mkString(".")}")
      UnresolvedAttribute(Seq(u.nameParts.last))
  }

  /** The single same-named equality key of a MERGE ON condition —
    * `t.k = s.k` (either qualification order) → `k`. Anything else
    * rejects: the engine's merge semantics are single-key upserts.
    */
  def mergeKeyOf(cond: Expression): String = {
    def last(e: Expression): Option[String] = e match {
      case u: UnresolvedAttribute => Some(u.nameParts.last)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    cond match {
      case EqualTo(a, b) =>
        (last(a), last(b)) match {
          case (Some(x), Some(y)) if x == y => x
          case (Some(x), Some(y)) => throw new IllegalArgumentException(
            s"MERGE ON must equate the SAME key column on both sides " +
              s"(the table's merge key); got $x = $y")
          case _ => throw new IllegalArgumentException(
            s"MERGE ON must be a plain key equality, got $cond")
        }
      case _ => throw new IllegalArgumentException(
        "MERGE ON must be a single key equality (t.k = s.k); composite " +
          s"or non-equality conditions are not merge keys: $cond")
    }
  }
}

/** `MERGE INTO` resolved against a manifest table: classifies each
  * source row through the FIRST-MATCH-WINS clause chain (`matchedChain`
  * over matched rows, `insertChain` over unmatched — a row matching no
  * clause leaves the target untouched), optionally sweeps target rows
  * ABSENT from the source (`nmbsDelete`), then ONE
  * [[ManifestVersioned.mergeVersionedMulti]] in source-wins mode —
  * zone/bloom key-locate pruning, expectation-carrying commit and
  * conflict re-run all inherited from the engine path, and the whole
  * statement commits atomically. The classification column is a
  * `helperCols` drop — it never lands in the table. Returns one row
  * (committed version, touched partition count).
  *
  * The matched-ness probe ([[ManifestVersioned.keysPresent]], zone+
  * bloom-pruned — never a full key scan) runs only when a clause
  * outcome depends on it; the unconditional-update + unconditional-
  * insert upsert needs none (every source row participates either
  * way). NOT MATCHED BY SOURCE reads the target through the REGISTERED
  * relation and anti-joins the source keys — inherently a target
  * key-column pass; that is the statement's own cost, not overhead.
  */
case class GraftMergeCommand(warehouseDir: String, table: String,
    sqlName: String, keyCol: String, source: LogicalPlan,
    matchedChain: Seq[(String, Option[Column])],
    insertChain: Seq[Option[Column]],
    nmbsDelete: Option[Option[Column]]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("touched_partitions", LongType, nullable = false)())

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val src = DslBridge.ofRows(spark, source)
    require(src.columns.contains(keyCol),
      s"MERGE source has no column named '$keyCol' (the ON key)")
    // ANSI cardinality rule: at most one source row per key — two rows
    // updating the same target row is an error, not a coin flip. One
    // aggregation over the (change-batch-sized) source.
    require(src.groupBy(col(keyCol)).count()
      .filter(col("count") > 1).limit(1).count() == 0L,
      s"MERGE source carries duplicate '$keyCol' keys — ANSI MERGE " +
        "forbids multiple source rows matching one target row " +
        "(dedupe the source, e.g. with latest-wins, first)")
    val act = "__graft_act"
    // first-match-wins as a right-folded CASE chain; no clause → NULL
    // → the row is dropped (leaves the target untouched, per ANSI)
    def chainExpr(chain: Seq[(String, Option[Column])]): Column =
      chain.foldRight(lit(null).cast("string")) { case ((kind, c), rest) =>
        when(c.getOrElse(lit(true)), lit(kind)).otherwise(rest)
      }
    // the plain upsert (unconditional UPDATE SET * + unconditional
    // INSERT *) is the one clause shape where every source row's
    // action is independent of matched-ness — no probe
    val probeFree = (matchedChain, insertChain) match {
      case (Seq(("U", None)), Seq(None)) => true
      case _ => false
    }
    val fromSource =
      if (matchedChain.isEmpty && insertChain.isEmpty)
        src.limit(0).withColumn(act, lit("U"))
      else if (probeFree)
        src.withColumn(act, lit("U"))
      else {
        val present = ManifestVersioned.keysPresent(spark, warehouseDir,
            table, src.select(col(keyCol)), keyCol)
          .select(col(keyCol).as("__m_key")).withColumn("__m", lit(1))
        val flagged = src.join(present, col(keyCol) === col("__m_key"),
          "left")
        val matched = col("__m").isNotNull
        flagged.withColumn(act,
            when(matched, chainExpr(matchedChain))
              .otherwise(chainExpr(insertChain.map(c => ("I", c)))))
          .filter(col(act).isNotNull)
          .drop("__m_key", "__m")
      }
    val change = nmbsDelete match {
      case None => fromSource
      case Some(cond) =>
        // target rows whose key the source does not carry, swept as
        // tombstones in the SAME commit — the pruned registered read
        // supplies the rows, so the condition pushes down as usual
        val tgt = DslBridge.ofRows(spark, UnresolvedRelation(Seq(sqlName)))
        val absent = cond.map(tgt.filter).getOrElse(tgt)
          .join(src.select(col(keyCol).as("__s_key")),
            col(keyCol) === col("__s_key"), "left_anti")
          .withColumn(act, lit("D"))
        fromSource.unionByName(absent, allowMissingColumns = true)
    }
    val partCols = ManifestVersioned
      .partitionColumns(spark, warehouseDir, table)
      .getOrElse(throw new IllegalStateException(
        s"$table records no #partcols header — MERGE needs it"))
    val (touched, v) = ManifestVersioned.mergeVersionedMulti(spark,
      warehouseDir, table, change, keyCol, partCols, order = Nil,
      isTombstone = col(act) === "D", sourceWins = true,
      note = "sql merge", helperCols = Seq(act))
    Seq(Row(v, touched.size.toLong))
  }
}

/** `DELETE FROM` resolved against a manifest table: the predicate runs
  * through the REGISTERED SQL read path (full zone → bloom → file
  * pruning — the matching-row scan lists only partitions the condition
  * could touch), the matching keys erase everywhere via
  * [[ManifestVersioned.deleteRowsLocate]] (delete vectors, O(delete
  * bytes), merge-on-read). Key-based erasure equals row erasure under
  * the one-row-per-key merge invariant; the registered key is REQUIRED
  * at resolution. Returns (committed version, partitions gaining a
  * vector) — the pre-delete head version when nothing matched (no
  * empty commits).
  */
case class GraftDeleteCommand(warehouseDir: String, table: String,
    sqlName: String, keyCol: String, cond: Column)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("touched_partitions", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    // re-plan the predicate over a FRESH registered-relation read: the
    // analyzer resolves it against the head schema and PruneGraftScans
    // turns it into the pruned scan — one code path with SELECT
    val matching = DslBridge.ofRows(spark,
        UnresolvedRelation(Seq(sqlName)))
      .filter(cond).select(col(keyCol))
    val (nParts, v) = ManifestVersioned.deleteRowsLocate(spark,
      warehouseDir, table, matching, keyCol, note = "sql delete")
    Seq(Row(v, nParts.toLong))
  }
}

/** `UPDATE ... SET ... WHERE ...` resolved against a manifest table:
  * matching rows read through the REGISTERED relation (full zone →
  * bloom → file pruning on the WHERE), assignments applied with an
  * ANSI cast to each column's recorded type (values may reference the
  * row's own columns — `SET v = v * 2` works), then ONE source-wins
  * [[ManifestVersioned.mergeVersionedMulti]] replaces the updated keys
  * atomically. Copy-on-write by design: the touched partitions rewrite
  * in one commit (assigning a PARTITION column moves rows between
  * partitions correctly — the merge owns both sides); the merge-on-read
  * alternative (delete vector + append) would cost O(update bytes) but
  * take two commits, and a crash between them would leave the rows
  * missing — atomicity wins for a SQL statement. Returns (committed
  * version, touched partition count).
  */
case class GraftUpdateCommand(warehouseDir: String, table: String,
    sqlName: String, keyCol: String, sets: Seq[(String, Column)],
    cond: Option[Column]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("touched_partitions", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val schema = ManifestVersioned.manifestSchema(spark, warehouseDir, table)
      .getOrElse(throw new IllegalStateException(
        s"$table records no #schema header — UPDATE needs it"))
    sets.foreach { case (c, _) => require(schema.fieldNames.contains(c),
      s"UPDATE SET column $c is not in $table's schema") }
    val matching = DslBridge.ofRows(spark,
      UnresolvedRelation(Seq(sqlName)))
    val filtered = cond.map(matching.filter).getOrElse(matching)
    // all assignments see the PRE-update row (ANSI): one select, every
    // column either its assignment (cast to the recorded type) or itself
    val byName = sets.toMap
    val updated = filtered.select(schema.fields.toSeq.map { f =>
      byName.get(f.name).map(_.cast(f.dataType).as(f.name))
        .getOrElse(col(f.name))
    }: _*)
    val partCols = ManifestVersioned
      .partitionColumns(spark, warehouseDir, table)
      .getOrElse(throw new IllegalStateException(
        s"$table records no #partcols header — UPDATE needs it"))
    val (touched, v) = ManifestVersioned.mergeVersionedMulti(spark,
      warehouseDir, table, updated, keyCol, partCols, order = Nil,
      isTombstone = lit(false), sourceWins = true, note = "sql update")
    Seq(Row(v, touched.size.toLong))
  }
}

/** `INSERT INTO` (append) / `INSERT OVERWRITE` (dynamic partition
  * replace) resolved against a manifest table. Column resolution is
  * ANSI: positional against the head schema (static PARTITION columns
  * excluded), or by name under a column list / `BY NAME`; every value
  * casts to the recorded column type; unmentioned columns insert NULL.
  * Returns the committed version.
  */
case class GraftInsertCommand(warehouseDir: String, table: String,
    query: LogicalPlan, userCols: Seq[String],
    staticSpec: Seq[(String, String)], overwrite: Boolean,
    byName: Boolean) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)())

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val q = DslBridge.ofRows(spark, query)
    val schema = ManifestVersioned.manifestSchema(spark, warehouseDir, table)
      .getOrElse(throw new IllegalStateException(
        s"$table records no #schema header"))
    val staticCols = staticSpec.map(_._1).toSet
    staticCols.foreach(c => require(schema.fieldNames.contains(c),
      s"static PARTITION column $c is not in $table's schema"))
    val named =
      if (userCols.nonEmpty) {
        require(userCols.length == q.columns.length,
          s"INSERT column list names ${userCols.length} columns but the " +
            s"query produces ${q.columns.length}")
        userCols.foreach(c => require(schema.fieldNames.contains(c),
          s"INSERT column $c is not in $table's schema"))
        q.toDF(userCols: _*)
      } else if (byName) {
        q.columns.foreach(c => require(schema.fieldNames.contains(c),
          s"INSERT BY NAME column $c is not in $table's schema"))
        q
      } else {
        val positional = schema.fields.toSeq
          .filterNot(f => staticCols.contains(f.name))
        require(q.columns.length == positional.length,
          s"INSERT needs ${positional.length} columns " +
            s"(${positional.map(_.name).mkString(", ")}), " +
            s"got ${q.columns.length}")
        q.toDF(positional.map(_.name): _*)
      }
    val withStatic = staticSpec.foldLeft(named) { case (d, (c, v)) =>
      d.withColumn(c, lit(v))
    }
    val aligned = withStatic.select(schema.fields.toSeq.map { f =>
      if (withStatic.columns.contains(f.name))
        col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    val partCols = ManifestVersioned
      .partitionColumns(spark, warehouseDir, table)
      .getOrElse(throw new IllegalStateException(
        s"$table records no #partcols header — INSERT needs it"))
    val v =
      if (overwrite)
        ManifestVersioned.writeDeltaMulti(spark, warehouseDir, table,
          aligned, partCols, note = "sql insert overwrite")
      else
        ManifestVersioned.appendRows(spark, warehouseDir, table, aligned,
          note = "sql insert")
    Seq(Row(v))
  }
}
