package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute,
  UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment,
  DeleteAction, DeleteFromTable, InsertAction, InsertIntoStatement,
  InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable,
  SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
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
  *    UPDATE SET *` / `UPDATE SET col = expr, …` / `DELETE`, any chain
  *    of `WHEN NOT MATCHED [AND c] THEN INSERT *` / `INSERT (cols)
  *    VALUES (exprs)` (unmentioned columns NULL-fill; the merge key
  *    must be supplied), plus `WHEN NOT MATCHED BY SOURCE [AND c] THEN
  *    UPDATE SET col = expr, … | DELETE` — a matched/unmatched row
  *    hitting no clause leaves the target untouched (ANSI). Matched
  *    conditions and assignment values may reference EITHER side
  *    (qualify to pick a side explicitly; a bare name resolves
  *    source-first); NOT-MATCHED conditions read the source row only,
  *    NOT-MATCHED-BY-SOURCE clauses the target row only. ON must be a
  *    single same-named key equality. `UPDATE SET *` takes the FULL
  *    source row (extra source columns evolve the schema additively —
  *    exactly how the reference's CDC op columns land in its
  *    warehouse); column-list assignments produce the TARGET row with
  *    assigned columns replaced, ANSI-cast to the recorded types.
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

  /** A DML target over a graft-addressable name (possibly aliased),
    * while still unresolved — (name parts, warehouseDir, table,
    * alias). Accepts session registrations (1-part) and
    * catalog-addressed multipart names (`graft.<alias>.<table>` —
    * [[GraftSqlTables.lookupAny]]), so the DML surface works in a
    * fresh session from configuration alone.
    */
  private object Target {
    def unapply(p: LogicalPlan)
        : Option[(Seq[String], String, String, Option[String])] = p match {
      case u: UnresolvedRelation =>
        GraftSqlTables.lookupAny(session, u.multipartIdentifier)
          .map { case (wh, t) => (u.multipartIdentifier, wh, t, None) }
      case SubqueryAlias(id, u: UnresolvedRelation) =>
        GraftSqlTables.lookupAny(session, u.multipartIdentifier)
          .map { case (wh, t) =>
            (u.multipartIdentifier, wh, t, Some(id.name)) }
      case _ => None
    }
  }

  /** A MERGE action list as the first-match-wins clause CHAIN the
    * command classifies rows with ([[GraftDml.MergeClause]] per action,
    * in statement order). `ctx` names which chain this is, because the
    * three chains see different rows:
    *  - `"matched"` (WHEN MATCHED): a joined (source, target) row —
    *    conditions and assignment values may reference EITHER side
    *    (qualified refs tag their side now; bare refs disambiguate at
    *    run time, source side winning a tie — see
    *    [[GraftDml.resolveSided]]). `UPDATE SET *`, `UPDATE SET c =
    *    expr, …` and `DELETE` are all accepted.
    *  - `"insert"` (WHEN NOT MATCHED): the source row only — a
    *    target-qualified reference rejects loudly here (there is no
    *    target row to read). `INSERT *` and column-list `INSERT (c, …)
    *    VALUES (…)` accepted.
    *  - `"nmbs"` (WHEN NOT MATCHED BY SOURCE): the target row only —
    *    source-qualified references reject. `UPDATE SET c = expr, …`
    *    and `DELETE` accepted.
    */
  private def clausesOf(actions: Seq[MergeAction], srcAlias: Set[String],
      tgtAlias: Set[String], ctx: String): Seq[GraftDml.MergeClause] = {
    def capture(e: org.apache.spark.sql.catalyst.expressions.Expression,
        what: String): Column = ctx match {
      case "matched" => DslBridge.column(
        GraftDml.sideAttrs(e, srcAlias, tgtAlias, Set.empty, what))
      case "insert" => DslBridge.column(
        GraftDml.sideAttrs(e, srcAlias, Set.empty, tgtAlias, what))
      case _ => DslBridge.column(
        GraftDml.sideAttrs(e, Set.empty, tgtAlias, srcAlias, what))
    }
    def assignsOf(assigns: Seq[Assignment], what: String)
        : Seq[(String, Column)] = {
      val sets = assigns.map { a =>
        val target = a.key match {
          case u: UnresolvedAttribute if u.nameParts.size == 1 =>
            u.nameParts.head
          case u: UnresolvedAttribute
              if tgtAlias.contains(u.nameParts.init.mkString(".")) =>
            u.nameParts.last
          case other => throw new IllegalArgumentException(
            s"$what assignment target must be a plain TARGET column " +
              s"(bare or target-qualified), got $other")
        }
        target -> capture(a.value, s"$what value for $target")
      }
      require(sets.map(_._1).distinct.size == sets.size,
        s"$what assigns the same column twice")
      sets
    }
    actions.map { a =>
      (a, ctx) match {
        case (UpdateStarAction(c), "matched") => GraftDml.MergeClause("U",
          c.map(capture(_, "MERGE WHEN MATCHED ... UPDATE condition")),
          None)
        case (UpdateAction(c, assigns, _), "matched") =>
          GraftDml.MergeClause("U",
            c.map(capture(_, "MERGE WHEN MATCHED ... UPDATE condition")),
            Some(assignsOf(assigns, "MERGE WHEN MATCHED ... UPDATE SET")))
        case (UpdateAction(c, assigns, _), "nmbs") =>
          GraftDml.MergeClause("U",
            c.map(capture(_,
              "MERGE WHEN NOT MATCHED BY SOURCE ... UPDATE condition")),
            Some(assignsOf(assigns,
              "MERGE WHEN NOT MATCHED BY SOURCE ... UPDATE SET")))
        case (DeleteAction(c), "matched" | "nmbs") =>
          GraftDml.MergeClause("D",
            c.map(capture(_, s"MERGE $ctx DELETE condition")), None)
        case (InsertStarAction(c), "insert") => GraftDml.MergeClause("I",
          c.map(capture(_, "MERGE WHEN NOT MATCHED ... INSERT condition")),
          None)
        case (InsertAction(c, assigns), "insert") =>
          GraftDml.MergeClause("I",
            c.map(capture(_,
              "MERGE WHEN NOT MATCHED ... INSERT condition")),
            Some(assignsOf(assigns,
              "MERGE WHEN NOT MATCHED ... INSERT column list")))
        case (other, _) => throw new IllegalArgumentException(
          s"unsupported MERGE $ctx action: $other")
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case DeleteFromTable(Target(name, wh, t, alias), cond) =>
      val keyCol = GraftSqlTables.lookupKeyAny(session, name)
        .getOrElse(throw new IllegalArgumentException(
          s"DELETE FROM ${name.mkString(".")} needs the table's merge " +
            "key — register with GraftSqlTables.register(..., keyCol = " +
            "Some(\"<key>\")) or record the graft.mergeKey table " +
            "property (key-based delete vectors are how the engine " +
            "erases rows)"))
      // qualified refs in a single-table DELETE are unambiguous —
      // allow the table name/alias as qualifier, then re-resolve bare
      GraftDeleteCommand(wh, t, name, keyCol,
        DslBridge.column(GraftDml.bareAttrs(cond,
          allowed = Set(name.mkString("."), name.last, t) ++ alias,
          reject = Set.empty, "DELETE WHERE condition")))
    case m: MergeIntoTable
        if Target.unapply(m.targetTable).isDefined =>
      val (name, wh, t, alias) = Target.unapply(m.targetTable).get
      val keyCol = GraftDml.mergeKeyOf(m.mergeCondition)
      GraftSqlTables.lookupKeyAny(session, name).foreach(k =>
        require(k == keyCol,
          s"MERGE ON equates '$keyCol' but ${name.mkString(".")} is " +
            s"registered with merge key '$k' — merging on a non-key " +
            "column would violate the one-row-per-key invariant"))
      val srcAlias: Set[String] = m.sourceTable match {
        case SubqueryAlias(id, _) => Set(id.name)
        case u: UnresolvedRelation => Set(u.multipartIdentifier.last)
        case _ => Set.empty
      }
      val tgtAlias = alias.toSet ++
        Set(name.mkString("."), name.last, t)
      val matchedChain = clausesOf(m.matchedActions, srcAlias, tgtAlias,
        "matched")
      val insertChain = clausesOf(m.notMatchedActions, srcAlias, tgtAlias,
        "insert")
      val nmbsChain = clausesOf(m.notMatchedBySourceActions, srcAlias,
        tgtAlias, "nmbs")
      require(matchedChain.nonEmpty || insertChain.nonEmpty ||
        nmbsChain.nonEmpty, "MERGE with no supported action")
      GraftMergeCommand(wh, t, name, keyCol, m.sourceTable, matchedChain,
        insertChain, nmbsChain)
    case UpdateTable(Target(name, wh, t, alias), assignments, cond) =>
      val keyCol = GraftSqlTables.lookupKeyAny(session, name)
        .getOrElse(throw new IllegalArgumentException(
          s"UPDATE ${name.mkString(".")} needs the table's merge key — " +
            "register with GraftSqlTables.register(..., keyCol = " +
            "Some(\"<key>\")) or record the graft.mergeKey table " +
            "property (updated rows replace their key through the " +
            "merge path)"))
      val allowed = Set(name.mkString("."), name.last, t) ++ alias
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
      val (pcols, genProps) = GraftDdl.partColsAndGen(c.partitioning)
      GraftCreateTableCommand(wh, t,
        pcols, keyCol, Some(c.query),
        None, c.ignoreIfExists, GraftDdl.checkConstraintsOf(spec),
        GraftDdl.userPropertiesOf(spec) ++ genProps)
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
      val (pcols, genProps) = GraftDdl.partColsAndGen(c.partitioning)
      GraftCreateTableCommand(wh, t,
        pcols, keyCol, None,
        Some(c.tableSchema), c.ignoreIfExists,
        GraftDdl.checkConstraintsOf(spec),
        GraftDdl.userPropertiesOf(spec) ++ genProps)
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
    case sc: org.apache.spark.sql.catalyst.plans.logical.ShowCreateTable =>
      val parts = sc.child match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
          Some(u.multipartIdentifier)
        case u: org.apache.spark.sql.catalyst.analysis
            .UnresolvedTableOrView => Some(u.multipartIdentifier)
        case _ => None
      }
      parts.flatMap(p => GraftSqlTables.lookupAny(session, p)
          .map(p -> _)) match {
        case Some((p, (wh, t))) =>
          GraftShowCreateTableCommand(wh, t, p.mkString("."))
        case None => sc
      }
    case sp: org.apache.spark.sql.catalyst.plans.logical.ShowPartitions =>
      val parts = sp.table match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
          Some(u.multipartIdentifier)
        case u: org.apache.spark.sql.catalyst.analysis
            .UnresolvedTableOrView => Some(u.multipartIdentifier)
        case _ => None
      }
      parts.flatMap(p => GraftSqlTables.lookupAny(session, p)
          .map(p -> _)) match {
        case Some((p, (wh, t))) =>
          require(sp.pattern.isEmpty,
            "SHOW PARTITIONS ... PARTITION(spec) is not supported on " +
              "graft tables — filter the relation instead")
          GraftShowPartitionsCommand(wh, t, p.mkString("."))
        case None => sp
      }
    case a: org.apache.spark.sql.catalyst.plans.logical.AnalyzeTable =>
      // ANALYZE answers from the MANIFEST (zero data reads) — Spark's
      // own ANALYZE would scan; the recorded counts/bytes already know
      val parts = a.child match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
          Some(u.multipartIdentifier)
        case u: org.apache.spark.sql.catalyst.analysis
            .UnresolvedTableOrView => Some(u.multipartIdentifier)
        case _ => None
      }
      parts.flatMap(p => GraftSqlTables.lookupAny(session, p)
          .map(p -> _)) match {
        case Some((p, (wh, t))) =>
          require(a.partitionSpec.isEmpty,
            "ANALYZE ... PARTITION is not supported on graft tables — " +
              "the manifest records per-partition statistics already " +
              "(partitionRowStats/partitionFileStats)")
          GraftAnalyzeTableCommand(wh, t, p.mkString("."))
        case None => a
      }
    case a: org.apache.spark.sql.catalyst.plans.logical.AnalyzeColumn =>
      val parts = a.child match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
          Some(u.multipartIdentifier)
        case u: org.apache.spark.sql.catalyst.analysis
            .UnresolvedTableOrView => Some(u.multipartIdentifier)
        case _ => None
      }
      parts.flatMap(p => GraftSqlTables.lookupAny(session, p)
          .map(p -> _)) match {
        case Some((p, (wh, t))) =>
          GraftAnalyzeColumnsCommand(wh, t, p.mkString("."),
            a.columnNames, a.allColumns)
        case None => a
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
    case st: org.apache.spark.sql.catalyst.plans.logical.ShowTableProperties =>
      // the parser wraps SHOW's target as UnresolvedTableOrView (ALTER
      // wraps as UnresolvedTable) — accept either
      val parts = st.table match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
          Some(u.multipartIdentifier)
        case u: org.apache.spark.sql.catalyst.analysis
            .UnresolvedTableOrView => Some(u.multipartIdentifier)
        case _ => None
      }
      parts.flatMap(GraftSqlTables.lookupAny(session, _)) match {
        case Some((wh, t)) =>
          GraftShowPropertiesCommand(wh, t, st.propertyKey)
        case None => st
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
    case ac: org.apache.spark.sql.catalyst.plans.logical.AddConstraint =>
      ac.table match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable
            if GraftSqlTables.lookupAny(session,
              u.multipartIdentifier).isDefined =>
          val (wh, t) = GraftSqlTables.lookupAny(session,
            u.multipartIdentifier).get
          val (n, cond) = GraftDdl.checkConstraintOf(ac.tableConstraint)
          GraftAddCheckCommand(wh, t, n, cond)
        case _ => ac // not a graft name — builtin path
      }
    // CHECK gets its own parsed node (the others arrive as
    // AddConstraint), with the table wrapped in a Filter carrying the
    // condition (that is how the builtin path resolves it); same
    // routing — the engine re-parses the condition TEXT itself
    case acc: org.apache.spark.sql.catalyst.plans.logical
        .AddCheckConstraint =>
      val tbl = acc.child match {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.child
        case c => c
      }
      val parts = tbl match {
        case u: UnresolvedRelation => Some(u.multipartIdentifier)
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
          Some(u.multipartIdentifier)
        case _ => None
      }
      parts.flatMap(GraftSqlTables.lookupAny(session, _)) match {
        case Some((wh, t)) =>
          val (n, cond) = GraftDdl.checkConstraintOf(acc.checkConstraint)
          GraftAddCheckCommand(wh, t, n, cond)
        case None => acc
      }
    case dc: org.apache.spark.sql.catalyst.plans.logical.DropConstraint =>
      dc.table match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable
            if GraftSqlTables.lookupAny(session,
              u.multipartIdentifier).isDefined =>
          val (wh, t) = GraftSqlTables.lookupAny(session,
            u.multipartIdentifier).get
          GraftDropCheckCommand(wh, t, dc.name, dc.ifExists)
        case _ => dc
      }
    case ac: org.apache.spark.sql.catalyst.plans.logical.AlterColumns =>
      ac.table match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable
            if u.multipartIdentifier.size == 1 &&
              GraftSqlTables.lookup(session,
                u.multipartIdentifier.head).isDefined =>
          val (wh, t) = GraftSqlTables.lookup(session,
            u.multipartIdentifier.head).get
          require(ac.specs.size == 1,
            "ALTER TABLE ... ALTER COLUMN on a graft table takes one " +
              "column per statement")
          val spec = ac.specs.head
          require(spec.column.name.size == 1,
            s"ALTER COLUMN on a graft table supports plain top-level " +
              s"columns, got ${spec.column.name.mkString(".")}")
          require(spec.newDataType.isDefined && spec.newNullability.isEmpty
              && spec.newComment.isEmpty && spec.newPosition.isEmpty &&
              spec.newDefaultExpression.isEmpty && !spec.dropDefault,
            "ALTER COLUMN on a graft table supports TYPE <widening> " +
              "only (no nullability, comment, position, or DEFAULT " +
              "changes)")
          GraftAlterColumnTypeCommand(wh, t, spec.column.name.head,
            spec.newDataType.get)
        case _ => ac // not a registered graft name — builtin path
      }
    case rc: org.apache.spark.sql.catalyst.plans.logical.RenameColumn =>
      rc.table match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable
            if u.multipartIdentifier.size == 1 &&
              GraftSqlTables.lookup(session,
                u.multipartIdentifier.head).isDefined =>
          val (wh, t) = GraftSqlTables.lookup(session,
            u.multipartIdentifier.head).get
          require(rc.column.name.size == 1,
            s"ALTER TABLE ... RENAME COLUMN on a graft table supports " +
              s"plain top-level columns, got ${rc.column.name.mkString(".")}")
          GraftRenameColumnCommand(wh, t, rc.column.name.head, rc.newName)
        case _ => rc // not a registered graft name — builtin path
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

  /** One MERGE clause as the command evaluates it: `kind` ∈ U (update)
    * / D (delete) / I (insert); `cond` the captured `AND` condition
    * (None = unconditional); `sets` the captured column-list
    * assignments (None = the star form for U/I, always None for D).
    * Attribute side-tags (`__s_`/`__t_` prefixes from qualified refs —
    * see [[sideAttrs]]) resolve at run time against the actual
    * source/target column sets ([[resolveSided]]).
    */
  case class MergeClause(kind: String, cond: Option[Column],
      sets: Option[Seq[(String, Column)]])

  /** Capture-time side tagging for MERGE clause expressions: a
    * source-qualified attribute becomes `__s_<name>`, a
    * target-qualified one `__t_<name>`, a qualifier in `reject` throws
    * (that side has no row in this clause — e.g. the target in a WHEN
    * NOT MATCHED INSERT), an unknown qualifier throws, and a BARE name
    * passes through for run-time disambiguation (the column sets are
    * only known at execution). Guessing a side silently would be a
    * silent wrong answer; every ambiguity here is either tagged now or
    * policed later.
    */
  def sideAttrs(e: Expression, srcQual: Set[String], tgtQual: Set[String],
      reject: Set[String], what: String): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    case u: UnresolvedAttribute if u.nameParts.size > 1 =>
      val q = u.nameParts.init.mkString(".")
      if (reject.contains(q)) throw new IllegalArgumentException(
        s"$what references ${u.nameParts.mkString(".")} — that side has " +
          "no row in this clause (a NOT MATCHED clause has no target " +
          "row; a NOT MATCHED BY SOURCE clause has no source row)")
      else if (srcQual.contains(q))
        UnresolvedAttribute(Seq("__s_" + u.nameParts.last))
      else if (tgtQual.contains(q))
        UnresolvedAttribute(Seq("__t_" + u.nameParts.last))
      else throw new IllegalArgumentException(
        s"$what references unknown qualifier '$q' in " +
          u.nameParts.mkString("."))
  }

  /** Run-time side resolution for a captured clause expression:
    * side-tagged names map through `srcName`/`tgtName` (the frame's
    * actual column naming — prefixed in the joined general path, plain
    * in the single-sided paths) after validating the column exists on
    * that side; a BARE name resolves source-first (a tie keeps the r9
    * contract: clause conditions read the source row unless the target
    * is named explicitly), then target; unknown names throw.
    * `srcCols = None` means this clause has no source row at all (NOT
    * MATCHED BY SOURCE) — any source reference throws.
    */
  def resolveSided(c: Column, srcCols: Option[Set[String]],
      tgtCols: Set[String], srcName: String => String,
      tgtName: String => String, what: String): Column = {
    def src(b: String): Expression = {
      val sc = srcCols.getOrElse(throw new IllegalArgumentException(
        s"$what references source column '$b' but this clause has no " +
          "source row"))
      if (!sc.contains(b)) throw new IllegalArgumentException(
        s"$what references unknown source column '$b'")
      UnresolvedAttribute(Seq(srcName(b)))
    }
    def tgt(b: String): Expression = {
      if (!tgtCols.contains(b)) throw new IllegalArgumentException(
        s"$what references unknown target column '$b'")
      UnresolvedAttribute(Seq(tgtName(b)))
    }
    DslBridge.column(DslBridge.expression(c).transform {
      case u: UnresolvedAttribute if u.nameParts.size == 1 =>
        val n = u.nameParts.head
        if (n.startsWith("__s_")) src(n.stripPrefix("__s_"))
        else if (n.startsWith("__t_")) tgt(n.stripPrefix("__t_"))
        else if (srcCols.exists(_.contains(n))) src(n)
        else if (tgtCols.contains(n)) tgt(n)
        else throw new IllegalArgumentException(
          s"$what references unknown column '$n' (in neither the " +
            "source nor the target)")
    })
  }

  /** Does a captured clause expression reference the TARGET side —
    * explicitly (`__t_` tag from a qualified ref) or through a bare
    * name only the target has? Decides whether the command can take
    * the probe-only fast path (matched-ness membership, no target
    * content) or must join the matched target rows in.
    */
  def refsTarget(c: Column, srcCols: Set[String]): Boolean =
    DslBridge.expression(c).exists {
      case u: UnresolvedAttribute if u.nameParts.size == 1 =>
        u.nameParts.head.startsWith("__t_") ||
          (!u.nameParts.head.startsWith("__s_") &&
            !srcCols.contains(u.nameParts.head))
      case _ => false
    }

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
  * clause leaves the target untouched), optionally processes target
  * rows ABSENT from the source (`nmbsChain` — UPDATE and DELETE), then
  * ONE [[ManifestVersioned.mergeVersionedMultiPlan]] in source-wins
  * mode — zone/bloom key-locate pruning, expectation-carrying commit
  * and conflict re-run all inherited from the engine path, and the
  * whole statement commits atomically. The classification column is a
  * `helperCols` drop — it never lands in the table. Returns one row
  * (committed version, touched partition count).
  *
  * Target-side cost is paid exactly when the statement's semantics
  * need target DATA, in three escalating tiers:
  *  - the unconditional star upsert needs NOTHING (every source row
  *    participates either way — no probe, no join);
  *  - a conditional star/delete chain whose conditions read only the
  *    source row needs MEMBERSHIP ([[ManifestVersioned.keysPresent]],
  *    zone+bloom-pruned — never a full key scan);
  *  - column-list assignments (`UPDATE SET c = expr`) or a condition
  *    referencing the target row need the matched rows' CONTENT
  *    ([[ManifestVersioned.rowsForKeys]] — the same locate pruning,
  *    returning full rows; the updated row is the TARGET row with
  *    assigned columns replaced, ANSI-cast to the recorded types).
  * NOT MATCHED BY SOURCE reads the target through the REGISTERED
  * relation and anti-joins the source keys — inherently a target
  * pass; that is the statement's own cost, not overhead (the
  * single-DELETE shape keeps its condition directly on the registered
  * read, where it prunes).
  *
  * The whole classification — probes included — is passed as a PLAN
  * THUNK, so a lost OCC race rebuilds matched-ness against the NEW
  * head: a key inserted concurrently is re-classified matched on
  * retry instead of riding a stale not-matched verdict into the wrong
  * clause.
  */
case class GraftMergeCommand(warehouseDir: String, table: String,
    sqlName: Seq[String], keyCol: String, source: LogicalPlan,
    matchedChain: Seq[GraftDml.MergeClause],
    insertChain: Seq[GraftDml.MergeClause],
    nmbsChain: Seq[GraftDml.MergeClause]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("touched_partitions", LongType, nullable = false)())

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    import GraftDml.MergeClause
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
    val schema = ManifestVersioned.manifestSchema(spark, warehouseDir,
      table).getOrElse(throw new IllegalStateException(
        s"$table records no #schema header — MERGE needs it"))
    val tgtCols = schema.fieldNames.toSet
    val srcCols = src.columns.toSet
    // assignment validation, once, loudly: targets must be TARGET
    // schema columns; the merge key is immutable (a key change is a
    // delete+insert); a column-list INSERT must supply the key; a
    // GENERATED column is never assignable from MERGE — the change
    // relation is a CASE chain over clauses, so a value assigned in
    // one clause would NULL-fill on every other branch and trip (or
    // worse, silently skip) the transform check. Unlike UPDATE —
    // where a direct assignment is uniform across all updated rows
    // and verifies loudly — the only sound MERGE behavior is to
    // re-derive at staging, so an explicit assignment rejects here
    // instead of being silently discarded and re-derived.
    val genTargets = ManifestVersioned
      .generatedColumns(spark, warehouseDir, table).map(_.genCol).toSet
    def checkNotGenerated(c: String, what: String): Unit =
      require(!genTargets.contains(c),
        s"MERGE $what may not assign generated column '$c' of $table — " +
          "it derives from its declared transform at staging; omit it " +
          "and the engine computes the correct value per clause")
    (matchedChain ++ nmbsChain).foreach(_.sets.foreach(_.foreach {
      case (c, _) =>
        require(tgtCols.contains(c),
          s"MERGE UPDATE SET column '$c' is not in $table's schema")
        require(c != keyCol,
          s"MERGE UPDATE SET may not assign the merge key '$keyCol' — " +
            "a key change is a delete+insert")
        checkNotGenerated(c, "UPDATE SET")
    }))
    insertChain.foreach(_.sets.foreach { sets =>
      sets.foreach { case (c, _) =>
        require(tgtCols.contains(c),
          s"MERGE INSERT column '$c' is not in $table's schema")
        checkNotGenerated(c, "INSERT")
      }
      require(sets.exists(_._1 == keyCol),
        s"MERGE INSERT column list must include the merge key '$keyCol'")
    })
    val act = "__graft_act"
    val clauseC = "__graft_clause"
    // content tier: any assignment, or any matched condition reading
    // the target row, needs the matched target rows joined in
    val needsJoin = matchedChain.exists(cl => cl.sets.isDefined ||
      cl.cond.exists(GraftDml.refsTarget(_, srcCols)))
    val probeFree = matchedChain == Seq(MergeClause("U", None, None)) &&
      insertChain == Seq(MergeClause("I", None, None))

    def classify(): org.apache.spark.sql.DataFrame = {
      val fromSource =
        if (matchedChain.isEmpty && insertChain.isEmpty)
          src.limit(0).withColumn(act, lit("U"))
        else if (probeFree)
          src.withColumn(act, lit("U"))
        else {
          val srcP = src.select(src.columns.toSeq.map(c =>
            col(c).as("__s_" + c)): _*)
          val joined =
            if (needsJoin) {
              val tgtP = ManifestVersioned.rowsForKeys(spark, warehouseDir,
                  table, src.select(col(keyCol)), keyCol)
                .select(schema.fieldNames.toSeq.map(c =>
                  col(c).as("__t_" + c)): _*)
              srcP.join(tgtP,
                col("__s_" + keyCol) === col("__t_" + keyCol), "left")
            } else {
              val present = ManifestVersioned.keysPresent(spark,
                  warehouseDir, table, src.select(col(keyCol)), keyCol)
                .select(col(keyCol).as("__t_" + keyCol))
              srcP.join(present,
                col("__s_" + keyCol) === col("__t_" + keyCol), "left")
            }
          val matched = col("__t_" + keyCol).isNotNull
          // membership tier: no target content columns exist in the
          // frame, and the needsJoin gate proved nothing reads them
          val effTgt = if (needsJoin) tgtCols else Set.empty[String]
          def rwM(c: Column, what: String) = GraftDml.resolveSided(c,
            Some(srcCols), effTgt, "__s_" + _, "__t_" + _, what)
          def rwI(c: Column, what: String) = GraftDml.resolveSided(c,
            Some(srcCols), Set.empty, "__s_" + _, "__t_" + _, what)
          // first-match-wins as a right-folded CASE chain over clause
          // INDICES (several U clauses may carry different
          // assignments); no clause → NULL → the row drops (leaves
          // the target untouched, per ANSI)
          def chainIdx(chain: Seq[MergeClause], offset: Int,
              rw: (Column, String) => Column, what: String): Column =
            chain.zipWithIndex.foldRight(lit(null).cast("int")) {
              case ((cl, i), rest) =>
                when(cl.cond.map(rw(_, what)).getOrElse(lit(true)),
                  lit(offset + i)).otherwise(rest)
            }
          val clause = when(matched,
              chainIdx(matchedChain, 0, rwM,
                "MERGE WHEN MATCHED condition"))
            .otherwise(chainIdx(insertChain, 1000, rwI,
              "MERGE WHEN NOT MATCHED condition"))
          val flagged = joined.withColumn(clauseC, clause)
            .filter(col(clauseC).isNotNull)
          // output row per clause kind: U-star / I-star = the full
          // source row (extra source columns evolve the schema
          // additively, the r9 contract); U-assignments = the TARGET
          // row with assigned columns replaced (ANSI-cast to recorded
          // types); I-assignments = assigned columns, NULL fill;
          // D = the key (the engine's tombstone test is key-level)
          val srcOnly = src.columns.toSeq.filterNot(tgtCols.contains)
          // GENERATED columns the source does not carry are left out of
          // the change relation entirely — the engine re-derives them
          // at staging for every clause kind (an inserted row gets its
          // real derived value instead of a NULL-fill the transform
          // check would loudly reject; updated rows re-derive to the
          // identical value)
          // genTargets was read once in run() for assignment validation
          // — reuse it (a second manifest-header read per MERGE, and per
          // OCC re-classification, buys nothing: a concurrent genCol
          // declaration change still gates at staging via enforceChecks
          // against the live head)
          val regen = genTargets.filterNot(srcCols.contains)
          val out: Seq[(String, Option[org.apache.spark.sql.types.DataType])] =
            schema.fields.toSeq.filterNot(f => regen(f.name))
              .map(f => f.name -> Some(f.dataType)) ++
              srcOnly.map(c => c -> None)
          val branches: Seq[(Int, MergeClause, Boolean)] =
            matchedChain.zipWithIndex.map { case (cl, i) =>
              (i, cl, true) } ++
              insertChain.zipWithIndex.map { case (cl, i) =>
                (1000 + i, cl, false) }
          def valueOf(cl: MergeClause, isMatched: Boolean, c: String,
              dt: Option[org.apache.spark.sql.types.DataType]): Column = {
            def tnull = dt.map(t => lit(null).cast(t)).getOrElse(lit(null))
            def srcVal =
              if (srcCols.contains(c)) col("__s_" + c) else tnull
            cl.kind match {
              case "D" =>
                if (c == keyCol) col("__s_" + keyCol) else tnull
              case kind => cl.sets match {
                case None => srcVal
                case Some(sets) => sets.toMap.get(c) match {
                  case Some(v) =>
                    val rw = if (isMatched) rwM(v, "MERGE SET value")
                      else rwI(v, "MERGE INSERT value")
                    dt.map(rw.cast(_)).getOrElse(rw)
                  case None =>
                    if (kind == "U" && effTgt.contains(c)) col("__t_" + c)
                    else tnull
                }
              }
            }
          }
          flagged.select((out.map { case (c, dt) =>
            branches.foldRight(
                dt.map(t => lit(null).cast(t)).getOrElse(lit(null))) {
              case ((idx, cl, m), rest) =>
                when(col(clauseC) === idx, valueOf(cl, m, c, dt))
                  .otherwise(rest)
            }.as(c)
          } :+ branches.foldRight(lit(null).cast("string")) {
            case ((idx, cl, _), rest) =>
              when(col(clauseC) === idx, lit(cl.kind)).otherwise(rest)
          }.as(act)): _*)
        }
      if (nmbsChain.isEmpty) fromSource
      else {
        // target rows whose key the source does not carry, updated or
        // tombstoned in the SAME commit; conditions and values read
        // the TARGET row only
        val tgt = DslBridge.ofRows(spark, UnresolvedRelation(sqlName))
        def rwT(c: Column, what: String) = GraftDml.resolveSided(c,
          None, tgtCols, identity, identity, what)
        val nmbsRows = nmbsChain match {
          case Seq(MergeClause("D", cond, None)) =>
            // single-DELETE shape: the condition filters the REGISTERED
            // read directly, so it pushes down into the pruned scan
            cond.map(c => tgt.filter(rwT(c,
                "MERGE WHEN NOT MATCHED BY SOURCE ... DELETE condition")))
              .getOrElse(tgt)
              .join(src.select(col(keyCol).as("__nm_key")),
                col(keyCol) === col("__nm_key"), "left_anti")
              .withColumn(act, lit("D"))
          case chain =>
            val absent = tgt.join(
              src.select(col(keyCol).as("__nm_key")),
              col(keyCol) === col("__nm_key"), "left_anti")
            val clause = chain.zipWithIndex
              .foldRight(lit(null).cast("int")) { case ((cl, i), rest) =>
                when(cl.cond.map(rwT(_,
                    "MERGE WHEN NOT MATCHED BY SOURCE condition"))
                  .getOrElse(lit(true)), lit(i)).otherwise(rest)
              }
            absent.withColumn(clauseC, clause)
              .filter(col(clauseC).isNotNull)
              .select((schema.fields.toSeq.map { f =>
                chain.zipWithIndex
                  .foldRight(lit(null).cast(f.dataType)) {
                    case ((cl, i), rest) =>
                      when(col(clauseC) === i,
                        cl.sets.flatMap(_.toMap.get(f.name))
                          .map(v => rwT(v,
                              "MERGE ... BY SOURCE SET value")
                            .cast(f.dataType))
                          .getOrElse(col(f.name))).otherwise(rest)
                  }.as(f.name)
              } :+ chain.zipWithIndex
                .foldRight(lit(null).cast("string")) {
                  case ((cl, i), rest) =>
                    when(col(clauseC) === i, lit(cl.kind)).otherwise(rest)
                }.as(act)): _*)
        }
        fromSource.unionByName(nmbsRows, allowMissingColumns = true)
      }
    }
    val partCols = ManifestVersioned
      .partitionColumns(spark, warehouseDir, table)
      .getOrElse(throw new IllegalStateException(
        s"$table records no #partcols header — MERGE needs it"))
    val (touched, v) = ManifestVersioned.mergeVersionedMultiPlan(spark,
      warehouseDir, table, () => classify(), keyCol, partCols,
      order = Nil, isTombstone = col(act) === "D", sourceWins = true,
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
    sqlName: Seq[String], keyCol: String, cond: Column)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("touched_partitions", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    // re-plan the predicate over a FRESH registered-relation read: the
    // analyzer resolves it against the head schema and PruneGraftScans
    // turns it into the pruned scan — one code path with SELECT
    val matching = DslBridge.ofRows(spark,
        UnresolvedRelation(sqlName))
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
    sqlName: Seq[String], keyCol: String, sets: Seq[(String, Column)],
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
      UnresolvedRelation(sqlName))
    val filtered = cond.map(matching.filter).getOrElse(matching)
    // all assignments see the PRE-update row (ANSI): one select, every
    // column either its assignment (cast to the recorded type) or itself
    val byName = sets.toMap
    // generated columns not DIRECTLY assigned re-derive at staging:
    // dropping them here means `SET ev = ...` refreshes days(ev)
    // automatically instead of tripping the transform check with the
    // stale stored value (an explicit `SET p_day = ...` still verifies)
    val regen = ManifestVersioned
      .generatedColumns(spark, warehouseDir, table)
      .map(_.genCol).filterNot(byName.contains).toSet
    val updated = filtered.select(schema.fields.toSeq.flatMap { f =>
      if (regen.contains(f.name)) None
      else Some(byName.get(f.name).map(_.cast(f.dataType).as(f.name))
        .getOrElse(col(f.name)))
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
    val genCols = ManifestVersioned
      .generatedColumns(spark, warehouseDir, table).map(_.genCol).toSet
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
        // generated columns are HIDDEN from positional arity (their
        // value is the engine's to derive — `INSERT INTO t VALUES`
        // supplies the real columns only); name one explicitly in a
        // column list to provide it (it then verifies in the write
        // gate like any provided generated value)
        val positional = schema.fields.toSeq
          .filterNot(f => staticCols.contains(f.name) ||
            genCols.contains(f.name))
        require(q.columns.length == positional.length,
          s"INSERT needs ${positional.length} columns " +
            s"(${positional.map(_.name).mkString(", ")}), " +
            s"got ${q.columns.length}")
        q.toDF(positional.map(_.name): _*)
      }
    val withStatic = staticSpec.foldLeft(named) { case (d, (c, v)) =>
      d.withColumn(c, lit(v))
    }
    // omitted GENERATED columns stay absent (not NULL-filled): the
    // engine derives them at staging; NULL-filling would instead gate
    // a "provided" NULL against the transform and reject
    val aligned = withStatic.select(schema.fields.toSeq.flatMap { f =>
      if (withStatic.columns.contains(f.name))
        Some(col(f.name).cast(f.dataType).as(f.name))
      else if (genCols.contains(f.name)) None
      else Some(lit(null).cast(f.dataType).as(f.name))
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
