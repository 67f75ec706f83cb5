package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan,
  TableSpecBase, UnresolvedTableSpec}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftbridge.DslBridge
import org.apache.spark.sql.types.StructType

import graft.io.ManifestVersioned

/** SQL DDL lifecycle for manifest tables — with [[GraftDml]] this
  * closes the loop: a SQL-only user can now CREATE, load, query,
  * mutate and DROP a table without touching the DataFrame API:
  *
  * {{{
  *   CREATE TABLE events (k BIGINT, day STRING, v DOUBLE)
  *     USING graft PARTITIONED BY (day)
  *     OPTIONS (warehouse '/wh', keyCol 'k')
  *   CREATE TABLE top_events USING graft PARTITIONED BY (day)
  *     OPTIONS (warehouse '/wh', keyCol 'k')
  *     AS SELECT ... FROM events WHERE ...
  *   DROP TABLE [IF EXISTS] events [PURGE]
  * }}}
  *
  * `USING graft` is the interception key (without our early rule the
  * builtin path would fail on the uncataloged provider anyway, so
  * nothing silently changes meaning). `warehouse` may come from
  * OPTIONS, `LOCATION`, or the session conf `spark.graft.warehouse`;
  * `keyCol` (optional) records the merge key the DML/stream surfaces
  * resolve. CREATE bootstraps version 1 — [[ManifestVersioned
  * .writeFullMulti]] of the CTAS query result, or of an EMPTY frame
  * under the declared schema — and registers the name in the session
  * ([[GraftSqlTables.register]]); partitioning must be identity
  * columns (the manifest layer's partition model). DROP unregisters
  * the session name and leaves the data + history on disk (the
  * external-table stance — a re-CREATE over the same warehouse meets
  * `IF NOT EXISTS` as existing); `PURGE` additionally deletes the
  * table directory, history and all.
  */
object GraftDdl {

  private[plans] def isGraft(spec: TableSpecBase): Boolean = spec match {
    case u: UnresolvedTableSpec =>
      u.provider.exists(_.equalsIgnoreCase("graft"))
    case _ => false
  }

  /** (warehouse, keyCol) from OPTIONS/LOCATION/session conf. */
  private[plans] def specOptions(session: SparkSession,
      spec: UnresolvedTableSpec): (String, Option[String]) = {
    val opts: Map[String, String] = spec.optionExpression.options
      .map { case (k, v) => k.toLowerCase -> String.valueOf(v.eval()) }
      .toMap
    val wh = opts.get("warehouse").orElse(spec.location)
      .orElse(session.conf.getOption("spark.graft.warehouse"))
      .getOrElse(throw new IllegalArgumentException(
        "CREATE TABLE ... USING graft needs a warehouse: OPTIONS " +
          "(warehouse '<dir>'), LOCATION '<dir>', or the session conf " +
          "spark.graft.warehouse"))
    (wh, opts.get("keycol"))
  }

  /** The table's user TBLPROPERTIES as declared in the CREATE spec —
    * durable metadata the bootstrap must carry (graft.generated.*
    * declarations among them).
    */
  private[plans] def userPropertiesOf(spec: UnresolvedTableSpec)
      : Map[String, String] = spec.properties

  /** Partition columns + implied generated-column declarations from
    * the PARTITIONED BY clause. Identity transforms name a stored
    * column; the Iceberg-style transforms — `days(ts)`, `months(ts)`,
    * `years(ts)`, `hours(ts)`, `bucket(n, c)` — declare HIDDEN
    * partitioning: each becomes a stored generated column (named
    * `<src>_<transform>`, Iceberg's convention) plus the
    * `graft.generated.*` property that makes every write derive it
    * and every read prune through it ([[graft.io.GenCols]]).
    */
  private[graft] def partColsAndGen(partitioning: Seq[Transform])
      : (Seq[String], Map[String, String]) = {
    require(partitioning.nonEmpty,
      "CREATE TABLE ... USING graft needs PARTITIONED BY (<cols>) — " +
        "manifest tables are partition-addressed (a partition is the " +
        "unit of commit, pruning and compaction)")
    val colsGen = partitioning.map { t =>
      def src = {
        require(t.references.length == 1,
          s"partition transform $t must reference exactly one column")
        t.references.head.fieldNames.mkString(".")
      }
      t.name match {
        case "identity" => (src, None)
        case fn @ ("years" | "months" | "days" | "hours") =>
          val g = s"${src}_${fn.stripSuffix("s")}"
          (g, Some(s"graft.generated.$g" -> s"$fn($src)"))
        case "bucket" =>
          val n = t.arguments.collectFirst {
            case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
              String.valueOf(l.value)
          }.getOrElse(throw new IllegalArgumentException(
            s"bucket transform $t carries no bucket count"))
          val g = s"${src}_bucket"
          (g, Some(s"graft.generated.$g" -> s"bucket($n, $src)"))
        case _ => throw new IllegalArgumentException(
          s"unsupported partition transform $t — USING graft supports " +
            "identity columns and the hidden-partitioning transforms " +
            "days/hours/months/years/bucket")
      }
    }
    (colsGen.map(_._1), colsGen.flatMap(_._2).toMap)
  }

  private[plans] def identityPartCols(partitioning: Seq[Transform])
      : Seq[String] = partColsAndGen(partitioning)._1

  /** A parsed table constraint as the (name, SQL text) pair the
    * engine's CHECK machinery stores ([[ManifestVersioned.setCheck]]).
    * CHECK is the one supported kind — PRIMARY KEY / FOREIGN KEY /
    * UNIQUE reject loudly (nothing here could enforce them, and an
    * unenforced constraint recorded silently is a lie waiting to be
    * believed); `NOT ENFORCED` rejects for the same reason (graft
    * checks always gate writes).
    */
  private[plans] def checkConstraintOf(
      c: org.apache.spark.sql.catalyst.expressions.TableConstraint)
      : (String, String) = c match {
    case cc: org.apache.spark.sql.catalyst.expressions.CheckConstraint =>
      require(cc.userProvidedCharacteristic.enforced.forall(_ == true),
        "NOT ENFORCED CHECK constraints are not supported on graft " +
          "tables — checks always gate writes")
      val n = Option(cc.userProvidedName).getOrElse(
        throw new IllegalArgumentException(
          "name the constraint: CONSTRAINT <name> CHECK (...) — the " +
            "name is how DROP CONSTRAINT and violation errors refer " +
            "to it"))
      n -> cc.condition
    case other => throw new IllegalArgumentException(
      s"unsupported constraint on a graft table: $other — CHECK " +
        "constraints are the supported kind (PRIMARY KEY-shaped " +
        "semantics come from the merge key; nothing here could " +
        "enforce FOREIGN KEY/UNIQUE and recording them unenforced " +
        "would be a silent lie)")
  }

  private[plans] def checkConstraintsOf(spec: UnresolvedTableSpec)
      : Seq[(String, String)] = {
    val cs = spec.constraints.map(checkConstraintOf)
    require(cs.map(_._1).distinct.size == cs.size,
      "duplicate constraint names in CREATE TABLE")
    cs
  }

  private[plans] def singlePartName(nameParts: Seq[String]): String = {
    require(nameParts.size == 1,
      s"USING graft table names are single-part session names, got " +
        nameParts.mkString("."))
    nameParts.head
  }
}

/** CREATE TABLE [AS SELECT] resolved for `USING graft`: bootstrap
  * version 1 and register the session name. Returns the committed
  * version (or nothing under a met `IF NOT EXISTS`).
  */
case class GraftCreateTableCommand(warehouseDir: String, table: String,
    partCols: Seq[String], keyCol: Option[String],
    query: Option[LogicalPlan], declaredSchema: Option[StructType],
    ifNotExists: Boolean,
    checks: Seq[(String, String)] = Nil,
    properties: Map[String, String] = Map.empty)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Nil

  override def innerChildren: Seq[LogicalPlan] = query.toSeq

  override def run(spark: SparkSession): Seq[Row] = {
    val exists = ManifestVersioned
      .currentVersion(spark, warehouseDir, table).isDefined
    if (exists) {
      if (!ifNotExists) throw new IllegalArgumentException(
        s"table $table already exists under $warehouseDir (history and " +
          "all) — DROP TABLE ... PURGE first, or CREATE TABLE IF NOT " +
          "EXISTS to adopt it")
      // adopt: (re-)register the session name over the existing table
      GraftSqlTables.register(spark, warehouseDir, table, keyCol = keyCol)
      return Nil
    }
    val df = query.map(DslBridge.ofRows(spark, _)).getOrElse {
      val schema = declaredSchema.getOrElse(throw new IllegalArgumentException(
        s"CREATE TABLE $table needs columns or AS SELECT"))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    // a partition column may be GENERATED (declared via TBLPROPERTIES
    // or a PARTITIONED BY transform) — writeFullMulti derives it from
    // its source; only genuinely-unknown columns reject
    val generated = properties.keySet.collect {
      case k if k.startsWith(graft.io.GenCols.Prefix) =>
        k.stripPrefix(graft.io.GenCols.Prefix)
    }
    partCols.foreach(c => require(
      df.columns.contains(c) || generated.contains(c),
      s"partition column $c is not in $table's columns " +
        s"(${df.columns.mkString(", ")}) and no graft.generated.$c " +
        "transform declares it"))
    keyCol.foreach(k => require(df.columns.contains(k),
      s"keyCol $k is not in $table's columns"))
    // the merge key is recorded as a DURABLE table property so a fresh
    // session can recover it (GraftSqlTables.registerAll) — the conf
    // registration below is this session's convenience, not the record
    ManifestVersioned.writeFullMulti(spark, warehouseDir, table, df,
      partCols, properties = properties ++
        keyCol.map(k => Map("graft.mergeKey" -> k)).getOrElse(Map.empty))
    // declared CHECK constraints apply right after the bootstrap, each
    // validated against the created data (vacuous for an empty table;
    // a CTAS whose rows violate its own declared check fails HERE, the
    // violating version being the only one the table ever had)
    checks.foreach { case (n, e) =>
      ManifestVersioned.setCheck(spark, warehouseDir, table, n, e) }
    GraftSqlTables.register(spark, warehouseDir, table, keyCol = keyCol)
    Nil
  }
}

/** ALTER TABLE ... ADD COLUMNS resolved for a registered graft name:
  * one O(1) schema-only commit ([[ManifestVersioned.addColumns]]) —
  * new columns append nullable, existing generations read them as
  * typed NULLs, zero data IO. Returns the committed version.
  */
case class GraftAddColumnsCommand(warehouseDir: String, table: String,
    cols: StructType) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "version", org.apache.spark.sql.types.IntegerType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = Seq(Row(
    ManifestVersioned.addColumns(spark, warehouseDir, table, cols,
      note = "sql add columns")))
}

/** ALTER TABLE DROP COLUMN(S) resolved for a registered graft name:
  * the symmetric O(1) schema-only commit ([[ManifestVersioned
  * .dropColumns]]) — reads stop selecting the column, bytes reclaim on
  * the next rewrite, pre-drop versions still time-travel to it.
  */
case class GraftDropColumnsCommand(warehouseDir: String, table: String,
    cols: Seq[String], ifExists: Boolean) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "version", org.apache.spark.sql.types.IntegerType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = Seq(Row(
    ManifestVersioned.dropColumns(spark, warehouseDir, table, cols,
      ifExists, note = "sql drop columns")))
}

/** ALTER TABLE RENAME COLUMN resolved for a registered graft name:
  * the O(1) schema-only commit ([[ManifestVersioned.renameColumn]] —
  * column-mapping semantics: the physical name stays stable, reads
  * project, load-bearing columns refuse).
  */
case class GraftRenameColumnCommand(warehouseDir: String, table: String,
    from: String, to: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "version", org.apache.spark.sql.types.IntegerType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = Seq(Row(
    ManifestVersioned.renameColumn(spark, warehouseDir, table, from, to,
      note = "sql rename column")))
}

/** ALTER TABLE ... ALTER COLUMN c TYPE t resolved for a registered
  * graft name: the explicit SQL spelling of type WIDENING
  * ([[ManifestVersioned.widenColumnType]]) — an empty delta at the
  * widened type through the one widening code path, so the lattice
  * admission, bloom-sidecar rebuild and NDV rendering guards all hold
  * identically to the implicit (wider-typed write) path. Narrowing and
  * retypes reject loudly; so do rendering-changing widenings of
  * partition / generated-transform columns.
  */
case class GraftAlterColumnTypeCommand(warehouseDir: String,
    table: String, column: String,
    newType: org.apache.spark.sql.types.DataType)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "version", org.apache.spark.sql.types.IntegerType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = Seq(Row(
    ManifestVersioned.widenColumnType(spark, warehouseDir, table,
      column, newType)))
}

/** ALTER TABLE ADD CONSTRAINT <name> CHECK (<expr>) resolved for a
  * graft-addressable name: records the check in the manifest headers
  * ([[ManifestVersioned.setCheck]]) after VALIDATING the existing rows
  * (adding a constraint the table already violates rejects, naming the
  * first offender — never a constraint that lies about history). Every
  * subsequent write gates on it before staging a byte.
  */
case class GraftAddCheckCommand(warehouseDir: String, table: String,
    name: String, sqlExpr: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "version", org.apache.spark.sql.types.IntegerType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = Seq(Row(
    ManifestVersioned.setCheck(spark, warehouseDir, table, name, sqlExpr)))
}

/** ALTER TABLE DROP CONSTRAINT resolved for a graft-addressable name
  * ([[ManifestVersioned.dropCheck]] — unknown names are loud unless
  * `IF EXISTS`, which also burns no version on a no-op).
  */
case class GraftDropCheckCommand(warehouseDir: String, table: String,
    name: String, ifExists: Boolean) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "version", org.apache.spark.sql.types.IntegerType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    if (ifExists && !ManifestVersioned
        .checks(spark, warehouseDir, table).contains(name))
      return Seq(Row(
        ManifestVersioned.currentVersion(spark, warehouseDir, table).get))
    Seq(Row(ManifestVersioned.dropCheck(spark, warehouseDir, table, name)))
  }
}

/** ALTER TABLE SET/UNSET TBLPROPERTIES resolved for a registered graft
  * name: O(1) metadata commits storing user properties as durable
  * `prop.*` manifest headers ([[ManifestVersioned.setTableProperties]]
  * / [[ManifestVersioned.unsetTableProperties]]) — they travel with
  * every version and survive full rewrites; `graft.mergeKey` is the
  * conventional durable home of the DML merge key.
  */
case class GraftSetPropertiesCommand(warehouseDir: String, table: String,
    props: Map[String, String], unsetKeys: Seq[String],
    unsetIfExists: Boolean) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "version", org.apache.spark.sql.types.IntegerType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = Seq(Row(
    if (unsetKeys.nonEmpty)
      ManifestVersioned.unsetTableProperties(spark, warehouseDir, table,
        unsetKeys, unsetIfExists, note = "sql unset tblproperties")
    else
      ManifestVersioned.setTableProperties(spark, warehouseDir, table,
        props, note = "sql set tblproperties")))
}

/** SHOW TBLPROPERTIES resolved for a graft-addressable name: the read
  * side of the durable property surface ([[ManifestVersioned
  * .tableProperties]] — manifest headers, zero data reads). An
  * optional `('key')` filters to one property, reporting the Spark
  * convention's "does not have property" value when absent.
  */
case class GraftShowPropertiesCommand(warehouseDir: String, table: String,
    propertyKey: Option[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "key", org.apache.spark.sql.types.StringType, nullable = false)(),
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "value", org.apache.spark.sql.types.StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val props = ManifestVersioned.tableProperties(spark, warehouseDir,
      table)
    propertyKey match {
      case Some(k) => Seq(Row(k, props.getOrElse(k,
        s"Table $table does not have property: $k")))
      case None => props.toSeq.sortBy(_._1).map { case (k, v) =>
        Row(k, v) }
    }
  }
}

/** TRUNCATE TABLE resolved for a registered graft name: ONE O(1)
  * metadata commit with zero partitions ([[ManifestVersioned
  * .truncateTable]]) — no delete vectors (a DELETE of every row would
  * write O(rows) of them), no data IO, history stays time-travelable.
  * Returns the committed version.
  */
case class GraftTruncateCommand(warehouseDir: String, table: String)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "version", org.apache.spark.sql.types.IntegerType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = Seq(Row(
    ManifestVersioned.truncateTable(spark, warehouseDir, table,
      note = "sql truncate")))
}

/** DROP TABLE resolved for a REGISTERED graft name: unregister (and
  * under PURGE, delete the table directory — every version of it).
  */
case class GraftDropTableCommand(warehouseDir: String, table: String,
    name: String, purge: Boolean) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    GraftSqlTables.unregister(spark, name)
    if (purge) {
      val base = new org.apache.hadoop.fs.Path(
        s"$warehouseDir/$table.mv")
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(base, true): Unit
    }
    Nil
  }
}
