package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException,
  NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Column => V2Column,
  Identifier, NamespaceChange, SupportsNamespaces, Table, TableCapability,
  TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.ManifestVersioned

/** DataSourceV2 `TableCatalog` for manifest warehouses — multipart
  * names resolve in ANY fresh session/tool (JDBC, notebooks) with zero
  * code, from configuration alone:
  *
  * {{{
  *   spark.sql.extensions                     graft.GraftExtensions
  *   spark.sql.catalog.graft                  graft.catalog.GraftCatalog
  *   spark.sql.catalog.graft.warehouse.prod   /warehouses/prod
  *   // then:  SELECT …   FROM graft.prod.orders
  *   //        MERGE INTO graft.prod.orders USING …
  * }}}
  *
  * Each NAMESPACE is a warehouse alias mapped to a directory by the
  * catalog's own options (`warehouse.<alias> = <dir>`; a bare
  * `warehouse = <dir>` binds the `default` alias) — the reference's own
  * addressing is exactly this catalog shape (`project.dataset.table`,
  * `incremental_etl_v1.py:85`). Tables are DISCOVERED from the
  * directory (`<name>.mv` with a committed head), never listed in
  * config; the merge key the DML surface needs comes from the durable
  * `graft.mergeKey` table property.
  *
  * Architecture (the Delta pattern): the catalog serves METADATA —
  * [[GraftTable]] handles carry the recorded schema, partitioning and
  * properties, so `SHOW TABLES IN graft.prod` / `DESCRIBE` work through
  * the standard V2 path — while SCANS and DML are swapped to the
  * engine's own plans by the session extensions
  * ([[graft.plans.ResolveGraftTables]] rewrites both the pre-resolution
  * multipart name and the resolved `DataSourceV2Relation` into the
  * pruned [[graft.plans.GraftManifestRelation]] read;
  * [[graft.plans.ResolveGraftDml]] intercepts MERGE/UPDATE/DELETE/
  * INSERT in the hint batch, before V2 resolution sees them). The
  * handle itself advertises NO capabilities: if the extensions are
  * missing, a read fails loudly at the capability check instead of
  * silently planning a wrong scan.
  *
  * `createTable` bootstraps version 1 (empty, under the declared
  * schema, identity partitioning required, `keyCol` property recording
  * the merge key). `dropTable` refuses: the catalog is a VIEW over
  * external directories it does not own — reclaim through `DROP TABLE
  * … PURGE` on a registered name or [[ManifestVersioned]] directly.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catName: String = _
  private var warehouses: Map[String, String] = Map.empty

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouses = options.asCaseSensitiveMap().asScala.toMap.flatMap {
      case (k, v) if k.toLowerCase.startsWith("warehouse.") =>
        Some(k.substring("warehouse.".length) -> v)
      case (k, v) if k.equalsIgnoreCase("warehouse") => Some("default" -> v)
      case _ => None
    }
  }

  override def name(): String = catName

  private def spark: SparkSession = SparkSession.active

  private def dirOf(namespace: Array[String]): String = {
    if (namespace.length != 1 || !warehouses.contains(namespace(0)))
      throw new NoSuchNamespaceException(catName +: namespace.toSeq)
    warehouses(namespace(0))
  }

  override def listNamespaces(): Array[Array[String]] =
    warehouses.keys.toArray.sorted.map(Array(_))

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else { dirOf(namespace); Array.empty }

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] =
    Map("location" -> dirOf(namespace)).asJava

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && warehouses.contains(namespace(0))

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      s"namespaces of $catName are warehouse aliases bound by " +
        s"configuration — set spark.sql.catalog.$catName.warehouse." +
        s"${namespace.mkString(".")} = <dir>")

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      s"namespaces of $catName are configuration-bound")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      s"namespaces of $catName are configuration-bound")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = dirOf(namespace)
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Array.empty
    fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.endsWith(".mv"))
      .map(_.getPath.getName.stripSuffix(".mv")).sorted
      .filter(t =>
        ManifestVersioned.currentVersion(spark, dir, t).isDefined)
      .map(Identifier.of(namespace, _)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.length == 1 &&
      warehouses.contains(ident.namespace()(0)) &&
      ManifestVersioned.currentVersion(spark,
        warehouses(ident.namespace()(0)), ident.name).isDefined

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident.namespace())
    if (ManifestVersioned.currentVersion(spark, dir, ident.name).isEmpty)
      throw new NoSuchTableException(
        (catName +: ident.namespace().toSeq) :+ ident.name)
    new GraftTable(dir, ident.name,
      s"$catName.${ident.namespace().mkString(".")}.${ident.name}")
  }

  override def createTable(ident: Identifier, columns: Array[V2Column],
      partitions: Array[Transform], properties: util.Map[String, String])
      : Table = {
    val dir = dirOf(ident.namespace())
    require(ManifestVersioned
        .currentVersion(spark, dir, ident.name).isEmpty,
      s"table ${ident.name} already exists under $dir")
    // identity columns plus the hidden-partitioning transforms —
    // days/hours/months/years/bucket declare a generated column
    // (graft.plans.GraftDdl.partColsAndGen is the session-SQL twin)
    val (partCols, genProps) =
      graft.plans.GraftDdl.partColsAndGen(partitions.toSeq)
    val schema = new StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(c.name, c.dataType,
        c.nullable)))
    val props = properties.asScala.toMap
      .filterNot { case (k, _) => k.startsWith("option.") ||
        k == "owner" || k == "provider" || k == "location" }
    val keyed = props.get("keyCol") match {
      case Some(k) => props - "keyCol" + ("graft.mergeKey" -> k)
      case None => props
    }
    ManifestVersioned.writeFullMulti(spark, dir, ident.name,
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
      partCols, properties = keyed ++ genProps)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      s"ALTER on $catName tables goes through the session-registered " +
        "surface (GraftSqlTables.register / registerAll) or the " +
        "ManifestVersioned API")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      s"$catName is a configuration-bound view over external " +
        "warehouse directories — DROP TABLE ... PURGE on a registered " +
        "session name, or ManifestVersioned directly, owns deletion")

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      s"renameTable is not supported by $catName (clone + drop owns " +
        "physical renames)")
}

/** Metadata handle for one manifest table served by [[GraftCatalog]]:
  * recorded head schema, identity partitioning, durable properties.
  * Advertises NO read/write capabilities — the session extensions swap
  * scans and DML to the engine plans before the capability check runs;
  * without the extensions a query fails LOUDLY here rather than
  * planning wrongly.
  */
class GraftTable(val warehouseDir: String, val table: String,
    qualified: String) extends Table {

  private def spark: SparkSession = SparkSession.active

  override def name(): String = qualified

  override def schema(): StructType =
    ManifestVersioned.manifestSchema(spark, warehouseDir, table)
      .getOrElse(new StructType())

  override def partitioning(): Array[Transform] =
    ManifestVersioned.partitionColumns(spark, warehouseDir, table)
      .getOrElse(Nil).map(Expressions.identity).toArray

  override def properties(): util.Map[String, String] =
    ManifestVersioned.tableProperties(spark, warehouseDir, table).asJava

  override def capabilities(): util.Set[TableCapability] =
    util.Collections.emptySet()
}
