package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Column-name operators (SURVEY.md §2.2 rows P1, P2, P3, P6, P10).
  *
  * Reference behavior: `helper_functions.py:9-63`. All name logic here is pure
  * driver-side metadata work; the DataFrame application is a SINGLE `select`
  * projection so Catalyst analyzes one node instead of the reference's O(N)
  * `withColumnRenamed` chain (`incremental_etl_v1.py:97-98`), which makes the
  * analyzer re-walk an N-deep plan per column. At 100 TB nothing here touches
  * data — column pruning still reaches the scan because the projection is a
  * plain alias list.
  */
object Normalize {

  /** P1 — strip Dynamics field-ID suffixes (`-\d+`) and lowercase.
    * Reference: `helper_functions.py:9-13`. Idempotent (property-tested).
    */
  def normalizeName(name: String): String =
    name.replaceAll("-\\d+", "").toLowerCase

  /** P2 — names occurring more than once. Reference: `helper_functions.py:16-23`. */
  def duplicateNames(names: Seq[String]): Set[String] =
    names.groupBy(identity).collect { case (n, occ) if occ.size > 1 => n }.toSet

  /** P1+P2+P3 — normalize every column name, then drop columns whose normalized
    * name is duplicated. The reference drops ALL occurrences of a duplicated name,
    * not just the extras (`helper_functions.py:132-137`) — that quirk is the
    * default here; `keepFirst = true` is the lossless variant (SURVEY.md §2.12).
    *
    * Columns are addressed positionally (via a temporary unique rename) so the
    * transform is well-defined even if the input already has duplicate names
    * (possible after a CSV header read).
    */
  def normalizeColumns(df: DataFrame, keepFirst: Boolean = false): DataFrame = {
    val normalized = df.columns.toSeq.map(normalizeName)
    val dups = duplicateNames(normalized)
    val tmp = df.toDF(normalized.indices.map(i => s"__graft_c$i"): _*)
    val seen = scala.collection.mutable.Set.empty[String]
    val kept = normalized.zipWithIndex.collect {
      case (n, i) if !dups(n) || (keepFirst && seen.add(n)) =>
        col(s"__graft_c$i").as(n)
    }
    tmp.select(kept: _*)
  }

  /** P6 — rename columns containing characters the warehouse forbids.
    * Reference renames exactly `$company` -> `_company`
    * (`helper_functions.py:183`, `incremental_etl_v1.py:114`).
    */
  def renameReserved(
      df: DataFrame,
      mapping: Map[String, String] = Map("$company" -> "_company")): DataFrame = {
    val renamed = df.columns.map(c => mapping.getOrElse(c, c))
    df.toDF(renamed: _*)
  }

  /** P10 — path -> destination table name: last path segment, alphanumerics only,
    * lowercase. Reference: `helper_functions.py:55-63`.
    */
  def tableName(path: String): String =
    path.split('/').last.filter(_.isLetterOrDigit).toLowerCase

  /** Flatten nested STRUCT columns to top level with `sep`-joined names
    * (`address.city` → `address_city`) — the normalization JSON ingest
    * needs before a relational warehouse will take the rows. Recursive
    * (structs of structs flatten fully); ARRAYS are left intact — array
    * explosion multiplies rows and is a modeling decision
    * (`explode`/`posexplode` downstream), not a name rewrite. Pure
    * column projection: zero shuffle, one codegen'd pass, and column
    * pruning still reaches the source because each output column maps to
    * one nested field reference.
    */
  def flattenStructs(df: DataFrame, sep: String = "_"): DataFrame = {
    import org.apache.spark.sql.types.StructType
    def fields(prefix: String, ref: Column,
        tpe: StructType): Seq[Column] =
      tpe.fields.toSeq.flatMap { f =>
        val name = if (prefix.isEmpty) f.name else s"$prefix$sep${f.name}"
        f.dataType match {
          case st: StructType => fields(name, ref.getField(f.name), st)
          case _ => Seq(ref.getField(f.name).as(name))
        }
      }
    val cols = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case st: StructType => fields(f.name, col(f.name), st)
        case _ => Seq(col(f.name))
      }
    }
    df.select(cols: _*)
  }
}
