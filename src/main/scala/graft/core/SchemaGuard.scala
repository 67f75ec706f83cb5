package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** Schema-drift guard for every stored-state `append*` path (dedup state,
  * indexes, LM deltas, SCD2, incremental join/agg): a nightly delta whose
  * schema has drifted from the stored relation must FAIL FAST at the
  * gate, not halfway through a positional `insertInto` (which silently
  * cross-wires same-typed columns) or as a mid-write cast error that
  * leaves a partial append behind.
  *
  * Default is REJECT: the delta's column names must match the stored
  * relation's exactly (order-insensitive — appends re-project into stored
  * order anyway) and each common column's type must be identical.
  * With `align = true` the delta is coerced instead, reusing
  * [[Merge.alignedUnion]]'s target-schema rules: missing columns become
  * typed NULLs, extra columns are dropped, drifted types cast to the
  * STORED type (the state relation is authoritative — it outlives any
  * one batch). The knob is explicit because silent coercion is a policy
  * decision (a renamed source column becomes a column of NULLs), not a
  * default.
  */
object SchemaGuard {

  /** `a` WIDENS losslessly to `b` — the engine's one safe-retype
    * lattice, shared by [[Merge.alignedUnion]] (the union's
    * authoritative type) and the manifest layer's schema evolution
    * ([[graft.io.ManifestVersioned]]): integral byte → short → int →
    * long, {byte,short,int} → double (every int32 is exact in a
    * double), integral → decimal with enough integer digits, and
    * decimal growth that shrinks neither the scale nor the
    * integer-digit capacity. Every pair here is VALUE-EXACT — which is
    * what keeps zone-map stat tokens sound across a widening — and
    * natively readable by Spark 4's parquet reader (the Delta
    * type-widening support). float → double is deliberately absent:
    * floats render shortest-repr stat tokens that do not bound their
    * widened double values.
    */
  def widens(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (a, b) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (ByteType | ShortType | IntegerType, DoubleType) => true
      case (x: DecimalType, y: DecimalType) =>
        y.scale >= x.scale &&
          y.precision - y.scale >= x.precision - x.scale
      case (ByteType, d: DecimalType) => d.precision - d.scale >= 3
      case (ShortType, d: DecimalType) => d.precision - d.scale >= 5
      case (IntegerType, d: DecimalType) => d.precision - d.scale >= 10
      case (LongType, d: DecimalType) => d.precision - d.scale >= 20
      case _ => false
    }
  }

  /** The widening `a` → `b` is RENDERING-STABLE: every value's
    * `cast(v AS string)` is byte-identical at the narrow and at the
    * widened type. This is the admission rule for widening a column
    * under an NDV policy WITHOUT touching its sidecars: KMV sketches
    * hash the STRING rendering ([[graft.io.NdvSidecar.stage]] —
    * `md5Long("ndv:" || cast(c as string))`), so a sketch staged at
    * `int` and one staged at `long` agree on every shared value exactly
    * when the renderings do. Stable: the integral chain (`5` renders
    * `"5"` at every width), integral → scale-0 decimal (`"5"` again),
    * and precision-only decimal growth (the scale fixes the rendering —
    * `"5.00"` either way). NOT stable: → double (`"5"` becomes `"5.0"`)
    * and decimal scale growth (`"5.00"` becomes `"5.000"`) — those
    * widenings stay rejected under an NDV policy. Stability composes:
    * every admitted edge preserves renderings, so chains do too
    * (pinned, with the rendering claim itself, in
    * `SchemaGuardLatticeSpec`).
    */
  def renderStable(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    widens(a, b) && ((a, b) match {
      case (ByteType | ShortType | IntegerType | LongType,
            ByteType | ShortType | IntegerType | LongType) => true
      case (ByteType | ShortType | IntegerType | LongType,
            d: DecimalType) => d.scale == 0
      case (x: DecimalType, y: DecimalType) => y.scale == x.scale
      case _ => false
    })
  }

  /** Conform `delta` to the stored schema, or throw. `what` names the
    * state relation in the error. Internal helper columns appended by the
    * state machinery itself (multiplicity, batch tags) belong to
    * `stored`; the caller passes the delta BEFORE attaching them when the
    * stored relation carries extras the batch never sees.
    *
    * `renames` (delta-side name → stored-side name) handles the drift a
    * real upstream actually performs: COLUMN RENAMES (the reference's
    * regex-suffix normalization exists precisely because source names
    * churn). The map is EXPLICIT — the stored schema stays authoritative
    * and an undeclared rename still rejects loudly (it surfaces as
    * missing+extra). Each declared rename applies only when the old name
    * is present (a batch from an already-migrated source passes
    * unchanged); a batch carrying BOTH names is ambiguous and throws.
    */
  def conform(stored: StructType, delta: DataFrame, align: Boolean,
      what: String, renames: Map[String, String] = Map.empty): DataFrame = {
    val renamed = renames.foldLeft(delta) { case (d, (from, to)) =>
      val names = d.schema.fieldNames.toSet
      if (names.contains(from) && names.contains(to))
        throw new IllegalArgumentException(
          s"ambiguous rename appending to $what: delta carries BOTH " +
            s"'$from' and its declared rename target '$to'")
      else if (names.contains(from)) d.withColumnRenamed(from, to)
      else d
    }
    conform0(stored, renamed, align, what)
  }

  private def conform0(stored: StructType, delta: DataFrame, align: Boolean,
      what: String): DataFrame = {
    val storedTypes = stored.fields.map(f => f.name -> f.dataType).toMap
    val deltaTypes = delta.schema.fields.map(f => f.name -> f.dataType).toMap
    if (!align) {
      val missing = storedTypes.keySet -- deltaTypes.keySet
      val extra = deltaTypes.keySet -- storedTypes.keySet
      // nullability is writer-dependent metadata, not drift — compare
      // structurally so a non-nullable literal column matches its
      // nullable stored twin
      val drifted = storedTypes.keySet.intersect(deltaTypes.keySet)
        .filterNot(c => org.apache.spark.sql.types.DataType
          .equalsStructurally(storedTypes(c), deltaTypes(c),
            ignoreNullability = true))
      if (missing.nonEmpty || extra.nonEmpty || drifted.nonEmpty)
        throw new IllegalArgumentException(
          s"schema drift appending to $what (pass align=true to coerce): " +
            s"missing=${missing.toSeq.sorted.mkString(",")} " +
            s"extra=${extra.toSeq.sorted.mkString(",")} " +
            s"retyped=${drifted.toSeq.sorted
              .map(c => s"$c:${deltaTypes(c).simpleString}->${storedTypes(c).simpleString}")
              .mkString(",")}")
      delta.select(stored.fieldNames.map(col).toIndexedSeq: _*)
    } else
      delta.select(stored.fields.map { f =>
        deltaTypes.get(f.name) match {
          case Some(t) if t == f.dataType => col(f.name)
          case Some(_) => col(f.name).cast(f.dataType).as(f.name)
          case None => lit(null).cast(f.dataType).as(f.name)
        }
      }.toIndexedSeq: _*)
  }
}
