package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.{ColumnNode, Literal => NLit,
  UnresolvedAttribute => NAttr, UnresolvedFunction => NFn}

import graft.io.{ZoneEq, ZoneGe, ZoneGt, ZoneIn, ZoneIsNull, ZoneLe,
  ZoneLt, ZoneNotNull, ZonePred}

/** Spark 4's public `Column` wraps a connect-compatible `ColumnNode`
  * tree whose node types (`internal.UnresolvedFunction("and"/"="/">=…)`
  * over `internal.UnresolvedAttribute`/`internal.Literal` leaves) are
  * `private[sql]` — so the walk that extracts manifest-prunable
  * predicates lives HERE, in a subpackage of `org.apache.spark.sql`,
  * exactly the placement every Spark-extension library uses for such
  * access. No internal behavior is altered; this only READS the tree
  * the DSL built. A bonus of walking ColumnNodes instead of Catalyst
  * expressions: `internal.Literal` still carries the caller's EXTERNAL
  * value (Long, LocalDateTime, …) — the type `ZoneMaps.renderValue`
  * wants, with no Catalyst conversion round-trip.
  *
  * Soundness rule (the caller re-applies the ORIGINAL Column as the
  * row filter, so misses cost pruning only): extract exactly the
  * conjuncts the whole predicate IMPLIES — top-level ANDs of
  * attribute-vs-literal comparisons, IN lists, IS [NOT] NULL, and
  * null-safe equality. Anything else (ORs, casts, function calls,
  * attr-vs-attr) contributes nothing.
  */
object PredExtract {

  def fromColumn(cond: Column): Seq[ZonePred] = walk(cond.node)

  private def name(n: ColumnNode): Option[String] = n match {
    case a: NAttr if a.nameParts.size == 1 => Some(a.nameParts.head)
    case _ => None
  }

  private def cmp(a: ColumnNode, b: ColumnNode,
      direct: (String, Any) => ZonePred,
      flipped: (String, Any) => ZonePred): Seq[ZonePred] = (a, b) match {
    case (attr, l: NLit) => name(attr).map(direct(_, l.value)).toSeq
    case (l: NLit, attr) => name(attr).map(flipped(_, l.value)).toSeq
    case _ => Nil
  }

  private def walk(n: ColumnNode): Seq[ZonePred] = n match {
    case f: NFn => (f.functionName, f.arguments) match {
      case ("and", Seq(l, r)) => walk(l) ++ walk(r)
      case ("=", Seq(a, b)) => cmp(a, b, ZoneEq(_, _), ZoneEq(_, _))
      case ("<=>", Seq(a, b)) =>
        // null-safe equality: vs a NULL literal it IS the null test;
        // vs a value it implies plain equality (null <=> v is false)
        (a, b) match {
          case (attr, l: NLit) if l.value == null =>
            name(attr).map(ZoneIsNull(_)).toSeq
          case (l: NLit, attr) if l.value == null =>
            name(attr).map(ZoneIsNull(_)).toSeq
          case _ => cmp(a, b, ZoneEq(_, _), ZoneEq(_, _))
        }
      case (">", Seq(a, b)) => cmp(a, b, ZoneGt(_, _), ZoneLt(_, _))
      case (">=", Seq(a, b)) => cmp(a, b, ZoneGe(_, _), ZoneLe(_, _))
      case ("<", Seq(a, b)) => cmp(a, b, ZoneLt(_, _), ZoneGt(_, _))
      case ("<=", Seq(a, b)) => cmp(a, b, ZoneLe(_, _), ZoneGe(_, _))
      case ("in", attr +: vs)
          if vs.nonEmpty && vs.forall(_.isInstanceOf[NLit]) =>
        name(attr).map(n =>
          ZoneIn(n, vs.map(_.asInstanceOf[NLit].value))).toSeq
      case ("isNull", Seq(a)) => name(a).map(ZoneIsNull(_)).toSeq
      case ("isNotNull", Seq(a)) => name(a).map(ZoneNotNull(_)).toSeq
      case _ => Nil
    }
    case _ => Nil
  }
}
