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

  /** OR-aware extraction: a bounded DNF of the predicate's prunable
    * skeleton — a list of BRANCHES (conjunct sets) whose disjunction
    * the whole predicate IMPLIES. `(a AND b) OR (c AND d)` — the
    * date-range-union shape plain conjunct extraction gives up on —
    * yields `[[a,b],[c,d]]`, and the caller prunes with the UNION of
    * per-branch survivors (sound by the same one-way argument: a row
    * satisfying the predicate satisfies some branch entirely, so its
    * partition survives that branch). A branch with NO conjuncts
    * (`Nil`) means "this arm is unprunable" — it survives everything,
    * collapsing the union to no-pruning exactly when it must.
    * Branch count is capped ([[MaxBranches]]); an AND whose cross
    * product would blow past it falls back to its smaller side (A∧B
    * implies A — still sound, just coarser).
    */
  def fromColumnOr(cond: Column): Seq[Seq[ZonePred]] = walkOr(cond.node)

  private[graftbridge] val MaxBranches = 32

  private def walkOr(n: ColumnNode): Seq[Seq[ZonePred]] = n match {
    case f: NFn if f.functionName == "and" && f.arguments.size == 2 =>
      val (l, r) = (walkOr(f.arguments(0)), walkOr(f.arguments(1)))
      if (l.size * r.size > MaxBranches)
        (if (l.size <= r.size) l else r)
      else for { a <- l; b <- r } yield a ++ b
    case f: NFn if f.functionName == "or" && f.arguments.size == 2 =>
      val both = walkOr(f.arguments(0)) ++ walkOr(f.arguments(1))
      if (both.size > MaxBranches) Seq(Nil) else both
    case other =>
      // leaf shapes reuse the conjunct walk (it never sees and/or here)
      Seq(walk(other))
  }

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
