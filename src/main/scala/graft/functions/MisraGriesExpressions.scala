package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary as a native Catalyst aggregate — the
  * CANDIDATE half of exact distributed heavy-hitter detection
  * ([[graft.ext.SketchState.heavyHitters]]).
  *
  * The problem at 100 TB: "which tokens exceed share φ of a trillion
  * occurrences" cannot be answered by `GROUP BY token` alone without
  * shuffling the full distinct-token relation (billions of rows). The
  * Misra-Gries summary holds AT MOST k counters per aggregation buffer,
  * and mergeable-summaries theory (Agarwal et al., PODS'12) gives the
  * guarantee this operator leans on: merging per-partition summaries
  * (sum counts, then subtract the (k+1)-th largest and drop ≤0) keeps
  * every item whose true count exceeds N/(k+1) in the merged summary.
  * So the aggregate's value — ≤ k candidate tokens — is a SUPERSET of
  * the true heavy hitters, at k counters of memory per partition and a
  * k-entry shuffle row per partition, independent of vocabulary size.
  * A second exact pass over only the candidates makes the final answer
  * exact and merge-order-invariant (the summary itself is order-
  * sensitive; the CONFIRMED output never is — `MisraGriesSpec` pins
  * both halves).
  *
  * Buffer counts stay EXACT-in-bound: update-side decrements remove at
  * most one unit per arriving row, so Σ counts ≤ rows seen; no overflow
  * before 2^63 rows per partition.
  *
  * Two surface forms over the same buffer:
  *  - `mg_sketch(tok, k)`   → array<string> candidate keys (the original
  *    in-query form);
  *  - `mg_sketch_wt(tok, k)` → map<string, long> counters — the STORABLE
  *    form [[graft.ext.SketchState]] persists per ingest batch, whose
  *    weights a later DECLARATIVE merge (sum → subtract (k+1)-th largest
  *    → keep positive) can combine across batches without re-reading any
  *    corpus bytes. The residual weights are what makes stored summaries
  *    mergeable; keys alone are not.
  */
object MisraGriesExpressions {

  /** Shared Misra-Gries buffer machinery; concrete forms pick the value
    * representation via `eval`/`dataType`.
    */
  abstract class MisraGriesLike
      extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
      with UnaryLike[Expression] {
    def k: Int

    override def nullable: Boolean = false

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a STRING child and k >= 1, got ${child.dataType.sql} / $k")

    override def createAggregationBuffer(): mutable.HashMap[String, Long] =
      mutable.HashMap.empty

    override def update(buf: mutable.HashMap[String, Long],
        input: InternalRow): mutable.HashMap[String, Long] = {
      val v = child.eval(input)
      if (v != null) {
        // UTF8String may alias a reused page; materialize before keying
        val t = v.asInstanceOf[UTF8String].toString
        buf.get(t) match {
          case Some(c) => buf(t) = c + 1
          case None if buf.size < k => buf(t) = 1
          case None => // decrement-all step (pays for itself amortized)
            val dead = mutable.ArrayBuffer[String]()
            buf.foreach { case (key, c) =>
              if (c == 1) dead += key else buf(key) = c - 1
            }
            dead.foreach(buf.remove)
        }
      }
      buf
    }

    /** Mergeable-summaries combine: sum counts, then shrink back to k by
      * subtracting the (k+1)-th largest count from all (keep > 0).
      */
    override def merge(buf: mutable.HashMap[String, Long],
        other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      other.foreach { case (t, c) => buf(t) = buf.getOrElse(t, 0L) + c }
      if (buf.size > k) {
        val cut = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        val dead = mutable.ArrayBuffer[String]()
        buf.foreach { case (key, c) =>
          if (c - cut <= 0) dead += key else buf(key) = c - cut
        }
        dead.foreach(buf.remove)
      }
      buf
    }

    override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(buf.size)
      buf.foreach { case (t, c) =>
        val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(b.length); out.write(b); out.writeLong(c)
      }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = mutable.HashMap.empty[String, Long]
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        buf(new String(b, java.nio.charset.StandardCharsets.UTF_8)) = in.readLong()
        i += 1
      }
      buf
    }
  }

  /** Candidate summary: ≤ k tokens, emitted token-sorted (determinism of
    * the VALUE given the buffer; the buffer itself depends on arrival
    * order — see the superset contract above).
    */
  case class MisraGriesAgg(
      child: Expression,
      k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends MisraGriesLike {

    override def prettyName: String = "mg_sketch"
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def eval(buf: mutable.HashMap[String, Long]): Any =
      new GenericArrayData(
        buf.keys.toArray.sorted.map(UTF8String.fromString(_): Any))

    override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
      copy(child = newChild)
  }

  /** Weighted summary: the full ≤k counter map (key-sorted entries). The
    * residual weights under-count true frequencies by at most
    * (N − M)/(k+1) (N rows seen, M = Σ weights) — the bound the stored
    * cross-batch merge in [[graft.ext.SketchState.readHhCandidates]]
    * leans on.
    */
  case class MisraGriesWtAgg(
      child: Expression,
      k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends MisraGriesLike {

    override def prettyName: String = "mg_sketch_wt"
    override def dataType: DataType =
      MapType(StringType, LongType, valueContainsNull = false)

    override def eval(buf: mutable.HashMap[String, Long]): Any = {
      val keys = buf.keys.toArray.sorted
      new ArrayBasedMapData(
        new GenericArrayData(keys.map(UTF8String.fromString(_): Any)),
        new GenericArrayData(keys.map(buf(_): Any)))
    }

    override def withNewMutableAggBufferOffset(o: Int): MisraGriesWtAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MisraGriesWtAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): MisraGriesWtAgg =
      copy(child = newChild)
  }

  /** Register `mg_sketch(token, k)` + `mg_sketch_wt(token, k)` in the
    * session registry (idempotent).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("mg_sketch",
      (es: Seq[Expression]) => MisraGriesAgg(es(0),
        es(1).eval().asInstanceOf[Number].intValue), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("mg_sketch_wt",
      (es: Seq[Expression]) => MisraGriesWtAgg(es(0),
        es(1).eval().asInstanceOf[Number].intValue), "built-in")
  }
}
