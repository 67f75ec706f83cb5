package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values / bottom-k) distinct-value sketch as a native
  * Catalyst aggregate — the INTERSECTABLE companion to the HLL state
  * ([[graft.ext.SketchState]]). HLL registers union perfectly but cannot
  * intersect; the bottom-k sketch supports Jaccard/intersection
  * estimation between two corpora ("how much does the new crawl overlap
  * the training set?") because it is a uniform SAMPLE of the distinct
  * hash space, not a lossy projection of it.
  *
  * `kmv_sketch(hv, k)` keeps the k SMALLEST DISTINCT values of a long
  * hash column (the caller hashes with [[Hashing.md5Long]], so the
  * DuckDB oracle can replay the sketch exactly: bottom-k distinct
  * hashes = `SELECT DISTINCT hv ORDER BY hv LIMIT k` — the sketch value
  * is ORDER-INVARIANT, unlike Misra-Gries, so live, stored, and oracle
  * forms are all bit-identical).
  *
  * Scale shape: k longs of memory per partition buffer, one k-entry row
  * per partition in the merge shuffle — the distinct-key relation
  * (billions of rows for web-scale token/shingle spaces) is never
  * shuffled, the same promise as `mg_sketch`. KMV is exactly mergeable:
  * bottom-k of a union of bottom-k's IS the bottom-k of the union, so
  * per-batch stored sketches reconstruct the corpus sketch losslessly.
  *
  * Estimator (Beyer et al., SIGMOD'07): with U the bottom-k of the
  * union and d its k-th smallest value over a hash domain of size M,
  * |distinct| ≈ (k−1)·M/d; Jaccard ≈ |{h ∈ U : h in BOTH sides}|/k.
  * When fewer than k distinct values exist the sketch IS the set and
  * every estimate is exact — [[graft.ext.SketchState.kmvOverlap]]
  * carries that case explicitly.
  */
object KmvExpressions {

  /** Bottom-k distinct longs, emitted ascending. */
  case class KmvAgg(
      child: Expression,
      k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[mutable.TreeSet[Long]]
      with UnaryLike[Expression] {

    override def prettyName: String = "kmv_sketch"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType && k >= 2) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a BIGINT child and k >= 2, got ${child.dataType.sql} / $k")

    override def createAggregationBuffer(): mutable.TreeSet[Long] =
      mutable.TreeSet.empty

    private def add(buf: mutable.TreeSet[Long], v: Long): Unit =
      if (buf.size < k) buf += v
      else if (v < buf.last && !buf.contains(v)) { buf -= buf.last; buf += v }

    override def update(buf: mutable.TreeSet[Long],
        input: InternalRow): mutable.TreeSet[Long] = {
      val v = child.eval(input)
      if (v != null) add(buf, v.asInstanceOf[Long])
      buf
    }

    override def merge(buf: mutable.TreeSet[Long],
        other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
      other.foreach(add(buf, _))
      buf
    }

    override def eval(buf: mutable.TreeSet[Long]): Any =
      new GenericArrayData(buf.toArray.map(_.asInstanceOf[Any]))

    override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(buf.size)
      buf.foreach(out.writeLong)
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = mutable.TreeSet.empty[Long]
      var i = 0
      while (i < n) { buf += in.readLong(); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): KmvAgg =
      copy(child = newChild)
  }

  /** Register `kmv_sketch(hv, k)` in the session registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("kmv_sketch",
      (es: Seq[Expression]) => KmvAgg(es(0),
        es(1).eval().asInstanceOf[Number].intValue), "built-in")
}
