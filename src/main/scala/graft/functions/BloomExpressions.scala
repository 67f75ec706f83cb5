package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Bloom-filter build/probe as native Catalyst expressions — the
  * semi-join-reduction primitive: an anti/semi join of a batch against a
  * huge key set (e.g. the corpus `text_md5` relation of incremental dedup)
  * normally shuffles BOTH sides on the key; with a bloom filter of the key
  * set attached to the batch as one compact binary value, every
  * definite-miss row (bloom says "absent" — never a false negative) skips
  * the shuffle entirely, and only possible-hits take the exact confirm
  * join. At 100 TB the key set is billions of rows but its bloom at ~10
  * bits/key is a few GB TOTAL, built by partial aggregation (each task ORs
  * its local bitset; the merge tree carries one bitset per partition, not
  * per row) and shipped once per executor as a broadcast row.
  *
  * Both expressions are codegen'd (no CodegenFallback in the probe's
  * per-row hot path). Layout contract: bit `i` lives at byte `i >>> 3`,
  * mask `1 << (i & 7)` of the serialized bitset — build and probe agree on
  * this and nothing else needs to: the filter never crosses the oracle
  * boundary (output equality with the exact join IS the correctness
  * check).
  */
object BloomExpressions {

  /** Number of hash probes per key (k). With m/n ≈ 10 bits/key, k=7 is the
    * fpp-optimal ln2·m/n ≈ 6.9 → fpp ≈ 0.8%.
    */
  val DefaultHashFns = 7

  /** m bits for a target of ~10 bits per expected distinct key. */
  def bitsFor(expectedKeys: Long): Long = math.max(64L, expectedKeys * 10L)

  /** Double hashing (Kirsch–Mitzenmacher): probe i tests bit
    * (h1 + i·h2) mod m, h2 forced odd; h1/h2 from a splitmix64-style
    * finalizer so nearby longs (sequential ids) spread uniformly.
    */
  private[functions] def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Build side: aggregates `child` (BIGINT key hashes) into a serialized
    * bitset of `numBits` bits. Partial aggregation applies — each input
    * partition builds one local bitset, merges OR them — so the shuffle to
    * the final reducer carries one bitset per partition. For multi-GB
    * bitsets at extreme scale, prefer more bits only as the key count
    * demands (callers size via [[BloomExpressions.bitsFor]]).
    */
  case class BloomBuildAgg(
      child: Expression,
      numBits: Long,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

    override def prettyName: String = "bloom_build"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType && numBits >= 64)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a BIGINT child and numBits >= 64, " +
          s"got ${child.dataType.sql} / $numBits")

    private def numWords: Int = (((numBits + 63) >>> 6).min(Int.MaxValue)).toInt

    /** Effective modulus — `numBits` rounded UP to the word boundary, i.e.
      * exactly `serializedBytes.length * 8`: the probe side derives its
      * modulus from the bitset length alone, so build and probe agree by
      * construction for any requested size.
      */
    private def m: Long = numWords.toLong * 64L

    override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

    override def update(buf: Array[Long],
        input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val x = v.asInstanceOf[Long]
        val h1 = mix(x)
        val h2 = mix(h1) | 1L
        var i = 0
        while (i < DefaultHashFns) {
          val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
          buf((bit >>> 6).toInt) |= 1L << (bit & 63L)
          i += 1
        }
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < buf.length) { buf(i) |= other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Long]): Any = serialize(buf)

    /** Little-endian per word, so byte `i >>> 3` bit `i & 7` == word
      * `i >>> 6` bit `i & 63` — the probe's byte-addressed contract.
      */
    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.asLongBuffer().put(buf)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val out = new Array[Long](bytes.length / 8)
      java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
      out
    }

    override def withNewMutableAggBufferOffset(o: Int): BloomBuildAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BloomBuildAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
      copy(child = newChild)
  }

  /** Probe side: true iff the key MIGHT be in the set the bitset was built
    * from; false is definitive absence. `bloom` is the serialized bitset
    * (in practice a constant per row via a 1-row broadcast join), `value`
    * the BIGINT key hash. Codegen'd — this runs once per batch row.
    */
  case class BloomMightContain(left: Expression, right: Expression)
      extends BinaryExpression {

    override def prettyName: String = "bloom_might_contain"
    override def dataType: DataType = org.apache.spark.sql.types.BooleanType
    override def nullIntolerant: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == BinaryType && right.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (BINARY bloom, BIGINT key), " +
          s"got ${left.dataType.sql} / ${right.dataType.sql}")

    override def nullSafeEval(bloomAny: Any, keyAny: Any): Any = {
      val bits = bloomAny.asInstanceOf[Array[Byte]]
      BloomExpressions.mightContain(bits, keyAny.asInstanceOf[Long])
    }

    override def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val cls = BloomExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, (bloom, key) => {
        s"${ev.value} = $cls.mightContain($bloom, $key);"
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): BloomMightContain =
      copy(left = newLeft, right = newRight)
  }

  /** Shared probe kernel (also the codegen entry point). */
  def mightContain(bits: Array[Byte], x: Long): Boolean = {
    val m = bits.length.toLong * 8L
    val h1 = mix(x)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < DefaultHashFns) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      if ((bits((bit >>> 3).toInt) & (1 << (bit & 7L).toInt)) == 0) return false
      i += 1
    }
    true
  }

  /** Register `bloom_build(keyHash, numBits)` / `bloom_might_contain` in
    * the session registry (idempotent). The analyzer wraps the registered
    * AggregateFunction in an AggregateExpression at resolution.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // Number.longValue, not asInstanceOf[Long]: a SQL integer literal
    // evaluates to a boxed java.lang.Integer, which a direct Long cast
    // rejects with ClassCastException.
    reg.createOrReplaceTempFunction("bloom_build",
      (es: Seq[Expression]) => BloomBuildAgg(es(0),
        es(1).eval().asInstanceOf[Number].longValue), "built-in")
    reg.createOrReplaceTempFunction("bloom_might_contain",
      (es: Seq[Expression]) => BloomMightContain(es(0), es(1)), "built-in")
  }
}
