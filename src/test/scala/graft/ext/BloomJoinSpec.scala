package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.BloomExpressions

/** Bloom-join contract: bit-identical to the direct anti/semi join, no
  * false negatives ever, and a false-positive rate small enough that the
  * prefilter actually short-circuits (the whole point of the reduction).
  */
class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // big side: ids 1..1000; every 3rd key overlaps the key set.
  private def big = (1L to 1000L).map(i => (i, s"key${i * 3}")).toDF("id", "k")
  private def keys = (1L to 3000L).filter(_ % 3 == 0)
    .map(i => s"key$i").toDF("kk")

  test("bloomAntiJoin is bit-identical to the direct left_anti join") {
    val viaBloom = BloomJoin.bloomAntiJoin(big, $"k", keys, $"kk")
      .select("id").as[Long].collect().sorted
    val direct = big.join(keys, $"k" === $"kk", "left_anti")
      .select("id").as[Long].collect().sorted
    assert(viaBloom === direct)
    assert(viaBloom.isEmpty) // every key matches here
  }

  test("bloomAntiJoin and bloomSemiJoin partition the batch exactly") {
    val disjointish = (1L to 1000L)
      .map(i => (i, if (i % 4 == 0) s"key${i * 3}" else s"fresh$i"))
      .toDF("id", "k")
    val anti = BloomJoin.bloomAntiJoin(disjointish, $"k", keys, $"kk")
      .select("id").as[Long].collect().sorted
    val semi = BloomJoin.bloomSemiJoin(disjointish, $"k", keys, $"kk")
      .select("id").as[Long].collect().sorted
    val directAnti = disjointish.join(keys, $"k" === $"kk", "left_anti")
      .select("id").as[Long].collect().sorted
    val directSemi = disjointish.join(keys, $"k" === $"kk", "left_semi")
      .select("id").as[Long].collect().sorted
    assert(anti === directAnti)
    assert(semi === directSemi)
    assert((anti ++ semi).sorted === (1L to 1000L).toArray)
  }

  test("null keys on the big side survive the anti form (join semantics)") {
    val withNulls = Seq((1L, Some("key3")), (2L, None), (3L, Some("nope")))
      .toDF("id", "k")
    val viaBloom = BloomJoin.bloomAntiJoin(withNulls, $"k", keys, $"kk")
      .select("id").as[Long].collect().sorted
    val direct = withNulls.join(keys, $"k" === $"kk", "left_anti")
      .select("id").as[Long].collect().sorted
    assert(viaBloom === direct)
    assert(viaBloom === Array(2L, 3L))
  }

  test("no false negatives; false-positive rate stays near the design point") {
    val m = BloomExpressions.bitsFor(10000) // 10 bits/key, k=7 → fpp ≈ 0.8%
    val inserted = (1L to 10000L).toArray
    val words = new Array[Long](((m + 63) / 64).toInt)
    val agg = BloomExpressions.BloomBuildAgg(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = false), m)
    var buf = agg.createAggregationBuffer()
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    inserted.foreach { x =>
      row.update(0, x)
      buf = agg.update(buf, row)
    }
    val bytes = agg.serialize(buf)
    assert(inserted.forall(BloomExpressions.mightContain(bytes, _)),
      "bloom filters must never report a false negative")
    val probes = (1000001L to 1010000L)
    val fp = probes.count(BloomExpressions.mightContain(bytes, _))
    assert(fp < 300, s"fpp ${fp / 10000.0} far above the ~0.8% design point")
    assert(words.length * 8 === bytes.length)
  }

  test("the definite-miss path carries most of a mostly-fresh batch") {
    // 90% fresh batch — the nightly-ingest shape the reduction targets.
    val batch = (1L to 1000L)
      .map(i => (i, if (i % 10 == 0) s"key${i * 3}" else s"novel$i"))
      .toDF("id", "k")
    val bloom = BloomJoin.keySetBloom(keys, $"kk",
      BloomExpressions.bitsFor(1000)).collect().head.getAs[Array[Byte]](0)
    val maybe = batch.withColumn("h", xxhash64($"k")).select("h").as[Long]
      .collect().count(BloomExpressions.mightContain(bloom, _))
    assert(maybe >= 100, "all true matches must stay possible-hits")
    assert(maybe <= 150,
      s"only ~10% of the batch should reach the confirm join, got $maybe/1000")
  }
}
