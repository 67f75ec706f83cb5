package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Properties of the type-widening lattice ([[SchemaGuard.widens]]) the
  * whole evolution surface leans on — `alignedUnion`'s authoritative-
  * type pick, `mergedSchema`'s in-place widening, and the SQL MERGE
  * path all assume:
  *
  *  1. TRANSITIVITY — a schema that widened a→b and later b→c must
  *     read a-generations under c; a non-transitive lattice would
  *     strand them.
  *  2. VALUE PRESERVATION — every edge round-trips the narrow type's
  *     BOUNDARY values exactly through a Spark cast (the lattice's
  *     admission rule is "no value changes, ever"; float→double is
  *     excluded precisely because it fails this).
  *  3. NO NARROWING EDGE — the reverse direction is never admitted
  *     (except a decimal to itself, where widening is the identity).
  */
class SchemaGuardLatticeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(3000), p)
    assert(res.passed, res.status.toString)
  }

  private val genDecimal: Gen[DecimalType] = for {
    p <- Gen.choose(1, 38)
    s <- Gen.choose(0, p)
  } yield DecimalType(p, s)

  private val genType: Gen[DataType] = Gen.frequency(
    (1, Gen.const(ByteType)), (1, Gen.const(ShortType)),
    (1, Gen.const(IntegerType)), (1, Gen.const(LongType)),
    (1, Gen.const(DoubleType)), (1, Gen.const(FloatType)),
    (1, Gen.const(StringType)), (4, genDecimal))

  test("widens is transitive (a->b and b->c admit a->c)") {
    check(Prop.forAll(genType, genType, genType) { (a, b, c) =>
      !(SchemaGuard.widens(a, b) && SchemaGuard.widens(b, c)) ||
        SchemaGuard.widens(a, c)
    })
  }

  test("no narrowing edge: mutual widening only as decimal identity") {
    check(Prop.forAll(genType, genType) { (a, b) =>
      !(SchemaGuard.widens(a, b) && SchemaGuard.widens(b, a)) ||
        (a == b && a.isInstanceOf[DecimalType])
    })
  }

  test("float->double, double->anything, string retypes stay excluded") {
    assert(!SchemaGuard.widens(FloatType, DoubleType),
      "float->double re-parses shortest-repr stat tokens wrongly")
    for (t <- Seq(ByteType, ShortType, IntegerType, LongType, FloatType,
        StringType, DecimalType(38, 0)))
      assert(!SchemaGuard.widens(DoubleType, t) &&
        !SchemaGuard.widens(StringType, t))
  }

  test("renderStable is a sub-relation of widens and is transitive") {
    check(Prop.forAll(genType, genType) { (a, b) =>
      !SchemaGuard.renderStable(a, b) || SchemaGuard.widens(a, b)
    })
    check(Prop.forAll(genType, genType, genType) { (a, b, c) =>
      !(SchemaGuard.renderStable(a, b) && SchemaGuard.renderStable(b, c)) ||
        SchemaGuard.renderStable(a, c)
    })
  }

  test("renderStable admits the integral chain and scale-preserving " +
      "decimal growth, excludes -> double and scale growth") {
    assert(SchemaGuard.renderStable(IntegerType, LongType))
    assert(SchemaGuard.renderStable(ByteType, IntegerType))
    assert(SchemaGuard.renderStable(LongType, DecimalType(20, 0)))
    assert(SchemaGuard.renderStable(DecimalType(7, 2), DecimalType(12, 2)))
    assert(!SchemaGuard.renderStable(IntegerType, DoubleType),
      "int 5 renders \"5\" but double 5 renders \"5.0\"")
    assert(!SchemaGuard.renderStable(DecimalType(7, 2), DecimalType(9, 4)),
      "scale growth rerenders \"5.00\" as \"5.0000\"")
    assert(!SchemaGuard.renderStable(IntegerType, DecimalType(12, 2)),
      "int 5 renders \"5\" but decimal(12,2) renders \"5.00\"")
  }

  test("every renderStable edge keeps cast-to-string renderings " +
      "byte-identical (the NDV sidecar's hash input)") {
    import scala.jdk.CollectionConverters._
    val narrowTypes: Seq[(DataType, Seq[Any])] = Seq(
      (ByteType, Seq(Byte.MinValue, -1.toByte, 0.toByte, Byte.MaxValue)),
      (ShortType, Seq(Short.MinValue, Short.MaxValue, 7.toShort)),
      (IntegerType, Seq(Int.MinValue, Int.MaxValue, 0, -1, 1000000)),
      (LongType, Seq(Long.MinValue, Long.MaxValue, 0L, 42L)),
      (DecimalType(7, 2), Seq(new java.math.BigDecimal("99999.99"),
        new java.math.BigDecimal("-99999.99"),
        new java.math.BigDecimal("0.01"),
        new java.math.BigDecimal("100.00"))))
    val wideTypes: Seq[DataType] = Seq(ShortType, IntegerType, LongType,
      DoubleType, DecimalType(5, 0), DecimalType(10, 0), DecimalType(20, 0),
      DecimalType(38, 0), DecimalType(12, 2), DecimalType(38, 2),
      DecimalType(38, 18))
    for ((narrow, values) <- narrowTypes; wide <- wideTypes
        if SchemaGuard.renderStable(narrow, wide)) {
      val rows = values.map(v => org.apache.spark.sql.Row(v)).asJava
      val df = spark.createDataFrame(rows,
        StructType(Seq(StructField("v", narrow))))
      val mismatched = df.select(
        col("v").cast(StringType).as("narrow_s"),
        col("v").cast(wide).cast(StringType).as("wide_s"))
        .filter(col("narrow_s") =!= col("wide_s")).count()
      assert(mismatched === 0L,
        s"$narrow -> $wide changes a string rendering")
    }
  }

  test("every admitted edge round-trips the narrow type's boundary " +
      "values exactly through Spark casts") {
    import scala.jdk.CollectionConverters._
    val narrowTypes: Seq[(DataType, Seq[Any])] = Seq(
      (ByteType, Seq(Byte.MinValue, -1.toByte, 0.toByte, Byte.MaxValue)),
      (ShortType, Seq(Short.MinValue, Short.MaxValue, 0.toShort)),
      (IntegerType, Seq(Int.MinValue, Int.MaxValue, 0, -1)),
      (LongType, Seq(Long.MinValue, Long.MaxValue, 0L)),
      (DecimalType(7, 2), Seq(new java.math.BigDecimal("99999.99"),
        new java.math.BigDecimal("-99999.99"),
        new java.math.BigDecimal("0.01"))))
    val wideTypes: Seq[DataType] = Seq(ShortType, IntegerType, LongType,
      DoubleType, DecimalType(3, 0), DecimalType(5, 0), DecimalType(10, 0),
      DecimalType(20, 0), DecimalType(9, 2), DecimalType(38, 18))
    for ((narrow, values) <- narrowTypes; wide <- wideTypes
        if SchemaGuard.widens(narrow, wide)) {
      val rows = values.map(v => org.apache.spark.sql.Row(v)).asJava
      val df = spark.createDataFrame(rows,
        StructType(Seq(StructField("v", narrow))))
      // up-cast then back: ANSI throws on any overflow/precision loss,
      // and the values must come back bit-identical
      val back = df.select(col("v").cast(wide).cast(narrow).as("v"))
      assert(back.except(df).isEmpty && df.except(back).isEmpty,
        s"$narrow -> $wide does not preserve boundary values")
    }
  }
}
