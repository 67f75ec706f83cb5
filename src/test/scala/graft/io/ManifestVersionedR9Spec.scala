package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-9 manifest-table features: TYPE-WIDENING schema evolution
  * (the safe value-preserving lattice, cast-on-read for older
  * generations through the parquet reader's native widening), the
  * SQL-INSERT append path ([[ManifestVersioned.appendRows]] — slice ∪
  * rows under an expectation-carrying commit), and the key-presence
  * probe ([[ManifestVersioned.keysPresent]] — the MERGE matched
  * classifier over the zone+bloom locate).
  */
class ManifestVersionedR9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wh(): String =
    Files.createTempDirectory("graft-mv9").toString

  // ── type widening ───────────────────────────────────────────────────

  test("int->long widening: old generations read up; zone pruning stays sound") {
    val w = wh()
    val v1 = (0 until 6).map(k => (k, if (k % 2 == 0) "a" else "b", k))
      .toDF("k", "p", "v")
      .select(col("k").cast("int").as("k"), col("p"),
        col("v").cast("int").as("v"))
    ManifestVersioned.writeFull(spark, w, "t", v1, "p")
    // the delta REPLACES partition b with long-typed rows, one value
    // past int range — provably long
    val big = 5000000000L
    val v2 = Seq((1L, "b", big), (3L, "b", 33L)).toDF("k", "p", "v")
      .select(col("k").cast("long").as("k"), col("p"), col("v"))
    ManifestVersioned.writeDelta(spark, w, "t", v2, "p")
    // head schema widened to long; both generations read coherently
    val sch = ManifestVersioned.manifestSchema(spark, w, "t").get
    assert(sch("k").dataType === LongType && sch("v").dataType === LongType)
    val got = ManifestVersioned.read(spark, w, "t")
      .select("k", "p", "v").as[(Long, String, Long)].collect().toSet
    assert(got === Set((0L, "a", 0L), (2L, "a", 2L), (4L, "a", 4L),
      (1L, "b", big), (3L, "b", 33L)))
    // time travel: v1 still reads under ITS recorded (int) schema
    assert(ManifestVersioned.manifestSchema(spark, w, "t", Some(1))
      .get("k").dataType === IntegerType)
    // zone pruning across MIXED-token generations (int tokens in the
    // a-partition entry, long in b): the long bound prunes a, keeps b
    val kept = ManifestVersioned.readWhereEntries(spark, w, "t",
      Seq(ZoneGe("v", 1000000000L))).map(_._1)
    assert(kept === Seq(ManifestVersioned.keyOf("b")))
    assert(ManifestVersioned.readWhere(spark, w, "t",
        Seq(ZoneGe("v", 1000000000L)))
      .select("k").as[Long].collect().toSeq === Seq(1L))
    // ...and the int-side bound keeps both partitions' survivors
    // (value-exact tokens): a holds v ∈ {0,2,4}, b nothing ≤ 4
    assert(ManifestVersioned.readWhere(spark, w, "t", Seq(ZoneLe("v", 4L)))
      .count() === 3L)
  }

  test("a NARROWER delta stages under the wider recorded schema") {
    val w = wh()
    ManifestVersioned.writeFull(spark, w, "t",
      Seq((1L, "a", 10L)).toDF("k", "p", "v"), "p")
    val narrow = Seq((2, "a", 20), (3, "b", 30)).toDF("k", "p", "v")
      .select(col("k").cast("int").as("k"), col("p"),
        col("v").cast("int").as("v"))
    ManifestVersioned.writeDelta(spark, w, "t", narrow, "p")
    assert(ManifestVersioned.manifestSchema(spark, w, "t")
      .get("k").dataType === LongType, "recorded schema stays long")
    assert(ManifestVersioned.read(spark, w, "t")
      .select("k", "p", "v").as[(Long, String, Long)].collect().toSet ===
      Set((2L, "a", 20L), (3L, "b", 30L)))
  }

  test("decimal precision/scale growth widens; values read exactly") {
    val w = wh()
    val v1 = Seq(("a", "12.34"), ("b", "1.50")).toDF("p", "x")
      .select(col("p"), col("x").cast(DecimalType(5, 2)).as("x"))
    ManifestVersioned.writeFull(spark, w, "t", v1, "p")
    val v2 = Seq(("b", "12345678.9012")).toDF("p", "x")
      .select(col("p"), col("x").cast(DecimalType(12, 4)).as("x"))
    ManifestVersioned.writeDelta(spark, w, "t", v2, "p")
    assert(ManifestVersioned.manifestSchema(spark, w, "t")
      .get("x").dataType === DecimalType(12, 4))
    assert(ManifestVersioned.read(spark, w, "t")
      .select(col("x").cast("string")).as[String].collect().toSet ===
      Set("12.3400", "12345678.9012"))
  }

  test("off-lattice retypes reject loudly; float->double names the reason") {
    val w = wh()
    ManifestVersioned.writeFull(spark, w, "t",
      Seq((1L, "a", 1.5f)).toDF("k", "p", "f"), "p")
    val e = intercept[IllegalArgumentException] {
      ManifestVersioned.writeDelta(spark, w, "t",
        Seq((2L, "a", 2.5d)).toDF("k", "p", "f"), "p")
    }
    assert(e.getMessage.contains("float->double"))
    // narrowing rejects
    val w2 = wh()
    ManifestVersioned.writeFull(spark, w2, "t",
      Seq((1L, "a", 10L)).toDF("k", "p", "v"), "p")
    intercept[IllegalArgumentException] {
      ManifestVersioned.writeDelta(spark, w2, "t",
        Seq(("x", "a", 1L)).toDF("k", "p", "v"), "p") // string k
    }
  }

  test("widening an NDV-policied column: rendering-stable accepts (sketches stay exact), rendering-changing rejects; bloom-policied widens WITH a sidecar rebuild") {
    val w = wh()
    val v1 = (0 until 4).map(k => (k, "a", k)).toDF("k", "p", "v")
      .select(col("k").cast("int").as("k"), col("p"), col("v"))
    // NDV policy + int->long: the sketches hash the STRING rendering
    // and "5" renders "5" at either width — the widening is accepted
    // with NO sidecar touch, and the fold over mixed-generation
    // sidecars (v1 staged at int, v2 at long) stays EXACT
    ManifestVersioned.writeFullMulti(spark, w, "t", v1, Seq("p"),
      ndvCols = Seq("k"))
    ManifestVersioned.writeDelta(spark, w, "t",
      Seq((5000000000L, "b", 5)).toDF("k", "p", "v"), "p")
    val ndv = ManifestVersioned.columnNdv(spark, w, "t", Seq("k")).collect()
    assert(ndv.length === 1 && ndv(0).getLong(1) === 5L &&
      ndv(0).getBoolean(2), "mixed-width sketches must fold exactly")
    // NDV policy + int->double: "5" renders "5.0" at double — the old
    // sketches would double-count every shared value; rejects
    val wD = wh()
    ManifestVersioned.writeFullMulti(spark, wD, "t", v1, Seq("p"),
      ndvCols = Seq("k"))
    val e = intercept[IllegalArgumentException] {
      ManifestVersioned.writeDelta(spark, wD, "t",
        Seq((5.5d, "a", 5)).toDF("k", "p", "v"), "p")
    }
    assert(e.getMessage.contains("NDV policy") &&
      e.getMessage.contains("rendering"))
    // BLOOM policy: the widening commit rebuilds every live sidecar at
    // the new type (see ManifestVersionedR10Spec for the probe matrix)
    val w2 = wh()
    ManifestVersioned.writeFullMulti(spark, w2, "t", v1, Seq("p"),
      bloomCols = Seq("k"))
    ManifestVersioned.writeDelta(spark, w2, "t",
      Seq((5000000000L, "b", 5)).toDF("k", "p", "v"), "p")
    assert(ManifestVersioned.read(spark, w2, "t").count() === 5L)
    // the same widening on an unpolicied column sails through
    val w3 = wh()
    ManifestVersioned.writeFullMulti(spark, w3, "t", v1, Seq("p"),
      bloomCols = Seq("v"))
    ManifestVersioned.writeDelta(spark, w3, "t",
      Seq((5000000000L, "a", 5)).toDF("k", "p", "v"), "p")
    assert(ManifestVersioned.read(spark, w3, "t").count() === 1L)
  }

  test("the nightly merge crosses a widening (mergeVersioned over widened head)") {
    val w = wh()
    val v1 = (0 until 6).map(k => (k, if (k % 2 == 0) "a" else "b", k))
      .toDF("k", "p", "v")
      .select(col("k").cast("int").as("k"), col("p"), col("v"))
    ManifestVersioned.writeFull(spark, w, "t", v1, "p")
    val change = Seq((2L, "a", 222L, false), (5000000000L, "b", 1L, false),
      (1L, "b", 0L, true)).toDF("k", "p", "v", "del")
    ManifestVersioned.mergeVersioned(spark, w, "t", change, "k", "p",
      order = Seq(col("v").desc), isTombstone = col("del"))
    val got = ManifestVersioned.read(spark, w, "t")
      .select("k", "v").as[(Long, Long)].collect().toSet
    assert(got === Set((0L, 0L), (2L, 222L), (4L, 4L), (3L, 3L),
      (5L, 5L), (5000000000L, 1L)))
  }

  // ── appendRows (the SQL INSERT path) ────────────────────────────────

  test("appendRows unions into touched partitions and reuses the rest") {
    val w = wh()
    ManifestVersioned.writeFull(spark, w, "t",
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "p", "v"), "p")
    val e1 = ManifestVersioned.manifestEntries(spark, w, "t")
    val v = ManifestVersioned.appendRows(spark, w, "t",
      Seq((3L, "a", 30L), (4L, "c", 40L)).toDF("k", "p", "v"))
    assert(v === 2)
    assert(ManifestVersioned.read(spark, w, "t")
      .select("k", "p", "v").as[(Long, String, Long)].collect().toSet ===
      Set((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L), (4L, "c", 40L)))
    val e2 = ManifestVersioned.manifestEntries(spark, w, "t")
    assert(e2(ManifestVersioned.keyOf("b")) ===
      e1(ManifestVersioned.keyOf("b")), "untouched partition reused")
    assert(e2(ManifestVersioned.keyOf("a")).dir !==
      e1(ManifestVersioned.keyOf("a")).dir)
    // duplicate keys coexist (INSERT has no key semantics); empty
    // append commits nothing
    ManifestVersioned.appendRows(spark, w, "t",
      Seq((1L, "a", 99L)).toDF("k", "p", "v"))
    assert(ManifestVersioned.read(spark, w, "t").filter(col("k") === 1L)
      .count() === 2L)
    assert(ManifestVersioned.appendRows(spark, w, "t",
      Seq.empty[(Long, String, Long)].toDF("k", "p", "v")) === 3)
  }

  test("appendRows with an additive column evolves the schema") {
    val w = wh()
    ManifestVersioned.writeFull(spark, w, "t",
      Seq((1L, "a", 10L)).toDF("k", "p", "v"), "p")
    ManifestVersioned.appendRows(spark, w, "t",
      Seq((2L, "a", 20L, "x")).toDF("k", "p", "v", "tag"))
    assert(ManifestVersioned.read(spark, w, "t")
      .select("k", "tag").as[(Long, Option[String])].collect().toSet ===
      Set((1L, None), (2L, Some("x"))))
  }

  // ── keysPresent (the MERGE matched probe) ───────────────────────────

  test("keysPresent answers membership through the pruned locate") {
    val w = wh()
    val base = (0L until 40L)
      .map(k => (k, if (k < 20) "a" else "b", k)).toDF("k", "p", "v")
    ManifestVersioned.writeFull(spark, w, "t", base, "p")
    val probe = Seq(3L, 19L, 20L, 99L, 1000L).toDF("k")
    assert(ManifestVersioned.keysPresent(spark, w, "t", probe, "k")
      .as[Long].collect().toSet === Set(3L, 19L, 20L))
    // nothing present: empty frame, correct schema
    val none = ManifestVersioned.keysPresent(spark, w, "t",
      Seq(500L).toDF("k"), "k")
    assert(none.columns.toSeq === Seq("k") && none.count() === 0L)
    // NULL probe keys drop (not a key-match in SQL semantics)
    assert(ManifestVersioned.keysPresent(spark, w, "t",
        Seq[Option[Long]](Some(5L), None).toDF("k"), "k")
      .as[Long].collect().toSet === Set(5L))
  }
}
