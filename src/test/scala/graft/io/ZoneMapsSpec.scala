package graft.io

import org.scalatest.funsuite.AnyFunSuite

import graft.io.ManifestVersioned.ColRange
import org.apache.spark.sql.types._

/** Unit rules of the zone-map layer: lossless (de)serialization and the
  * one-way conservatism contract — every doubtful path KEEPS the
  * partition ([[ManifestVersionedR8Spec]] covers the integrated
  * readWhere behavior over real manifests).
  */
class ZoneMapsSpec extends AnyFunSuite {

  test("renderStats/parseStats round-trip exotic tokens losslessly") {
    val stats = Map(
      "a col" -> ColRange(Some("x,y;z\tw"), Some("søndag")),
      "n" -> ColRange(Some("-12.5"), Some("1e9")),
      "allnull" -> ColRange(None, None))
    assert(ZoneMaps.parseStats(ZoneMaps.renderStats(stats)) === stats)
    assert(ZoneMaps.parseStats("") === Map.empty)
  }

  test("rendering is deterministic (name-sorted) for stable manifest bytes") {
    val a = Map("b" -> ColRange(Some("1"), Some("2")),
      "a" -> ColRange(Some("3"), Some("4")))
    assert(ZoneMaps.renderStats(a) ===
      ZoneMaps.renderStats(a.toSeq.reverse.toMap))
  }

  private val schema = Some(StructType(Seq(
    StructField("l", LongType), StructField("s", StringType),
    StructField("ts", TimestampType), StructField("nt", TimestampNTZType))))

  test("numeric ranges compare as numbers, not strings") {
    // lexicographically "9" > "10" — a string compare would wrongly prune
    val st = Map("l" -> ColRange(Some("9"), Some("10")))
    assert(ZoneMaps.mayMatch(st, ZoneEq("l", 10L), schema))
    assert(!ZoneMaps.mayMatch(st, ZoneEq("l", 11L), schema))
    assert(!ZoneMaps.mayMatch(st, ZoneGt("l", 10L), schema))
    assert(ZoneMaps.mayMatch(st, ZoneGe("l", 10L), schema))
  }

  test("conservatism: missing stats / no schema / family mismatch keep") {
    val st = Map("l" -> ColRange(Some("1"), Some("2")))
    // column with no recorded stats
    assert(ZoneMaps.mayMatch(st, ZoneEq("other", 99L), schema))
    // no schema at all (pre-schema-header manifest)
    assert(ZoneMaps.mayMatch(st, ZoneEq("l", 99L), None))
    // type-family mismatch: a zoned Timestamp pred against an NTZ
    // column would need the session timezone — must keep
    val tsSt = Map("nt" -> ColRange(
      Some("2024-01-01 00:00:00.000000000"),
      Some("2024-01-02 00:00:00.000000000")))
    assert(ZoneMaps.mayMatch(tsSt,
      ZoneGt("nt", java.sql.Timestamp.valueOf("2030-01-01 00:00:00")),
      schema))
    // …while the exact-family LocalDateTime pred prunes
    assert(!ZoneMaps.mayMatch(tsSt,
      ZoneGt("nt", java.time.LocalDateTime.parse("2030-01-01T00:00:00")),
      schema))
  }

  test("non-BMP strings are incomparable (UTF-16 vs UTF-8 order) and keep") {
    // U+10000 (surrogate pair) — Java compareTo orders by UTF-16 unit,
    // Spark's UTF8String by UTF-8 byte; they disagree exactly here
    val supp = new String(Character.toChars(0x10000))
    val st = Map("s" -> ColRange(Some(supp), Some(supp)))
    assert(ZoneMaps.mayMatch(st, ZoneGt("s", "�"), schema))
    // plain BMP strings do compare and prune
    val bmp = Map("s" -> ColRange(Some("a"), Some("c")))
    assert(!ZoneMaps.mayMatch(bmp, ZoneGt("s", "x"), schema))
  }

  test("wide/signed years decline comparison — never a wrong prune") {
    val dSchema = Some(StructType(Seq(StructField("d", DateType),
      StructField("ts", TimestampType))))
    // year 10000 renders WIDER than the yyyy regime ('10000-…' from
    // Date.toString, '+10000-…' from the formatter); lexicographically
    // it sorts BELOW '2020-…', so a naive compare would call the
    // partition's max < the bound and wrongly prune a matching row
    val junkMaxD = Map("d" -> ColRange(Some("2020-01-01"),
      Some("10000-01-01")))
    assert(ZoneMaps.mayMatch(junkMaxD, ZoneGe("d",
      java.sql.Date.valueOf("2024-06-01")), dSchema),
      "a far-future junk max must KEEP the partition, not prune it")
    val junkMaxTs = Map("ts" -> ColRange(
      Some("2020-01-01 00:00:00.000000000"),
      Some("+10000-01-01 00:00:00.000000000")))
    assert(ZoneMaps.mayMatch(junkMaxTs, ZoneGe("ts",
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00")), dSchema))
    // negative years are sign-prefixed and decline likewise
    assert(ZoneMaps.mayMatch(Map("d" -> ColRange(Some("-0500-01-01"),
      Some("-0100-01-01"))),
      ZoneLe("d", java.sql.Date.valueOf("2024-06-01")), dSchema))
    // the fixed-width regime still compares and prunes
    assert(!ZoneMaps.mayMatch(Map("d" -> ColRange(Some("2020-01-01"),
      Some("2021-01-01"))),
      ZoneGe("d", java.sql.Date.valueOf("2024-06-01")), dSchema))
  }

  test("all-null ranges disprove every null-rejecting pred") {
    val st = Map("l" -> ColRange(None, None))
    for (p <- Seq(ZoneEq("l", 1L), ZoneGt("l", 1L), ZoneGe("l", 1L),
        ZoneLt("l", 1L), ZoneLe("l", 1L), ZoneIn("l", Seq(1L, 2L))))
      assert(!ZoneMaps.mayMatch(st, p, schema), s"$p must prune all-null")
  }

  test("ZoneIn survives iff ANY member may live in the range") {
    val st = Map("l" -> ColRange(Some("10"), Some("20")))
    assert(ZoneMaps.mayMatch(st, ZoneIn("l", Seq(1L, 15L, 99L)), schema))
    assert(!ZoneMaps.mayMatch(st, ZoneIn("l", Seq(1L, 99L)), schema))
    // the empty IN-list matches nothing anywhere
    assert(!ZoneMaps.mayMatch(st, ZoneIn("l", Nil), schema))
    // one incomparable member keeps the partition (conservatism)
    assert(ZoneMaps.mayMatch(st,
      ZoneIn("l", Seq(99L, "not-a-number")), schema))
  }
}
