package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** NDV sidecars: per-partition KMV distinct sketches under the
  * `#ndvcols` policy, folded by `columnNdv` into table-wide distinct
  * counts with zero data reads — EXACT (and marked so) while every
  * sketch is complete, deterministic-estimate beyond, NULL whenever
  * any live generation cannot vouch for the column.
  */
class NdvSidecarSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ndv(wh: String, cols: Seq[String], asOf: Option[Int] = None)
      : Map[String, (Option[Long], Boolean)] =
    ManifestVersioned.columnNdv(spark, wh, "t", cols, asOf)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2)))
      .toMap

  test("exact counts across partitions, maintained through deltas and merges") {
    val wh = Files.createTempDirectory("graft-ndv1").toString
    val df = (0L until 200L)
      .map(k => (k, if (k % 2 == 0) "a" else "b", s"cat${k % 7}"))
      .toDF("k", "p", "cat")
    ManifestVersioned.writeFull(spark, wh, "t", df, "p",
      ndvCols = Seq("cat", "k"))
    assert(ndv(wh, Seq("cat", "k")) ===
      Map("cat" -> (Some(7L), true), "k" -> (Some(200L), true)))
    // a delta replacing one partition re-sketches it under the
    // inherited policy; a new category appears in the count
    ManifestVersioned.writeDelta(spark, wh, "t",
      (0L until 100L).map(k => (k * 2, "a", if (k == 0) "catNEW" else s"cat${(k * 2) % 7}"))
        .toDF("k", "p", "cat"), "p")
    assert(ndv(wh, Seq("cat")) === Map("cat" -> (Some(8L), true)))
    // history still answers with the OLD version's sketches
    assert(ndv(wh, Seq("cat"), asOf = Some(1)) ===
      Map("cat" -> (Some(7L), true)))
  }

  test("saturated sketches estimate within KMV error and say is_exact=false") {
    val wh = Files.createTempDirectory("graft-ndv2").toString
    val n = 20000L
    ManifestVersioned.writeFull(spark, wh, "t",
      (0L until n).map(k => (k, "a")).toDF("k", "p"), "p",
      ndvCols = Seq("k"))
    val Some((Some(est), exact)) = ndv(wh, Seq("k")).get("k")
    assert(!exact)
    assert(math.abs(est - n).toDouble / n < 0.15,
      s"KMV estimate off: $est vs $n")
  }

  test("delete vectors flip exactness (upper bound), a fold restores it") {
    val wh = Files.createTempDirectory("graft-ndv3").toString
    ManifestVersioned.writeFull(spark, wh, "t",
      (0L until 50L).map(k => (k, "a", s"c${k % 5}")).toDF("k", "p", "cat"),
      "p", ndvCols = Seq("cat"))
    ManifestVersioned.deleteRows(spark, wh, "t",
      Seq((1L, "a")).toDF("k", "p"), "k", Seq("p"))
    assert(ndv(wh, Seq("cat")) === Map("cat" -> (Some(5L), false)),
      "an outstanding DV makes the count an upper bound")
    ManifestVersioned.compactPartitions(spark, wh, "t", "p", Seq("a"))
    assert(ndv(wh, Seq("cat")) === Map("cat" -> (Some(5L), true)),
      "folding re-sketches the survivors")
  }

  test("unpolicied columns and pre-policy generations report NULL") {
    val wh = Files.createTempDirectory("graft-ndv4").toString
    // v1 WITHOUT a policy, so partition a's generation has no sidecar
    ManifestVersioned.writeFull(spark, wh, "t",
      Seq((1L, "a", "x")).toDF("k", "p", "cat"), "p")
    ManifestVersioned.writeFull(spark, wh, "t",
      Seq((1L, "a", "x"), (2L, "b", "y")).toDF("k", "p", "cat"), "p",
      ndvCols = Seq("cat"))
    assert(ndv(wh, Seq("cat")) === Map("cat" -> (Some(2L), true)))
    // column outside the policy: NULL, never a guess
    assert(ndv(wh, Seq("k")) === Map("k" -> (None, false)))
    // the pre-policy v1 generation cannot vouch
    assert(ndv(wh, Seq("cat"), asOf = Some(1)) ===
      Map("cat" -> (None, false)))
  }

  test("NULLs are excluded (count-distinct semantics) and all-null folds to 0") {
    val wh = Files.createTempDirectory("graft-ndv5").toString
    val df = Seq[(Long, String, String)](
      (1L, "a", "x"), (2L, "a", null), (3L, "b", null))
      .toDF("k", "p", "cat")
    ManifestVersioned.writeFull(spark, wh, "t", df, "p",
      ndvCols = Seq("cat"))
    assert(ndv(wh, Seq("cat")) === Map("cat" -> (Some(1L), true)))
    ManifestVersioned.writeFull(spark, wh, "t",
      Seq[(Long, String, String)]((1L, "a", null)).toDF("k", "p", "cat"),
      "p", ndvCols = Seq("cat"))
    assert(ndv(wh, Seq("cat")) === Map("cat" -> (Some(0L), true)))
  }

  test("sidecars survive restore; sketches merge across many partitions exactly") {
    val wh = Files.createTempDirectory("graft-ndv6").toString
    ManifestVersioned.writeFull(spark, wh, "t",
      (0L until 300L).map(k => (k, s"p${k % 10}", s"g${k % 37}"))
        .toDF("k", "p", "cat"),
      "p", ndvCols = Seq("cat"))
    assert(ndv(wh, Seq("cat")) === Map("cat" -> (Some(37L), true)))
    ManifestVersioned.writeDelta(spark, wh, "t",
      Seq((9999L, "p0", "EXTRA")).toDF("k", "p", "cat"), "p")
    ManifestVersioned.restore(spark, wh, "t", 1)
    assert(ndv(wh, Seq("cat")) === Map("cat" -> (Some(37L), true)),
      "restored generations keep their sidecars")
  }
}
