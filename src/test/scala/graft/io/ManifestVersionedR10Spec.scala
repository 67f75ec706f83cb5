package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-10 manifest-table hardening, each test pinning a specific
  * failure mode found by review of the round-9 surface:
  *
  *  - a NARROWER-typed delta on a bloom-policied column (accepted by
  *    the widening lattice — base type keeps) must stage its files at
  *    the RECORDED type, because the bloom/NDV sidecars hash the
  *    staged physical type: an `xxhash64(int)` sidecar under a long
  *    recorded schema makes every long-typed probe miss, so a
  *    partition that actually holds the probed key would be wrongly
  *    pruned — silently missing rows on reads and silently skipped
  *    deletes via `deleteRowsLocate`.
  *  - a FRESH change-feed subscriber (no applied output yet) against a
  *    table whose early manifests were vacuumed must bootstrap from
  *    the discovered in-retention versions — the applied+1 backfill
  *    (which heals marker-less versions for an ESTABLISHED subscriber)
  *    would otherwise reach for version 1 forever.
  */
class ManifestVersionedR10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wh(): String =
    Files.createTempDirectory("graft-mv10").toString

  test("a narrower-typed delta on a bloom-policied column stages at the recorded type") {
    val w = wh()
    val v1 = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "p", "v")
    ManifestVersioned.writeFullMulti(spark, w, "t", v1, Seq("p"),
      bloomCols = Seq("k"))
    // INT-typed delta under the long recorded schema: the lattice
    // accepts it (recorded type keeps), and the staged files+sidecars
    // must be LONG
    val d = Seq((3, "b", 30)).toDF("k", "p", "v")
      .select(col("k").cast("int").as("k"), col("p"),
        col("v").cast("long").as("v"))
    ManifestVersioned.writeDelta(spark, w, "t", d, "p")
    val sch = ManifestVersioned.manifestSchema(spark, w, "t").get
    assert(sch("k").dataType === LongType, "recorded schema keeps long")
    // the staged parquet's own footer type is long (no schema hint)
    val bDir = ManifestVersioned.manifestEntries(spark, w, "t")
      .apply(ManifestVersioned.keyOf("b")).dir
    assert(spark.read.parquet(s"$w/t.mv/$bDir").schema("k").dataType
      === LongType, "staged file at the recorded type, not the delta's")
    // probes hashed at the recorded long type must FIND the delta's key
    assert(ManifestVersioned.keysPresent(spark, w, "t",
      Seq(3L).toDF("k"), "k").count() === 1L,
      "bloom probe missed a key the table holds (sidecar at wrong type)")
    assert(ManifestVersioned.readFiltered(spark, w, "t", col("k") === 3L)
      .count() === 1L)
    // and a locate-delete actually erases it (pre-fix: silently
    // skipped). k=2 is already gone — the delta REPLACED partition b.
    ManifestVersioned.deleteRowsLocate(spark, w, "t", Seq(3L).toDF("k"), "k")
    assert(ManifestVersioned.read(spark, w, "t")
      .select("k").as[Long].collect().toSet === Set(1L))
  }

  test("a narrower-typed MERGE change under a bloom policy keeps probes sound") {
    val w = wh()
    ManifestVersioned.writeFullMulti(spark, w, "t",
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "p", "v"), Seq("p"),
      bloomCols = Seq("k"))
    // int-typed upsert batch (a CSV-inferred nightly batch is exactly
    // this shape) — rides mergeVersionedMulti into writeDeltaInternal
    val change = Seq((2, "b", 222), (5, "a", 50)).toDF("k", "p", "v")
      .select(col("k").cast("int").as("k"), col("p"),
        col("v").cast("long").as("v"))
    ManifestVersioned.mergeVersionedMulti(spark, w, "t", change, "k",
      Seq("p"), order = Nil, isTombstone = lit(false), sourceWins = true)
    assert(ManifestVersioned.keysPresent(spark, w, "t",
      Seq(2L, 5L).toDF("k"), "k").count() === 2L)
    assert(ManifestVersioned.read(spark, w, "t")
      .select("k", "v").as[(Long, Long)].collect().toSet ===
      Set((1L, 10L), (2L, 222L), (5L, 50L)))
  }

  test("a fresh change-feed subscriber bootstraps from in-retention versions after a vacuum") {
    val w = wh()
    def fx(triples: (Long, String, Long)*) = triples.toDF("k", "p", "v")
    ManifestVersioned.writeFull(spark, w, "t", fx((1L, "a", 10L)), "p")
    ManifestVersioned.writeDelta(spark, w, "t", fx((2L, "b", 20L)), "p")
    ManifestVersioned.writeDelta(spark, w, "t", fx((1L, "a", 11L)), "p")
    ManifestVersioned.writeDelta(spark, w, "t", fx((3L, "b", 30L)), "p")
    // reclaim everything but the last two versions: manifests v1/v2 die
    ManifestVersioned.vacuum(spark, w, "t", keepHistory = 1)
    assert(ManifestVersioned.listVersions(spark, w, "t") === Seq(3, 4))
    // a FRESH subscriber discovers only the retained commits; pre-fix
    // the applied+1 backfill forced start=1 and the missing v1
    // manifest failed the read forever. The bootstrap serves the
    // oldest retained version (3) as a full INSERT snapshot — table
    // state at v3 = {(1,a,11),(2,b,20)} — then diffs onward (v4
    // replaces partition b: k=3 insert, k=2 delete).
    graft.streaming.StreamingIngest.changeFeedBatch(spark,
      Seq((s"$w/t.mv/_manifest.v00003", 3),
        (s"$w/t.mv/_manifest.v00004", 4)).toDF("manifest_path", "version"),
      w, "t", "k", "t_feed")
    assert(spark.read.parquet(s"$w/t_feed")
      .select("version", "k", "change_type")
      .as[(Int, Long, String)].collect().toSet ===
      Set((3, 1L, "insert"), (3, 2L, "insert"),
        (4, 3L, "insert"), (4, 2L, "delete")))
    // an ESTABLISHED subscriber still heals marker-less gaps: v5
    // commits markerless, v6 normally; the next batch carries only 6
    // and the feed still covers 5 (applied HWM = 4)
    ManifestVersioned.writeDelta(spark, w, "t", fx((4L, "a", 40L)), "p")
    val marker = new org.apache.hadoop.fs.Path(
      s"$w/t.mv/commits/manifest.v00005")
    marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(marker, false)
    ManifestVersioned.writeDelta(spark, w, "t", fx((5L, "b", 50L)), "p")
    graft.streaming.StreamingIngest.changeFeedBatch(spark,
      Seq((s"$w/t.mv/_manifest.v00006", 6)).toDF("manifest_path", "version"),
      w, "t", "k", "t_feed")
    // (each delta REPLACES its partition, so the previous occupant
    // emits a delete alongside the new row's insert)
    assert(spark.read.parquet(s"$w/t_feed")
      .filter(col("version") >= 5)
      .select("version", "k", "change_type")
      .as[(Int, Long, String)].collect().toSet ===
      Set((5, 4L, "insert"), (5, 1L, "delete"),
        (6, 5L, "insert"), (6, 3L, "delete")))
  }

  test("an established subscriber whose resume point fell out of retention fails loudly") {
    val w = wh()
    def fx(triples: (Long, String, Long)*) = triples.toDF("k", "p", "v")
    ManifestVersioned.writeFull(spark, w, "t", fx((1L, "a", 10L)), "p")
    // subscriber applies version 1, then falls asleep
    graft.streaming.StreamingIngest.changeFeedBatch(spark,
      Seq((s"$w/t.mv/_manifest.v00001", 1)).toDF("manifest_path", "version"),
      w, "t", "k", "t_feed")
    // table moves on and vacuum reclaims v1..v2 — the subscriber's
    // resume point (applied=1) now predates retention
    ManifestVersioned.writeDelta(spark, w, "t", fx((2L, "b", 20L)), "p")
    ManifestVersioned.writeDelta(spark, w, "t", fx((3L, "b", 30L)), "p")
    ManifestVersioned.vacuum(spark, w, "t", keepHistory = 0)
    assert(ManifestVersioned.earliestFeedVersion(spark, w, "t")
      === Some(4))
    val e = intercept[IllegalStateException] {
      graft.streaming.StreamingIngest.changeFeedBatch(spark,
        Seq((s"$w/t.mv/_manifest.v00003", 3)).toDF("manifest_path", "version"),
        w, "t", "k", "t_feed")
    }
    assert(e.getMessage.contains("vacuumed") &&
      e.getMessage.contains("Restart"),
      s"error must be actionable, got: ${e.getMessage}")
  }
}
