package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows = Seq(
    ("a", 1L, 100L), ("a", 2L, 250L), ("b", 3L, 50L),
    ("a", 4L, 75L), ("c", 5L, 900L), ("b", 6L, 10L))
    .toDF("g", "id", "v_fp")

  private def stateMap(df: org.apache.spark.sql.DataFrame) =
    df.select("g", "cnt", "sum_fp", "min_fp", "max_fp").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("combine of per-batch partials equals the from-scratch aggregate") {
    val direct = IncrementalAgg.partials(rows, Seq("g"), col("v_fp"))
    val b0 = IncrementalAgg.partials(rows.filter(col("id") % 2 === 0), Seq("g"), col("v_fp"))
    val b1 = IncrementalAgg.partials(rows.filter(col("id") % 2 === 1), Seq("g"), col("v_fp"))
    assert(stateMap(IncrementalAgg.combine(b0, b1, Seq("g"))) === stateMap(direct))
  }

  test("combine absorbs new groups and preserves delta-absent groups") {
    val state = IncrementalAgg.partials(rows.filter(col("g") === "a"), Seq("g"), col("v_fp"))
    val delta = IncrementalAgg.partials(
      Seq(("d", 7L, 42L)).toDF("g", "id", "v_fp"), Seq("g"), col("v_fp"))
    val out = stateMap(IncrementalAgg.combine(state, delta, Seq("g")))
    assert(out("a") === ((3L, 425L, 75L, 250L))) // untouched by the delta
    assert(out("d") === ((1L, 42L, 42L, 42L)))   // newly arrived group
  }

  test("appendStored maintains state across batches equal to a full recompute") {
    val wh = Files.createTempDirectory("graft_aggspec").toString
    def batch(i: Int) = rows.filter(col("id") % 3 === i)
    IncrementalAgg.createStored(wh, "agg_state", batch(0), Seq("g"), col("v_fp"))
    IncrementalAgg.appendStored(spark, wh, "agg_state", batch(1), Seq("g"), col("v_fp"))
    IncrementalAgg.appendStored(spark, wh, "agg_state", batch(2), Seq("g"), col("v_fp"))
    val stored = stateMap(IncrementalAgg.readStored(spark, wh, "agg_state"))
    assert(stored === stateMap(IncrementalAgg.partials(rows, Seq("g"), col("v_fp"))))
  }

  private def retractMap(df: org.apache.spark.sql.DataFrame) =
    df.select("g", "cnt", "sum_fp").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("retractable state: deletes cancel contributions; emptied groups vanish; replay is a partition replace") {
    val wh = Files.createTempDirectory("graft-iagg-r").toString
    IncrementalAgg.createRetractable(wh, "ragg",
      rows.filter($"id" <= 3), Seq("g"), col("v_fp"))
    IncrementalAgg.appendRetractable(wh, "ragg",
      rows.filter($"id" > 3), Seq("g"), col("v_fp"), lit(1L), "n2")
    // delete ALL of c's rows and one of a's
    val dels = rows.filter($"id" === 5L || $"id" === 2L)
    IncrementalAgg.appendRetractable(wh, "ragg", dels, Seq("g"),
      col("v_fp"), lit(-1L), "n3")
    val got = retractMap(IncrementalAgg.readRetractable(spark, wh, "ragg", Seq("g")))
    val survivors = rows.filter($"id" =!= 5L && $"id" =!= 2L)
    val want = retractMap(survivors.groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum("v_fp").as("sum_fp")))
    assert(got === want)
    assert(!got.contains("c"), "a fully-deleted group must vanish from the view")

    // at-least-once replay of the delete batch: its partition is REPLACED
    IncrementalAgg.appendRetractable(wh, "ragg", dels, Seq("g"),
      col("v_fp"), lit(-1L), "n3")
    assert(retractMap(IncrementalAgg.readRetractable(spark, wh, "ragg", Seq("g")))
      === want, "replayed batch tag must not double-retract")

    // compaction is a pure representation change
    IncrementalAgg.compactRetractable(spark, wh, "ragg", Seq("g"))
    assert(retractMap(IncrementalAgg.readRetractable(spark, wh, "ragg", Seq("g")))
      === want)
  }

  test("as-of read reconstructs the pre-delete view and PRUNES later batch partitions") {
    val wh = Files.createTempDirectory("graft-iagg-asof").toString
    IncrementalAgg.createRetractable(wh, "asofagg",
      rows.filter($"id" <= 3), Seq("g"), col("v_fp"))
    IncrementalAgg.appendRetractable(wh, "asofagg",
      rows.filter($"id" > 3), Seq("g"), col("v_fp"), lit(1L), "n2")
    IncrementalAgg.appendRetractable(wh, "asofagg",
      rows.filter($"id" === 5L || $"id" === 2L), Seq("g"),
      col("v_fp"), lit(-1L), "n3")

    // as of base: only the first batch's rows, the delete not yet applied
    val asBase = IncrementalAgg.readRetractableAsOf(spark, wh, "asofagg",
      Seq("g"), Seq("base"))
    val wantBase = retractMap(rows.filter($"id" <= 3).groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum("v_fp").as("sum_fp")))
    assert(retractMap(asBase) === wantBase)
    assert(asBase.columns.toSeq === Seq("g", "cnt", "sum_fp"))

    // as of n2: everything inserted, nothing deleted — c is resurrected
    // relative to the current view
    val asN2 = retractMap(IncrementalAgg.readRetractableAsOf(spark, wh,
      "asofagg", Seq("g"), Seq("base", "n2")))
    assert(asN2 === retractMap(rows.groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum("v_fp").as("sum_fp"))))
    assert(asN2.contains("c"))

    // the cutoff is partition pruning, not a post-scan filter: the n3
    // partition never reaches the scan
    val pruned = IncrementalAgg.readRetractableAsOf(spark, wh, "asofagg",
      Seq("g"), Seq("base", "n2"))
    pruned.count()
    val scan = pruned.queryExecution.executedPlan.toString
    val partFilter = "PartitionFilters: \\[[^\\]]*_ingest_batch[^\\]]*\\]".r
    assert(partFilter.findFirstIn(scan).isDefined,
      s"batch cutoff must land in PartitionFilters:\n$scan")

    // full-history as-of ≡ the serving read
    assert(retractMap(IncrementalAgg.readRetractableAsOf(spark, wh, "asofagg",
        Seq("g"), Seq("base", "n2", "n3")))
      === retractMap(IncrementalAgg.readRetractable(spark, wh, "asofagg", Seq("g"))))
  }

  // ── manifest change-feed → retractable view ─────────────────────────

  test("syncRetractableFromManifest: seed, merge-churn refresh, replay no-op") {
    import graft.io.ManifestVersioned
    val wh = Files.createTempDirectory("graft-feedagg").toString
    def fixture(ts: (Long, String, Long)*) = ts.toDF("k", "p", "v")
    def expect(): Map[String, (Long, Long)] =
      ManifestVersioned.read(spark, wh, "t")
        .groupBy("p").agg(count(lit(1)).as("cnt"), sum("v").as("s"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
    def view(): Map[String, (Long, Long)] =
      IncrementalAgg.readRetractable(spark, wh, "t_agg", Seq("p"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
    ManifestVersioned.writeFull(spark, wh, "t",
      fixture((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L)), "p")
    // seed reflects the snapshot
    assert(IncrementalAgg.syncRetractableFromManifest(spark, wh, "t",
      "t_agg", "k", Seq("p"), Seq("v"), col("v")) === 1)
    assert(view() === expect())
    // nightly churn: update (same group), group-moving update,
    // tombstone, insert — then ONE sync from the feed
    ManifestVersioned.mergeVersioned(spark, wh, "t",
      Seq((1L, "a", 11L, false), (3L, "a", 31L, false),
        (2L, null.asInstanceOf[String], 0L, true), (4L, "c", 40L, false))
        .toDF("k", "p", "v", "del"),
      "k", "p", Seq(col("v").desc), col("del"))
    assert(IncrementalAgg.syncRetractableFromManifest(spark, wh, "t",
      "t_agg", "k", Seq("p"), Seq("v"), col("v")) === 2)
    assert(view() === expect(),
      "feed deltas reproduce the from-scratch aggregate")
    assert(view().keySet === Set("a", "c"), "group b vanished with its row")
    // a replayed sync is a no-op (same head, same tag)
    assert(IncrementalAgg.syncRetractableFromManifest(spark, wh, "t",
      "t_agg", "k", Seq("p"), Seq("v"), col("v")) === 2)
    assert(view() === expect())
    // a delete-vector commit feeds as deletes and syncs too
    ManifestVersioned.deleteRows(spark, wh, "t",
      Seq((4L, "c")).toDF("k", "p"), "k", Seq("p"))
    assert(IncrementalAgg.syncRetractableFromManifest(spark, wh, "t",
      "t_agg", "k", Seq("p"), Seq("v"), col("v")) === 3)
    assert(view() === expect())
    assert(view().keySet === Set("a"))
  }
}
