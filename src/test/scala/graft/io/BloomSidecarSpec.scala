package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bloom-filter sidecars: per-partition membership pruning for
  * SCATTERED keys — the fixture interleaves keys across partitions so
  * every partition's zone RANGE spans the whole key space (range
  * pruning provably keeps everything) and only membership can prune.
  */
class BloomSidecarSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 5 partitions × 40 keys, round-robin: partition p holds keys
    * {p, p+5, p+10, …} — every partition's [min, max] covers ~the full
    * 0..199 range, so zone maps keep all 5 for any probe.
    */
  private def scattered(wh: String, bloomCols: Seq[String]): Unit = {
    val df = (0L until 200L).map(k =>
      (k, s"p${k % 5}", k * 10L)).toDF("k", "p", "v")
    ManifestVersioned.writeFull(spark, wh, "t", df, "p", bloomCols)
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "p", "v").as[(Long, String, Long)].collect().toSet

  test("prune: a point probe keeps its true partition and drops the rest") {
    val wh = Files.createTempDirectory("graft-bl1").toString
    scattered(wh, Seq("k"))
    val entries = ManifestVersioned.manifestEntries(spark, wh, "t").toSeq
    assert(entries.forall(_._2.bloom.isDefined), "policy stages sidecars")
    // zone maps CANNOT prune this fixture: every partition's k-range
    // intersects any probe
    val zone = ManifestVersioned.readWhereEntries(spark, wh, "t",
      Seq(ZoneEq("k", 7L)))
    assert(zone.size === 5, "ranges overlap — zone pruning is blind here")
    // bloom prunes to (essentially) the one true partition; fpp ~0.8%
    // per filter is deterministic for the fixed fixture+hash, and the
    // true partition can never drop (no false negatives)
    val surv = BloomSidecar.prune(spark,
      new org.apache.hadoop.fs.Path(s"$wh/t.mv"), entries, "k",
      Seq(7L).toDF("k"))
    assert(surv.contains(ManifestVersioned.keyOf("p2")), "7 lives in p2")
    assert(surv.size < 5, "membership prunes where ranges cannot")
  }

  test("readWhere: equality/IN on a bloomed column scans fewer partitions, same rows") {
    val wh = Files.createTempDirectory("graft-bl2").toString
    scattered(wh, Seq("k"))
    val eq = Seq(ZoneEq("k", 13L))
    val kept = ManifestVersioned.readWhereEntriesBloom(spark, wh, "t", eq)
    assert(kept.map(_._1).contains(ManifestVersioned.keyOf("p3")))
    assert(kept.size < 5, "the scan set shrank below the zone verdict")
    assert(rows(ManifestVersioned.readWhere(spark, wh, "t", eq)) ===
      Set((13L, "p3", 130L)))
    val in = Seq(ZoneIn("k", Seq(13L, 14L, null)))
    val keptIn = ManifestVersioned.readWhereEntriesBloom(spark, wh, "t", in)
    assert(keptIn.size < 5)
    assert(rows(ManifestVersioned.readWhere(spark, wh, "t", in)) ===
      Set((13L, "p3", 130L), (14L, "p4", 140L)))
  }

  test("readWhere: a type-mismatched literal skips bloom (conservative), result exact") {
    val wh = Files.createTempDirectory("graft-bl3").toString
    scattered(wh, Seq("k"))
    // Int literal against a Long column: zone maps may still prune by
    // RANGE (they compare as BigDecimal) but bloom must not hash a
    // coerced twin — the gate keeps the zone verdict
    val preds = Seq(ZoneEq("k", 13))
    assert(ManifestVersioned.readWhereEntriesBloom(spark, wh, "t", preds)
      .size === ManifestVersioned.readWhereEntries(spark, wh, "t", preds)
      .size, "mismatched literal type must not bloom-prune")
    assert(rows(ManifestVersioned.readWhere(spark, wh, "t", preds)) ===
      Set((13L, "p3", 130L)))
  }

  test("merge locate: bloom shrinks the candidate set; merge result path-equal") {
    val whB = Files.createTempDirectory("graft-bl4b").toString
    val whN = Files.createTempDirectory("graft-bl4n").toString
    scattered(whB, Seq("k"))
    scattered(whN, Nil)
    val change = Seq((7L, "p2", 777L, false), (203L, "p3", 2030L, false),
      (11L, null.asInstanceOf[String], 0L, true)).toDF("k", "p", "v", "del")
    // pinned candidate set: zone keeps all 5, bloom keeps only the
    // partitions that may hold keys {7, 203, 11} — p2 (7), p1 (11);
    // 203 lives nowhere yet
    val baseEntries = ManifestVersioned.manifestEntries(spark, whB, "t")
    val cand = ManifestVersioned.locateCandidates(spark, whB, "t", 1,
      baseEntries, change,
      change.select(col("k").as("__mv_key")).distinct(), "k")
    assert(cand.toSet.subsetOf(baseEntries.keySet))
    assert(Set("p2", "p1").map(ManifestVersioned.keyOf(_))
      .subsetOf(cand.toSet), "true holders never prune")
    assert(cand.size < 5, "bloom pruned the locate scan")
    // path equivalence: bloomed and bloom-free tables merge identically
    for (wh <- Seq(whB, whN))
      ManifestVersioned.mergeVersioned(spark, wh, "t", change, "k", "p",
        Seq(col("v").desc), col("del"))
    assert(rows(ManifestVersioned.read(spark, whB, "t")) ===
      rows(ManifestVersioned.read(spark, whN, "t")))
    assert(rows(ManifestVersioned.read(spark, whB, "t"))
      .contains((7L, "p2", 777L)))
    assert(!rows(ManifestVersioned.read(spark, whB, "t"))
      .exists(_._1 == 11L), "tombstone applied")
  }

  test("merge locate: NULL change keys and type mismatch keep the zone set") {
    val wh = Files.createTempDirectory("graft-bl5").toString
    scattered(wh, Seq("k"))
    val baseEntries = ManifestVersioned.manifestEntries(spark, wh, "t")
    val withNull = Seq((Some(7L), "p2", 777L), (None, "p0", 1L))
      .toDF("k", "p", "v")
    assert(ManifestVersioned.locateCandidates(spark, wh, "t", 1,
      baseEntries, withNull,
      withNull.select(col("k").as("__mv_key")).distinct(), "k")
      .size === 5, "a NULL key keeps everything (null-safe locate join)")
    val intKeys = Seq((7, "p2", 777L)).toDF("k", "p", "v")
    assert(ManifestVersioned.locateCandidates(spark, wh, "t", 1,
      baseEntries, intKeys,
      intKeys.select(col("k").as("__mv_key")).distinct(), "k")
      .size === 5, "an int probe against a long column must not hash")
  }

  test("deltas inherit the policy; a policy-free table never prunes") {
    val wh = Files.createTempDirectory("graft-bl6").toString
    scattered(wh, Seq("k"))
    ManifestVersioned.writeDelta(spark, wh, "t",
      Seq((500L, "p9", 5000L)).toDF("k", "p", "v"), "p")
    val e = ManifestVersioned.manifestEntries(spark, wh, "t")(
      ManifestVersioned.keyOf("p9"))
    assert(e.bloom.isDefined, "the delta staged a sidecar under the policy")
    // policy-free twin: entries carry no sidecar, prune keeps all
    val wh2 = Files.createTempDirectory("graft-bl7").toString
    scattered(wh2, Nil)
    val entries2 = ManifestVersioned.manifestEntries(spark, wh2, "t").toSeq
    assert(entries2.forall(_._2.bloom.isEmpty))
    assert(BloomSidecar.prune(spark,
      new org.apache.hadoop.fs.Path(s"$wh2/t.mv"), entries2, "k",
      Seq(7L).toDF("k")).size === 5)
  }

  test("an all-NULL bloomed column yields no sidecar row — probes keep") {
    val wh = Files.createTempDirectory("graft-bl8").toString
    val df = Seq((1L, "a", Some(10L)), (2L, "a", Some(20L)),
      (3L, "b", None), (4L, "b", None)).toDF("k", "p", "v")
    ManifestVersioned.writeFull(spark, wh, "t", df, "p", Seq("v"))
    val entries = ManifestVersioned.manifestEntries(spark, wh, "t")
    assert(entries(ManifestVersioned.keyOf("a")).bloom.isDefined)
    // b's only bloomed column is all-NULL: no bloom dir staged at all
    assert(entries(ManifestVersioned.keyOf("b")).bloom.isEmpty)
    val surv = BloomSidecar.prune(spark,
      new org.apache.hadoop.fs.Path(s"$wh/t.mv"), entries.toSeq, "v",
      Seq(999L).toDF("v"))
    assert(surv.contains(ManifestVersioned.keyOf("b")),
      "no sidecar ⇒ no pruning evidence ⇒ keep")
    assert(!surv.contains(ManifestVersioned.keyOf("a")),
      "a's sidecar disproves 999")
  }

  test("compaction folds delete vectors INTO a fresh sidecar") {
    val wh = Files.createTempDirectory("graft-bl9").toString
    scattered(wh, Seq("k"))
    ManifestVersioned.deleteRows(spark, wh, "t",
      Seq((7L, "p2")).toDF("k", "p"), "k", Seq("p"))
    ManifestVersioned.compactPartitions(spark, wh, "t", "p", Seq("p2"))
    val e = ManifestVersioned.manifestEntries(spark, wh, "t")(
      ManifestVersioned.keyOf("p2"))
    assert(e.deletes.isEmpty && e.bloom.isDefined,
      "the rewrite folded the vector and re-bloomed the survivors")
    assert(!rows(ManifestVersioned.read(spark, wh, "t")).exists(_._1 == 7L))
  }

  test("vacuum: referenced sidecars survive, superseded ones sweep") {
    val wh = Files.createTempDirectory("graft-bl10").toString
    scattered(wh, Seq("k"))
    // v2 replaces p0 — p0's v1 generation AND its sidecar age out
    ManifestVersioned.writeDelta(spark, wh, "t",
      (0L until 200L by 5L).map(k => (k, "p0", k)).toDF("k", "p", "v"), "p")
    def bloomDirs() = {
      val b = new java.io.File(s"$wh/t.mv/blooms")
      b.listFiles().flatMap(k => k.listFiles().map(g =>
        s"blooms/${k.getName}/${g.getName}")).toSet
    }
    assert(bloomDirs().size === 6, "5 from v1 + p0's replacement")
    ManifestVersioned.vacuum(spark, wh, "t", keepHistory = 0)
    val live = ManifestVersioned.manifestEntries(spark, wh, "t")
      .values.flatMap(_.bloom).toSet
    assert(bloomDirs() === live, "exactly the head's sidecars remain")
    assert(live.size === 5)
    // the table still reads and still bloom-prunes after the sweep
    val kept = ManifestVersioned.readWhereEntriesBloom(spark, wh, "t",
      Seq(ZoneEq("k", 13L)))
    assert(kept.size < 5)
    assert(rows(ManifestVersioned.readWhere(spark, wh, "t",
      Seq(ZoneEq("k", 13L)))) === Set((13L, "p3", 130L)))
  }

  test("a full rewrite WITHOUT bloomCols drops the policy") {
    val wh = Files.createTempDirectory("graft-bl11").toString
    scattered(wh, Seq("k"))
    assert(ManifestVersioned.bloomColumns(spark, wh, "t") ===
      Some(Seq("k")))
    scattered(wh, Nil) // v2: layout-defining rewrite, no policy
    assert(ManifestVersioned.bloomColumns(spark, wh, "t").isEmpty)
    assert(ManifestVersioned.manifestEntries(spark, wh, "t")
      .values.forall(_.bloom.isEmpty))
    // history keeps its sidecars
    assert(ManifestVersioned.bloomColumns(spark, wh, "t", Some(1)) ===
      Some(Seq("k")))
  }

  test("deleteRowsLocate: bare keys locate through zone+bloom and erase everywhere") {
    val wh = Files.createTempDirectory("graft-bl13").toString
    scattered(wh, Seq("k"))
    val before = ManifestVersioned.manifestEntries(spark, wh, "t")
    // bare ids: 7 (p2), 11 (p1), 9999 (nowhere), NULL (dropped)
    val (applied, v) = ManifestVersioned.deleteRowsLocate(spark, wh, "t",
      Seq(Some(7L), Some(11L), Some(9999L), Option.empty[Long]).toDF("k"),
      "k")
    assert(applied === 2 && v === 2)
    val after = ManifestVersioned.manifestEntries(spark, wh, "t")
    assert(after.values.map(_.dir).toSet === before.values.map(_.dir).toSet,
      "vectors only — no partition rewrote")
    assert(after(ManifestVersioned.keyOf("p2")).deletes.size === 1)
    assert(after(ManifestVersioned.keyOf("p1")).deletes.size === 1)
    assert(after(ManifestVersioned.keyOf("p0")).deletes.isEmpty,
      "unlocated partitions gain nothing")
    val ks = ManifestVersioned.read(spark, wh, "t")
      .select("k").as[Long].collect().toSet
    assert(!ks.contains(7L) && !ks.contains(11L) && ks.contains(12L))
    // int-typed bare keys cast to the recorded long and still locate
    val (applied2, _) = ManifestVersioned.deleteRowsLocate(spark, wh, "t",
      Seq(12).toDF("k"), "k")
    assert(applied2 === 1)
    assert(!ManifestVersioned.read(spark, wh, "t")
      .select("k").as[Long].collect().toSet.contains(12L))
  }

  test("timestamp time travel: versionAtTime resolves each commit's clock") {
    val wh = Files.createTempDirectory("graft-bl14").toString
    scattered(wh, Nil)
    ManifestVersioned.writeDelta(spark, wh, "t",
      Seq((500L, "p9", 1L)).toDF("k", "p", "v"), "p")
    ManifestVersioned.writeDelta(spark, wh, "t",
      Seq((501L, "p9", 2L)).toDF("k", "p", "v"), "p")
    val ts = (1 to 3).map(v => ManifestVersioned
      .commitTimestamp(spark, wh, "t", Some(v)).get)
    assert(ts === ts.sorted, "single committer ⇒ monotonic clocks")
    assert(ManifestVersioned.versionAtTime(spark, wh, "t", ts(0) - 1).isEmpty)
    assert(ManifestVersioned.versionAtTime(spark, wh, "t", ts(0)) ===
      Some(1))
    assert(ManifestVersioned.versionAtTime(spark, wh, "t", ts(2) + 60000) ===
      Some(3))
    assert(ManifestVersioned.readAsOfTime(spark, wh, "t", ts(1))
      .count() === 201)
    intercept[java.util.NoSuchElementException] {
      ManifestVersioned.readAsOfTime(spark, wh, "t", ts(0) - 1)
    }
  }

  test("CHECK constraints gate the write boundary; NULL passes; restore restores them") {
    val wh = Files.createTempDirectory("graft-bl15").toString
    scattered(wh, Nil)
    // adopting a constraint existing rows violate refuses
    intercept[IllegalArgumentException] {
      ManifestVersioned.setCheck(spark, wh, "t", "v_small", "v < 100")
    }
    ManifestVersioned.setCheck(spark, wh, "t", "v_nonneg", "v >= 0")
    assert(ManifestVersioned.checks(spark, wh, "t") ===
      Map("v_nonneg" -> "v >= 0"))
    // a violating delta rejects BEFORE staging: no new version, no dirs
    val vBefore = ManifestVersioned.currentVersion(spark, wh, "t").get
    val e = intercept[IllegalArgumentException] {
      ManifestVersioned.writeDelta(spark, wh, "t",
        Seq((900L, "p9", -5L)).toDF("k", "p", "v"), "p")
    }
    assert(e.getMessage.contains("v_nonneg"))
    assert(ManifestVersioned.currentVersion(spark, wh, "t").get === vBefore)
    // a clean delta (and a NULL, which passes) lands
    ManifestVersioned.writeDelta(spark, wh, "t",
      Seq((900L, "p9", Some(5L)), (901L, "p9", Option.empty[Long]))
        .toDF("k", "p", "v"), "p")
    // the nightly merge enforces too (it stages through the same path;
    // a NEW key so the violating row survives latest-wins)
    intercept[IllegalArgumentException] {
      ManifestVersioned.mergeVersioned(spark, wh, "t",
        Seq((9999L, "p2", -1L, false)).toDF("k", "p", "v", "del"), "k", "p",
        Seq(col("v").desc), col("del"))
    }
    // drop; unknown names are loud; restore brings the rules back
    intercept[IllegalArgumentException] {
      ManifestVersioned.dropCheck(spark, wh, "t", "nope")
    }
    val vChecked = ManifestVersioned.currentVersion(spark, wh, "t").get
    ManifestVersioned.dropCheck(spark, wh, "t", "v_nonneg")
    assert(ManifestVersioned.checks(spark, wh, "t").isEmpty)
    ManifestVersioned.writeDelta(spark, wh, "t",
      Seq((902L, "p9", -5L)).toDF("k", "p", "v"), "p") // allowed now
    ManifestVersioned.restore(spark, wh, "t", vChecked)
    assert(ManifestVersioned.checks(spark, wh, "t") ===
      Map("v_nonneg" -> "v >= 0"), "rules travel with the restored version")
  }

  test("multi-column partitioning: sidecars stage per (date, source) cell and locate-prune") {
    val wh = Files.createTempDirectory("graft-bl16").toString
    val df = (0L until 120L).map(k =>
      (k, s"d${k % 3}", s"s${k % 2}", k * 10L))
      .toDF("k", "d", "src", "v")
    ManifestVersioned.writeFullMulti(spark, wh, "t", df, Seq("d", "src"),
      bloomCols = Seq("k"))
    val entries = ManifestVersioned.manifestEntries(spark, wh, "t")
    assert(entries.size === 6 && entries.values.forall(_.bloom.isDefined))
    // key 7 lives only in cell (d1, s1): 7%3=1, 7%2=1
    val change = Seq((7L, "d1", "s1", 777L)).toDF("k", "d", "src", "v")
    val cand = ManifestVersioned.locateCandidates(spark, wh, "t", 1,
      entries, change,
      change.select(col("k").as("__mv_key")).distinct(), "k")
    assert(cand.contains(ManifestVersioned.keyOf(Seq("d1", "s1"))))
    assert(cand.size < 6, "the 2-column cells prune by membership too")
    ManifestVersioned.mergeVersionedMulti(spark, wh, "t", change, "k",
      Seq("d", "src"), Seq(col("v").desc), lit(false))
    assert(ManifestVersioned.read(spark, wh, "t")
      .filter(col("k") === 7L).select("v").collect()(0).getLong(0) === 777L)
  }

  test("probe with only NULL keys prunes every side-carried candidate (3VL)") {
    val wh = Files.createTempDirectory("graft-bl12").toString
    scattered(wh, Seq("k"))
    val entries = ManifestVersioned.manifestEntries(spark, wh, "t").toSeq
    val surv = BloomSidecar.prune(spark,
      new org.apache.hadoop.fs.Path(s"$wh/t.mv"), entries, "k",
      Seq(Tuple1(Option.empty[Long])).toDF("k"))
    assert(surv.isEmpty,
      "equality with NULL matches nothing a bloom covers")
  }
}
