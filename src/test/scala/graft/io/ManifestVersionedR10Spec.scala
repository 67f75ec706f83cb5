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

  // ── CONVERT in place (zero-copy onboarding) ───────────────────────

  test("convertTable adopts a hive-partitioned parquet dir without copying") {
    val w = wh()
    val src = s"${wh()}/lake"
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("k", "p", "v")
    // the in-file partition column requirement: partitionBy consumes
    // its column, so the source duplicates it into a helper dir column
    df.withColumn("pd", col("p")).write.partitionBy("pd").parquet(src)
    val v1 = ManifestVersioned.convertTable(spark, w, "conv", src,
      Seq("p"), dirCols = Seq("pd"), validate = true)
    assert(v1 === 1)
    assert(ManifestVersioned.read(spark, w, "conv")
      .select("k", "p", "v").as[(Long, String, Long)].collect().toSet ===
      Set((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L)))
    // zero copy: the table root holds NO data dirs, entries point out
    val base = new org.apache.hadoop.fs.Path(s"$w/conv.mv/parts")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(base), "convert must not copy data")
    assert(ManifestVersioned.manifestEntries(spark, w, "conv")
      .values.forall(_.dir.startsWith("../")), "entries reference out")
    // manifest-level partition pruning works off the converted entries
    assert(ManifestVersioned.readPartitions(spark, w, "conv", Seq("b"))
      .select("k").as[Long].collect().toSeq === Seq(3L))
    // the table is fully live: a merge stages NATIVE generations for
    // touched partitions and keeps foreign references for the rest
    ManifestVersioned.mergeVersionedMulti(spark, w, "conv",
      Seq((3L, "b", 333L), (4L, "c", 40L)).toDF("k", "p", "v"), "k",
      Seq("p"), order = Nil, isTombstone = lit(false), sourceWins = true)
    val e2 = ManifestVersioned.manifestEntries(spark, w, "conv")
    assert(e2(ManifestVersioned.keyOf("a")).dir.startsWith("../"))
    assert(e2(ManifestVersioned.keyOf("b")).dir.startsWith("parts/"))
    assert(ManifestVersioned.read(spark, w, "conv")
      .select("k", "v").as[(Long, Long)].collect().toSet ===
      Set((1L, 10L), (2L, 20L), (3L, 333L), (4L, 40L)))
    // honesty: converted entries carry no counts/stats — metadata
    // aggregates decline rather than guess
    assert(ManifestVersioned.rowCount(spark, w, "conv").isEmpty)
  }

  test("convertTable refuses hive-only layouts and value/dir lies") {
    val w = wh()
    val src = s"${wh()}/lake2"
    val df = Seq((1L, "a", 10L)).toDF("k", "p", "v")
    // plain partitionBy drops p from the files — hive-only source
    df.write.partitionBy("p").parquet(src)
    assert(intercept[IllegalArgumentException] {
      ManifestVersioned.convertTable(spark, w, "conv2", src, Seq("p"))
    }.getMessage.contains("in-file"))
    // a lying layout (dir says a, files say b) fails validate
    val src3 = s"${wh()}/lake3"
    df.withColumn("pd", lit("zzz")).write.partitionBy("pd").parquet(src3)
    assert(intercept[IllegalArgumentException] {
      ManifestVersioned.convertTable(spark, w, "conv3", src3,
        Seq("p"), dirCols = Seq("pd"), validate = true)
    }.getMessage.contains("do not match"))
  }

  // ── widening under a bloom policy: sidecar re-derivation ──────────

  test("widening a bloom-policied column rebuilds sidecars; pre-widening keys stay probe-able") {
    val w = wh()
    val v1 = (0 until 8).map(k => (k, if (k % 2 == 0) "a" else "b", k))
      .toDF("k", "p", "v")
      .select(col("k").cast("int").as("k"), col("p"), col("v"))
    ManifestVersioned.writeFullMulti(spark, w, "t", v1, Seq("p"),
      bloomCols = Seq("k"))
    val bloomsV1 = ManifestVersioned.manifestEntries(spark, w, "t")
      .map { case (pk, e) => pk -> e.bloom }
    // the widening delta touches ONLY partition c; a and b keep their
    // data generations but get REBUILT sidecars at the long type
    ManifestVersioned.writeDelta(spark, w, "t",
      Seq((5000000000L, "c", 50L)).toDF("k", "p", "v"), "p")
    assert(ManifestVersioned.manifestSchema(spark, w, "t")
      .get("k").dataType === LongType)
    val entriesV2 = ManifestVersioned.manifestEntries(spark, w, "t")
    for (pk <- Seq(ManifestVersioned.keyOf("a"), ManifestVersioned.keyOf("b"))) {
      assert(entriesV2(pk).dir === ManifestVersioned
        .manifestEntries(spark, w, "t", Some(1))(pk).dir,
        "data generations must be untouched (sidecar-only rebuild)")
      assert(entriesV2(pk).bloom.isDefined &&
        entriesV2(pk).bloom != bloomsV1(pk),
        "live sidecars must have been rebuilt into new dirs")
    }
    // probes at the NEW recorded type find PRE-widening keys — the
    // whole point: without the rebuild, xxhash64(long 3) misses the
    // int-built sidecar and partition b would wrongly prune
    assert(ManifestVersioned.keysPresent(spark, w, "t",
      Seq(3L, 4L, 5000000000L).toDF("k"), "k").count() === 3L)
    assert(ManifestVersioned.readFiltered(spark, w, "t", col("k") === 3L)
      .count() === 1L)
    // and a locate-delete of a pre-widening key lands
    ManifestVersioned.deleteRowsLocate(spark, w, "t", Seq(4L).toDF("k"), "k")
    assert(ManifestVersioned.read(spark, w, "t")
      .filter(col("k") === 4L).count() === 0L)
    // time travel: v1 still reads under its int schema with its OLD
    // sidecars (the rebuild wrote new dirs, never touched the old)
    assert(ManifestVersioned.manifestEntries(spark, w, "t", Some(1))
      .forall { case (pk, e) => e.bloom === bloomsV1(pk) })
    assert(ManifestVersioned.read(spark, w, "t", Some(1)).count() === 8L)
  }

  // ── ALTER TABLE RENAME COLUMN (column mapping) ────────────────────

  test("renameColumn: O(1) schema commit; old generations read under the new name") {
    val w = wh()
    ManifestVersioned.writeFull(spark, w, "t",
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "p", "v"), "p")
    val v = ManifestVersioned.renameColumn(spark, w, "t", "v", "val")
    assert(v === 2)
    // zero data IO: the generation dirs are untouched
    assert(ManifestVersioned.manifestEntries(spark, w, "t", Some(1))
      === ManifestVersioned.manifestEntries(spark, w, "t", Some(2)))
    val sch = ManifestVersioned.manifestSchema(spark, w, "t").get
    assert(sch.fieldNames.toSeq === Seq("k", "p", "val"))
    assert(ManifestVersioned.read(spark, w, "t")
      .select("k", "val").as[(Long, Long)].collect().toSet ===
      Set((1L, 10L), (2L, 20L)))
    // time travel: the pre-rename version still speaks the OLD name
    assert(ManifestVersioned.read(spark, w, "t", Some(1))
      .columns.toSeq === Seq("k", "p", "v"))
    // writes post-rename speak the NEW name; the merged read is coherent
    ManifestVersioned.writeDelta(spark, w, "t",
      Seq((3L, "b", 30L)).toDF("k", "p", "val"), "p")
    assert(ManifestVersioned.read(spark, w, "t")
      .select("k", "val").as[(Long, Long)].collect().toSet ===
      Set((1L, 10L), (3L, 30L)))
    // the nightly merge crosses the rename too
    ManifestVersioned.mergeVersionedMulti(spark, w, "t",
      Seq((1L, "a", 111L), (4L, "a", 40L)).toDF("k", "p", "val"), "k",
      Seq("p"), order = Nil, isTombstone = lit(false), sourceWins = true)
    assert(ManifestVersioned.read(spark, w, "t")
      .select("k", "val").as[(Long, Long)].collect().toSet ===
      Set((1L, 111L), (3L, 30L), (4L, 40L)))
  }

  test("renameColumn: zone pruning and range stats keep working across the mapping") {
    val w = wh()
    ManifestVersioned.writeFull(spark, w, "t",
      (0L until 20L).map(k => (k, if (k < 10) "a" else "b", k * 10L))
        .toDF("k", "p", "v"), "p")
    ManifestVersioned.renameColumn(spark, w, "t", "v", "val")
    // predicates on the NEW name prune through stats recorded under
    // the OLD (physical) name — partition a holds val 0..90 only
    val kept = ManifestVersioned.readWhereEntries(spark, w, "t",
      Seq(ZoneGe("val", 150L))).map(_._1)
    assert(kept === Seq(ManifestVersioned.keyOf("b")))
    assert(ManifestVersioned.readWhere(spark, w, "t",
        Seq(ZoneGe("val", 150L))).count() === 5L)
    // ...and a post-rename delta's stats (physical-keyed) compose
    ManifestVersioned.writeDelta(spark, w, "t",
      Seq((100L, "c", 5000L)).toDF("k", "p", "val"), "p")
    assert(ManifestVersioned.readWhereEntries(spark, w, "t",
      Seq(ZoneGe("val", 4000L))).map(_._1)
      === Seq(ManifestVersioned.keyOf("c")))
    // zero-read range stats answer under the new name
    val r = ManifestVersioned.columnRanges(spark, w, "t", Seq("val")).head()
    assert(r.getAs[Long]("min_val") === 0L &&
      r.getAs[Long]("max_val") === 5000L)
    assert(ManifestVersioned.nullCount(spark, w, "t", "val") === Some(0L))
  }

  test("renameColumn: load-bearing columns and reserved names refuse loudly") {
    val w = wh()
    ManifestVersioned.writeFullMulti(spark, w, "t",
      Seq((1L, "a", 10L)).toDF("k", "p", "v"), Seq("p"),
      bloomCols = Seq("k"),
      properties = Map("graft.mergeKey" -> "k"))
    // partition column
    assert(intercept[IllegalArgumentException] {
      ManifestVersioned.renameColumn(spark, w, "t", "p", "p2")
    }.getMessage.contains("load-bearing"))
    // bloom-policied / merge-key column
    assert(intercept[IllegalArgumentException] {
      ManifestVersioned.renameColumn(spark, w, "t", "k", "k2")
    }.getMessage.contains("load-bearing"))
    // CHECK constraint references
    ManifestVersioned.setCheck(spark, w, "t", "v_pos", "v >= 0")
    assert(intercept[IllegalArgumentException] {
      ManifestVersioned.renameColumn(spark, w, "t", "v", "val")
    }.getMessage.contains("CHECK"))
    ManifestVersioned.dropCheck(spark, w, "t", "v_pos")
    ManifestVersioned.renameColumn(spark, w, "t", "v", "val")
    // the retired name stays reserved: re-adding 'v' rejects on both
    // the write path and ALTER ADD
    assert(intercept[IllegalArgumentException] {
      ManifestVersioned.writeDelta(spark, w, "t",
        Seq((2L, "a", 1L, 9L)).toDF("k", "p", "val", "v"), "p")
    }.getMessage.contains("reserved"))
    assert(intercept[IllegalArgumentException] {
      ManifestVersioned.addColumns(spark, w, "t", org.apache.spark.sql
        .types.StructType(Seq(org.apache.spark.sql.types
          .StructField("v", LongType))))
    }.getMessage.contains("reserved"))
    // unknown / duplicate names
    intercept[IllegalArgumentException] {
      ManifestVersioned.renameColumn(spark, w, "t", "nosuch", "x") }
    intercept[IllegalArgumentException] {
      ManifestVersioned.renameColumn(spark, w, "t", "val", "k") }
  }

  test("SQL surface: ALTER TABLE RENAME COLUMN + a change feed crossing the rename") {
    val w = wh()
    ManifestVersioned.writeFull(spark, w, "t",
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "p", "v"), "p")
    graft.plans.GraftSqlTables.register(spark, w, "t",
      asName = Some("ren_t"), keyCol = Some("k"))
    spark.sql("ALTER TABLE ren_t RENAME COLUMN v TO val")
    assert(spark.sql("SELECT k, val FROM ren_t WHERE val >= 20")
      .as[(Long, Long)].collect().toSet === Set((2L, 20L)))
    spark.sql("INSERT INTO ren_t VALUES (3, 'b', 30)")
    spark.sql("UPDATE ren_t SET val = val + 1 WHERE k = 1")
    // the feed spans the rename: v=2 renamed, v=3 insert, v=4 update —
    // the renamed column arrives as ONE coherent 'val' column
    val feed = ManifestVersioned.readChangesSince(spark, w, "t", 1, "k")
    assert(feed.columns.contains("new_val") ||
      feed.select("version").distinct().count() >= 2L)
    val changed = feed.filter(col("version") >= 3)
      .select("version", "k", "change_type")
      .as[(Int, Long, String)].collect().toSet
    assert(changed === Set((3, 3L, "insert"), (4, 1L, "update")))
  }

  test("randomized rename/write/merge/delete sequences replay a model (seeded)") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val w = wh()
      val parts = Seq("a", "b", "c")
      // model: key -> (partition, value); the value column's CURRENT
      // logical name churns through renames, its physical name never
      var rows = (0L until 6L).map(k =>
        k -> ((parts(k.toInt % 3), k * 10L))).toMap
      var colName = "c0"
      var gen = 0
      def df(m: Map[Long, (String, Long)], name: String) =
        m.toSeq.map { case (k, (p, v)) => (k, p, v) }
          .toDF("k", "p", name)
      ManifestVersioned.writeFull(spark, w, "t", df(rows, colName), "p")
      // expected (rows, value-column logical name) per ACTUAL version —
      // keyed by the committed head, because a no-op (deleting an
      // absent key) burns no version
      var history = Map(1 -> ((rows, colName)))
      for (op <- 1 to 18) {
        rnd.nextInt(4) match {
          case 0 => // RENAME: O(1) schema commit, rows unchanged
            gen += 1
            val next = s"c$gen"
            ManifestVersioned.renameColumn(spark, w, "t", colName, next)
            colName = next
          case 1 => // DELTA: replace one partition wholesale
            val p = parts(rnd.nextInt(3))
            val fresh = (0 until rnd.nextInt(3) + 1).map(_ =>
              rnd.nextInt(40).toLong ->
                ((p, rnd.nextInt(1000).toLong))).toMap
            rows = rows.filterNot(_._2._1 == p) ++ fresh
            ManifestVersioned.writeDelta(spark, w, "t",
              df(fresh, colName), "p")
          case 2 => // MERGE: source-wins upsert of 2 random keys
            val change = (0 until 2).map(_ =>
              rnd.nextInt(40).toLong ->
                ((parts(rnd.nextInt(3)), rnd.nextInt(1000).toLong))).toMap
            rows = rows ++ change
            ManifestVersioned.mergeVersionedMulti(spark, w, "t",
              df(change, colName), "k", Seq("p"), order = Nil,
              isTombstone = lit(false), sourceWins = true)
          case 3 => // locate-DELETE a random (possibly absent) key
            val k = rnd.nextInt(40).toLong
            rows = rows - k
            ManifestVersioned.deleteRowsLocate(spark, w, "t",
              Seq(k).toDF("k"), "k")
        }
        history += ManifestVersioned
          .currentVersion(spark, w, "t").get -> ((rows, colName))
        // the head always equals the model, under the CURRENT name
        val got = ManifestVersioned.read(spark, w, "t")
          .select(col("k"), col("p"), col(colName))
          .as[(Long, String, Long)].collect().toSet
        assert(got === rows.toSeq.map { case (k, (p, v)) =>
          (k, p, v) }.toSet, s"seed=$seed op=$op")
      }
      // time travel: every version replays ITS state under ITS name
      for ((ver, (m, name)) <- history) {
        val got = ManifestVersioned.read(spark, w, "t", Some(ver))
          .select(col("k"), col("p"), col(name))
          .as[(Long, String, Long)].collect().toSet
        assert(got === m.toSeq.map { case (k, (p, v)) =>
          (k, p, v) }.toSet, s"seed=$seed version=$ver")
      }
      // the full change feed conforms every epoch to the final name
      val feed = ManifestVersioned.readChangesSince(spark, w, "t", 0, "k")
      assert(feed.columns.contains(s"new_$colName") &&
        !feed.columns.exists(c => c.startsWith("new_c") &&
          c != s"new_$colName"),
        s"seed=$seed: the feed must speak ONLY the final name")
    }
  }

  test("a DOUBLE rename feeds as one column across its whole history") {
    val w = wh()
    ManifestVersioned.writeFull(spark, w, "t",
      Seq((1L, "a", 10L)).toDF("k", "p", "v"), "p")          // v1: v
    ManifestVersioned.renameColumn(spark, w, "t", "v", "val") // v2
    ManifestVersioned.writeDelta(spark, w, "t",
      Seq((2L, "b", 20L)).toDF("k", "p", "val"), "p")        // v3: val
    ManifestVersioned.renameColumn(spark, w, "t", "val", "amount") // v4
    ManifestVersioned.writeDelta(spark, w, "t",
      Seq((1L, "a", 11L)).toDF("k", "p", "amount"), "p")     // v5: amount
    // each version reads under ITS name; the head under the final one
    assert(ManifestVersioned.read(spark, w, "t", Some(1)).columns
      .contains("v"))
    assert(ManifestVersioned.read(spark, w, "t", Some(3)).columns
      .contains("val"))
    assert(ManifestVersioned.read(spark, w, "t")
      .select("k", "amount").as[(Long, Long)].collect().toSet ===
      Set((1L, 11L), (2L, 20L)))
    // the feed spans BOTH renames: the column arrives as ONE coherent
    // 'amount' column, its per-version values intact (intermediate
    // logical names resolve through the stable physical name)
    val feed = ManifestVersioned.readChangesSince(spark, w, "t", 0, "k")
    assert(feed.columns.contains("new_amount") &&
      !feed.columns.contains("new_v") && !feed.columns.contains("new_val"))
    assert(feed.select("version", "k", "change_type", "new_amount")
      .as[(Int, Long, String, Option[Long])].collect().toSet ===
      Set((1, 1L, "insert", Some(10L)), (3, 2L, "insert", Some(20L)),
        (5, 1L, "update", Some(11L))))
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
