package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Per-FILE zone maps (`_filestats` sidecars) + the clustered layout
  * rewrites that make them selective: every staged generation records
  * each parquet file's per-column min/max inside the generation dir,
  * `readWhere` prunes FILES within zone/bloom-surviving partitions, and
  * `optimizeClustered`/`optimizeZOrdered` rewrite partitions so each
  * file owns a narrow key slice (range-clustered / Morton-rectangular).
  * Soundness is the zone-map contract one level finer: any doubt keeps
  * the file, a missing sidecar keeps the whole dir, and the residual
  * filter always applies.
  */
class FileStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(n: Int) =
    (0 until n).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i * 10L))
      .toDF("k", "p", "v")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
    df.select("k", "p", "v").as[(Long, String, Long)].collect().toSet

  /** (selected file count, total sidecar file count) over the pred's
    * surviving partitions; None-selection dirs count their sidecar size
    * as selected (no pruning).
    */
  private def selection(wh: String, table: String,
      preds: Seq[ZonePred]): (Int, Int) = {
    val base = new org.apache.hadoop.fs.Path(s"$wh/$table.mv")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sel = ManifestVersioned.readWhereFiles(spark, wh, table, preds)
    val totals = sel.map { case (_, e, _) =>
      ManifestVersioned.readFileStats(fs, base, e.dir).map(_.size).getOrElse(1)
    }.sum
    val picked = sel.map { case (_, e, s) =>
      s.map(_.size).getOrElse(
        ManifestVersioned.readFileStats(fs, base, e.dir).map(_.size).getOrElse(1))
    }.sum
    (picked, totals)
  }

  test("every staged generation carries a complete _filestats sidecar") {
    val wh = Files.createTempDirectory("graft-fst1").toString
    ManifestVersioned.writeFull(spark, wh, "t", fixture(40).repartition(4), "p")
    val base = new org.apache.hadoop.fs.Path(s"$wh/t.mv")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = ManifestVersioned.manifestEntries(spark, wh, "t")
    assert(entries.size === 2)
    entries.values.foreach { e =>
      val fss = ManifestVersioned.readFileStats(fs, base, e.dir)
      assert(fss.isDefined, s"missing sidecar in ${e.dir}")
      // the sidecar lists exactly the dir's data files
      val onDisk = fs.listStatus(new org.apache.hadoop.fs.Path(base, e.dir))
        .map(_.getPath.getName).filterNot(_.startsWith("_")).toSet
      assert(fss.get.map(_._1).toSet === onDisk)
      // per-file rows sum to the manifest's recorded partition count
      assert(fss.get.map(_._3).sum === e.rows)
      // partition-level range == fold of the file ranges (k is numeric)
      val fileLos = fss.get.flatMap(_._2.get("k")).flatMap(_.lo).map(_.toLong)
      assert(e.stats("k").lo.map(_.toLong) === Some(fileLos.min))
    }
  }

  test("file-level pruning: a gap partition survives zones but drops file-by-file") {
    val wh = Files.createTempDirectory("graft-fst2").toString
    // ONE partition, two deterministic files: k ∈ [0,9] and k ∈ [20,29]
    // (range exchange on a two-valued helper column pins the file split)
    val df = ((0L until 10L) ++ (20L until 30L)).map(k => (k, "a", k * 10L))
      .toDF("k", "p", "v")
      .withColumn("grp", when(col("k") < 15, 0).otherwise(1))
      .repartitionByRange(2, col("grp")).drop("grp")
    ManifestVersioned.writeFull(spark, wh, "t", df, "p")
    val (_, total) = selection(wh, "t", Seq(ZoneEq("k", 15L)))
    assert(total === 2, "fixture must stage two files")
    // partition range [0,29] keeps the partition; both files disprove 15
    val sel = ManifestVersioned.readWhereFiles(spark, wh, "t",
      Seq(ZoneEq("k", 15L)))
    assert(sel.size === 1 && sel.head._3 === Some(Nil),
      "every file individually disproved")
    assert(ManifestVersioned.readWhere(spark, wh, "t",
      Seq(ZoneEq("k", 15L))).count() === 0)
    // a value inside one file scans exactly that file and answers right
    val (picked, _) = selection(wh, "t", Seq(ZoneEq("k", 25L)))
    assert(picked === 1)
    assert(rows(ManifestVersioned.readWhere(spark, wh, "t",
      Seq(ZoneEq("k", 25L)))) === Set((25L, "a", 250L)))
  }

  test("missing sidecar degrades to a whole-dir scan, never a wrong answer") {
    val wh = Files.createTempDirectory("graft-fst3").toString
    ManifestVersioned.writeFull(spark, wh, "t", fixture(30).repartition(3), "p")
    val base = new org.apache.hadoop.fs.Path(s"$wh/t.mv")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    ManifestVersioned.manifestEntries(spark, wh, "t").values.foreach(e =>
      fs.delete(new org.apache.hadoop.fs.Path(base, s"${e.dir}/_filestats"),
        false))
    val sel = ManifestVersioned.readWhereFiles(spark, wh, "t",
      Seq(ZoneGe("k", 10L)))
    assert(sel.nonEmpty && sel.forall(_._3.isEmpty),
      "no sidecar → None → full dir")
    assert(rows(ManifestVersioned.readWhere(spark, wh, "t",
      Seq(ZoneGe("k", 10L)))) ===
      rows(ManifestVersioned.read(spark, wh, "t").filter(col("k") >= 10)))
  }

  test("optimizeClustered: content-neutral fold that makes file pruning selective") {
    val wh = Files.createTempDirectory("graft-fst4").toString
    // interleaved keys → every staged file spans the whole domain
    ManifestVersioned.writeFull(spark, wh, "t", fixture(400).repartition(8),
      "p")
    val before = rows(ManifestVersioned.read(spark, wh, "t"))
    val (p0, t0) = selection(wh, "t",
      Seq(ZoneGe("k", 100L), ZoneLt("k", 120L)))
    assert(p0 === t0, "unclustered: every file may hold the range")
    val v = ManifestVersioned.optimizeClustered(spark, wh, "t", Seq("p"),
      Seq(Seq("a"), Seq("b")), Seq("k"), filesPerPartition = 4)
    assert(v === 2)
    assert(rows(ManifestVersioned.read(spark, wh, "t")) === before,
      "optimize is content-neutral")
    val (p1, t1) = selection(wh, "t",
      Seq(ZoneGe("k", 100L), ZoneLt("k", 120L)))
    assert(t1 >= 4 && p1 < t1,
      s"clustered files must prune: picked $p1 of $t1")
    assert(rows(ManifestVersioned.readWhere(spark, wh, "t",
      Seq(ZoneGe("k", 100L), ZoneLt("k", 120L)))) ===
      before.filter(r => r._1 >= 100L && r._1 < 120L))
  }

  test("optimizeZOrdered: file pruning on EITHER dimension") {
    val wh = Files.createTempDirectory("graft-fst5").toString
    // a 32×32 grid in one partition; clustering on x alone would leave
    // y spanning its domain in every file
    val grid = (0 until 1024).map { i =>
      (i.toLong, "a", (i % 32).toLong, (i / 32).toLong)
    }.toDF("k", "p", "x", "y")
    ManifestVersioned.writeFull(spark, wh, "t", grid.repartition(8), "p")
    ManifestVersioned.optimizeZOrdered(spark, wh, "t", Seq("p"),
      Seq(Seq("a")), "x", "y", filesPerPartition = 16)
    val (px, tx) = selection(wh, "t", Seq(ZoneEq("x", 3L)))
    val (py, ty) = selection(wh, "t", Seq(ZoneEq("y", 3L)))
    assert(tx === ty && tx >= 8)
    assert(px < tx, s"x pred must prune files: $px of $tx")
    assert(py < ty, s"y pred must prune files: $py of $ty")
    assert(ManifestVersioned.readWhere(spark, wh, "t", Seq(ZoneEq("x", 3L)))
      .count() === 32)
    assert(ManifestVersioned.readWhere(spark, wh, "t", Seq(ZoneEq("y", 3L)))
      .count() === 32)
  }

  test("optimizeZOrderedMulti: three dimensions, file pruning on EACH") {
    val wh = Files.createTempDirectory("graft-fst8").toString
    // a 16×16×4 grid in one partition
    val grid = (0 until 1024).map { i =>
      (i.toLong, "a", (i % 16).toLong, ((i / 16) % 16).toLong,
        (i / 256).toLong)
    }.toDF("k", "p", "x", "y", "z")
    ManifestVersioned.writeFull(spark, wh, "t", grid.repartition(8), "p")
    val before = ManifestVersioned.read(spark, wh, "t").count()
    ManifestVersioned.optimizeZOrderedMulti(spark, wh, "t", Seq("p"),
      Seq(Seq("a")), Seq("x", "y", "z"), filesPerPartition = 16)
    assert(ManifestVersioned.read(spark, wh, "t").count() === before)
    for ((c, v, expect) <- Seq(("x", 2L, 64L), ("y", 2L, 64L), ("z", 2L, 256L))) {
      val (picked, total) = selection(wh, "t", Seq(ZoneEq(c, v)))
      assert(total >= 8 && picked < total,
        s"$c pred must prune files: $picked of $total")
      assert(ManifestVersioned.readWhere(spark, wh, "t", Seq(ZoneEq(c, v)))
        .count() === expect)
    }
  }

  test("file pruning composes with delete vectors (merge-on-read)") {
    val wh = Files.createTempDirectory("graft-fst6").toString
    ManifestVersioned.writeFull(spark, wh, "t", fixture(100), "p")
    ManifestVersioned.optimizeClustered(spark, wh, "t", Seq("p"),
      Seq(Seq("a"), Seq("b")), Seq("k"), filesPerPartition = 4)
    ManifestVersioned.deleteRows(spark, wh, "t",
      Seq((10L, "a"), (11L, "b")).toDF("k", "p"), "k", Seq("p"))
    val got = rows(ManifestVersioned.readWhere(spark, wh, "t",
      Seq(ZoneGe("k", 8L), ZoneLe("k", 14L))))
    assert(got === (8L to 14L).filterNot(k => k == 10L || k == 11L)
      .map(k => (k, if (k % 2 == 0) "a" else "b", k * 10L)).toSet)
    val (picked, total) = selection(wh, "t",
      Seq(ZoneGe("k", 8L), ZoneLe("k", 14L)))
    assert(picked < total, "DV partitions still prune files")
  }

  test("sidecars survive restore and historical reads") {
    val wh = Files.createTempDirectory("graft-fst7").toString
    ManifestVersioned.writeFull(spark, wh, "t", fixture(60), "p")
    ManifestVersioned.optimizeClustered(spark, wh, "t", Seq("p"),
      Seq(Seq("a"), Seq("b")), Seq("k"), filesPerPartition = 3)
    ManifestVersioned.writeDelta(spark, wh, "t",
      Seq((1000L, "a", 1L)).toDF("k", "p", "v"), "p")
    ManifestVersioned.restore(spark, wh, "t", 2) // pre-delta, clustered
    val sel = ManifestVersioned.readWhereFiles(spark, wh, "t",
      Seq(ZoneEq("k", 7L)))
    assert(sel.exists(_._3.isDefined),
      "restored generations keep their sidecars")
    assert(rows(ManifestVersioned.readWhere(spark, wh, "t",
      Seq(ZoneEq("k", 7L)))) === Set((7L, "b", 70L)))
  }
}
