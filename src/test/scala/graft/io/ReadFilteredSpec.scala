package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** NULL-count zone stats (`ZoneIsNull`/`ZoneNotNull` pruning at both
  * partition and file level) and the native-Column front door
  * (`readFiltered` + `ZoneMaps.fromColumn`): callers write ordinary
  * Spark predicates, the prunable conjuncts drive the zone → bloom →
  * file stack, and the ORIGINAL Column rides as the row filter so
  * unextractable residue (ORs, attr-vs-attr) costs pruning only.
  */
class ReadFilteredSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // nulls live ONLY in partition "a" (k % 3 == 0 there); "b"/"c" are
  // null-free, and "d" is ALL-null on v
  private def nulled(wh: String): Unit = {
    val df = (0L until 90L).map { k =>
      val p = Seq("a", "b", "c")(k.toInt % 3)
      val v: java.lang.Long =
        if (p == "a" && k % 9 == 0) null else java.lang.Long.valueOf(k * 10)
      (k, p, v)
    }.toDF("k", "p", "v")
      .unionAll(Seq((1000L, "d", null.asInstanceOf[java.lang.Long]))
        .toDF("k", "p", "v"))
    ManifestVersioned.writeFull(spark, wh, "t", df, "p")
  }

  test("null counts are recorded and fold; IS NULL prunes null-free partitions") {
    val wh = Files.createTempDirectory("graft-rf1").toString
    nulled(wh)
    val entries = ManifestVersioned.manifestEntries(spark, wh, "t")
    assert(entries(ManifestVersioned.keyOf(Seq("a"))).stats("v").nulls === 10)
    assert(entries(ManifestVersioned.keyOf(Seq("b"))).stats("v").nulls === 0)
    assert(entries(ManifestVersioned.keyOf(Seq("d"))).stats("v") ===
      ManifestVersioned.ColRange(None, None, 1L))
    val kept = ManifestVersioned.readWhereEntries(spark, wh, "t",
      Seq(ZoneIsNull("v"))).map(_._1).toSet
    assert(kept === Set("a", "d").map(s => ManifestVersioned.keyOf(Seq(s))),
      "null-free partitions prune under IS NULL")
    assert(ManifestVersioned.readWhere(spark, wh, "t", Seq(ZoneIsNull("v")))
      .select("k").as[Long].collect().toSet ===
      (0L until 90L by 9L).toSet + 1000L)
  }

  test("IS NOT NULL prunes the all-null partition, keeps every other") {
    val wh = Files.createTempDirectory("graft-rf2").toString
    nulled(wh)
    val kept = ManifestVersioned.readWhereEntries(spark, wh, "t",
      Seq(ZoneNotNull("v"))).map(_._1).toSet
    assert(!kept.contains(ManifestVersioned.keyOf(Seq("d"))))
    assert(kept.size === 3)
    assert(ManifestVersioned.readWhere(spark, wh, "t", Seq(ZoneNotNull("v")))
      .count() === 80)
  }

  test("IS NULL prunes FILES when the nulls cluster in one of them") {
    val wh = Files.createTempDirectory("graft-rf3").toString
    // one partition, two pinned files: nulls only in the second
    val df = (0L until 40L).map { k =>
      val v: java.lang.Long =
        if (k >= 30L) null else java.lang.Long.valueOf(k)
      (k, "a", v)
    }.toDF("k", "p", "v")
      .withColumn("grp", when(col("k") < 20, 0).otherwise(1))
      .repartitionByRange(2, col("grp")).drop("grp")
    ManifestVersioned.writeFull(spark, wh, "t", df, "p")
    val sel = ManifestVersioned.readWhereFiles(spark, wh, "t",
      Seq(ZoneIsNull("v")))
    assert(sel.size === 1 && sel.head._3.map(_.size) === Some(1),
      "the null-free file prunes")
    assert(ManifestVersioned.readWhere(spark, wh, "t", Seq(ZoneIsNull("v")))
      .count() === 10)
  }

  test("legacy 3-field stats parse as unknown null count and keep under IS NULL") {
    val legacy = ZoneMaps.parseStats(
      ZoneMaps.renderStats(Map("v" ->
        ManifestVersioned.ColRange(Some("1"), Some("9"))))) // nulls = -1
    assert(legacy("v").nulls === -1L)
    assert(ZoneMaps.mayMatch(legacy, ZoneIsNull("v"), None),
      "unknown null count must keep")
    assert(ZoneMaps.mayMatch(legacy, ZoneNotNull("v"), None))
    // and the 4-field render round-trips
    val fresh = ZoneMaps.parseStats(ZoneMaps.renderStats(Map("v" ->
      ManifestVersioned.ColRange(Some("1"), Some("9"), 7L))))
    assert(fresh("v").nulls === 7L)
  }

  test("fromColumn extracts exactly the implied conjuncts") {
    import java.time.LocalDateTime
    assert(ZoneMaps.fromColumn(
      col("k") === 5L && col("v") >= 10L && lit(3L) > col("w")) ===
      Seq(ZoneEq("k", 5L), ZoneGe("v", 10L), ZoneLt("w", 3L)))
    assert(ZoneMaps.fromColumn(col("k").isin(1L, 2L)) ===
      Seq(ZoneIn("k", Seq(1L, 2L))))
    assert(ZoneMaps.fromColumn(col("k").isNull && col("v").isNotNull) ===
      Seq(ZoneIsNull("k"), ZoneNotNull("v")))
    assert(ZoneMaps.fromColumn(col("k").between(2L, 4L)) ===
      Seq(ZoneGe("k", 2L), ZoneLe("k", 4L)))
    assert(ZoneMaps.fromColumn(col("k") <=> lit(null)) ===
      Seq(ZoneIsNull("k")))
    val t = LocalDateTime.parse("1997-06-01T00:00:00")
    assert(ZoneMaps.fromColumn(col("ts") >= lit(t)) === Seq(ZoneGe("ts", t)))
    // unextractable shapes yield NOTHING (the residual filter owns them)
    assert(ZoneMaps.fromColumn(col("k") === 1L || col("v") === 2L) === Nil)
    assert(ZoneMaps.fromColumn(col("k") === col("v")) === Nil)
    assert(ZoneMaps.fromColumn(abs(col("k")) === 1L) === Nil)
    // ... but AND still yields its extractable side next to an opaque one
    assert(ZoneMaps.fromColumn(
      (col("k") === 1L || col("v") === 2L) && col("w") < 9L) ===
      Seq(ZoneLt("w", 9L)))
  }

  test("readFiltered: native predicates prune and the original Column filters") {
    val wh = Files.createTempDirectory("graft-rf4").toString
    val df = (0L until 300L)
      .map(k => (k, if (k % 2 == 0) "a" else "b", k * 10L))
      .toDF("k", "p", "v")
    ManifestVersioned.writeFull(spark, wh, "t", df.repartition(6), "p")
    ManifestVersioned.optimizeClustered(spark, wh, "t", Seq("p"),
      Seq(Seq("a"), Seq("b")), Seq("k"), filesPerPartition = 4)
    // compound: a prunable range AND an OR-residual only the row
    // filter can decide
    val cond = col("k") >= 100L && col("k") < 140L &&
      (col("v") % 40 === 0 || col("p") === "b")
    val got = ManifestVersioned.readFiltered(spark, wh, "t", cond)
      .select("k").as[Long].collect().toSet
    val want = (100L until 140L)
      .filter(k => (k * 10) % 40 == 0 || k % 2 == 1).toSet
    assert(got === want)
    // the extracted range really pruned files
    val (picked, total) = {
      val base = new org.apache.hadoop.fs.Path(s"$wh/t.mv")
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val sel = ManifestVersioned.readWhereFiles(spark, wh, "t",
        ZoneMaps.fromColumn(cond))
      (sel.map(_._3.map(_.size).getOrElse(99)).sum,
        sel.map { case (_, e, _) =>
          ManifestVersioned.readFileStats(fs, base, e.dir)
            .map(_.size).getOrElse(99)
        }.sum)
    }
    assert(picked < total, s"expected file pruning: $picked of $total")
    // an all-OR predicate extracts nothing and still answers exactly
    val orOnly = col("k") === 5L || col("k") === 250L
    assert(ManifestVersioned.readFiltered(spark, wh, "t", orOnly)
      .select("k").as[Long].collect().toSet === Set(5L, 250L))
  }

  test("OR-of-conjuncts prunes with the union of branch survivors") {
    val wh = Files.createTempDirectory("graft-rf6").toString
    // clustered layout so FILE pruning is measurable: k range split
    // across partitions a(0-299 even)/b(odd)
    val df = (0L until 300L)
      .map(k => (k, if (k % 2 == 0) "a" else "b", k * 10L))
      .toDF("k", "p", "v")
    ManifestVersioned.writeFull(spark, wh, "t", df.repartition(6), "p")
    ManifestVersioned.optimizeClustered(spark, wh, "t", Seq("p"),
      Seq(Seq("a"), Seq("b")), Seq("k"), filesPerPartition = 4)
    // the date-range-union shape: two disjoint k slivers OR-ed — the
    // pre-r9 conjunct extraction pruned NOTHING here
    val cond = (col("k") >= 10L && col("k") < 30L) ||
      (col("k") >= 250L && col("k") < 260L)
    val got = ManifestVersioned.readFiltered(spark, wh, "t", cond)
      .select("k").as[Long].collect().toSet
    assert(got === ((10L until 30L) ++ (250L until 260L)).toSet)
    // the union of branch survivors lists FEWER files than the table
    val branches = ZoneMaps.fromColumnOr(cond)
    assert(branches.size === 2 && branches.forall(_.size === 2))
    val base = new org.apache.hadoop.fs.Path(s"$wh/t.mv")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = ManifestVersioned.manifestEntries(spark, wh, "t").values
      .flatMap(e => ManifestVersioned.readFileStats(fs, base, e.dir)
        .map(_.size).orElse(Some(99))).sum
    val perBranch = branches.map(b =>
      ManifestVersioned.readWhereFiles(spark, wh, "t", b)
        .filter(_._3.forall(_.nonEmpty)))
    val unionFiles = perBranch.flatten
      .flatMap { case (_, e, sel) => sel.getOrElse(Seq("whole")).map(f => (e.dir, f)) }
      .toSet.size
    assert(unionFiles < all,
      s"expected OR-union file pruning: $unionFiles of $all")
    // a branch mixing prunable and unprunable arms keeps everything
    // that arm could match — still exact
    val mixed = (col("k") < 5L) || (col("v") % 70 === 0)
    assert(ManifestVersioned.readFiltered(spark, wh, "t", mixed)
      .select("k").as[Long].collect().toSet ===
      ((0L until 5L) ++ (0L until 300L).filter(k => (k * 10) % 70 == 0)).toSet)
    // disjoint-everything branches: provably empty, zero scan
    val none = (col("k") > 5000L) || (col("k") < -1L)
    assert(ManifestVersioned.readFiltered(spark, wh, "t", none).count() === 0)
  }

  test("readFiltered: an everything-pruned predicate returns the empty typed relation") {
    val wh = Files.createTempDirectory("graft-rf5").toString
    ManifestVersioned.writeFull(spark, wh, "t",
      Seq((1L, "a", 10L)).toDF("k", "p", "v"), "p")
    val out = ManifestVersioned.readFiltered(spark, wh, "t",
      col("k") > 100L)
    assert(out.count() === 0)
    assert(out.schema.fieldNames.toSeq === Seq("k", "p", "v"))
  }
}
