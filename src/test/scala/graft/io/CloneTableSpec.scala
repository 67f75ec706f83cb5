package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Zero-copy clones (branches): the clone's first version references
  * the source's generation dirs through `../` re-rooting — no data
  * moves — and diverges copy-on-write: branch writes stage branch-local
  * dirs, the source never changes, and each side's vacuum stays inside
  * its own tree.
  */
class CloneTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(triples: (Long, String, Long)*) =
    triples.toDF("k", "p", "v")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
    df.select("k", "p", "v").as[(Long, String, Long)].collect().toSet

  private def localDirs(wh: String, table: String): Set[String] = {
    val base = new java.io.File(s"$wh/$table.mv/parts")
    if (!base.exists()) Set.empty
    else base.listFiles().flatMap(k => k.listFiles().map(_.getName)).toSet
  }

  test("shallow clone reads identically with ZERO copied data") {
    val wh = Files.createTempDirectory("graft-cl1").toString
    ManifestVersioned.writeFull(spark, wh, "src",
      fixture((1L, "a", 10L), (2L, "b", 20L)), "p")
    ManifestVersioned.deleteRows(spark, wh, "src",
      Seq((2L, "b")).toDF("k", "p"), "k", Seq("p"))
    val v = ManifestVersioned.cloneTable(spark, wh, "src", "br")
    assert(v === 1)
    assert(rows(ManifestVersioned.read(spark, wh, "br")) ===
      Set((1L, "a", 10L)), "delete vectors apply through the reference")
    assert(localDirs(wh, "br").isEmpty, "a shallow clone owns zero data dirs")
    // headers traveled: schema, layout, dvkey
    assert(ManifestVersioned.partitionColumns(spark, wh, "br") ===
      Some(Seq("p")))
  }

  test("copy-on-write divergence: branch writes never touch the source") {
    val wh = Files.createTempDirectory("graft-cl2").toString
    ManifestVersioned.writeFull(spark, wh, "src",
      fixture((1L, "a", 10L), (2L, "b", 20L)), "p")
    ManifestVersioned.cloneTable(spark, wh, "src", "br")
    // a nightly merge lands on the BRANCH
    ManifestVersioned.mergeVersioned(spark, wh, "br",
      fixture((1L, "a", 11L), (3L, "a", 30L)), "k", "p",
      Seq(col("v").desc), lit(false))
    assert(rows(ManifestVersioned.read(spark, wh, "br")) ===
      Set((1L, "a", 11L), (3L, "a", 30L), (2L, "b", 20L)))
    assert(rows(ManifestVersioned.read(spark, wh, "src")) ===
      Set((1L, "a", 10L), (2L, "b", 20L)), "the source never changes")
    // only the touched partition localized; b still references the source
    assert(localDirs(wh, "br").nonEmpty)
    val bEntry = ManifestVersioned.manifestEntries(spark, wh, "br")(
      ManifestVersioned.keyOf("b"))
    assert(bEntry.dir.startsWith("../src.mv/"),
      "untouched partitions keep the zero-copy reference")
    // compaction localizes the rest
    ManifestVersioned.compactPartitions(spark, wh, "br", "p", Seq("b"))
    assert(ManifestVersioned.manifestEntries(spark, wh, "br")
      .values.forall(!_.dir.startsWith("../")))
  }

  test("the branch's vacuum can never sweep source files") {
    val wh = Files.createTempDirectory("graft-cl3").toString
    ManifestVersioned.writeFull(spark, wh, "src",
      fixture((1L, "a", 10L)), "p")
    ManifestVersioned.cloneTable(spark, wh, "src", "br")
    ManifestVersioned.writeDelta(spark, wh, "br",
      fixture((1L, "a", 99L)), "p")
    ManifestVersioned.vacuum(spark, wh, "br", keepHistory = 0)
    assert(rows(ManifestVersioned.read(spark, wh, "src")) ===
      Set((1L, "a", 10L)), "source files survive the branch's vacuum")
    assert(rows(ManifestVersioned.read(spark, wh, "br")) ===
      Set((1L, "a", 99L)))
  }

  test("deep clone is an independent table; clone targets must be fresh") {
    val wh = Files.createTempDirectory("graft-cl4").toString
    ManifestVersioned.writeFull(spark, wh, "src",
      fixture((1L, "a", 10L), (2L, "b", 20L)), "p")
    ManifestVersioned.cloneTable(spark, wh, "src", "cp", deep = true)
    assert(localDirs(wh, "cp").nonEmpty, "deep clones own their data")
    // the source's history can be reclaimed wholesale; the copy lives
    ManifestVersioned.writeFull(spark, wh, "src", fixture((9L, "z", 90L)), "p")
    ManifestVersioned.vacuum(spark, wh, "src", keepHistory = 0)
    assert(rows(ManifestVersioned.read(spark, wh, "cp")) ===
      Set((1L, "a", 10L), (2L, "b", 20L)))
    intercept[IllegalArgumentException](
      ManifestVersioned.cloneTable(spark, wh, "src", "cp"))
  }

  test("clone at a pinned version branches history") {
    val wh = Files.createTempDirectory("graft-cl5").toString
    ManifestVersioned.writeFull(spark, wh, "src", fixture((1L, "a", 10L)), "p")
    ManifestVersioned.writeDelta(spark, wh, "src", fixture((1L, "a", 11L)), "p")
    ManifestVersioned.cloneTable(spark, wh, "src", "old", asOf = Some(1))
    assert(rows(ManifestVersioned.read(spark, wh, "old")) ===
      Set((1L, "a", 10L)), "the branch starts at the pinned snapshot")
  }
}
