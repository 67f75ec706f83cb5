package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Column-mapping drift vs pinned-snapshot writes — the defect class
  * the two-writer model check surfaced in r12: RENAME COLUMN (and DROP
  * COLUMN) are schema-only commits that move NO partition entry, so a
  * racing merge/append pinned to the pre-rename snapshot sailed past
  * the entry-expectation check and exploded on the physical-name
  * reservation (`IllegalArgumentException`, which no retry loop
  * catches) — or, for a drop, would have silently resurrected the
  * column. The fix: such drift is a [[ConcurrentWriteConflictException]]
  * (checked fail-fast and per OCC attempt), so the public retry paths
  * re-derive from the new head. These are the deterministic pins; the
  * seeded race lives in `GraftConcurrentModelSpec`.
  */
class SchemaRaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(triples: (Long, String, Long)*) =
    triples.toDF("k", "p", "v")

  test("a merge pinned to a pre-RENAME snapshot conflicts (re-derive), " +
      "never the physical-name reservation error") {
    val wh = Files.createTempDirectory("graft-smr1").toString
    ManifestVersioned.writeFull(spark, wh, "t",
      fixture((1L, "a", 10L), (2L, "b", 20L))
        .withColumn("extra", lit(1L)).withColumn("del", lit(false)), "p")
    // writer A derives its change under the v1 schema (carries `extra`)
    val changeA = Seq((1L, "a", 111L, 9L, false))
      .toDF("k", "p", "v", "extra", "del")
    // writer B renames `extra` mid-flight — a schema-only commit
    ManifestVersioned.renameColumn(spark, wh, "t", "extra", "renamed")
    // A's pinned attempt must abort AS A CONFLICT, not an
    // IllegalArgumentException the retry loops would never catch
    intercept[ConcurrentWriteConflictException] {
      ManifestVersioned.mergeVersionedAt(spark, wh, "t", baseV = 1,
        changeA, "k", Seq("p"), Seq(col("v").desc), col("del"))
    }
    // the table is untouched by the aborted attempt
    assert(ManifestVersioned.read(spark, wh, "t")
      .select("k", "v").as[(Long, Long)].collect().toSet ===
      Set((1L, 10L), (2L, 20L)))
    // a re-derived change speaking the NEW head's names commits fine
    val changeA2 = Seq((1L, "a", 111L, 9L, false))
      .toDF("k", "p", "v", "renamed", "del")
    ManifestVersioned.mergeVersioned(spark, wh, "t", changeA2, "k", "p",
      Seq(col("v").desc), col("del"))
    assert(ManifestVersioned.read(spark, wh, "t")
      .filter(col("k") === 1).select("renamed").as[Long].head() === 9L)
  }

  test("a merge pinned to a pre-DROP snapshot conflicts instead of " +
      "silently resurrecting the dropped column") {
    val wh = Files.createTempDirectory("graft-smr2").toString
    ManifestVersioned.writeFull(spark, wh, "t",
      fixture((1L, "a", 10L))
        .withColumn("doomed", lit(1L)).withColumn("del", lit(false)), "p")
    val changeA = Seq((1L, "a", 111L, 9L, false))
      .toDF("k", "p", "v", "doomed", "del")
    ManifestVersioned.dropColumns(spark, wh, "t", Seq("doomed"))
    intercept[ConcurrentWriteConflictException] {
      ManifestVersioned.mergeVersionedAt(spark, wh, "t", baseV = 1,
        changeA, "k", Seq("p"), Seq(col("v").desc), col("del"))
    }
    assert(!ManifestVersioned.read(spark, wh, "t").columns
      .contains("doomed"))
  }

  test("the FIXED-frame public merge aborts LOUDLY when a rename lands " +
      "mid-flight — the retry loop must not respin with refreshed " +
      "expectations and silently resurrect stale names") {
    val wh = Files.createTempDirectory("graft-smr4").toString
    ManifestVersioned.writeFull(spark, wh, "t",
      fixture((1L, "a", 10L), (2L, "b", 20L))
        .withColumn("extra", lit(1L)).withColumn("del", lit(false)), "p")
    // the change frame blocks at its first evaluation until the PEER's
    // rename has committed — a deterministic spelling of "the rename
    // lands between the merge's entry and its commit". `started` is
    // the handshake: it trips when the merge is already PAST its
    // entry-schema pinning (the UDF only runs inside change
    // evaluation, which follows the pin), so the rename provably
    // lands in the window — a bare sleep could fire the rename before
    // a stalled merge thread pinned, turning the typed conflict into
    // the reservation error and flaking the test
    val started = new java.util.concurrent.CountDownLatch(1)
    val latch = new java.util.concurrent.CountDownLatch(1)
    val gate = org.apache.spark.sql.functions.udf { (v: Long) =>
      started.countDown()
      latch.await(60, java.util.concurrent.TimeUnit.SECONDS); v
    }
    val change = Seq((1L, "a", 111L, 9L, false))
      .toDF("k", "p", "v", "extra", "del")
      .withColumn("v", gate(col("v")))
    val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    try {
      val merging = pool.submit(
        new java.util.concurrent.Callable[Throwable] {
          def call(): Throwable =
            try {
              ManifestVersioned.mergeVersionedMulti(spark, wh, "t",
                change, "k", Seq("p"), Seq(col("v").desc), col("del"))
              null
            } catch { case e: Throwable => e }
        })
      assert(started.await(60, java.util.concurrent.TimeUnit.SECONDS),
        "the merge never reached its change evaluation")
      ManifestVersioned.renameColumn(spark, wh, "t", "extra", "renamed")
      latch.countDown()
      val err = merging.get(120, java.util.concurrent.TimeUnit.SECONDS)
      assert(err != null, "the fixed-frame merge must NOT commit " +
        "stale column names after a mid-flight rename")
      assert(err.isInstanceOf[SchemaMappingConflictException] &&
        err.getMessage.contains("re-derive"),
        s"expected the loud fixed-frame abort, got $err")
      // nothing committed, nothing resurrected: the table still reads
      // under the renamed schema only
      val cols = ManifestVersioned.read(spark, wh, "t").columns.toSet
      assert(cols.contains("renamed") && !cols.contains("extra"))
      assert(ManifestVersioned.read(spark, wh, "t")
        .filter(col("k") === 1).select("v").as[Long].head() === 10L)
    } finally { latch.countDown(); pool.shutdown() }
  }

  test("compaction racing a DROP COLUMN conflicts and HEALS by " +
      "re-deriving — never resurrects the dropped column") {
    val wh = Files.createTempDirectory("graft-smr5").toString
    ManifestVersioned.writeFull(spark, wh, "t",
      fixture((1L, "a", 10L), (2L, "a", 20L))
        .withColumn("doomed", lit(7L)), "p")
    ManifestVersioned.dropColumns(spark, wh, "t", Seq("doomed"))
    // the pinned attempt at the pre-drop base must CONFLICT (its slice
    // carries `doomed` with real bytes — committing would resurrect)
    intercept[SchemaMappingConflictException] {
      ManifestVersioned.compactPartitionsAt(spark, wh, "t", Seq("p"),
        Seq(Seq("a")), layout = None, baseV = 1)
    }
    // the public retry path re-folds from the new head and succeeds
    ManifestVersioned.compactPartitions(spark, wh, "t", "p", Seq("a"))
    val back = ManifestVersioned.read(spark, wh, "t")
    assert(!back.columns.contains("doomed"),
      "compaction must not resurrect a dropped column")
    assert(back.select("k").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("appendRows honors a caller-supplied derivation-time schema pin " +
      "(ADVICE-r12 #1): a DROP landing between a statement's schema " +
      "read and its append conflicts loudly instead of resurrecting") {
    val wh = Files.createTempDirectory("graft-smr6").toString
    ManifestVersioned.writeFull(spark, wh, "t",
      fixture((1L, "a", 10L)).withColumn("doomed", lit(1L)), "p")
    // the statement (COPY INTO's shape) reads the schema, aligns its
    // source rows under it...
    val derivedUnder = ManifestVersioned.manifestSchema(spark, wh, "t")
    val aligned = Seq((2L, "a", 20L, 5L)).toDF("k", "p", "v", "doomed")
    // ...and a peer drops the column BEFORE the append runs. Without
    // the caller pin, appendRows' own entry snapshot is the post-drop
    // schema — `doomed` reads as additive evolution and silently
    // resurrects. With it, the drift is a typed conflict the
    // statement-level re-derive loop catches.
    ManifestVersioned.dropColumns(spark, wh, "t", Seq("doomed"))
    intercept[SchemaMappingConflictException] {
      ManifestVersioned.appendRows(spark, wh, "t", aligned,
        expectSchema0 = derivedUnder)
    }
    val cols = ManifestVersioned.read(spark, wh, "t").columns.toSet
    assert(!cols.contains("doomed"),
      "the aborted append must not resurrect the dropped column")
    assert(ManifestVersioned.read(spark, wh, "t").count() === 1,
      "the aborted append commits nothing")
  }

  test("additive evolution and widening still COMMUTE with a pinned " +
      "merge — no false conflicts") {
    val wh = Files.createTempDirectory("graft-smr3").toString
    ManifestVersioned.writeFull(spark, wh, "t",
      fixture((1L, "a", 10L), (2L, "b", 20L))
        .withColumn("del", lit(false)), "p")
    val changeA = Seq((1L, "a", 111L, false)).toDF("k", "p", "v", "del")
    // peer commits an ADD COLUMNS between A's derivation and commit:
    // every (logical, physical) pair A derived under still exists, so
    // the pinned attempt goes through (its rows read the added column
    // as typed NULLs)
    ManifestVersioned.addColumns(spark, wh, "t",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("added",
          org.apache.spark.sql.types.LongType))))
    val (_, v) = ManifestVersioned.mergeVersionedAt(spark, wh, "t",
      baseV = 1, changeA, "k", Seq("p"), Seq(col("v").desc), col("del"))
    assert(v === 3)
    val back = ManifestVersioned.read(spark, wh, "t")
    assert(back.filter(col("k") === 1).select("v").as[Long].head() === 111L)
    assert(back.filter(col("k") === 1).select("added")
      .as[Option[Long]].head() === None)
  }
}
