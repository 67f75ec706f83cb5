package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.ManifestVersioned

/** Pins the manifest streaming SINK (`writeStream.format("graft")`):
  * one atomic version per micro-batch under each commitMode, the
  * ledger-free batch-id replay guard, and the loud option guards.
  */
class GraftStreamSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val inSchema = StructType(Seq(
    StructField("k", LongType), StructField("p", StringType),
    StructField("v", DoubleType), StructField("is_del", BooleanType)))

  private def bootstrap(): (String, String) = {
    val wh = Files.createTempDirectory("graft-streamsink").toString
    ManifestVersioned.writeFull(spark, wh, "t",
      Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
        .toDF("k", "p", "v"), "p")
    (wh, "t")
  }

  private def jsonDir(batches: Seq[String]*): String = {
    val dir = Files.createTempDirectory("graft-streamsink-in")
    batches.zipWithIndex.foreach { case (rows, i) =>
      Files.write(dir.resolve(s"b$i.jsonl"),
        (rows.mkString("\n") + "\n").getBytes)
    }
    dir.toString
  }

  private def runSink(in: String, wh: String, t: String, ckpt: String,
      opts: (String, String)*): Unit = {
    val w = spark.readStream.schema(inSchema).json(in)
      .writeStream.format("graft")
      .option("warehouse", wh).option("table", t)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
    val q = opts.foldLeft(w) { case (x, (k, v)) => x.option(k, v) }.start()
    q.awaitTermination()
  }

  test("commitMode=merge folds a CDC stream exactly like the batch merge") {
    val (wh, t) = bootstrap()
    val in = jsonDir(Seq(
      """{"k":2,"p":"a","v":21.0,"is_del":false}""",
      """{"k":3,"p":"b","v":0.0,"is_del":true}""",
      """{"k":4,"p":"c","v":40.0,"is_del":false}"""))
    val ckpt = Files.createTempDirectory("graft-streamsink-ck").toString
    runSink(in, wh, t, ckpt, "commitMode" -> "merge", "keyCol" -> "k",
      "tombstoneCol" -> "is_del")
    val got = ManifestVersioned.read(spark, wh, t)
      .select("k", "p", "v").as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "a", 10.0), (2L, "a", 21.0), (4L, "c", 40.0)))
    // the sink's version carries the batch-id note (the replay guard key)
    assert(ManifestVersioned.manifestNote(spark, wh, t)
      .exists(_.startsWith("batch:")))
    // re-running the SAME checkpoint with no new files commits nothing
    val v = ManifestVersioned.currentVersion(spark, wh, t)
    runSink(in, wh, t, ckpt, "commitMode" -> "merge", "keyCol" -> "k",
      "tombstoneCol" -> "is_del")
    assert(ManifestVersioned.currentVersion(spark, wh, t) == v)
  }

  test("commitMode=append keeps duplicate keys (INSERT semantics)") {
    val (wh, t) = bootstrap()
    val in = jsonDir(Seq(
      """{"k":1,"p":"a","v":11.0,"is_del":false}""",
      """{"k":9,"p":"b","v":90.0,"is_del":false}"""))
    val ckpt = Files.createTempDirectory("graft-streamsink-ck2").toString
    runSink(in, wh, t, ckpt)
    val got = ManifestVersioned.read(spark, wh, t)
      .select("k", "v").as[(Long, Double)].collect().toSeq.sorted
    assert(got == Seq((1L, 10.0), (1L, 11.0), (2L, 20.0), (3L, 30.0),
      (9L, 90.0)))
  }

  test("merge mode folds intra-batch duplicate keys by orderCol " +
      "(latest wins, delete-then-update resolves to the update); " +
      "without orderCol duplicates reject loudly") {
    val seqSchema = StructType(inSchema.fields :+
      StructField("seq", LongType))
    val in = jsonDir(Seq(
      """{"k":2,"p":"a","v":99.0,"is_del":true,"seq":1}""",
      """{"k":2,"p":"a","v":21.0,"is_del":false,"seq":2}""",
      """{"k":3,"p":"b","v":31.0,"is_del":false,"seq":5}""",
      """{"k":3,"p":"b","v":77.0,"is_del":false,"seq":2}"""))
    val (wh, t) = bootstrap()
    val q = spark.readStream.schema(seqSchema).json(in)
      .writeStream.format("graft")
      .option("warehouse", wh).option("table", t)
      .option("commitMode", "merge").option("keyCol", "k")
      .option("tombstoneCol", "is_del").option("orderCol", "seq")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ssk-ord").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = ManifestVersioned.read(spark, wh, t)
      .select("k", "v").as[(Long, Double)].collect().toSet
    assert(got === Set((1L, 10.0), (2L, 21.0), (3L, 31.0)),
      "k=2: seq2 update outlives the seq1 delete; k=3: seq5 wins")
    // the same batch WITHOUT orderCol refuses the ambiguity
    val (wh2, t2) = bootstrap()
    val msg = intercept[Exception] {
      val q2 = spark.readStream.schema(seqSchema).json(in)
        .writeStream.format("graft")
        .option("warehouse", wh2).option("table", t2)
        .option("commitMode", "merge").option("keyCol", "k")
        .option("tombstoneCol", "is_del")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-ssk-noord").toString)
        .trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination()
    }.getMessage
    assert(msg.contains("orderCol"))
  }

  test("a replayed addBatch short-circuits on the note guard") {
    val (wh, t) = bootstrap()
    val sink = new GraftManifestSink(spark, wh, t, "append", None, None)
    val batch = Seq((7L, "a", 70.0)).toDF("k", "p", "v")
    sink.addBatch(42L, batch)
    val v = ManifestVersioned.currentVersion(spark, wh, t)
    sink.addBatch(42L, batch) // at-least-once replay of the same batch
    assert(ManifestVersioned.currentVersion(spark, wh, t) == v)
    assert(ManifestVersioned.read(spark, wh, t)
      .filter(col("k") === 7L).count() == 1L)
  }

  test("the replay guard survives maintenance commits between batch and replay") {
    val (wh, t) = bootstrap()
    val sink = new GraftManifestSink(spark, wh, t, "append", None, None)
    sink.addBatch(42L, Seq((7L, "a", 70.0)).toDF("k", "p", "v"))
    // a COMPACTION lands between the batch's commit and its post-crash
    // replay — the head's note is no longer `batch:42`, so a
    // head-only guard would re-append and duplicate the rows
    ManifestVersioned.compactPartitions(spark, wh, t, "p", Seq("a"))
    val v = ManifestVersioned.currentVersion(spark, wh, t)
    sink.addBatch(42L, Seq((7L, "a", 70.0)).toDF("k", "p", "v"))
    assert(ManifestVersioned.currentVersion(spark, wh, t) == v,
      "replayed batch must not commit past a maintenance commit")
    assert(ManifestVersioned.read(spark, wh, t)
      .filter(col("k") === 7L).count() == 1L, "rows duplicated by replay")
    // a LATER batch still applies (the walk finds 42 < 43)
    sink.addBatch(43L, Seq((8L, "b", 80.0)).toDF("k", "p", "v"))
    assert(ManifestVersioned.read(spark, wh, t)
      .filter(col("k") === 8L).count() == 1L)
  }

  test("composition: change-feed source replicates table A into table B " +
      "through the merge sink (stream-native mirror)") {
    val whA = Files.createTempDirectory("graft-repl-a").toString
    val whB = Files.createTempDirectory("graft-repl-b").toString
    val ckpt = Files.createTempDirectory("graft-repl-ck").toString
    ManifestVersioned.writeFull(spark, whA, "src",
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "p", "v"), "p")
    ManifestVersioned.writeFull(spark, whB, "dst",
      spark.emptyDataset[(Long, String, Double)].toDF("k", "p", "v"), "p")
    def mirrorOnce(): Unit = {
      // feed rows → upsert shape: new-side values, deletes as tombstones
      val q = spark.readStream.format("graft")
        .option("warehouse", whA).option("table", "src")
        .option("keyCol", "k").load()
        .select(col("k"), col("new_p").as("p"), col("new_v").as("v"),
          (col("change_type") === "delete").as("is_del"))
        .writeStream.format("graft")
        .option("warehouse", whB).option("table", "dst")
        .option("commitMode", "merge").option("keyCol", "k")
        .option("tombstoneCol", "is_del")
        .option("checkpointLocation", ckpt).start()
      try { q.processAllAvailable() } finally q.stop()
    }
    def rowsOf(wh: String, t: String): Set[(Long, String, Double)] =
      ManifestVersioned.read(spark, wh, t).select("k", "p", "v")
        .as[(Long, String, Double)].collect().toSet
    mirrorOnce()
    assert(rowsOf(whB, "dst") === rowsOf(whA, "src"))
    // mutate A while the mirror is down; restart catches up exactly
    ManifestVersioned.mergeVersionedMulti(spark, whA, "src",
      Seq((1L, "a", 11.0, false), (2L, "b", 0.0, true),
        (3L, "c", 30.0, false)).toDF("k", "p", "v", "is_del"),
      "k", Seq("p"), order = Nil, isTombstone = col("is_del"),
      sourceWins = true)
    mirrorOnce()
    assert(rowsOf(whB, "dst") === rowsOf(whA, "src"))
    assert(rowsOf(whB, "dst") === Set((1L, "a", 11.0), (3L, "c", 30.0)))
  }

  test("loud guards: output mode, partitionBy, commitMode, bootstrap") {
    val (wh, t) = bootstrap()
    val in = jsonDir(Seq("""{"k":1,"p":"a","v":1.0,"is_del":false}"""))
    def tryStart(f: org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] => org.apache.spark.sql.streaming
        .DataStreamWriter[org.apache.spark.sql.Row]): String =
      intercept[Exception] {
        val q = f(spark.readStream.schema(inSchema).json(in)
          .writeStream.format("graft")
          .option("checkpointLocation",
            Files.createTempDirectory("ck").toString)
          .trigger(Trigger.AvailableNow())).start()
        q.awaitTermination()
      }.getMessage
    assert(tryStart(_.option("warehouse", wh).option("table", t)
      .partitionBy("p")).contains("partcols"))
    assert(tryStart(_.option("warehouse", wh).option("table", t)
      .option("commitMode", "nope")).contains("commitMode"))
    assert(tryStart(_.option("warehouse", wh).option("table", t)
      .option("commitMode", "merge")).contains("keyCol"))
    assert(tryStart(_.option("warehouse", wh)
      .option("table", "missing_" + System.nanoTime()))
      .contains("writeFull"))
    assert(tryStart(_.option("table", t)).contains("warehouse"))
  }
}
