package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.ManifestVersioned

/** Pins the first-class change-feed streaming source
  * ([[GraftChangeFeedProvider]], `format("graft")`): micro-batch parity
  * with [[ManifestVersioned.readChangesSince]], checkpoint/restart
  * resuming at the right version, `startingVersion` semantics, and the
  * loud option/schema guards.
  */
class GraftStreamSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): (String, String) = {
    val wh = Files.createTempDirectory("graft-streamsrc").toString
    val t = "orders_s"
    // v1: bootstrap 6 keys over 2 partitions
    ManifestVersioned.writeFull(spark, wh, t,
      Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
        (4L, "b", 40.0), (5L, "b", 50.0), (6L, "b", 60.0))
        .toDF("k", "p", "v"), "p")
    // v2: update k=2, delete k=5, insert k=7 (new partition c)
    ManifestVersioned.mergeVersionedMulti(spark, wh, t,
      Seq((2L, "a", 21.0, false), (5L, "b", 0.0, true),
        (7L, "c", 70.0, false)).toDF("k", "p", "v", "is_del"),
      "k", Seq("p"), order = Nil, isTombstone = col("is_del"),
      sourceWins = true)
    (wh, t)
  }

  private def feed(wh: String, t: String, extra: (String, String)*)
      : DataFrame = {
    val r = spark.readStream.format("graft")
      .option("warehouse", wh).option("table", t).option("keyCol", "k")
    extra.foldLeft(r) { case (x, (k, v)) => x.option(k, v) }.load()
  }

  private def rows(df: DataFrame): Set[(Int, Long, String, Option[String],
      Option[String], Option[Double], Option[Double])] =
    df.select("version", "k", "change_type", "old_p", "new_p", "old_v",
        "new_v")
      .as[(Int, Long, String, Option[String], Option[String],
        Option[Double], Option[Double])].collect().toSet

  test("micro-batches are readChangesSince batches (bootstrap parity)") {
    val (wh, t) = freshTable()
    val q = feed(wh, t).writeStream.format("memory")
      .queryName("cf_parity").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = rows(spark.table("cf_parity"))
    val batch = rows(
      ManifestVersioned.readChangesSince(spark, wh, t, 0, "k"))
    assert(streamed == batch)
    // the bootstrap (v1) arrives as inserts; v2 carries the churn
    assert(streamed.count(_._1 == 1) == 6)
    assert(streamed.filter(_._1 == 2).map(x => (x._2, x._3)) ==
      Set((2L, "update"), (5L, "delete"), (7L, "insert")))
  }

  test("checkpointed restart resumes at the committed version " +
      "(exactly-once across stop/commit/restart)") {
    val (wh, t) = freshTable()
    val out = Files.createTempDirectory("graft-streamsrc-out").toString
    val ckpt = Files.createTempDirectory("graft-streamsrc-ckpt").toString
    def runOnce(): Unit = {
      val q = feed(wh, t).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
      try { q.processAllAvailable() } finally q.stop()
    }
    runOnce()
    val afterFirst = rows(spark.read.parquet(out))
    assert(afterFirst.map(_._1).max == 2)
    // while the stream is DOWN: v3 updates k=1 and deletes k=7
    ManifestVersioned.mergeVersionedMulti(spark, wh, t,
      Seq((1L, "a", 11.0, false), (7L, "c", 0.0, true))
        .toDF("k", "p", "v", "is_del"),
      "k", Seq("p"), order = Nil, isTombstone = col("is_del"),
      sourceWins = true)
    runOnce()
    val afterSecond = rows(spark.read.parquet(out))
    // exactly the v3 changes appended — no replays, no gaps
    assert(afterSecond -- afterFirst == Set(
      (3, 1L, "update", Some("a"), Some("a"), Some(10.0), Some(11.0)),
      (3, 7L, "delete", Some("c"), None, Some(70.0), None)))
    assert(afterSecond.size == afterFirst.size + 2)
  }

  test("startingVersion=latest skips the bootstrap; a numeric " +
      "startingVersion is a consumed-through cursor") {
    val (wh, t) = freshTable()
    val latest = feed(wh, t, "startingVersion" -> "latest")
      .writeStream.format("memory").queryName("cf_latest").start()
    try { latest.processAllAvailable() } finally latest.stop()
    assert(spark.table("cf_latest").isEmpty) // nothing after head yet
    val fromV1 = feed(wh, t, "startingVersion" -> "1")
      .writeStream.format("memory").queryName("cf_from1").start()
    try { fromV1.processAllAvailable() } finally fromV1.stop()
    assert(rows(spark.table("cf_from1")) ==
      rows(ManifestVersioned.readChangesSince(spark, wh, t, 1, "k")))
  }

  test("maxVersionsPerTrigger bounds catch-up micro-batches") {
    val (wh, t) = freshTable() // v1 (bootstrap) + v2 (churn)
    for (i <- 3 to 5) // v3..v5: one new key each
      ManifestVersioned.mergeVersionedMulti(spark, wh, t,
        Seq((10L + i, "a", i * 1.0, false)).toDF("k", "p", "v", "is_del"),
        "k", Seq("p"), order = Nil, isTombstone = col("is_del"),
        sourceWins = true)
    val q = feed(wh, t, "maxVersionsPerTrigger" -> "2")
      .writeStream.format("memory").queryName("cf_paced").start()
    try { q.processAllAvailable() } finally q.stop()
    // same rows as the unbounded read — pacing changes batching only
    assert(rows(spark.table("cf_paced")) ==
      rows(ManifestVersioned.readChangesSince(spark, wh, t, 0, "k")))
    // 5 versions at <=2 per trigger needs at least 3 micro-batches
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
      s"expected >=3 bounded batches, got " +
        q.recentProgress.map(_.numInputRows).mkString(","))
  }

  test("keyCol falls back to the registered SQL merge key") {
    val (wh, t) = freshTable()
    graft.plans.GraftSqlTables.register(spark, wh, t,
      keyCol = Some("k"))
    val q = spark.readStream.format("graft")
      .option("warehouse", wh).option("table", t).load()
      .writeStream.format("memory").queryName("cf_regkey").start()
    try { q.processAllAvailable() } finally q.stop()
    assert(rows(spark.table("cf_regkey")) ==
      rows(ManifestVersioned.readChangesSince(spark, wh, t, 0, "k")))
  }

  test("loud guards: missing options, unknown key, bad startingVersion") {
    val (wh, t) = freshTable()
    def startFails(df: => DataFrame): String =
      intercept[Exception] {
        val q = df.writeStream.format("memory")
          .queryName(s"cf_err_${System.nanoTime()}").start()
        try { q.processAllAvailable() } finally q.stop()
      }.getMessage
    assert(intercept[Exception] {
      spark.readStream.format("graft").option("table", t).load()
    }.getMessage.contains("warehouse"))
    assert(intercept[Exception] {
      spark.readStream.format("graft").option("warehouse", wh).load()
    }.getMessage.contains("table"))
    assert(intercept[Exception] {
      spark.readStream.format("graft").option("warehouse", wh)
        .option("table", "nosuch_" + System.nanoTime()).load()
    }.getMessage.contains("keyCol"))
    assert(startFails(feed(wh, t, "startingVersion" -> "x"))
      .contains("startingVersion"))
    assert(intercept[Exception] {
      spark.readStream.format("graft").option("warehouse", wh)
        .option("table", t).option("keyCol", "nope").load()
    }.getMessage.contains("nope"))
  }

  test("mid-stream schema evolution fails the LIVE stream loudly; a " +
      "restarted stream adopts the widened schema at the right version") {
    val (wh, t) = freshTable()
    val out = Files.createTempDirectory("graft-streamsrc-evo").toString
    val ckpt = Files.createTempDirectory("graft-streamsrc-evock").toString
    val q1 = feed(wh, t).writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    try {
      q1.processAllAvailable()
      // v3 adds a column (additive evolution through the merge path)
      // while q1 is LIVE with the pre-evolution schema pinned
      ManifestVersioned.mergeVersionedMulti(spark, wh, t,
        Seq((8L, "a", 80.0, "x", false))
          .toDF("k", "p", "v", "tag", "is_del"),
        "k", Seq("p"), order = Nil, isTombstone = col("is_del"),
        sourceWins = true)
      val msg = intercept[Exception] { q1.processAllAvailable() }
        .getMessage
      assert(msg.contains("evolved mid-stream"))
    } finally q1.stop()
    // a FRESH stream pins the widened schema and sees old_tag/new_tag
    val q3 = feed(wh, t).writeStream.format("memory")
      .queryName("cf_evolved").start()
    try { q3.processAllAvailable() } finally q3.stop()
    val evolved = spark.table("cf_evolved")
    assert(evolved.columns.contains("new_tag"))
    assert(evolved.filter(col("version") === 3 && col("k") === 8)
      .select("new_tag").as[String].head() == "x")
  }

  test("a vacuumed-past resume point fails loudly and actionably, " +
      "not with a raw missing-file error") {
    val (wh, t) = freshTable()
    val ckpt = Files.createTempDirectory("graft-streamsrc-exp").toString
    val out = Files.createTempDirectory("graft-streamsrc-expo").toString
    // consume through v2, checkpointed
    val q1 = feed(wh, t).writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    try { q1.processAllAvailable() } finally q1.stop()
    // the table moves on and a vacuum reclaims everything but the head
    ManifestVersioned.writeDelta(spark, wh, t,
      Seq((8L, "c", 80.0)).toDF("k", "p", "v"), "p")
    ManifestVersioned.writeDelta(spark, wh, t,
      Seq((9L, "c", 90.0)).toDF("k", "p", "v"), "p")
    ManifestVersioned.vacuum(spark, wh, t, keepHistory = 0)
    assert(ManifestVersioned.earliestFeedVersion(spark, wh, t)
      === Some(5))
    // the checkpointed resume point (v2) predates retention — the
    // restarted stream must fail with the restart instruction
    val q2 = feed(wh, t).writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    val msg = intercept[Exception] {
      try q2.processAllAvailable() finally q2.stop()
    }.getMessage
    assert(msg.contains("expired") && msg.contains("startingVersion"),
      s"wanted the actionable retention error, got: $msg")
    // ...and a brand-new stream asking for the vacuumed history fails
    // at START, before any checkpoint exists
    val msg2 = intercept[Exception] {
      val q3 = feed(wh, t, "startingVersion" -> "1")
        .writeStream.format("memory").queryName("cf_expired").start()
      try q3.processAllAvailable() finally q3.stop()
    }.getMessage
    assert(msg2.contains("expired"))
    // a fresh stream from the retained boundary works and serves the
    // next commit's changes
    ManifestVersioned.writeDelta(spark, wh, t,
      Seq((10L, "d", 100.0)).toDF("k", "p", "v"), "p")
    val q4 = feed(wh, t, "startingVersion" -> "4")
      .writeStream.format("memory").queryName("cf_boundary").start()
    try { q4.processAllAvailable() } finally q4.stop()
    assert(spark.table("cf_boundary").select("version")
      .as[Int].collect().toSet === Set(5))
  }
}
