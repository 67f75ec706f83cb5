package graft.io

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** REUSABLE contract kit for [[WarehouseAdapter]] implementations —
  * what every substrate behind the pipeline's warehouse boundary (the
  * reference's BigQuery at `helper_functions.py:192-196` /
  * `incremental_etl_v1.py:85`) must guarantee before [[graft.core
  * .Pipeline]] can trust it. Subclass with a factory; the kit
  * generates the suite:
  *
  *  1. ROUND-TRIP FIDELITY: overwrite-then-read returns the exact rows
  *     AND the exact schema — types included (a substrate that comes
  *     back with everything stringly-typed fails), nulls distinct from
  *     empty strings, delimiter/quote/newline content intact, UTC
  *     timestamps and dates exact.
  *  2. WRITE_TRUNCATE: a second overwrite fully replaces the first —
  *     rows, schema, everything; re-running a full load converges.
  *  3. APPEND adds rows without touching existing ones; a
  *     schema-drifted append rejects loudly (never silently
  *     mis-columns).
  *  4. REPLACE-FROM-SELF: replacing a table with content DERIVED FROM
  *     READING THAT TABLE works (the nightly merge's shape) — the
  *     materialization barrier the reference gets from staging via GCS.
  *  5. EXISTS tracks table lifecycle; reading a missing table throws.
  *  6. recoverAll is an idempotent no-op on a clean warehouse.
  *
  * Run by `ParquetWarehouseContractSpec` and
  * `CsvWarehouseContractSpec`; a real BigQuery adapter ships with its
  * own subclass pointed at the service (or a faithful fake).
  */
abstract class WarehouseContractKit extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def newAdapter(): WarehouseAdapter
  def adapterName: String

  private var n = 0
  private def wh(): String = {
    n += 1
    Files.createTempDirectory(s"graft-whkit$n").toString
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** A frame exercising every fidelity hazard at once. */
  private def fixture() = {
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("s", StringType),
      StructField("d", DoubleType),
      StructField("i", IntegerType),
      StructField("b", BooleanType),
      StructField("day", DateType),
      StructField("at", TimestampType)))
    val rows = Seq(
      Row(1L, "plain", 1.5, 10, true,
        java.sql.Date.valueOf("2026-03-01"), ts("2026-03-01 10:00:00")),
      Row(2L, "comma, quote \" and\nnewline", -2.25, null, false,
        null, ts("2026-03-02 23:59:59.123456")),
      Row(3L, "", 0.0, 0, null,
        java.sql.Date.valueOf("1969-12-31"), null),
      Row(4L, null, null, -7, true,
        java.sql.Date.valueOf("2026-12-31"), ts("1969-12-31 23:59:59")),
      // null-sentinel lookalikes and boundary whitespace: data spelled
      // like common null tokens must stay DATA, and padding must
      // survive (text substrates trim / tokenize by default)
      Row(5L, "\\N", 5.0, 5, false,
        java.sql.Date.valueOf("2026-06-15"), ts("2026-06-15 12:00:00")),
      Row(6L, "  padded  ", 6.0, 6, true, null, null),
      Row(7L, "NULL", 7.0, 7, false, null, null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case null => "<null>"
      case t: java.sql.Timestamp => t.toInstant.toString
      case d: java.sql.Date => d.toString
      case v => v.toString
    }.mkString("|")).sorted.toSeq

  test(s"$adapterName: overwrite-then-read round-trips rows, types, " +
      "nulls-vs-empty, quoting, temporal values") {
    val a = newAdapter()
    val w = wh()
    val df = fixture()
    assert(!a.exists(spark, w, "t"))
    a.overwrite(df, w, "t")
    assert(a.exists(spark, w, "t"))
    val back = a.read(spark, w, "t")
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      "schema must round-trip exactly, types included")
    assert(canon(back) === canon(df))
  }

  test(s"$adapterName: overwrite is WRITE_TRUNCATE — the second write " +
      "fully replaces rows AND schema") {
    val a = newAdapter()
    val w = wh()
    a.overwrite(fixture(), w, "t")
    val second = Seq((100L, "fresh"), (200L, "start")).toDF("id", "tag")
    a.overwrite(second, w, "t")
    val back = a.read(spark, w, "t")
    assert(back.columns.toSeq === Seq("id", "tag"))
    assert(canon(back) === canon(second))
  }

  test(s"$adapterName: append adds rows; a schema-drifted append " +
      "rejects loudly") {
    val a = newAdapter()
    val w = wh()
    val df = fixture()
    a.overwrite(df, w, "t")
    a.append(df.filter(col("k") <= 2), w, "t")
    assert(a.read(spark, w, "t").count() === 9)
    assert(a.read(spark, w, "t").filter(col("k") === 1).count() === 2)
    intercept[Exception] {
      a.append(Seq((1, "drifted")).toDF("x", "y"), w, "t")
    }
    assert(a.read(spark, w, "t").count() === 9, "failed append left " +
      "the table untouched")
  }

  test(s"$adapterName: replace works when the new content derives " +
      "from reading the table being replaced (materialization barrier)") {
    val a = newAdapter()
    val w = wh()
    a.overwrite(fixture(), w, "t")
    // the nightly-merge shape: read t, transform, replace t with it
    val merged = a.read(spark, w, "t")
      .withColumn("d", coalesce(col("d"), lit(0.0)) + 1.0)
      .filter(col("k") =!= 3)
    a.replace(spark, w, "t", merged)
    val back = a.read(spark, w, "t")
    assert(back.count() === 6)
    assert(back.filter(col("k") === 1).select("d").as[Double].head() ===
      2.5)
    // and replace-from-self converges on a second run (content captured
    // BEFORE the second replace: a DataFrame held across a replace
    // pins the superseded file listing by design — no snapshot
    // isolation on the overwrite substrates, same as the reference's
    // BQ overwrite invalidating running readers)
    val expected = canon(back)
    a.replace(spark, w, "t", a.read(spark, w, "t"))
    assert(canon(a.read(spark, w, "t")) === expected)
  }

  test(s"$adapterName: reading a missing table throws; exists stays " +
      "false until a write") {
    val a = newAdapter()
    val w = wh()
    assert(!a.exists(spark, w, "ghost"))
    intercept[Exception] { a.read(spark, w, "ghost").collect() }
  }

  test(s"$adapterName: an EMPTY overwrite is a real table — schema " +
      "round-trips, reads return zero rows, and a later overwrite " +
      "recovers (the all-tombstones full-load shape)") {
    val a = newAdapter()
    val w = wh()
    val empty = fixture().filter(col("k") < 0)
    a.overwrite(empty, w, "t")
    assert(a.exists(spark, w, "t"))
    val back = a.read(spark, w, "t")
    assert(back.count() === 0)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      empty.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    // ... and replacing the empty table with real content works
    a.overwrite(fixture(), w, "t")
    assert(a.read(spark, w, "t").count() === 7)
    // ... as does replacing real content with empty (every row
    // tombstoned on a later night)
    a.replace(spark, w, "t", a.read(spark, w, "t").filter(col("k") < 0))
    assert(a.read(spark, w, "t").count() === 0)
  }

  test(s"$adapterName: recoverAll is an idempotent no-op on a clean " +
      "warehouse") {
    val a = newAdapter()
    val w = wh()
    a.overwrite(fixture(), w, "t")
    val before = canon(a.read(spark, w, "t"))
    a.recoverAll(spark, w)
    a.recoverAll(spark, w)
    assert(canon(a.read(spark, w, "t")) === before)
  }
}

class ParquetWarehouseContractSpec extends WarehouseContractKit {
  def newAdapter(): WarehouseAdapter = ParquetWarehouseAdapter
  def adapterName: String = "parquet adapter"
}

class ManifestWarehouseContractSpec extends WarehouseContractKit {
  def newAdapter(): WarehouseAdapter = new ManifestWarehouseAdapter(shards = 4)
  def adapterName: String = "manifest adapter"
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def tmp() = java.nio.file.Files
    .createTempDirectory("graft-whkit-mv").toString

  test("manifest adapter: every boundary write is a committed version — " +
      "history accumulates, time travel reads any past night, and the " +
      "synthetic shard column never leaks into reads") {
    val a = newAdapter()
    val w = tmp()
    a.overwrite(Seq((1L, "night1")).toDF("k", "v"), w, "t")
    a.replace(spark, w, "t", Seq((1L, "night2"), (2L, "new")).toDF("k", "v"))
    a.append(Seq((3L, "late")).toDF("k", "v"), w, "t")
    val versions = ManifestVersioned.listVersions(spark, w, "t")
    assert(versions.size === 3, "one committed version per boundary write")
    // time travel: night 1 is still exactly readable
    val v1 = ManifestVersioned.read(spark, w, "t", Some(versions.head))
    assert(v1.columns.contains("_graft_shard"),
      "the layer records the shard column physically")
    assert(v1.drop("_graft_shard").as[(Long, String)].collect().toSet ===
      Set((1L, "night1")))
    // the boundary read never shows the synthetic column
    assert(a.read(spark, w, "t").columns.toSeq === Seq("k", "v"))
    assert(a.read(spark, w, "t").as[(Long, String)].collect().toSet ===
      Set((1L, "night2"), (2L, "new"), (3L, "late")))
    // DESCRIBE HISTORY over the run cadence (the SQL surface the
    // manifest substrate buys the ETL operator)
    graft.plans.GraftSqlTables.register(spark, w, "t", Some("whkit_hist"))
    try {
      val hist = spark.sql("DESCRIBE HISTORY whkit_hist")
      assert(hist.count() === 3)
    } finally graft.plans.GraftSqlTables.unregister(spark, "whkit_hist")
  }

  test("manifest adapter: append is O(batch) — existing generation " +
      "dirs are untouched, only the fresh batch's shards are staged") {
    val a = newAdapter()
    val w = tmp()
    a.overwrite((1L to 100L).map(k => (k, s"v$k")).toDF("k", "v"), w, "t")
    val before = ManifestVersioned.manifestEntries(spark, w, "t")
    a.append(Seq((200L, "x"), (201L, "y")).toDF("k", "v"), w, "t")
    val after = ManifestVersioned.manifestEntries(spark, w, "t")
    before.foreach { case (key, e) =>
      assert(after.get(key).map(_.dir) === Some(e.dir),
        s"append rewrote existing partition $key — the O(batch) " +
          "contract is broken")
    }
    assert((after.keySet -- before.keySet).nonEmpty,
      "the appended batch staged new partitions")
    assert(a.read(spark, w, "t").count() === 102)
  }

  test("manifest adapter: recoverAll sweeps staging debris and orphan " +
      "generations, deletes never-committed tables, and retains ALL " +
      "history") {
    val a = newAdapter()
    val w = tmp()
    a.overwrite(Seq((1L, "a")).toDF("k", "v"), w, "t")
    a.replace(spark, w, "t", Seq((1L, "b")).toDF("k", "v"))
    val fs = new org.apache.hadoop.fs.Path(w)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash debris: a scratch staging dir and an orphan generation that
    // never made it into a manifest
    val base = new org.apache.hadoop.fs.Path(s"$w/t.mv")
    fs.mkdirs(new org.apache.hadoop.fs.Path(base, "._stage.deadbeef"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(base, "parts/zzz_0/orphan"))
    // a table whose first commit never landed
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$w/ghost.mv/._stage.x"))
    a.recoverAll(spark, w)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(base, "._stage.deadbeef")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(base, "parts/zzz_0/orphan")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$w/ghost.mv")),
      "a never-committed table dir is not a table")
    assert(!a.exists(spark, w, "ghost"))
    // BOTH committed versions survived (recovery never drops history)
    val versions = ManifestVersioned.listVersions(spark, w, "t")
    assert(versions.size === 2)
    assert(ManifestVersioned.read(spark, w, "t", Some(versions.head))
      .drop("_graft_shard").as[(Long, String)].collect().toSet ===
      Set((1L, "a")))
    assert(a.read(spark, w, "t").as[(Long, String)].collect().toSet ===
      Set((1L, "b")))
  }

  test("manifest adapter: a configured mergeKey is recorded as the " +
      "durable graft.mergeKey property when the frame carries the " +
      "column, and skipped when it does not") {
    val a = new ManifestWarehouseAdapter(shards = 2, mergeKey = Some("k"))
    val w = tmp()
    a.overwrite(Seq((1L, "x")).toDF("k", "v"), w, "t")
    assert(ManifestVersioned.tableProperties(spark, w, "t")
      .get("graft.mergeKey") === Some("k"))
    // survives the nightly full rewrite (properties are durable)
    a.replace(spark, w, "t", Seq((2L, "y")).toDF("k", "v"))
    assert(ManifestVersioned.tableProperties(spark, w, "t")
      .get("graft.mergeKey") === Some("k"))
    // a table without the column records nothing
    a.overwrite(Seq((1L, "x")).toDF("id", "v"), w, "nokey")
    assert(ManifestVersioned.tableProperties(spark, w, "nokey")
      .get("graft.mergeKey") === None)
    // ADVICE-r12 #3: a full rewrite that DROPS the key column must
    // clear the durable property in the same commit — properties
    // otherwise survive rewrites, and a stale key would hand SQL DML
    // a nonexistent upsert column (the deferred error this adapter
    // exists to prevent)
    a.replace(spark, w, "t", Seq((9L, "z")).toDF("id", "v"))
    assert(ManifestVersioned.tableProperties(spark, w, "t")
      .get("graft.mergeKey") === None,
      "a keyless rewrite must not leave the prior graft.mergeKey live")
    // ...and a later rewrite that carries the key again re-records it
    a.replace(spark, w, "t", Seq((1L, "x")).toDF("k", "v"))
    assert(ManifestVersioned.tableProperties(spark, w, "t")
      .get("graft.mergeKey") === Some("k"))
  }

  test("manifest adapter: recoverAll with a grace window leaves RECENT " +
      "zero-version dirs and staging debris alone (ADVICE-r12 #4 — a " +
      "concurrent first commit must not have its staged work swept)") {
    val graced = new ManifestWarehouseAdapter(shards = 2,
      recoveryGraceMs = 60 * 60 * 1000L)
    val w = tmp()
    val fs = new org.apache.hadoop.fs.Path(w)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a table whose first commit is IN FLIGHT right now (fresh mtimes)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$w/inflight.mv/._stage.x"))
    // a committed table with FRESH staging debris next to it
    graced.overwrite(Seq((1L, "a")).toDF("k", "v"), w, "t")
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$w/t.mv/._stage.fresh"))
    graced.recoverAll(spark, w)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$w/inflight.mv")),
      "a zero-version dir touched within the grace window is an " +
        "in-flight first commit, not debris")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$w/t.mv/._stage.fresh")),
      "fresh staging debris survives a graced recovery")
    // the table itself is untouched either way
    assert(graced.read(spark, w, "t").count() === 1)
    // grace 0 (the pipeline-startup single-writer default) sweeps both
    new ManifestWarehouseAdapter(shards = 2).recoverAll(spark, w)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$w/inflight.mv")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$w/t.mv/._stage.fresh")))
    assert(new ManifestWarehouseAdapter().read(spark, w, "t").count() === 1)
  }

  test("manifest adapter: a frame carrying the reserved shard column " +
      "rejects loudly") {
    val a = newAdapter()
    val w = tmp()
    val e = intercept[IllegalArgumentException] {
      a.overwrite(Seq((1L, "x")).toDF("k", "_graft_shard"), w, "t")
    }
    assert(e.getMessage.contains("_graft_shard"))
  }

  test("manifest adapter: writes spread across shards for parallelism " +
      "(one generation dir per populated shard bucket)") {
    val a = newAdapter()
    val w = tmp()
    a.overwrite((1L to 1000L).map(k => (k, k * 2)).toDF("k", "v"), w, "t")
    val parts = ManifestVersioned.manifestEntries(spark, w, "t").size
    assert(parts > 1, s"1000 rows landed in $parts shard(s) — a single " +
      "write task would bottleneck a full load at scale")
    assert(parts <= 4, "more shards than the configured count")
    assert(a.read(spark, w, "t").agg(org.apache.spark.sql.functions
      .sum(col("v"))).as[Long].head() === 1001000L)
  }
}

class CsvWarehouseContractSpec extends WarehouseContractKit {
  def newAdapter(): WarehouseAdapter = CsvWarehouseAdapter
  def adapterName: String = "csv adapter"

  test("csv adapter: randomized string fidelity — arbitrary unicode, " +
      "delimiters, quotes, null-token lookalikes and nulls round-trip " +
      "exactly (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(411)
    // the hazard alphabet: quoting/delimiter/escape metacharacters,
    // sentinel spellings, surrogate-pair unicode, whitespace
    val atoms = Seq(",", "\"", "\\", "\n", "\r", "\\N", "NULL", "s", "",
      " ", "\t", "𝕦ñí", "a")
    def randString(): String =
      (0 until rnd.nextInt(8)).map(_ => atoms(rnd.nextInt(atoms.size)))
        .mkString
    val rows = (0L until 200L).map { i =>
      (i, if (rnd.nextInt(10) == 0) null else randString())
    }
    val w = java.nio.file.Files
      .createTempDirectory("graft-whkit-fuzz").toString
    val a = newAdapter()
    a.overwrite(rows.toDF("k", "s"), w, "t")
    val back = a.read(spark, w, "t").as[(Long, Option[String])]
      .collect().map { case (k, s) => k -> s.orNull }.toMap
    rows.foreach { case (k, s) =>
      assert(back(k) === s,
        s"k=$k: wrote ${Option(s).map(_.map(_.toInt.toHexString))}, " +
          s"read ${Option(back(k)).map(_.map(_.toInt.toHexString))}")
    }
  }

  test("csv adapter: an interrupted replace swap rolls FORWARD at " +
      "recoverAll when the delete committed, and sweeps when it did not") {
    val a = newAdapter()
    val w = java.nio.file.Files.createTempDirectory("graft-whkit-csv")
      .toString
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "s")
    a.overwrite(df, w, "t")
    val fs = new org.apache.hadoop.fs.Path(w)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash between stage-complete and delete: swap present,
    // live present → recoverAll sweeps the stage, live survives
    val live = new org.apache.hadoop.fs.Path(s"$w/t.csvwh")
    val swap = new org.apache.hadoop.fs.Path(s"$w/t.csvwh._swap")
    org.apache.hadoop.fs.FileUtil.copy(fs, live, fs, swap, false, false,
      spark.sparkContext.hadoopConfiguration)
    a.recoverAll(spark, w)
    assert(!fs.exists(swap) && fs.exists(live))
    assert(a.read(spark, w, "t").count() === 2)
    // simulate a crash between delete and rename: swap present, live
    // gone → recoverAll rolls the staged copy forward
    org.apache.hadoop.fs.FileUtil.copy(fs, live, fs, swap, false, false,
      spark.sparkContext.hadoopConfiguration)
    fs.delete(live, true)
    a.recoverAll(spark, w)
    assert(fs.exists(live) && !fs.exists(swap))
    assert(a.read(spark, w, "t").count() === 2)
  }
}
