package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.ManifestVersioned

/** SQL DDL lifecycle (`USING graft`): CREATE TABLE [AS SELECT],
  * TRUNCATE TABLE, ALTER TABLE ADD/DROP COLUMNS and SET/UNSET
  * TBLPROPERTIES, DROP TABLE [PURGE], plus the registerAll warehouse
  * attach — with the DML surface this pins that a SQL-only user can
  * create, load, query, mutate, evolve, audit and drop a manifest
  * table without the DataFrame API, and that a FRESH session recovers
  * the whole warehouse from durable metadata alone.
  */
class GraftDdlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private var n = 0
  private def wh(): String = {
    n += 1
    Files.createTempDirectory(s"graft-ddl$n").toString
  }

  test("full SQL-only lifecycle: CREATE AS SELECT, DML, audit, DROP") {
    val w = wh()
    Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
      .toDF("k", "p", "v").createOrReplaceTempView("ddl_src1")
    spark.sql(
      s"""CREATE TABLE lc USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k')
          AS SELECT * FROM ddl_src1""")
    assert(spark.sql("SELECT * FROM lc").count() === 3)
    spark.sql("UPDATE lc SET v = v + 1 WHERE p = 'a'")
    spark.sql("DELETE FROM lc WHERE k = 3")
    spark.sql("INSERT INTO lc VALUES (4, 'c', 40.0)")
    assert(spark.sql("SELECT k, v FROM lc ORDER BY k")
      .as[(Long, Double)].collect().toSeq ===
      Seq((1L, 11.0), (2L, 21.0), (4L, 40.0)))
    // the lifecycle left real versions behind (bootstrap + 3 DML)
    assert(ManifestVersioned.listVersions(spark, w, "lc").size === 4)
    spark.sql("DROP TABLE lc")
    assert(intercept[Exception] {
      spark.sql("SELECT * FROM lc").collect()
    }.getMessage.toLowerCase.contains("lc"))
    // plain DROP keeps the data (external-table stance)
    assert(ManifestVersioned.currentVersion(spark, w, "lc").isDefined)
  }

  test("CREATE TABLE with declared columns bootstraps an EMPTY v1") {
    val w = wh()
    spark.sql(
      s"""CREATE TABLE empt (k BIGINT, p STRING, v DOUBLE)
          USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k')""")
    assert(spark.sql("SELECT * FROM empt").count() === 0)
    assert(spark.table("empt").schema.fieldNames.toSeq ===
      Seq("k", "p", "v"))
    spark.sql("INSERT INTO empt VALUES (1, 'a', 1.0)")
    assert(spark.sql("SELECT * FROM empt").count() === 1)
  }

  test("IF NOT EXISTS adopts an existing table; plain CREATE rejects") {
    val w = wh()
    ManifestVersioned.writeFull(spark, w, "adopt",
      Seq((1L, "a", 1.0)).toDF("k", "p", "v"), "p")
    assert(intercept[Exception] {
      spark.sql(
        s"""CREATE TABLE adopt (k BIGINT, p STRING, v DOUBLE)
            USING graft PARTITIONED BY (p) OPTIONS (warehouse '$w')""")
    }.getMessage.contains("already exists"))
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS adopt (k BIGINT, p STRING, v DOUBLE)
          USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k')""")
    assert(spark.sql("SELECT * FROM adopt").count() === 1)
    spark.sql("DROP TABLE adopt")
  }

  test("TRUNCATE TABLE is an O(1) metadata commit: empty head, history " +
      "time-travelable, generation dirs untouched until vacuum") {
    val w = wh()
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "p", "v")
      .createOrReplaceTempView("ddl_src_t")
    spark.sql(
      s"""CREATE TABLE trunc USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k') AS SELECT * FROM ddl_src_t""")
    val out = spark.sql("TRUNCATE TABLE trunc").collect()
    assert(out.length === 1 && out(0).getInt(0) === 2)
    assert(spark.sql("SELECT * FROM trunc").count() === 0)
    // schema + partcols survive: the table is empty, not gone
    spark.sql("INSERT INTO trunc VALUES (9, 'c', 9.0)")
    assert(spark.sql("SELECT k FROM trunc").as[Long].collect().toSeq ===
      Seq(9L))
    // v1 stays time-travelable (the truncate wrote no deletes)
    assert(ManifestVersioned.read(spark, w, "trunc", Some(1))
      .count() === 2)
    spark.sql("DROP TABLE trunc")
  }

  test("ALTER TABLE ADD COLUMNS is a schema-only commit: old rows read " +
      "NULL, new writes carry values, collisions reject") {
    val w = wh()
    Seq((1L, "a", 1.0)).toDF("k", "p", "v")
      .createOrReplaceTempView("ddl_src_a")
    spark.sql(
      s"""CREATE TABLE altered USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k') AS SELECT * FROM ddl_src_a""")
    val out = spark.sql(
      "ALTER TABLE altered ADD COLUMNS (tag STRING, score DOUBLE)")
      .collect()
    assert(out.length === 1 && out(0).getInt(0) === 2)
    // pre-alter generation reads the new columns as NULL
    val row = spark.sql("SELECT tag, score FROM altered WHERE k = 1")
      .collect()(0)
    assert(row.isNullAt(0) && row.isNullAt(1))
    // new writes carry values under the widened schema
    spark.sql("INSERT INTO altered VALUES (2, 'a', 2.0, 'x', 0.5)")
    assert(spark.sql("SELECT tag FROM altered WHERE k = 2")
      .as[String].head() === "x")
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE altered ADD COLUMNS (v DOUBLE)")
    }.getMessage.contains("already exist"))
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE altered ADD COLUMNS (d INT DEFAULT 3)")
    }.getMessage.contains("plain top-level"))
    // DROP COLUMN: the symmetric schema-only commit
    spark.sql("ALTER TABLE altered DROP COLUMN score")
    assert(!spark.table("altered").columns.contains("score"))
    assert(spark.sql("SELECT tag FROM altered WHERE k = 2")
      .as[String].head() === "x", "other columns untouched")
    // pre-drop versions still time-travel to the column
    assert(ManifestVersioned.read(spark, w, "altered", Some(3))
      .columns.contains("score"))
    // load-bearing and key columns refuse; IF EXISTS no-ops on absent
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE altered DROP COLUMN p")
    }.getMessage.contains("load-bearing"))
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE altered DROP COLUMN k")
    }.getMessage.contains("merge key"))
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE altered DROP COLUMN ghost")
    }.getMessage.contains("no such column"))
    val v = ManifestVersioned.currentVersion(spark, w, "altered")
    spark.sql("ALTER TABLE altered DROP COLUMN IF EXISTS ghost")
    assert(ManifestVersioned.currentVersion(spark, w, "altered") === v,
      "IF EXISTS on an absent column burns no version")
    spark.sql("DROP TABLE altered")
  }

  test("OPTIMIZE: measure-then-fold compaction; ZORDER rewrites clustered; " +
      "data bit-identical") {
    val w = wh()
    // partition 'a' gets generation sprawl (3 separate appends), 'b'
    // stays healthy single-file
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "p", "v")
      .createOrReplaceTempView("opt_src1")
    spark.sql(
      s"""CREATE TABLE optt USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k')
          AS SELECT * FROM opt_src1""")
    spark.sql("INSERT INTO optt VALUES (3, 'a', 30.0)")
    spark.sql("INSERT INTO optt VALUES (4, 'a', 40.0)")
    val before = spark.sql("SELECT k, p, v FROM optt")
      .as[(Long, String, Double)].collect().toSet
    val headBefore = ManifestVersioned.currentVersion(spark, w, "optt").get
    // plain OPTIMIZE folds flagged partitions (small-files disease on
    // 'a') and commits ONE version; data identical
    val rep = spark.sql("OPTIMIZE optt").collect()
    assert(rep.length === 1 && rep(0).getLong(1) >= 1L,
      "at least the sprawling partition rewrites")
    assert(ManifestVersioned.currentVersion(spark, w, "optt").get
      === headBefore + 1)
    assert(spark.sql("SELECT k, p, v FROM optt")
      .as[(Long, String, Double)].collect().toSet === before)
    // a healthy table is a NO-OP: no new version
    val h2 = ManifestVersioned.currentVersion(spark, w, "optt").get
    assert(spark.sql("OPTIMIZE optt").collect()(0).getLong(1) === 0L)
    assert(ManifestVersioned.currentVersion(spark, w, "optt").get === h2)
    // ZORDER BY rewrites every live partition, bit-identical data
    spark.sql("OPTIMIZE optt ZORDER BY (k, v)")
    assert(spark.sql("SELECT k, p, v FROM optt")
      .as[(Long, String, Double)].collect().toSet === before)
    // unknown zorder column rejects loudly
    assert(intercept[Exception] {
      spark.sql("OPTIMIZE optt ZORDER BY (nosuch)").collect()
    }.getMessage.contains("nosuch"))
  }

  test("VACUUM reclaims aged history under RETAIN, spares fresh staging") {
    val w = wh()
    Seq((1L, "a", 10.0)).toDF("k", "p", "v")
      .createOrReplaceTempView("vac_src1")
    spark.sql(
      s"""CREATE TABLE vact USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k')
          AS SELECT * FROM vac_src1""")
    spark.sql("INSERT INTO vact VALUES (2, 'b', 20.0)")
    spark.sql("UPDATE vact SET v = 11.0 WHERE k = 1")
    // a concurrent writer's fresh staging dir — the SQL statement's
    // built-in grace must spare it even under RETAIN 0 HOURS
    val staged = new org.apache.hadoop.fs.Path(s"$w/vact.mv/._stage.fresh1")
    val fs = staged.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(staged)
    // RETAIN far in the past-covering window: nothing reclaimable
    assert(spark.sql("VACUUM vact RETAIN 9999 HOURS").collect().isEmpty)
    assert(ManifestVersioned.listVersions(spark, w, "vact")
      === Seq(1, 2, 3))
    // RETAIN 0: only the head's instant must stay readable — v1/v2
    // manifests and their orphaned generations reclaim; the report
    // rows ARE what was removed
    val rep = spark.sql("VACUUM vact RETAIN 0 HOURS").collect()
    assert(rep.nonEmpty && rep.forall(r => r.getString(1).nonEmpty))
    assert(ManifestVersioned.listVersions(spark, w, "vact") === Seq(3))
    assert(fs.exists(staged), "fresh staging swept despite the grace")
    assert(spark.sql("SELECT k, v FROM vact ORDER BY k")
      .as[(Long, Double)].collect().toSeq ===
      Seq((1L, 11.0), (2L, 20.0)), "head unreadable after vacuum")
    // unregistered names fall through to the builtin parser's error
    intercept[Exception] { spark.sql("VACUUM not_a_graft_table") }
  }

  test("CHECK constraints through SQL: CREATE-declared, ADD/DROP CONSTRAINT, write gating") {
    val w = wh()
    spark.sql(
      s"""CREATE TABLE chk (k BIGINT, p STRING, v DOUBLE,
            CONSTRAINT v_pos CHECK (v >= 0))
          USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k')""")
    assert(ManifestVersioned.checks(spark, w, "chk") ===
      Map("v_pos" -> "v >= 0"))
    // the declared check gates writes from the first insert on
    assert(intercept[Exception] {
      spark.sql("INSERT INTO chk VALUES (1, 'a', -5.0)")
    }.getMessage.contains("v_pos"))
    spark.sql("INSERT INTO chk VALUES (1, 'a', 5.0)")
    // ADD CONSTRAINT validates existing rows first
    spark.sql("ALTER TABLE chk ADD CONSTRAINT k_small CHECK (k < 100)")
    assert(intercept[Exception] {
      spark.sql("INSERT INTO chk VALUES (500, 'a', 1.0)")
    }.getMessage.contains("k_small"))
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE chk ADD CONSTRAINT v_big CHECK (v >= 100)")
    }.getMessage.contains("violate"),
      "adding a constraint the data already violates must reject")
    // DROP CONSTRAINT re-opens the gate; IF EXISTS no-ops on unknowns
    spark.sql("ALTER TABLE chk DROP CONSTRAINT k_small")
    spark.sql("INSERT INTO chk VALUES (500, 'a', 1.0)")
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE chk DROP CONSTRAINT ghost")
    }.getMessage.contains("no CHECK named"))
    val v = ManifestVersioned.currentVersion(spark, w, "chk")
    spark.sql("ALTER TABLE chk DROP CONSTRAINT IF EXISTS ghost")
    assert(ManifestVersioned.currentVersion(spark, w, "chk") === v,
      "IF EXISTS on an unknown constraint burns no version")
    // unsupported shapes reject loudly
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE chk ADD CONSTRAINT pk PRIMARY KEY (k)")
    }.getMessage.contains("CHECK constraints are the supported kind"))
    assert(intercept[Exception] {
      spark.sql(
        "ALTER TABLE chk ADD CONSTRAINT ne CHECK (v < 1e9) NOT ENFORCED")
    }.getMessage.contains("NOT ENFORCED"))
  }

  test("RESTORE rolls the head back as a new commit; nothing is lost") {
    val w = wh()
    Seq((1L, "a", 10.0)).toDF("k", "p", "v")
      .createOrReplaceTempView("res_src1")
    spark.sql(
      s"""CREATE TABLE rest USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k')
          AS SELECT * FROM res_src1""")
    spark.sql("INSERT INTO rest VALUES (2, 'b', 20.0)")   // v2
    spark.sql("UPDATE rest SET v = 99.0 WHERE k = 1")     // v3
    val rep = spark.sql("RESTORE rest TO VERSION AS OF 2").collect()
    assert(rep(0).getInt(0) === 2 && rep(0).getInt(1) === 4)
    assert(spark.sql("SELECT k, v FROM rest ORDER BY k")
      .as[(Long, Double)].collect().toSeq ===
      Seq((1L, 10.0), (2L, 20.0)),
      "head must be v2's content again")
    // the rolled-back v3 is still time-travelable (restore is a commit)
    assert(spark.sql("SELECT v FROM rest VERSION AS OF 3 WHERE k = 1")
      .as[Double].head() === 99.0)
    // a restore of the restore works too (it is just a version)
    spark.sql("RESTORE TABLE rest TO VERSION AS OF 3")
    assert(spark.sql("SELECT v FROM rest WHERE k = 1")
      .as[Double].head() === 99.0)
    // unavailable versions refuse with the history pointer
    assert(intercept[Exception] {
      spark.sql("RESTORE rest TO VERSION AS OF 42").collect()
    }.getMessage.contains("not available"))
  }

  test("DESCRIBE HISTORY lists the commit audit newest first; " +
      "DESCRIBE DETAIL is the one-row table card") {
    val w = wh()
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "p", "v")
      .createOrReplaceTempView("dh_src1")
    spark.sql(
      s"""CREATE TABLE dh USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k') AS SELECT * FROM dh_src1""")
    spark.sql("INSERT INTO dh VALUES (3, 'c', 30.0)")
    spark.sql("DELETE FROM dh WHERE k = 1")
    val h = spark.sql("DESCRIBE HISTORY dh").collect()
    assert(h.map(_.getInt(0)).toSeq === Seq(3, 2, 1),
      "newest first, one row per version")
    assert(h.forall(r => !r.isNullAt(1)), "every commit carries a stamp")
    assert(spark.sql("DESC HISTORY dh LIMIT 2").count() === 2)
    // the card: head version, layout, counts, durable properties
    spark.sql("ALTER TABLE dh SET TBLPROPERTIES ('team' = 'ops')")
    val d = spark.sql("DESCRIBE DETAIL dh").collect()
    assert(d.length === 1)
    val r = d(0)
    assert(r.getString(0) === "graft" && r.getString(1) === "dh")
    assert(r.getString(2) === s"$w/dh.mv")
    assert(r.getInt(3) === 4, "head version after 3 DML + SET")
    assert(r.getString(5) === "p")
    assert(r.getLong(6) === 3L, "live partitions a, b, c")
    assert(r.getString(11).contains("team=ops") &&
      r.getString(11).contains("graft.mergeKey=k"))
    // an unknown name falls through to Spark's own error path
    assert(intercept[Exception] {
      spark.sql("DESCRIBE HISTORY nope_dh").collect()
    }.getMessage.nonEmpty)
  }

  test("SHALLOW CLONE branches zero-copy; DEEP CLONE materializes; " +
      "divergence is copy-on-write") {
    val w = wh()
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "p", "v")
      .createOrReplaceTempView("cl_src1")
    spark.sql(
      s"""CREATE TABLE clsrc USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k') AS SELECT * FROM cl_src1""")
    spark.sql("INSERT INTO clsrc VALUES (3, 'c', 30.0)")   // v2
    val rep = spark.sql(
      "CREATE TABLE clbr SHALLOW CLONE clsrc").collect()
    assert(rep(0).getInt(0) === 1 && rep(0).getInt(1) === 2,
      "branch v1 references source v2")
    assert(spark.sql("SELECT * FROM clbr").count() === 3)
    // zero-copy: the branch holds no parts tree of its own yet
    assert(!new java.io.File(s"$w/clbr.mv/parts").exists())
    // the clone is DML-able immediately (merge key rode the property)
    spark.sql("UPDATE clbr SET v = 99.0 WHERE k = 1")
    assert(spark.sql("SELECT v FROM clbr WHERE k = 1")
      .as[Double].head() === 99.0)
    assert(spark.sql("SELECT v FROM clsrc WHERE k = 1")
      .as[Double].head() === 10.0, "the source never sees branch writes")
    // historical clone: VERSION AS OF pins the branched snapshot
    spark.sql("CREATE TABLE clv1 SHALLOW CLONE clsrc VERSION AS OF 1")
    assert(spark.sql("SELECT * FROM clv1").count() === 2)
    // deep clone is an independent materialized table
    spark.sql("CREATE TABLE cldeep DEEP CLONE clsrc")
    assert(new java.io.File(s"$w/cldeep.mv/parts").exists())
    assert(spark.sql("SELECT * FROM cldeep").count() === 3)
    // clones only bootstrap NEW tables
    assert(intercept[Exception] {
      spark.sql("CREATE TABLE clbr SHALLOW CLONE clsrc").collect()
    }.getMessage.contains("already exists"))
  }

  test("table_changes TVF: per-version key-level diffs, bounded span, " +
      "retention guard, loud unknowns") {
    val w = wh()
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "p", "v")
      .createOrReplaceTempView("tc_src1")
    spark.sql(
      s"""CREATE TABLE tcs USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k') AS SELECT * FROM tc_src1""")
    spark.sql("INSERT INTO tcs VALUES (3, 'c', 30.0)")      // v2
    spark.sql("UPDATE tcs SET v = 99.0 WHERE k = 1")        // v3
    spark.sql("DELETE FROM tcs WHERE k = 2")                // v4
    val all = spark.sql(
      "SELECT version, k, change_type FROM table_changes('tcs', 2) " +
        "ORDER BY version, k").as[(Int, Long, String)].collect().toSeq
    assert(all === Seq((2, 3L, "insert"), (3, 1L, "update"),
      (4, 2L, "delete")))
    // bounded span; old/new value columns carry the pre/post images
    val u = spark.sql(
      "SELECT old_v, new_v FROM table_changes('tcs', 3, 3)")
      .as[(Double, Double)].collect().toSeq
    assert(u === Seq((10.0, 99.0)))
    // version 1 serves the bootstrap inserts
    assert(spark.sql("SELECT count(*) FROM table_changes('tcs', 1, 1)")
      .as[Long].head() === 2L)
    // guards: version 0, unknown table
    assert(intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('tcs', 0)").collect()
    }.getMessage.contains("from_version must be >= 1"))
    assert(intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('nope_tc', 1)").collect()
    }.getMessage.contains("not a graft-addressable"))
    spark.sql("DROP TABLE tcs")
  }

  test("ANALYZE TABLE answers from the manifest: table stats, " +
      "per-column stats, zero data reads") {
    val w = wh()
    Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", Double.NaN))
      .toDF("k", "p", "v")
      .select(col("k"), col("p"),
        when(col("k") === 3, lit(null)).otherwise(col("v")).as("v"))
      .createOrReplaceTempView("an_src1")
    spark.sql(
      s"""CREATE TABLE ant USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k') AS SELECT * FROM an_src1""")
    val t = spark.sql("ANALYZE TABLE ant COMPUTE STATISTICS").collect()(0)
    assert(t.getInt(0) === 1 && t.getLong(1) === 2L &&
      t.getLong(2) === 3L && t.getBoolean(4), "2 partitions, 3 rows exact")
    assert(!t.isNullAt(3) && t.getLong(3) > 0L, "recorded bytes")
    val c = spark.sql(
      "ANALYZE TABLE ant COMPUTE STATISTICS FOR COLUMNS k, v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(c("k").getString(1) === "1" && c("k").getString(2) === "3")
    assert(c("v").getLong(3) === 1L, "one NULL v recorded")
    assert(c("k").getBoolean(5), "ranges exact")
    assert(c("k").isNullAt(4), "no NDV policy -> honest NULL ndv")
    // FOR ALL COLUMNS covers the schema
    assert(spark.sql(
      "ANALYZE TABLE ant COMPUTE STATISTICS FOR ALL COLUMNS")
      .count() === 3)
    // PARTITION spec refuses (per-partition stats live in the manifest)
    assert(intercept[Exception] {
      spark.sql("ANALYZE TABLE ant PARTITION (p='a') COMPUTE STATISTICS")
        .collect()
    }.getMessage.contains("not supported"))
    spark.sql("DROP TABLE ant")
  }

  test("SHOW PARTITIONS lists live partitions with recorded counts") {
    val w = wh()
    Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .toDF("k", "p", "v").createOrReplaceTempView("shp_src1")
    spark.sql(
      s"""CREATE TABLE shp USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k') AS SELECT * FROM shp_src1""")
    val rows = spark.sql("SHOW PARTITIONS shp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(3))).toSeq
    assert(rows === Seq(("p=a", 2L, true), ("p=b", 1L, true)))
    // a delete vector demotes exactness (count becomes an upper bound)
    spark.sql("DELETE FROM shp WHERE k = 3")
    val after = spark.sql("SHOW PARTITIONS shp").collect()
      .map(r => (r.getString(0), r.getBoolean(3))).toMap
    assert(after("p=a"))
    assert(after.get("p=b").forall(_ == false),
      "a DV-carrying partition must not claim exactness")
    spark.sql("DROP TABLE shp")
  }

  test("SHOW CREATE TABLE round-trips: the emitted DDL recreates the " +
      "table's shape in a fresh warehouse") {
    val w = wh()
    Seq((1L, java.sql.Timestamp.valueOf("2026-03-01 10:00:00"), 10.0))
      .toDF("k", "ev", "v").createOrReplaceTempView("sct_src1")
    spark.sql(
      s"""CREATE TABLE sct USING graft PARTITIONED BY (days(ev))
          OPTIONS (warehouse '$w', keyCol 'k')
          TBLPROPERTIES ('team' = 'ops')
          AS SELECT * FROM sct_src1""")
    spark.sql("ALTER TABLE sct ADD CONSTRAINT pos CHECK (v > 0)")
    val stmt = spark.sql("SHOW CREATE TABLE sct").as[String].head()
    assert(stmt.contains("USING graft") &&
      stmt.contains("PARTITIONED BY (ev_day)") &&
      stmt.contains("keyCol 'k'") &&
      stmt.contains("CONSTRAINT pos CHECK (v > 0)") &&
      stmt.contains("'graft.generated.ev_day' = 'days(ev)'") &&
      stmt.contains("'team' = 'ops'"))
    // round-trip into a fresh warehouse (rewrite the location, drop the
    // session name first)
    val w2 = wh()
    spark.sql("DROP TABLE sct")
    spark.sql(stmt.replace(s"warehouse '$w'", s"warehouse '$w2'"))
    assert(ManifestVersioned.manifestSchema(spark, w2, "sct")
      .get.fieldNames.toSeq === Seq("k", "ev", "v", "ev_day"))
    assert(ManifestVersioned.partitionColumns(spark, w2, "sct")
      .get === Seq("ev_day"))
    assert(ManifestVersioned.tableProperties(spark, w2, "sct")
      .get("graft.generated.ev_day").contains("days(ev)"))
    assert(ManifestVersioned.checks(spark, w2, "sct").contains("pos"))
    // the recreated shape is live: an INSERT derives and the check gates
    spark.sql(
      "INSERT INTO sct VALUES (2, TIMESTAMP'2026-03-02 09:00:00', 5.0)")
    assert(intercept[Exception] {
      spark.sql(
        "INSERT INTO sct VALUES (3, TIMESTAMP'2026-03-02 09:00:00', -1.0)")
    }.getMessage.contains("pos"))
    spark.sql("DROP TABLE sct")
  }

  test("COPY INTO loads a folder incrementally and idempotently: " +
      "watermark advances with the commit, re-runs load nothing, " +
      "new arrivals load alone") {
    val w = wh()
    val in = Files.createTempDirectory("graft-copyin").toFile
    def drop(name: String, lines: Seq[String], mtime: Long): Unit = {
      val f = new java.io.File(in, name)
      val pw = new java.io.PrintWriter(f)
      try lines.foreach(pw.println) finally pw.close()
      assert(f.setLastModified(mtime))
    }
    val t0 = System.currentTimeMillis() - 60000
    drop("a.csv", Seq("k,p,v", "1,a,10.0", "2,b,20.0"), t0)
    drop("b.csv", Seq("k,p,v", "3,a,30.0"), t0 + 1000)
    drop("skip.txt", Seq("junk"), t0 + 1000)
    spark.sql(
      s"""CREATE TABLE cpt (k BIGINT, p STRING, v DOUBLE)
          USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k')""")
    val r1 = spark.sql(
      s"""COPY INTO cpt FROM '${in.getAbsolutePath}' FILEFORMAT = CSV
          PATTERN = '*.csv' FORMAT_OPTIONS ('header' = 'true')""")
      .collect()(0)
    assert(r1.getLong(1) === 2L && r1.getLong(2) === 3L,
      "two csv files, three rows; the .txt never matches")
    // idempotent: the same statement loads nothing and burns no version
    val r2 = spark.sql(
      s"""COPY INTO cpt FROM '${in.getAbsolutePath}' FILEFORMAT = CSV
          PATTERN = '*.csv' FORMAT_OPTIONS ('header' = 'true')""")
      .collect()(0)
    assert(r2.getLong(1) === 0L && r2.getInt(0) === r1.getInt(0))
    // a NEW arrival (newer mtime) loads alone
    drop("c.csv", Seq("k,p,v", "4,c,40.0"), t0 + 5000)
    val r3 = spark.sql(
      s"""COPY INTO cpt FROM '${in.getAbsolutePath}' FILEFORMAT = CSV
          PATTERN = '*.csv' FORMAT_OPTIONS ('header' = 'true')""")
      .collect()(0)
    assert(r3.getLong(1) === 1L && r3.getLong(2) === 1L)
    assert(spark.sql("SELECT k, p, v FROM cpt ORDER BY k")
      .as[(Long, String, Double)].collect().toSeq ===
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0),
        (4L, "c", 40.0)))
    // CSV strings ANSI-cast to the recorded types; junk fails loudly
    drop("bad.csv", Seq("k,p,v", "not_a_number,a,1.0"), t0 + 9000)
    assert(intercept[Exception] {
      spark.sql(
        s"""COPY INTO cpt FROM '${in.getAbsolutePath}' FILEFORMAT = CSV
            PATTERN = '*.csv' FORMAT_OPTIONS ('header' = 'true')""")
        .collect()
    }.getMessage.nonEmpty)
    // unknown source columns reject by name
    val in2 = Files.createTempDirectory("graft-copyin2").toFile
    val pw = new java.io.PrintWriter(new java.io.File(in2, "x.csv"))
    try pw.println("k,p,v,ghost\n9,a,1.0,zz") finally pw.close()
    assert(intercept[Exception] {
      spark.sql(
        s"""COPY INTO cpt FROM '${in2.getAbsolutePath}' FILEFORMAT = CSV
            FORMAT_OPTIONS ('header' = 'true')""").collect()
    }.getMessage.contains("unknown column"))
    spark.sql("DROP TABLE cpt")
  }

  test("ALTER TABLE ... ALTER COLUMN c TYPE t: accepted widening chain, " +
      "bloom-policied rebuild, loud narrowing/retype/unsupported rejects") {
    val w = wh()
    spark.sql(
      s"""CREATE TABLE alct (k INT, p STRING, v SMALLINT)
          USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k')""")
    spark.sql("INSERT INTO alct VALUES (1, 'a', 10), (2, 'b', 20)")
    // accepted chain: smallint -> int -> bigint, each an O(1) commit
    spark.sql("ALTER TABLE alct ALTER COLUMN v TYPE INT")
    spark.sql("ALTER TABLE alct ALTER COLUMN v TYPE BIGINT")
    assert(spark.table("alct").schema("v").dataType ===
      org.apache.spark.sql.types.LongType)
    // pre-widening rows read up natively; new writes land at the type
    spark.sql("INSERT INTO alct VALUES (3, 'a', 3000000000)")
    assert(spark.sql("SELECT sum(v) FROM alct").as[Long].head() ===
      3000000030L)
    // narrowing and retype reject loudly, nothing commits
    val vBefore = ManifestVersioned.currentVersion(spark, w, "alct").get
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE alct ALTER COLUMN v TYPE INT")
    }.getMessage.contains("not a value-exact widening"))
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE alct ALTER COLUMN v TYPE STRING")
    }.getMessage.contains("not a value-exact widening"))
    // non-TYPE alterations are out of surface, loudly
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE alct ALTER COLUMN v COMMENT 'x'")
    }.getMessage.contains("TYPE <widening> only"))
    assert(ManifestVersioned.currentVersion(spark, w, "alct").get ===
      vBefore)
    // same-type is a no-op: no version burned
    spark.sql("ALTER TABLE alct ALTER COLUMN v TYPE BIGINT")
    assert(ManifestVersioned.currentVersion(spark, w, "alct").get ===
      vBefore)
    spark.sql("DROP TABLE alct")
    // bloom-policied widening REBUILDS the sidecars: post-widening
    // locate-deletes probe with the new type's hash and must still
    // find pre-widening keys
    ManifestVersioned.writeFullMulti(spark, w, "blw",
      (0L until 100L).map(k => (k, s"p${k % 3}", k)).toDF("k", "p", "v")
        .selectExpr("cast(k as int) k", "p", "v"),
      Seq("p"), bloomCols = Seq("k"))
    val name = GraftSqlTables.register(spark, w, "blw",
      asName = Some("alct_blw"), keyCol = Some("k"))
    spark.sql(s"ALTER TABLE $name ALTER COLUMN k TYPE BIGINT")
    ManifestVersioned.deleteRowsLocate(spark, w, "blw",
      Seq(7L, 42L).toDF("k"), "k")
    assert(ManifestVersioned.read(spark, w, "blw").count() === 98)
    assert(ManifestVersioned.read(spark, w, "blw")
      .filter(col("k").isin(7L, 42L)).count() === 0)
    // a partition-column widening that changes renderings rejects
    // (partition keys are value renderings); int->bigint on a NON-part
    // column under NO policy stays O(1)
    ManifestVersioned.writeFullMulti(spark, w, "pwd",
      Seq((1, 1, "x")).toDF("pk", "k", "s"), Seq("pk"))
    GraftSqlTables.register(spark, w, "pwd",
      asName = Some("alct_pwd"), keyCol = Some("k"))
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE alct_pwd ALTER COLUMN pk TYPE DOUBLE")
    }.getMessage.contains("partition"))
    // renderStable partition widening (int->bigint renders identically)
    spark.sql("ALTER TABLE alct_pwd ALTER COLUMN pk TYPE BIGINT")
    assert(spark.table("alct_pwd").schema("pk").dataType ===
      org.apache.spark.sql.types.LongType)
  }

  test("COPY INTO is idempotent under CONCURRENCY: racing loaders of " +
      "the same source never duplicate rows — the watermark is a " +
      "commit expectation, and the loser re-derives to a no-op") {
    val w = wh()
    val in = Files.createTempDirectory("graft-copyrace").toFile
    val t0 = System.currentTimeMillis() - 60000
    for (i <- 0 until 8) {
      val f = new java.io.File(in, f"f$i%02d.csv")
      val pw = new java.io.PrintWriter(f)
      try {
        pw.println("k,p,v")
        for (j <- 0 until 50) pw.println(s"${i * 50 + j},p${j % 3},1.0")
      } finally pw.close()
      assert(f.setLastModified(t0 + i * 1000))
    }
    spark.sql(
      s"""CREATE TABLE cprace (k BIGINT, p STRING, v DOUBLE)
          USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k')""")
    val stmt =
      s"""COPY INTO cprace FROM '${in.getAbsolutePath}' FILEFORMAT = CSV
          PATTERN = '*.csv' FORMAT_OPTIONS ('header' = 'true')"""
    // 4 barrier-aligned threads run the SAME statement; pre-fix, every
    // thread read the un-advanced watermark and every commit succeeded
    // (expectations covered only partition entries) — 4× duplication.
    // Post-fix exactly one load wins; losers' property conflicts make
    // them re-read the advanced watermark and load nothing.
    val barrier = new java.util.concurrent.CyclicBarrier(4)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val fs = (1 to 4).map(_ => pool.submit(
        new java.util.concurrent.Callable[(Long, Long)] {
          def call(): (Long, Long) = {
            barrier.await()
            val r = spark.sql(stmt).collect()(0)
            (r.getLong(1), r.getLong(2))
          }
        }))
      val results = fs.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(results.map(_._2).sum === 400L,
        s"every row loaded exactly once, got $results")
      assert(results.map(_._1).sum === 8L,
        s"every file loaded exactly once, got $results")
    } finally pool.shutdown()
    assert(spark.sql("SELECT count(*), count(DISTINCT k) FROM cprace")
      .as[(Long, Long)].head() === ((400L, 400L)))
    // and a fifth, serial re-run still loads nothing
    val again = spark.sql(stmt).collect()(0)
    assert(again.getLong(1) === 0L && again.getLong(2) === 0L)
    spark.sql("DROP TABLE cprace")
  }

  test("COPY INTO fresh files with ZERO rows still advances the " +
      "watermark (metadata-only commit) — never re-reads them forever") {
    val w = wh()
    val in = Files.createTempDirectory("graft-copyempty").toFile
    val t0 = System.currentTimeMillis() - 60000
    def drop(name: String, lines: Seq[String], mtime: Long): Unit = {
      val f = new java.io.File(in, name)
      val pw = new java.io.PrintWriter(f)
      try lines.foreach(pw.println) finally pw.close()
      assert(f.setLastModified(mtime))
    }
    drop("empty.csv", Seq("k,p,v"), t0) // header only — zero rows
    spark.sql(
      s"""CREATE TABLE cpempty (k BIGINT, p STRING, v DOUBLE)
          USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k')""")
    val stmt =
      s"""COPY INTO cpempty FROM '${in.getAbsolutePath}' FILEFORMAT = CSV
          PATTERN = '*.csv' FORMAT_OPTIONS ('header' = 'true')"""
    val r1 = spark.sql(stmt).collect()(0)
    assert(r1.getLong(1) === 1L && r1.getLong(2) === 0L,
      "one fresh file, zero rows")
    // the watermark advanced: a re-run lists NOTHING fresh (pre-fix it
    // re-read the empty file on every run, forever)
    val r2 = spark.sql(stmt).collect()(0)
    assert(r2.getLong(1) === 0L && r2.getLong(2) === 0L,
      s"re-run must load nothing, got $r2")
    // and a later real file loads alone, on top of the advanced mark
    drop("real.csv", Seq("k,p,v", "1,a,1.0"), t0 + 5000)
    val r3 = spark.sql(stmt).collect()(0)
    assert(r3.getLong(1) === 1L && r3.getLong(2) === 1L)
    assert(spark.sql("SELECT count(*) FROM cpempty").as[Long].head() === 1L)
    spark.sql("DROP TABLE cpempty")
  }

  test("appendRows property expectations: a moved table property aborts " +
      "the commit with a PROPERTY conflict (not a retryable write one)") {
    val w = wh()
    ManifestVersioned.writeFull(spark, w, "t",
      Seq((1L, "a", 1.0)).toDF("k", "p", "v"), "p")
    ManifestVersioned.appendRows(spark, w, "t",
      Seq((2L, "a", 2.0)).toDF("k", "p", "v"),
      extraProps = Map("wm" -> "100"))
    // stale expectation (absent, but live says 100) → loud, typed
    intercept[graft.io.ConcurrentPropertyConflictException] {
      ManifestVersioned.appendRows(spark, w, "t",
        Seq((3L, "a", 3.0)).toDF("k", "p", "v"),
        expectProps = Map("wm" -> None))
    }
    assert(ManifestVersioned.read(spark, w, "t").count() === 2,
      "the conflicted append staged nothing")
    // matching expectation commits and can advance the property
    ManifestVersioned.appendRows(spark, w, "t",
      Seq((3L, "a", 3.0)).toDF("k", "p", "v"),
      extraProps = Map("wm" -> "200"),
      expectProps = Map("wm" -> Some("100")))
    assert(ManifestVersioned.tableProperties(spark, w, "t")("wm") === "200")
    assert(ManifestVersioned.read(spark, w, "t").count() === 3)
  }

  test("INSERT INTO ... REPLACE WHERE: predicate-scoped atomic " +
      "overwrite touches only the predicate's partitions") {
    val w = wh()
    Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0),
      (4L, "c", 40.0))
      .toDF("k", "p", "v").createOrReplaceTempView("rw_src1")
    spark.sql(
      s"""CREATE TABLE rwt USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k') AS SELECT * FROM rw_src1""")
    def entriesByValue() = ManifestVersioned
      .manifestEntries(spark, w, "rwt")
      .map { case (k, e) => ManifestVersioned.partValuesOf(k).head -> e }
    val before = entriesByValue()
    // replace partition 'a''s rows with a corrected batch
    val rep = spark.sql(
      """INSERT INTO rwt REPLACE WHERE p = 'a'
         SELECT k, 'a' AS p, v * 100 FROM rw_src1 WHERE p = 'a'""")
      .collect()(0)
    assert(rep.getLong(1) === 1L, "only the 'a' partition touched")
    assert(spark.sql("SELECT k, v FROM rwt ORDER BY k")
      .as[(Long, Double)].collect().toSeq ===
      Seq((1L, 1000.0), (2L, 2000.0), (3L, 30.0), (4L, 40.0)))
    // UNtouched partitions kept their generation dirs verbatim (the
    // pruning evidence: no rewrite happened there)
    val after = entriesByValue()
    assert(after("b").dir === before("b").dir &&
      after("c").dir === before("c").dir)
    assert(after("a").dir !== before("a").dir)
    // a finer-than-partition predicate carries the complement verbatim
    spark.sql(
      """INSERT INTO rwt REPLACE WHERE p = 'a' AND v >= 2000.0
         SELECT 9 AS k, 'a' AS p, 9000.0 AS v""")
    assert(spark.sql("SELECT k, v FROM rwt WHERE p = 'a' ORDER BY k")
      .as[(Long, Double)].collect().toSeq ===
      Seq((1L, 1000.0), (9L, 9000.0)))
    // an emptied partition drops; a new partition creates
    spark.sql(
      """INSERT INTO rwt REPLACE WHERE p = 'b'
         SELECT 8 AS k, 'd' AS p, 8.0 AS v WHERE false""")
    assert(!entriesByValue().contains("b"))
    spark.sql(
      """INSERT INTO rwt REPLACE WHERE p = 'zz'
         SELECT 7 AS k, 'zz' AS p, 7.0 AS v""")
    assert(spark.sql("SELECT k FROM rwt WHERE p = 'zz'")
      .as[Long].head() === 7L)
    // scope guard: batch rows must satisfy the predicate
    assert(intercept[Exception] {
      spark.sql(
        """INSERT INTO rwt REPLACE WHERE p = 'a'
           SELECT 6 AS k, 'c' AS p, 6.0 AS v""").collect()
    }.getMessage.contains("NOT satisfying"))
    spark.sql("DROP TABLE rwt")
  }

  test("OPTIMIZE WHERE scopes maintenance to the predicate's " +
      "partitions; VACUUM DRY RUN reports without sweeping") {
    val w = wh()
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "p", "v")
      .createOrReplaceTempView("ow_src1")
    spark.sql(
      s"""CREATE TABLE owt USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k') AS SELECT * FROM ow_src1""")
    // sprawl BOTH partitions, then scope the fold to 'a'
    spark.sql("INSERT INTO owt VALUES (3, 'a', 3.0)")
    spark.sql("INSERT INTO owt VALUES (4, 'a', 4.0)")
    spark.sql("INSERT INTO owt VALUES (5, 'b', 5.0)")
    spark.sql("INSERT INTO owt VALUES (6, 'b', 6.0)")
    def dirOf(p: String) = ManifestVersioned
      .manifestEntries(spark, w, "owt")
      .map { case (k, e) => ManifestVersioned.partValuesOf(k).head ->
        e.dir }.apply(p)
    val bBefore = dirOf("b")
    val rep = spark.sql(
      "OPTIMIZE owt WHERE p = 'a' ZORDER BY (k)").collect()(0)
    assert(rep.getLong(1) === 1L, "only 'a' rewrote")
    assert(dirOf("b") === bBefore, "'b' untouched by the scoped rewrite")
    assert(spark.sql("SELECT sum(k) FROM owt").as[Long].head() === 21L,
      "data bit-identical through the scoped rewrite")
    // the scoped measure-then-fold form composes too
    val rep2 = spark.sql("OPTIMIZE owt WHERE p = 'b'").collect()(0)
    assert(dirOf("a") === dirOf("a"), "trivially")
    assert(spark.sql("SELECT sum(k) FROM owt").as[Long].head() === 21L)
    assert(rep2.getLong(1) >= 0L)
    // DRY RUN: the report rows come back, NOTHING is reclaimed
    val hist = ManifestVersioned.listVersions(spark, w, "owt")
    val dry = spark.sql("VACUUM owt RETAIN 0 HOURS DRY RUN").collect()
    assert(dry.nonEmpty, "aged history must appear in the report")
    assert(ManifestVersioned.listVersions(spark, w, "owt") === hist,
      "DRY RUN swept nothing")
    // the real sweep then reclaims what the dry run reported
    spark.sql("VACUUM owt RETAIN 0 HOURS")
    assert(ManifestVersioned.listVersions(spark, w, "owt").size <
      hist.size)
    spark.sql("DROP TABLE owt")
  }

  test("DROP TABLE PURGE deletes the table directory, history and all") {
    val w = wh()
    Seq((1L, "a", 1.0)).toDF("k", "p", "v")
      .createOrReplaceTempView("ddl_src2")
    spark.sql(
      s"""CREATE TABLE purged USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k') AS SELECT * FROM ddl_src2""")
    spark.sql("DROP TABLE purged PURGE")
    assert(ManifestVersioned.currentVersion(spark, w, "purged").isEmpty)
    assert(!new java.io.File(s"$w/purged.mv").exists())
  }

  test("warehouse falls back to LOCATION and spark.graft.warehouse") {
    val w1 = wh()
    Seq((1L, "a", 1.0)).toDF("k", "p", "v")
      .createOrReplaceTempView("ddl_src3")
    spark.sql(
      s"""CREATE TABLE loctab USING graft PARTITIONED BY (p)
          LOCATION '$w1' AS SELECT * FROM ddl_src3""")
    assert(ManifestVersioned.currentVersion(spark, w1, "loctab").isDefined)
    spark.sql("DROP TABLE loctab")
    val w2 = wh()
    spark.conf.set("spark.graft.warehouse", w2)
    try {
      spark.sql(
        s"""CREATE TABLE conftab USING graft PARTITIONED BY (p)
            AS SELECT * FROM ddl_src3""")
      assert(ManifestVersioned.currentVersion(spark, w2, "conftab")
        .isDefined)
      spark.sql("DROP TABLE conftab")
    } finally spark.conf.unset("spark.graft.warehouse")
  }

  test("TBLPROPERTIES are durable manifest metadata; registerAll " +
      "re-attaches a fresh session to the whole warehouse") {
    val w = wh()
    Seq((1L, "a", 1.0)).toDF("k", "p", "v")
      .createOrReplaceTempView("ddl_src_p")
    spark.sql(
      s"""CREATE TABLE props1 USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w', keyCol 'k') AS SELECT * FROM ddl_src_p""")
    spark.sql(
      s"""CREATE TABLE props2 USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w') AS SELECT * FROM ddl_src_p""")
    // CREATE recorded the merge key as a durable property
    assert(ManifestVersioned.tableProperties(spark, w, "props1")
      .get("graft.mergeKey") === Some("k"))
    spark.sql(
      "ALTER TABLE props1 SET TBLPROPERTIES ('team' = 'pipeline', " +
        "'tier' = 'gold')")
    assert(ManifestVersioned.tableProperties(spark, w, "props1") ===
      Map("graft.mergeKey" -> "k", "team" -> "pipeline", "tier" -> "gold"))
    // properties survive a FULL rewrite (table metadata, not data)
    ManifestVersioned.writeFull(spark, w, "props1",
      Seq((5L, "b", 5.0)).toDF("k", "p", "v"), "p")
    assert(ManifestVersioned.tableProperties(spark, w, "props1")
      .get("team") === Some("pipeline"))
    // SHOW TBLPROPERTIES is the SQL read side — zero data reads
    assert(spark.sql("SHOW TBLPROPERTIES props1").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet ===
      Set("graft.mergeKey" -> "k", "team" -> "pipeline",
        "tier" -> "gold"))
    assert(spark.sql("SHOW TBLPROPERTIES props1 ('team')").collect()
      .map(_.getString(1)).toSeq === Seq("pipeline"))
    assert(spark.sql("SHOW TBLPROPERTIES props1 ('ghost')").head()
      .getString(1).contains("does not have property"))
    spark.sql("ALTER TABLE props1 UNSET TBLPROPERTIES ('tier')")
    assert(!ManifestVersioned.tableProperties(spark, w, "props1")
      .contains("tier"))
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE props1 UNSET TBLPROPERTIES ('ghost')")
    }.getMessage.contains("no such table propert"))
    val v = ManifestVersioned.currentVersion(spark, w, "props1")
    spark.sql(
      "ALTER TABLE props1 UNSET TBLPROPERTIES IF EXISTS ('ghost')")
    assert(ManifestVersioned.currentVersion(spark, w, "props1") === v,
      "IF EXISTS on absent keys burns no version")
    // a FRESH session attaches to the whole warehouse in one call and
    // recovers the merge key from the durable property — DML works
    // with zero out-of-band knowledge
    spark.sql("DROP TABLE props1")
    spark.sql("DROP TABLE props2")
    assert(GraftSqlTables.registerAll(spark, w) ===
      Seq("props1", "props2"))
    spark.sql("DELETE FROM props1 WHERE k = 5")
    assert(spark.sql("SELECT * FROM props1").count() === 0)
    assert(intercept[Exception] {
      spark.sql("DELETE FROM props2 WHERE k = 1")
    }.getMessage.contains("merge key"),
      "props2 was created without a key — DML still refuses loudly")
    spark.sql("DROP TABLE props1"); spark.sql("DROP TABLE props2")
  }

  test("randomized SQL op sequences agree with an in-memory model " +
      "(seeded; INSERT/UPDATE/DELETE/TRUNCATE interleaved)") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(100 + seed)
      val w = wh()
      (0L until 8L).map(k => (k, if (k % 2 == 0) "a" else "b", k * 10L))
        .toDF("k", "p", "v").createOrReplaceTempView(s"ddl_rand$seed")
      spark.sql(
        s"""CREATE TABLE rnd$seed USING graft PARTITIONED BY (p)
            OPTIONS (warehouse '$w', keyCol 'k')
            AS SELECT * FROM ddl_rand$seed""")
      var model: Map[Long, (String, Long)] =
        (0L until 8L).map(k =>
          k -> (if (k % 2 == 0) "a" else "b", k * 10L)).toMap
      var nextKey = 100L
      for (step <- 1 to 10) {
        rnd.nextInt(8) match {
          case 0 | 1 => // INSERT a fresh key
            val (k, p, v) = (nextKey, if (rnd.nextBoolean()) "a" else "c",
              rnd.nextInt(1000).toLong)
            nextKey += 1
            spark.sql(s"INSERT INTO rnd$seed VALUES ($k, '$p', $v)")
            model += k -> (p, v)
          case 2 | 3 => // UPDATE a value slice, self-referencing
            val cut = rnd.nextInt(500)
            spark.sql(
              s"UPDATE rnd$seed SET v = v * 2 + 1 WHERE v >= $cut")
            model = model.map { case (k, (p, v)) =>
              k -> (p, if (v >= cut) v * 2 + 1 else v) }
          case 4 | 5 => // DELETE a key slice
            val m = 2 + rnd.nextInt(4)
            spark.sql(s"DELETE FROM rnd$seed WHERE k % $m = 0")
            model = model.filter { case (k, _) => k % m != 0 }
          case 6 => // point UPDATE moving a row's partition
            model.keys.toSeq.sorted.headOption.foreach { k =>
              spark.sql(
                s"UPDATE rnd$seed SET p = 'z' WHERE k = $k")
              model += k -> ("z", model(k)._2)
            }
          case 7 => // TRUNCATE (rare-ish; resets everything)
            spark.sql(s"TRUNCATE TABLE rnd$seed")
            model = Map.empty
        }
        if (step % 5 == 0 || step == 10) {
          val got = spark.sql(s"SELECT k, p, v FROM rnd$seed")
            .as[(Long, String, Long)].collect().toSet
          val want = model.map { case (k, (p, v)) => (k, p, v) }.toSet
          assert(got === want, s"seed $seed diverged at step $step")
        }
      }
      spark.sql(s"DROP TABLE rnd$seed")
    }
  }

  test("randomized ops over a HIDDEN-partitioned table agree with the " +
      "model, and replaying table_changes from v1 rebuilds the exact " +
      "state (seeded; DML/OPTIMIZE/TRUNCATE/RESTORE interleaved)") {
    import graft.io.ManifestVersioned
    val days = Seq("2026-03-01", "2026-03-02", "2026-03-03",
      "2026-03-04", "2026-03-05")
    for (seed <- 1 to 2) {
      val rnd = new scala.util.Random(900 + seed)
      val w = wh()
      val tb = s"rndh$seed"
      (0L until 6L).map(k => (k,
        java.sql.Timestamp.valueOf(s"${days(k.toInt % 3)} 10:00:00"),
        k * 10L))
        .toDF("k", "ev", "v").createOrReplaceTempView(s"hid_rand$seed")
      // the writer NEVER computes ev_day anywhere in this test
      spark.sql(
        s"""CREATE TABLE $tb USING graft PARTITIONED BY (days(ev))
            OPTIONS (warehouse '$w', keyCol 'k')
            AS SELECT * FROM hid_rand$seed""")
      type Model = Map[Long, (String, Long)] // k -> (day ts, v)
      var model: Model = (0L until 6L).map(k =>
        k -> (s"${days(k.toInt % 3)} 10:00:00", k * 10L)).toMap
      def head(): Int = ManifestVersioned.currentVersion(spark, w, tb).get
      var hist: Map[Int, Model] = Map(head() -> model)
      var nextKey = 100L
      for (step <- 1 to 12) {
        rnd.nextInt(12) match {
          case 0 | 1 => // INSERT (positional arity hides ev_day)
            val d = days(rnd.nextInt(days.size))
            val (k, v) = (nextKey, rnd.nextInt(1000).toLong)
            nextKey += 1
            spark.sql(s"INSERT INTO $tb VALUES " +
              s"($k, TIMESTAMP'$d 10:00:00', $v)")
            model += k -> (s"$d 10:00:00", v)
          case 2 | 3 => // UPDATE a value slice
            val cut = rnd.nextInt(500)
            spark.sql(s"UPDATE $tb SET v = v + 7 WHERE v >= $cut")
            model = model.map { case (k, (d, v)) =>
              k -> (d, if (v >= cut) v + 7 else v) }
          case 4 => // UPDATE moving a row ACROSS hidden partitions
            model.keys.toSeq.sorted.headOption.foreach { k =>
              val d = days(rnd.nextInt(days.size))
              spark.sql(s"UPDATE $tb SET ev = TIMESTAMP'$d 10:00:00' " +
                s"WHERE k = $k")
              model += k -> (s"$d 10:00:00", model(k)._2)
            }
          case 5 | 6 => // DELETE a key slice
            val m = 2 + rnd.nextInt(4)
            spark.sql(s"DELETE FROM $tb WHERE k % $m = 0")
            model = model.filter { case (k, _) => k % m != 0 }
          case 7 => // maintenance interleave: bit-identity, empty feed
            spark.sql(s"OPTIMIZE $tb")
          case 8 => // RESTORE to a random retained version
            val vr = hist.keys.toSeq.sorted
              .apply(rnd.nextInt(hist.size))
            spark.sql(s"RESTORE $tb TO VERSION AS OF $vr")
            model = hist(vr)
          case 9 => // TRUNCATE
            spark.sql(s"TRUNCATE TABLE $tb")
            model = Map.empty
          case 10 | 11 => // REPLACE WHERE: backfill one day, predicate
            // on the RAW timestamp (the hidden-partitioning shape)
            val d = days(rnd.nextInt(days.size))
            val nd = java.time.LocalDate.parse(d).plusDays(1).toString
            val (k1, k2) = (nextKey, nextKey + 1)
            val (v1, v2) = (rnd.nextInt(100).toLong,
              rnd.nextInt(100).toLong)
            nextKey += 2
            spark.sql(
              s"""INSERT INTO $tb
                  REPLACE WHERE ev >= TIMESTAMP'$d 00:00:00'
                    AND ev < TIMESTAMP'$nd 00:00:00'
                  SELECT * FROM VALUES
                    ($k1, TIMESTAMP'$d 10:00:00', ${v1}L),
                    ($k2, TIMESTAMP'$d 10:00:00', ${v2}L)
                    AS t(k, ev, v)""")
            model = model.filter { case (_, (dd, _)) =>
              !dd.startsWith(d) } +
              (k1 -> (s"$d 10:00:00", v1)) + (k2 -> (s"$d 10:00:00", v2))
        }
        hist += head() -> model
        if (step % 4 == 0 || step == 12) {
          // 1) head equals the model, derived column included
          val got = spark.sql(
            s"SELECT k, CAST(ev AS STRING), CAST(ev_day AS STRING), v " +
              s"FROM $tb").as[(Long, String, String, Long)]
            .collect().toSet
          val want = model.map { case (k, (d, v)) =>
            (k, d, d.take(10), v) }.toSet
          assert(got === want, s"seed $seed head diverged at step $step")
          // 2) the change feed from v1 REPLAYS to the same state —
          // maintenance commits must contribute nothing, restores must
          // emit their inverse diffs
          val replayed = spark.sql(
            s"""SELECT version, k, change_type,
                       coalesce(CAST(new_ev AS STRING), '') AS ev,
                       coalesce(new_v, 0L) AS v
                FROM table_changes('$tb', 1) ORDER BY version""")
            .as[(Int, Long, String, String, Long)].collect()
            .foldLeft(Map.empty[Long, (String, Long)]) {
              case (st, (_, k, "delete", _, _)) => st - k
              case (st, (_, k, _, d, v)) => st + (k -> (d, v))
            }
          assert(replayed.map { case (k, (d, v)) => (k, d, v) }.toSet ===
            model.map { case (k, (d, v)) => (k, d, v) }.toSet,
            s"seed $seed feed replay diverged at step $step")
        }
      }
      spark.sql(s"DROP TABLE $tb")
    }
  }

  test("loud guards: no warehouse, no partitioning, non-identity " +
      "transform, multi-part name") {
    Seq((1L, "a", 1.0)).toDF("k", "p", "v")
      .createOrReplaceTempView("ddl_src4")
    assert(intercept[Exception] {
      spark.sql("""CREATE TABLE g1 USING graft PARTITIONED BY (p)
          AS SELECT * FROM ddl_src4""")
    }.getMessage.contains("warehouse"))
    val w = wh()
    assert(intercept[Exception] {
      spark.sql(s"""CREATE TABLE g2 USING graft
          OPTIONS (warehouse '$w') AS SELECT * FROM ddl_src4""")
    }.getMessage.contains("PARTITIONED BY"))
    // truncate is the one transform the hidden-partitioning surface
    // does not map (bucket/days/hours/months/years do — see the
    // hidden-partitioning test)
    assert(intercept[Exception] {
      spark.sql(s"""CREATE TABLE g3 USING graft
          PARTITIONED BY (truncate(4, p)) OPTIONS (warehouse '$w')
          AS SELECT * FROM ddl_src4""")
    }.getMessage.contains("unsupported partition transform"))
    assert(intercept[Exception] {
      spark.sql(s"""CREATE TABLE a.b.g4 USING graft PARTITIONED BY (p)
          OPTIONS (warehouse '$w') AS SELECT * FROM ddl_src4""")
    }.getMessage.contains("single-part"))
  }

  test("hidden partitioning: PARTITIONED BY (days(ts)) declares a " +
      "generated column; writes derive it, reads prune through it") {
    val w = wh()
    Seq((1L, java.sql.Timestamp.valueOf("2026-03-01 10:00:00"), 10.0),
      (2L, java.sql.Timestamp.valueOf("2026-03-02 11:00:00"), 20.0))
      .toDF("k", "ev", "v").createOrReplaceTempView("gen_sql_src1")
    spark.sql(
      s"""CREATE TABLE genp USING graft PARTITIONED BY (days(ev))
          OPTIONS (warehouse '$w', keyCol 'k')
          AS SELECT * FROM gen_sql_src1""")
    // the generated column materialized under the Iceberg-style name
    // and the declaration is a durable property
    assert(spark.table("genp").columns.toSeq ===
      Seq("k", "ev", "v", "ev_day"))
    assert(ManifestVersioned.tableProperties(spark, w, "genp")
      .get("graft.generated.ev_day").contains("days(ev)"))
    assert(ManifestVersioned.manifestEntries(spark, w, "genp").size === 2)
    // INSERT never mentions ev_day — positional arity hides it and
    // the engine derives it
    spark.sql(
      "INSERT INTO genp VALUES (3, TIMESTAMP'2026-03-03 09:00:00', 30.0)")
    assert(spark.sql("SELECT CAST(ev_day AS STRING) FROM genp " +
      "WHERE k = 3").as[String].head() === "2026-03-03")
    // MERGE inserting new rows derives too (source carries no ev_day)
    Seq((3L, java.sql.Timestamp.valueOf("2026-03-03 09:00:00"), 33.0),
      (4L, java.sql.Timestamp.valueOf("2026-03-04 12:00:00"), 40.0))
      .toDF("k", "ev", "v").createOrReplaceTempView("gen_sql_chg1")
    spark.sql(
      """MERGE INTO genp t USING gen_sql_chg1 s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT CAST(ev_day AS STRING), v FROM genp " +
      "WHERE k IN (3, 4) ORDER BY k").as[(String, Double)]
      .collect().toSeq ===
      Seq(("2026-03-03", 33.0), ("2026-03-04", 40.0)))
    // UPDATE moving the source timestamp REFRESHES the generated
    // column (and therefore the row's partition)
    spark.sql(
      "UPDATE genp SET ev = TIMESTAMP'2026-03-09 08:00:00' WHERE k = 1")
    assert(spark.sql("SELECT CAST(ev_day AS STRING) FROM genp " +
      "WHERE k = 1").as[String].head() === "2026-03-09")
    // read-side: the raw-ev predicate prunes through the derived
    // ev_day pred at the manifest level
    assert(spark.sql("SELECT k FROM genp WHERE " +
      "ev >= TIMESTAMP'2026-03-04 00:00:00'").as[Long]
      .collect().toSet === Set(4L, 1L))
    // bucket transform: same machinery over pmod
    spark.sql(
      s"""CREATE TABLE genb USING graft PARTITIONED BY (bucket(4, k))
          OPTIONS (warehouse '$w', keyCol 'k')
          AS SELECT k, v FROM gen_sql_src1""")
    assert(spark.table("genb").columns.contains("k_bucket"))
    assert(spark.sql("SELECT k_bucket FROM genb WHERE k = 2")
      .as[Int].head() === 2)
    spark.sql("DROP TABLE genp")
    spark.sql("DROP TABLE genb")
  }
}
