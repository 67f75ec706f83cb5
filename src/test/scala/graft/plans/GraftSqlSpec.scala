package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.ManifestVersioned

/** The SQL surface for manifest tables: register once, then plain
  * `spark.sql` resolves the name (ResolveGraftTables) and the
  * optimizer converts each resolved filter into the pruned scan
  * (PruneGraftScans) — manifest, zone, bloom and file pruning behind
  * ordinary SQL, with the Filter kept as the residual so extraction
  * misses can never change an answer.
  */
class GraftSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(n: Int = 300): String = {
    val wh = Files.createTempDirectory("graft-sql").toString
    val df = (0L until n.toLong)
      .map(k => (k, if (k % 2 == 0) "a" else "b", k * 10L))
      .toDF("k", "p", "v")
    ManifestVersioned.writeFull(spark, wh, "t", df.repartition(6), "p")
    ManifestVersioned.optimizeClustered(spark, wh, "t", Seq("p"),
      Seq(Seq("a"), Seq("b")), Seq("k"), filesPerPartition = 4)
    wh
  }

  test("registered names resolve; filters prune partitions AND files through SQL") {
    val wh = freshTable()
    val name = GraftSqlTables.register(spark, wh, "t",
      asName = Some("sql_t1"))
    assert(GraftSqlTables.registered(spark).get("sql_t1") ===
      Some((wh, "t")))
    val df = spark.sql(
      "SELECT k, v FROM sql_t1 WHERE k >= 100 AND k < 140 ORDER BY k")
    assert(df.as[(Long, Long)].collect().toSeq ===
      (100L until 140L).map(k => (k, k * 10)))
    // the executed scan reads a strict subset of the table's files —
    // Dataset.inputFiles is the public window onto the listing
    val all = spark.sql("SELECT * FROM sql_t1").inputFiles.toSet
    val pruned = df.inputFiles.toSet
    assert(pruned.subsetOf(all))
    assert(pruned.size < all.size,
      s"expected file pruning through SQL: ${pruned.size} of ${all.size}")
    GraftSqlTables.unregister(spark, "sql_t1")
  }

  test("OR-of-conjuncts WHERE prunes files through SQL (union of branch survivors)") {
    val wh = freshTable()
    val name = GraftSqlTables.register(spark, wh, "t",
      asName = Some("sql_tor"))
    val df = spark.sql(s"""SELECT k, v FROM $name
      WHERE (k >= 10 AND k < 30) OR (k >= 250 AND k < 260) ORDER BY k""")
    assert(df.as[(Long, Long)].collect().toSeq ===
      ((10L until 30L) ++ (250L until 260L)).map(k => (k, k * 10)))
    val all = spark.sql(s"SELECT * FROM $name").inputFiles.toSet
    val pruned = df.inputFiles.toSet
    assert(pruned.subsetOf(all) && pruned.size < all.size,
      s"expected OR-union file pruning through SQL: ${pruned.size} of ${all.size}")
    // both-arms-impossible: provably empty, zero files
    val none = spark.sql(
      s"SELECT * FROM $name WHERE (k > 99999) OR (k < -5)")
    assert(none.count() === 0 && none.inputFiles.isEmpty)
    GraftSqlTables.unregister(spark, "sql_tor")
  }

  test("a metadata-disproved predicate returns empty without scanning anything") {
    val wh = freshTable()
    GraftSqlTables.register(spark, wh, "t", asName = Some("sql_t2"))
    val df = spark.sql("SELECT * FROM sql_t2 WHERE k = 100000")
    assert(df.count() === 0)
    assert(df.inputFiles.isEmpty, "all-pruned must plan zero files")
    GraftSqlTables.unregister(spark, "sql_t2")
  }

  test("OR residuals, joins and aggregates answer exactly (extraction misses are safe)") {
    val wh = freshTable()
    GraftSqlTables.register(spark, wh, "t", asName = Some("sql_t3"))
    assert(spark.sql(
      "SELECT count(*) FROM sql_t3 WHERE k = 5 OR v = 2500").head().getLong(0)
      === 2L)
    // self-join through the SQL surface; filter on one side prunes it
    val joined = spark.sql(
      """SELECT a.k, b.v FROM sql_t3 a JOIN sql_t3 b ON a.k = b.k
         WHERE a.k < 10""")
    assert(joined.count() === 10L)
    GraftSqlTables.unregister(spark, "sql_t3")
  }

  test("queries see commits made AFTER registration (read-latest MVCC)") {
    val wh = freshTable(10)
    GraftSqlTables.register(spark, wh, "t", asName = Some("sql_t4"))
    assert(spark.sql("SELECT count(*) FROM sql_t4").head().getLong(0) === 10L)
    ManifestVersioned.writeDelta(spark, wh, "t",
      Seq((1000L, "a", 1L)).toDF("k", "p", "v"), "p")
    // writeDelta REPLACES partition a (5 rows) with the 1-row batch:
    // 5 (b) + 1 = 6 ≠ 10 proves the head is re-read per query
    assert(spark.sql("SELECT count(*) FROM sql_t4").head().getLong(0) === 6L,
      "resolution re-reads the head per query")
    GraftSqlTables.unregister(spark, "sql_t4")
  }

  test("delete vectors apply through SQL; IS NULL uses the null-count stats") {
    val wh = Files.createTempDirectory("graft-sql5").toString
    val df = (0L until 60L).map { k =>
      val v: java.lang.Long =
        if (k % 2 == 0 && k < 20) null else java.lang.Long.valueOf(k)
      (k, if (k < 20) "lo" else "hi", v)
    }.toDF("k", "p", "v")
    ManifestVersioned.writeFull(spark, wh, "t", df, "p")
    ManifestVersioned.deleteRows(spark, wh, "t",
      Seq((2L, "lo")).toDF("k", "p"), "k", Seq("p"))
    GraftSqlTables.register(spark, wh, "t", asName = Some("sql_t5"))
    // 10 nulls live in partition lo; key 2 is delete-vectored
    assert(spark.sql("SELECT count(*) FROM sql_t5 WHERE v IS NULL")
      .head().getLong(0) === 9L)
    // the null-free partition never enters the listing (partition lo's
    // data AND delete-vector files both live under key x6C6F)
    val scanned = spark.sql("SELECT k FROM sql_t5 WHERE v IS NULL").inputFiles
    assert(scanned.nonEmpty && scanned.forall(_.contains("/x6C6F/")),
      s"only partition lo (hex 6C6F) may be listed: ${scanned.toSeq}")
    GraftSqlTables.unregister(spark, "sql_t5")
  }

  test("VERSION AS OF and TIMESTAMP AS OF travel through SQL") {
    val wh = freshTable(10) // v1 = writeFull, v2 = optimize (content-equal)
    GraftSqlTables.register(spark, wh, "t", asName = Some("sql_t7"))
    // v1/v2 may share a millisecond (fine: content-equal); v3 must be
    // strictly later so TIMESTAMP AS OF v1's instant resolves pre-delta
    Thread.sleep(10)
    ManifestVersioned.writeDelta(spark, wh, "t",
      Seq((1000L, "a", 1L)).toDF("k", "p", "v"), "p") // v3: a → 1 row
    assert(spark.sql("SELECT count(*) FROM sql_t7").head().getLong(0) === 6L)
    assert(spark.sql("SELECT count(*) FROM sql_t7 VERSION AS OF 1")
      .head().getLong(0) === 10L)
    // pruning composes with time travel: v1 is unclustered (6 scattered
    // files), v2 is clustered — the same range lists fewer files at v2
    val v1 = spark.sql(
      "SELECT k FROM sql_t7 VERSION AS OF 1 WHERE k >= 2 AND k < 4")
    val v2 = spark.sql(
      "SELECT k FROM sql_t7 VERSION AS OF 2 WHERE k >= 2 AND k < 4")
    assert(v1.as[Long].collect().toSet === Set(2L, 3L))
    assert(v2.as[Long].collect().toSet === Set(2L, 3L))
    assert(v2.inputFiles.size < v1.inputFiles.size,
      "the clustered version's files prune")
    // timestamp form: the instant of v1's commit resolves to v1
    val t1 = ManifestVersioned.commitTimestamp(spark, wh, "t", Some(1)).get
    val ts = new java.sql.Timestamp(t1).toString
    assert(spark.sql(
      s"SELECT count(*) FROM sql_t7 TIMESTAMP AS OF '$ts'")
      .head().getLong(0) === 10L)
    GraftSqlTables.unregister(spark, "sql_t7")
  }

  test("metadata-only aggregates: count/min/max plan ZERO files while stats are exact") {
    val wh = Files.createTempDirectory("graft-sql8").toString
    val df = (0L until 100L).map { k =>
      val v: java.lang.Long =
        if (k % 10 == 0) null else java.lang.Long.valueOf(k * 2)
      (k, if (k % 2 == 0) "a" else "b", v)
    }.toDF("k", "p", "v")
    ManifestVersioned.writeFull(spark, wh, "t", df, "p")
    GraftSqlTables.register(spark, wh, "t", asName = Some("sql_t8"))
    val meta = spark.sql(
      """SELECT count(*) AS n, count(v) AS nv, min(k) AS mn, max(k) AS mx
         FROM sql_t8""")
    assert(meta.collect().toSeq.map(_.toSeq) ===
      Seq(Seq(100L, 90L, 0L, 99L)))
    assert(meta.inputFiles.isEmpty, "exact stats answer with zero files")
    // sum is NOT answerable from ranges: ordinary scan, right answer
    val scan = spark.sql("SELECT sum(k) AS s, count(*) AS n FROM sql_t8")
    assert(scan.head().getLong(0) === (0L until 100L).sum)
    assert(scan.inputFiles.nonEmpty)
    // a delete vector makes every stat inexact: falls back to the scan
    ManifestVersioned.deleteRows(spark, wh, "t",
      Seq((4L, "a")).toDF("k", "p"), "k", Seq("p"))
    val after = spark.sql("SELECT count(*) AS n, max(k) AS mx FROM sql_t8")
    assert(after.collect().toSeq.map(_.toSeq) === Seq(Seq(99L, 99L)))
    assert(after.inputFiles.nonEmpty, "DVs must force the real scan")
    GraftSqlTables.unregister(spark, "sql_t8")
  }

  test("__history/__files/__stats audit relations resolve through SQL") {
    val wh = freshTable(20) // v1 full, v2 optimize
    GraftSqlTables.register(spark, wh, "t", asName = Some("sql_t9"))
    val h = spark.sql(
      "SELECT version, n_partitions FROM sql_t9__history ORDER BY version")
    assert(h.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ===
      Seq((1, 2L), (2, 2L)))
    assert(spark.sql("SELECT sum(n_rows) FROM sql_t9__stats")
      .head().getLong(0) === 20L)
    assert(spark.sql(
      "SELECT count(*) FROM sql_t9__files WHERE n_files >= 1")
      .head().getLong(0) === 2L)
    // an unregistered base name with the suffix still fails loudly
    intercept[Exception](
      spark.sql("SELECT * FROM nosuch__history").collect())
    GraftSqlTables.unregister(spark, "sql_t9")
  }

  test("temp views and unknown names are untouched by the resolver") {
    val wh = freshTable(5)
    GraftSqlTables.register(spark, wh, "t", asName = Some("sql_t6"))
    // a temp view with the same name wins (built-in resolution first)
    Seq((1L, 2L)).toDF("k", "v").createOrReplaceTempView("sql_t6")
    assert(spark.sql("SELECT count(*) FROM sql_t6").head().getLong(0) === 1L)
    spark.catalog.dropTempView("sql_t6")
    assert(spark.sql("SELECT count(*) FROM sql_t6").head().getLong(0) === 5L)
    // unknown names still fail analysis loudly
    intercept[Exception](spark.sql("SELECT * FROM graft_no_such").collect())
    GraftSqlTables.unregister(spark, "sql_t6")
  }
}
