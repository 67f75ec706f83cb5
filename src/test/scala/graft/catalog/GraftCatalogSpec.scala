package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.ManifestVersioned

/** The DSv2 catalog plugin: `graft.<alias>.<table>` multipart names
  * resolve in a FRESH session from configuration alone — no
  * registerAll, no register calls — for SELECT, DML (merge key from
  * the durable `graft.mergeKey` property), metadata (SHOW TABLES /
  * DESCRIBE through the genuine V2 path), and CREATE TABLE. The
  * session-registered path stays as the compatibility surface.
  */
class GraftCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCatalogSession(w: String, cat: String) = {
    val s2 = spark.newSession()
    s2.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$cat.warehouse.wh1", w)
    s2
  }

  test("configuration-only resolution: SELECT, DELETE, MERGE by multipart name") {
    val w = Files.createTempDirectory("graft-cat1").toString
    // created out-of-band (another job, another session) with the
    // durable merge-key property — all a fresh session ever needs
    ManifestVersioned.writeFullMulti(spark, w, "orders",
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
        .toDF("k", "p", "v"),
      Seq("p"), properties = Map("graft.mergeKey" -> "k"))
    val s2 = freshCatalogSession(w, "g10")
    import s2.implicits._
    assert(s2.sql("SELECT k, v FROM g10.wh1.orders ORDER BY k")
      .as[(Long, Double)].collect().toSeq ===
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    // predicates still reach the pruned engine scan (not a V2 scan —
    // GraftTable advertises no capabilities, so reaching a result at
    // all proves the extension swap happened)
    assert(s2.sql("SELECT k FROM g10.wh1.orders WHERE p = 'a'")
      .as[Long].collect().toSet === Set(1L, 3L))
    // DML by multipart name: the merge key comes from the property
    s2.sql("DELETE FROM g10.wh1.orders WHERE k = 3")
    s2.range(1).select(lit(2L).as("k"), lit("b").as("p"),
        lit(22.0).as("v"))
      .unionAll(s2.range(1).select(lit(9L).as("k"), lit("c").as("p"),
        lit(90.0).as("v")))
      .createOrReplaceTempView("cat_src1")
    s2.sql("""MERGE INTO g10.wh1.orders t USING cat_src1 s ON t.k = s.k
              WHEN MATCHED THEN UPDATE SET v = s.v
              WHEN NOT MATCHED THEN INSERT *""")
    s2.sql("UPDATE g10.wh1.orders SET v = v + 1 WHERE k = 1")
    s2.sql("INSERT INTO g10.wh1.orders VALUES (7, 'c', 70.0)")
    assert(s2.sql("SELECT k, v FROM g10.wh1.orders ORDER BY k")
      .as[(Long, Double)].collect().toSeq ===
      Seq((1L, 11.0), (2L, 22.0), (7L, 70.0), (9L, 90.0)))
    // the writes are ordinary manifest versions — visible to any path
    assert(ManifestVersioned.read(spark, w, "orders").count() === 4L)
    // maintenance statements accept catalog-addressed names too
    s2.sql("OPTIMIZE g10.wh1.orders").collect()
    s2.sql("VACUUM g10.wh1.orders RETAIN 9999 HOURS").collect()
    assert(s2.sql("SELECT count(*) AS n FROM g10.wh1.orders")
      .as[Long].head() === 4L)
  }

  test("metadata flows through the genuine V2 path: SHOW TABLES, DESCRIBE, spark.table") {
    val w = Files.createTempDirectory("graft-cat2").toString
    ManifestVersioned.writeFullMulti(spark, w, "t1",
      Seq((1L, "a", 1.0)).toDF("k", "p", "v"), Seq("p"),
      properties = Map("graft.mergeKey" -> "k"))
    ManifestVersioned.writeFullMulti(spark, w, "t2",
      Seq((1L, "a")).toDF("k", "p"), Seq("p"))
    val s2 = freshCatalogSession(w, "g11")
    assert(s2.sql("SHOW TABLES IN g11.wh1").collect()
      .map(_.getString(1)).toSet === Set("t1", "t2"))
    val desc = s2.sql("DESCRIBE TABLE g11.wh1.t1").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc.get("k").contains("bigint") &&
      desc.get("v").contains("double"))
    assert(s2.table("g11.wh1.t1").count() === 1L)
    // unknown alias / table fail as proper catalog errors
    intercept[Exception] { s2.sql("SHOW TABLES IN g11.nope").collect() }
    intercept[Exception] { s2.table("g11.wh1.missing").collect() }
  }

  test("CREATE TABLE through the catalog bootstraps v1 with the key property") {
    val w = Files.createTempDirectory("graft-cat3").toString
    val s2 = freshCatalogSession(w, "g12")
    s2.sql("""CREATE TABLE g12.wh1.fresh (k BIGINT, p STRING, v DOUBLE)
              PARTITIONED BY (p) TBLPROPERTIES ('keyCol' = 'k')""")
    assert(ManifestVersioned.currentVersion(spark, w, "fresh")
      === Some(1))
    assert(ManifestVersioned.tableProperties(spark, w, "fresh")
      .get("graft.mergeKey") === Some("k"))
    s2.sql("INSERT INTO g12.wh1.fresh VALUES (1, 'a', 1.5)")
    s2.sql("MERGE INTO g12.wh1.fresh t USING " +
      "(SELECT 1 AS k, 'a' AS p, 9.0 AS v) s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET *")
    import s2.implicits._
    assert(s2.sql("SELECT k, v FROM g12.wh1.fresh")
      .as[(Long, Double)].collect().toSeq === Seq((1L, 9.0)))
    // dropTable refuses — the catalog does not own the directories
    intercept[UnsupportedOperationException] {
      s2.sql("DROP TABLE g12.wh1.fresh")
    }
  }

  test("CREATE TABLE through the catalog with a days() transform " +
      "declares hidden partitioning") {
    val w = Files.createTempDirectory("graft-cat4").toString
    val s2 = freshCatalogSession(w, "g13")
    s2.sql("""CREATE TABLE g13.wh1.evts (k BIGINT, ev TIMESTAMP,
              v DOUBLE) PARTITIONED BY (days(ev))
              TBLPROPERTIES ('keyCol' = 'k')""")
    assert(ManifestVersioned.tableProperties(spark, w, "evts")
      .get("graft.generated.ev_day") === Some("days(ev)"))
    assert(ManifestVersioned.partitionColumns(spark, w, "evts")
      === Some(Seq("ev_day")))
    // the INSERT never mentions ev_day; the engine derives it
    s2.sql("INSERT INTO g13.wh1.evts VALUES " +
      "(1, TIMESTAMP'2026-03-01 10:00:00', 1.0)")
    s2.sql("INSERT INTO g13.wh1.evts VALUES " +
      "(2, TIMESTAMP'2026-03-02 11:00:00', 2.0)")
    import s2.implicits._
    assert(s2.sql("SELECT CAST(ev_day AS STRING) FROM g13.wh1.evts " +
      "WHERE k = 2").as[String].head() === "2026-03-02")
    assert(ManifestVersioned.manifestEntries(spark, w, "evts")
      .size === 2, "one hidden partition per day")
    // the raw-ev predicate prunes through the derived ev_day pred
    assert(s2.sql("SELECT k FROM g13.wh1.evts WHERE " +
      "ev >= TIMESTAMP'2026-03-02 00:00:00'").as[Long]
      .collect().toSeq === Seq(2L))
    // the change feed TVF accepts the catalog-addressed name too (the
    // merge key recovered from the durable property)
    assert(s2.sql(
      "SELECT version, change_type FROM table_changes('g13.wh1.evts', 2) " +
        "ORDER BY version")
      .as[(Int, String)].collect().toSeq ===
      Seq((2, "insert"), (3, "insert")))
  }
}
