package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Snapshot-versioned tables: atomic pointer visibility, time travel,
  * rollback without data movement, orphan sweeping after crashes, and
  * vacuum retention.
  */
class VersionedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").as[Long].collect().toSet

  test("write/commit/read across versions; time travel; rollback") {
    val wh = Files.createTempDirectory("graft-ver").toString
    assert(Versioned.currentVersion(spark, wh, "t") === None)
    val v1 = Versioned.writeVersioned(spark, wh, "t", Seq(1L, 2L).toDF("id"))
    val v2 = Versioned.writeVersioned(spark, wh, "t", Seq(1L, 2L, 3L).toDF("id"))
    assert((v1, v2) === ((1, 2)))
    assert(Versioned.currentVersion(spark, wh, "t") === Some(2))
    assert(ids(Versioned.readVersioned(spark, wh, "t")) === Set(1L, 2L, 3L))
    assert(ids(Versioned.readVersioned(spark, wh, "t", Some(1))) === Set(1L, 2L))
    Versioned.rollback(spark, wh, "t", 1)
    assert(ids(Versioned.readVersioned(spark, wh, "t")) === Set(1L, 2L))
    // version 2 is now above the pointer: refuse to read it as committed
    intercept[IllegalArgumentException] {
      Versioned.readVersioned(spark, wh, "t", Some(2))
    }
    // the next write claims version 2 again, sweeping the leftover
    val v2b = Versioned.writeVersioned(spark, wh, "t", Seq(9L).toDF("id"))
    assert(v2b === 2)
    assert(ids(Versioned.readVersioned(spark, wh, "t")) === Set(9L))
  }

  test("a crashed write (data without pointer) leaves readers on the old version") {
    val wh = Files.createTempDirectory("graft-ver2").toString
    Versioned.writeVersioned(spark, wh, "t", Seq(1L).toDF("id"))
    // simulate a crash: v00002 data lands but the pointer never commits
    Seq(99L).toDF("id").write.parquet(s"$wh/t.v/v00002")
    assert(Versioned.currentVersion(spark, wh, "t") === Some(1))
    assert(ids(Versioned.readVersioned(spark, wh, "t")) === Set(1L))
    intercept[IllegalArgumentException] {
      Versioned.readVersioned(spark, wh, "t", Some(2))
    }
    // next writer sweeps the orphan and commits its own version 2
    Versioned.writeVersioned(spark, wh, "t", Seq(2L).toDF("id"))
    assert(ids(Versioned.readVersioned(spark, wh, "t")) === Set(2L))
  }

  test("a crashed pointer commit (tmp only) never hides the live pointer") {
    val wh = Files.createTempDirectory("graft-ver4").toString
    Versioned.writeVersioned(spark, wh, "t", Seq(1L).toDF("id"))
    Versioned.writeVersioned(spark, wh, "t", Seq(2L).toDF("id"))
    // simulate a crash mid-commit: the tmp epoch file exists, the rename
    // never happened — readers must still see version 2
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$wh/t.v/._ptr.000000099.tmp"), "7")
    assert(Versioned.currentVersion(spark, wh, "t") === Some(2))
    assert(ids(Versioned.readVersioned(spark, wh, "t")) === Set(2L))
    // and the next commit proceeds normally past the debris
    Versioned.writeVersioned(spark, wh, "t", Seq(3L).toDF("id"))
    assert(ids(Versioned.readVersioned(spark, wh, "t")) === Set(3L))
  }

  test("concurrent committers: distinct versions, serial epoch order, no tears") {
    val wh = Files.createTempDirectory("graft-ver5").toString
    val Rounds = 3
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    def writer(tag: Long): Future[Seq[Int]] = Future {
      (1 to Rounds).map { i =>
        Versioned.writeVersionedConcurrent(spark, wh, "t",
          Seq(tag * 100 + i).toDF("id"))
      }
    }
    val (a, b) = (writer(1L), writer(2L))
    val committed = Await.result(a, 120.seconds) ++ Await.result(b, 120.seconds)
    // every commit claimed a DISTINCT version (no shared-target tears)
    assert(committed.distinct.size === committed.size)
    // the live pointer is one of the committed versions (epoch order =
    // serial order; a version a slower committer pointer-committed first
    // is superseded, exactly like a rolled-back one)
    val cur = Versioned.currentVersion(spark, wh, "t").get
    assert(committed.contains(cur))
    // every addressable version reads back as exactly one writer's
    // whole payload — never a torn mix
    for (v <- committed if v <= cur)
      assert(ids(Versioned.readVersioned(spark, wh, "t", Some(v))).size === 1)
    // vacuum in a no-writer window sweeps claims/epoch debris cleanly
    Versioned.vacuumVersions(spark, wh, "t", keepHistory = committed.size)
    assert(ids(Versioned.readVersioned(spark, wh, "t")).size === 1)
  }

  test("vacuum keeps the current version and the requested history depth") {
    val wh = Files.createTempDirectory("graft-ver3").toString
    (1L to 5L).foreach(i =>
      Versioned.writeVersioned(spark, wh, "t", Seq(i).toDF("id")))
    Versioned.vacuumVersions(spark, wh, "t", keepHistory = 1)
    assert(Versioned.listVersions(spark, wh, "t") === Seq(4, 5))
    assert(ids(Versioned.readVersioned(spark, wh, "t")) === Set(5L))
    assert(ids(Versioned.readVersioned(spark, wh, "t", Some(4))) === Set(4L))
    // rollback leftovers above the pointer are vacuumed too
    Versioned.rollback(spark, wh, "t", 4)
    Versioned.vacuumVersions(spark, wh, "t", keepHistory = 0)
    assert(Versioned.listVersions(spark, wh, "t") === Seq(4))
  }
}
