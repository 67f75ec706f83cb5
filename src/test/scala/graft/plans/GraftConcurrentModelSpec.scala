package graft.plans

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.ManifestVersioned

/** The third seeded model check: MAINTENANCE interleaved with DML under
  * THREE CONCURRENT WRITERS (two through r12; the third joined in r13 —
  * VERDICT-r12 #7 — so every pairwise race now also runs with a third
  * stream perturbing the OCC head between any pair's derivation and
  * commit, the shape that distinguishes retry-once code from
  * retry-until-clean code). The first two models (GraftDmlSpec's MERGE
  * model, GraftDdlSpec's op-sequence models) randomize statements in
  * one thread; this one races seeded statement streams against ONE
  * table and asserts the outcome is BIT-IDENTICAL to replaying the
  * same streams serially (writer A's ops, then B's, then C's).
  *
  * Serial-equivalence is by construction, so any divergence is an
  * ENGINE defect (a lost OCC retry, a double COPY INTO load, a
  * compaction dropping rows): the writers' effects commute — merge key
  * spaces are disjoint (A/B/C own the 0/1/2 residues mod 3, < 1000),
  * COPY INTO key spaces are disjoint from each other and from every
  * merge (≥ 10000 / 20000 / 30000 per writer), and OPTIMIZE / ZORDER /
  * VACUUM are content-neutral by contract. COPY INTO's own randomized
  * coverage matters here: each statement re-derives through the live
  * schema when a peer's ADD/RENAME/DROP lands inside its
  * read-align-append window (the r12 #10b statement-level re-derive,
  * deterministically pinned in SchemaRaceSpec, exercised under real
  * interleavings by this model). RESTORE and CLONE — which do NOT
  * commute on a shared table — run on writer-PRIVATE shallow clones
  * branched mid-race (exercising clone-under-concurrent-writers and
  * restore bookkeeping without breaking the shared model).
  */
class GraftConcurrentModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private sealed trait Op
  private case class MergeOp(rows: Seq[(Long, String, Long, Boolean)],
      viewTag: String) extends Op
  private case class CopyOp(fileName: String,
      rows: Seq[(Long, String, Long)], mtime: Long) extends Op
  private case object OptimizeOp extends Op
  private case class ZOrderOp(cols: String) extends Op
  private case object VacuumSafeOp extends Op
  private case object CloneRestoreOp extends Op
  // schema evolution interleaves too — both COMMUTE content-wise:
  // ADD COLUMNS is additive (old rows read typed NULLs; each writer
  // adds its OWN column so A/B adds commute), and the v-widening is
  // idempotent-monotone (the second widening is a no-op; merges staged
  // at the narrow type read up natively)
  private case class AddColumnOp(colName: String) extends Op
  private case object WidenVOp extends Op
  // RENAME COLUMN is the one schema op with COLUMN-MAPPING state (the
  // physical-name metadata a reader resolves through) — a racing MERGE
  // reading the schema header mid-rename is exactly the window this
  // model must cover. The renamed column is writer-PRIVATE (added by
  // the same op, names carried in the op so race and replay rename the
  // same columns), so A/B renames commute and serial-replay equivalence
  // stays by construction; the RACE is against the peer's DML and
  // maintenance, which read and rewrite the mapped schema constantly.
  private case class RenameColOp(from: String, to: String) extends Op
  // DROP COLUMN is the other mapping-state transition the r12 drift
  // check guards (a pinned-snapshot merge racing a drop would have
  // silently resurrected the column); writer-private add+drop commutes
  // with the peer, end state = the column never existed
  private case class DropColOp(colName: String) extends Op

  private def applyOp(table: String, srcDir: String, writer: String,
      op: Op, opIdx: Int): Unit = op match {
    case MergeOp(rows, tag) =>
      val view = s"ccm_${writer}_${tag}_$opIdx"
      rows.toDF("k", "p", "v", "del").createOrReplaceTempView(view)
      spark.sql(
        s"""MERGE INTO $table USING $view s ON $table.k = s.k
            WHEN MATCHED AND s.del THEN DELETE
            WHEN MATCHED THEN UPDATE SET v = s.v
            WHEN NOT MATCHED AND NOT s.del
              THEN INSERT (k, p, v) VALUES (s.k, s.p, s.v)""")
    case CopyOp(name, rows, mtime) =>
      val f = new java.io.File(srcDir, name)
      val pw = new java.io.PrintWriter(f)
      try {
        pw.println("k,p,v")
        rows.foreach { case (k, p, v) => pw.println(s"$k,$p,$v") }
      } finally pw.close()
      assert(f.setLastModified(mtime))
      spark.sql(
        s"""COPY INTO $table FROM '$srcDir' FILEFORMAT = CSV
            PATTERN = '*.csv' FORMAT_OPTIONS ('header' = 'true')""")
    case OptimizeOp => spark.sql(s"OPTIMIZE $table")
    case ZOrderOp(cols) => spark.sql(s"OPTIMIZE $table ZORDER BY ($cols)")
    case VacuumSafeOp => spark.sql(s"VACUUM $table RETAIN 1 HOURS")
    case AddColumnOp(c) =>
      spark.sql(s"ALTER TABLE $table ADD COLUMNS ($c BIGINT)")
    case RenameColOp(from, to) =>
      spark.sql(s"ALTER TABLE $table ADD COLUMNS ($from BIGINT)")
      spark.sql(s"ALTER TABLE $table RENAME COLUMN $from TO $to")
    case DropColOp(c) =>
      spark.sql(s"ALTER TABLE $table ADD COLUMNS ($c BIGINT)")
      spark.sql(s"ALTER TABLE $table DROP COLUMN $c")
    case WidenVOp =>
      spark.sql(s"ALTER TABLE $table ALTER COLUMN v TYPE BIGINT")
    case CloneRestoreOp =>
      // writer-private branch: clone the live table mid-race, mutate
      // the CLONE, restore the clone to its birth version — the clone
      // must come back bit-identical to its own snapshot no matter
      // what the peer writer does to the source meanwhile
      val cl = s"ccmclone_${writer}_$opIdx"
      spark.sql(s"CREATE TABLE $cl SHALLOW CLONE $table")
      val birth = spark.sql(s"SELECT k, p, v FROM $cl")
        .as[(Long, String, Long)].collect().toSet
      val bv = spark.sql(s"DESCRIBE HISTORY $cl")
        .select("version").as[Int].collect().max
      val view = s"ccm_${writer}_clsrc_$opIdx"
      Seq((90000L + opIdx, "a", 1L, false)).toDF("k", "p", "v", "del")
        .createOrReplaceTempView(view)
      spark.sql(
        s"""MERGE INTO $cl USING $view s ON $cl.k = s.k
            WHEN NOT MATCHED THEN INSERT (k, p, v)
            VALUES (s.k, s.p, s.v)""")
      spark.sql(s"RESTORE $cl TO VERSION AS OF $bv")
      val back = spark.sql(s"SELECT k, p, v FROM $cl")
        .as[(Long, String, Long)].collect().toSet
      assert(back === birth,
        s"$cl restore did not reproduce its clone-time snapshot")
      spark.sql(s"DROP TABLE $cl PURGE")
  }

  test("three concurrent seeded writers (MERGE / COPY INTO / OPTIMIZE / " +
      "ZORDER / VACUUM, plus private CLONE+RESTORE) end bit-identical " +
      "to a serial replay of the same statement streams") {
    // default 2 seeds (suite-budget friendly); -Dgraft.ccm.seeds=N
    // runs a wider sweep — used as a one-off robustness pass whenever
    // a new op kind joins the model
    val seeds = sys.props.get("graft.ccm.seeds").map(_.toInt).getOrElse(2)
    for (seed <- 1 to seeds) {
      val warehouse = Files.createTempDirectory(s"graft-ccm$seed").toString
      val parts = Seq("a", "b", "c")
      def genOps(rnd: scala.util.Random, writer: String,
          mergeBase: Long, copyBase: Long, t0: Long): Seq[Op] = {
        var copied = 0
        (1 to 8).map { i =>
          rnd.nextInt(14) match {
            case 0 | 1 | 2 | 3 =>
              val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
                (mergeBase + 3 * rnd.nextInt(40),
                  parts(rnd.nextInt(3)),
                  rnd.nextInt(1000).toLong, rnd.nextInt(4) == 0)
              }.distinctBy(_._1)
              MergeOp(rows, s"m$i")
            case 4 | 5 =>
              copied += 1
              val rows = (0 until 2).map(j =>
                (copyBase + 10L * copied + j, parts(rnd.nextInt(3)),
                  rnd.nextInt(1000).toLong))
              CopyOp(f"$writer$copied%02d.csv", rows,
                t0 + copied * 1000L)
            case 6 => OptimizeOp
            case 7 => ZOrderOp("k, v")
            case 8 => VacuumSafeOp
            case 9 => CloneRestoreOp
            case 10 => AddColumnOp(s"x_${writer}_$i")
            case 11 => WidenVOp
            case 12 => RenameColOp(s"r_${writer}_$i", s"rn_${writer}_$i")
            case 13 => DropColOp(s"d_${writer}_$i")
          }
        }
      }
      val t0 = System.currentTimeMillis() - 600000
      val rndA = new scala.util.Random(7000 + seed)
      val rndB = new scala.util.Random(8000 + seed)
      val rndC = new scala.util.Random(9000 + seed)
      val opsA = genOps(rndA, s"a$seed", 0L, 10000L, t0)
      val opsB = genOps(rndB, s"b$seed", 1L, 20000L, t0)
      val opsC = genOps(rndC, s"c$seed", 2L, 30000L, t0)
      val base = (0L until 12L)
        .map(k => (k, parts(k.toInt % 3), k * 10L))

      def mkTable(name: String, srcTag: String): Unit = {
        // v starts INT so WidenVOp exercises a real (first-wins,
        // then-idempotent) explicit widening mid-race
        base.toDF("k", "p", "v")
          .selectExpr("k", "p", "cast(v as int) v")
          .createOrReplaceTempView(s"ccm_$srcTag")
        spark.sql(
          s"""CREATE TABLE $name USING graft PARTITIONED BY (p)
              OPTIONS (warehouse '$warehouse', keyCol 'k')
              AS SELECT * FROM ccm_$srcTag""")
      }
      // ── concurrent run ──
      val shared = s"ccm_race$seed"
      mkTable(shared, s"base_race$seed")
      val dirA = Files.createTempDirectory(s"ccm-src-a$seed").toString
      val dirB = Files.createTempDirectory(s"ccm-src-b$seed").toString
      val dirC = Files.createTempDirectory(s"ccm-src-c$seed").toString
      val streams = Seq(
        (opsA, dirA, "a"), (opsB, dirB, "b"), (opsC, dirC, "c"))
      val barrier = new java.util.concurrent.CyclicBarrier(streams.size)
      val pool =
        java.util.concurrent.Executors.newFixedThreadPool(streams.size)
      try {
        streams.map { case (ops, dir, w) =>
          pool.submit(new Runnable {
            def run(): Unit = {
              barrier.await()
              ops.zipWithIndex.foreach { case (op, i) =>
                applyOp(shared, dir, s"$w$seed", op, i) }
            }
          })
        }.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
      } finally pool.shutdown()
      // ── serial replay: same streams, A fully, then B, then C, fresh
      // table; COPY INTO re-reads the SAME files the race loaded ──
      val replay = s"ccm_replay$seed"
      mkTable(replay, s"base_replay$seed")
      streams.foreach { case (ops, dir, w) =>
        ops.zipWithIndex.foreach { case (op, i) =>
          op match {
            case CopyOp(_, _, _) => // files already on disk; just re-copy
              spark.sql(
                s"""COPY INTO $replay FROM '$dir' FILEFORMAT = CSV
                    PATTERN = '*.csv' FORMAT_OPTIONS ('header' = 'true')""")
            case other => applyOp(replay, dir, s"r$w$seed", other, i)
          }
        }
      }
      def content(t: String) = spark.sql(s"SELECT k, p, CAST(v AS BIGINT) v FROM $t")
        .as[(Long, String, Long)].collect().toSeq
        .sortBy(r => (r._1, r._2, r._3))
      assert(content(shared) === content(replay),
        s"seed $seed: concurrent outcome diverged from the serial replay")
      // schema evolution commuted too: same column set, and every
      // writer-added column is all-NULL on both tables
      val sharedCols = spark.table(shared).columns.sorted.toSeq
      assert(sharedCols === spark.table(replay).columns.sorted.toSeq,
        s"seed $seed: schemas diverged")
      sharedCols.filter(c => c.startsWith("x_") || c.startsWith("rn_"))
        .foreach { c =>
          assert(spark.sql(
            s"SELECT count($c) FROM $shared").as[Long].head() === 0L,
            s"seed $seed: added/renamed column $c must read as typed NULLs")
        }
      // every racing rename COMPLETED: no pre-rename r_* name survives
      // (an incomplete rename would also have tripped the schema
      // equality above, but say it explicitly)
      assert(!sharedCols.exists(c => c.startsWith("r_") &&
        !c.startsWith("rn_")),
        s"seed $seed: a rename lost its second half mid-race")
      // ... and every racing add+drop COMPLETED: no d_* column survives
      assert(!sharedCols.exists(_.startsWith("d_")),
        s"seed $seed: a drop lost its second half mid-race")
      // maintenance epilogue: full-history vacuum + compaction leave
      // the rows bit-identical on both tables
      spark.sql(s"OPTIMIZE $shared")
      spark.sql(s"VACUUM $shared RETAIN 0 HOURS")
      assert(content(shared) === content(replay),
        s"seed $seed: epilogue maintenance changed the content")
      spark.sql(s"DROP TABLE $shared"); spark.sql(s"DROP TABLE $replay")
    }
  }
}
