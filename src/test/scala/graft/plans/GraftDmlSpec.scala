package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.ManifestVersioned

/** SQL DML over registered manifest tables: MERGE INTO (full ANSI
  * clause matrix — conditional UPDATE SET * / DELETE chains,
  * conditional INSERT *, NOT MATCHED BY SOURCE DELETE), UPDATE,
  * DELETE FROM and INSERT INTO resolve to the engine paths
  * (mergeVersionedMulti in source-wins mode, deleteRowsLocate,
  * appendRows/writeDeltaMulti) — one code path with the DataFrame
  * API, pinned here by direct equivalence on every clause
  * combination, a seeded randomized model check, and the loud-reject
  * contract for unsupported shapes.
  */
class GraftDmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private var n = 0
  /** Fresh registered table {k long, p string, v long} with rows
    * (k, p(k), k*10) for k in [0, 12), partitioned by p, key k.
    */
  private def fresh(): (String, String) = {
    n += 1
    val wh = Files.createTempDirectory("graft-dml").toString
    val df = (0L until 12L)
      .map(k => (k, if (k % 2 == 0) "a" else "b", k * 10L))
      .toDF("k", "p", "v")
    ManifestVersioned.writeFull(spark, wh, "t", df, "p")
    val name = GraftSqlTables.register(spark, wh, "t",
      asName = Some(s"dml_t$n"), keyCol = Some("k"))
    (wh, name)
  }

  private def content(wh: String): Set[(Long, String, Long)] =
    ManifestVersioned.read(spark, wh, "t").select("k", "p", "v")
      .as[(Long, String, Long)].collect().toSet

  private def base: Set[(Long, String, Long)] =
    (0L until 12L).map(k => (k, if (k % 2 == 0) "a" else "b", k * 10L)).toSet

  private def srcView(rows: Seq[(Long, String, Long, Boolean)],
      view: String): Unit =
    rows.toDF("k", "p", "v", "del").createOrReplaceTempView(view)

  // ── the MERGE matrix ────────────────────────────────────────────────

  test("MERGE upsert: UPDATE SET * + conditional DELETE + INSERT *") {
    val (wh, name) = fresh()
    srcView(Seq(
      (1L, "b", 111L, false),  // matched → update
      (4L, "a", 444L, false),  // matched → update
      (6L, "a", 0L, true),     // matched + del → delete
      (20L, "a", 200L, false), // unmatched → insert
      (21L, "x", 0L, true)     // unmatched → INSERT (ANSI: the DELETE
                               // clause needs a MATCH; del=true is
                               // just a value that lands)
    ), "dml_src1")
    val out = spark.sql(
      s"""MERGE INTO $name USING dml_src1 s ON $name.k = s.k
          WHEN MATCHED AND s.del THEN DELETE
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""").collect()
    assert(out.length === 1 && out(0).getInt(0) === 2) // committed v2
    // UPDATE SET * takes the full source row — the del flag column
    // evolves the schema additively (NULL on untouched rows); the
    // classifier's own column must NOT land
    val head = ManifestVersioned.read(spark, wh, "t")
    assert(!head.columns.exists(_.startsWith("__graft")),
      "the clause classifier column leaked into the table")
    val got = head.select("k", "p", "v", "del")
      .as[(Long, String, Long, Option[Boolean])].collect().toSet
    val want =
      base.filterNot(r => Set(1L, 4L, 6L, 20L).contains(r._1))
        .map { case (k, p, v) => (k, p, v, None: Option[Boolean]) } ++
      Set((1L, "b", 111L, Some(false)), (4L, "a", 444L, Some(false)),
        (20L, "a", 200L, Some(false)), (21L, "x", 0L, Some(true)))
    assert(got === want)
    // SQL path ≡ DataFrame path (the house three-way check): replay
    // the same source through mergeVersionedMulti(sourceWins) on a
    // twin, with the ANSI matched-ness pre-classified (the DataFrame
    // API's tombstone semantic is match-free by contract — a caller
    // expressing ANSI supplies the matched key set, here known: 1,4,6)
    val (wh2, _) = fresh()
    ManifestVersioned.mergeVersionedMulti(spark, wh2, "t",
      spark.table("dml_src1"), "k", Seq("p"), order = Nil,
      isTombstone = col("del") && col("k").isin(1L, 4L, 6L),
      sourceWins = true)
    assert(got === ManifestVersioned.read(spark, wh2, "t")
      .select("k", "p", "v", "del")
      .as[(Long, String, Long, Option[Boolean])].collect().toSet)
  }

  test("MERGE update+insert only: tombstone-free upsert, fast path") {
    val (wh, name) = fresh()
    srcView(Seq((3L, "b", 333L, false), (30L, "a", 300L, false)),
      "dml_src2")
    spark.sql(
      s"""MERGE INTO $name USING dml_src2 s ON $name.k = s.k
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
    assert(content(wh) === base.filterNot(_._1 == 3L) ++
      Set((3L, "b", 333L), (30L, "a", 300L)))
  }

  test("MERGE update-only: unmatched source rows do NOT insert") {
    val (wh, name) = fresh()
    srcView(Seq((2L, "a", 222L, false), (40L, "a", 400L, false)),
      "dml_src3")
    spark.sql(
      s"""MERGE INTO $name USING dml_src3 s ON $name.k = s.k
          WHEN MATCHED THEN UPDATE SET *""")
    assert(content(wh) === base.filterNot(_._1 == 2L) + ((2L, "a", 222L)),
      "k=40 must not appear")
  }

  test("MERGE insert-only: matched source rows do NOT update") {
    val (wh, name) = fresh()
    srcView(Seq((2L, "a", 999L, false), (50L, "b", 500L, false)),
      "dml_src4")
    spark.sql(
      s"""MERGE INTO $name USING dml_src4 s ON $name.k = s.k
          WHEN NOT MATCHED THEN INSERT *""")
    assert(content(wh) === base + ((50L, "b", 500L)),
      "k=2 must keep its original v=20")
  }

  test("MERGE conditional-delete-only: matched & !cond rows stay untouched") {
    val (wh, name) = fresh()
    srcView(Seq((2L, "a", 0L, true), (3L, "b", 0L, false),
      (60L, "a", 0L, true)), "dml_src5")
    spark.sql(
      s"""MERGE INTO $name USING dml_src5 s ON $name.k = s.k
          WHEN MATCHED AND s.del THEN DELETE""")
    assert(content(wh) === base.filterNot(_._1 == 2L),
      "only k=2 deletes; k=3 (cond false) keeps ORIGINAL values; k=60 inert")
  }

  test("MERGE unconditional DELETE: every matched key deletes") {
    val (wh, name) = fresh()
    srcView(Seq((0L, "a", 0L, false), (1L, "b", 0L, true),
      (70L, "a", 0L, false)), "dml_src6")
    spark.sql(
      s"""MERGE INTO $name USING dml_src6 s ON $name.k = s.k
          WHEN MATCHED THEN DELETE""")
    assert(content(wh) === base.filterNot(r => r._1 <= 1L))
  }

  test("MERGE multiple conditional DELETEs fold first-match-wins (OR)") {
    // the parser forbids an unconditional clause before a later one, so
    // the only multi-clause orders that reach resolution are
    // conditional-first — covered here and in the upsert test above
    val (wh, name) = fresh()
    srcView(Seq((5L, "b", 555L, true), (6L, "a", 666L, false),
      (7L, "b", 0L, false)), "dml_src7")
    spark.sql(
      s"""MERGE INTO $name USING dml_src7 s ON $name.k = s.k
          WHEN MATCHED AND s.del THEN DELETE
          WHEN MATCHED AND s.v = 0 THEN DELETE
          WHEN MATCHED THEN UPDATE SET *""")
    assert(content(wh) ===
      base.filterNot(r => Set(5L, 6L, 7L).contains(r._1)) + ((6L, "a", 666L)),
      "k=5 deletes by clause 1, k=7 by clause 2, k=6 updates")
  }

  test("MERGE column-list UPDATE: target row with assigned columns replaced") {
    val (wh, name) = fresh()
    srcView(Seq((1L, "b", 7L, false), (4L, "a", 5L, false)), "dml_srcA")
    // assignment reads BOTH sides: v := t.v + s.v; p stays the
    // TARGET's (unassigned → preserved, the ANSI contract — contrast
    // UPDATE SET *, which takes the full source row)
    spark.sql(
      s"""MERGE INTO $name USING dml_srcA s ON $name.k = s.k
          WHEN MATCHED THEN UPDATE SET v = $name.v + s.v""")
    assert(content(wh) ===
      base.filterNot(r => Set(1L, 4L).contains(r._1)) +
        ((1L, "b", 17L)) + ((4L, "a", 45L)),
      "assigned v = target v + source v; unassigned p/k preserved")
    // path equivalence with the DataFrame spelling: the same result is
    // rowsForKeys-join + replace through mergeVersionedMulti
    val (wh2, _) = fresh()
    val srcDf = Seq((1L, 7L), (4L, 5L)).toDF("k", "dv")
    val tgtRows = ManifestVersioned.rowsForKeys(spark, wh2, "t",
      srcDf.select("k"), "k")
    val change = tgtRows.join(srcDf.withColumnRenamed("k", "sk"),
        col("k") === col("sk"))
      .select(col("k"), col("p"), (col("v") + col("dv")).as("v"))
    ManifestVersioned.mergeVersionedMulti(spark, wh2, "t", change, "k",
      Seq("p"), order = Nil, isTombstone = lit(false), sourceWins = true)
    assert(content(wh2) === content(wh).map { case (k, p, v) => (k, p, v) })
  }

  test("MERGE column-list INSERT: NULL fill, ANSI casts, key required") {
    val (wh, name) = fresh()
    srcView(Seq((30L, "c", 3L, false), (31L, "c", 4L, false),
      (1L, "b", 9L, false)), "dml_srcB")
    // v unmentioned → NULL; expressions allowed as values; matched
    // rows (k=1) hit no matched clause → untouched
    spark.sql(
      s"""MERGE INTO $name USING dml_srcB s ON $name.k = s.k
          WHEN NOT MATCHED THEN INSERT (k, p) VALUES (s.k, concat(s.p, '!'))""")
    val got = ManifestVersioned.read(spark, wh, "t")
      .select("k", "p", "v").as[(Long, String, Option[Long])]
      .collect().toSet
    assert(got ===
      base.map { case (k, p, v) => (k, p, Some(v): Option[Long]) } +
        ((30L, "c!", None)) + ((31L, "c!", None)))
  }

  test("MERGE NOT MATCHED BY SOURCE UPDATE: absent target rows update in place") {
    val (wh, name) = fresh()
    // source carries keys 0..5 only; rows 6..11 are absent from source
    srcView((0L until 6L).map(k =>
      (k, if (k % 2 == 0) "a" else "b", k * 10L, false)), "dml_srcC")
    spark.sql(
      s"""MERGE INTO $name USING dml_srcC s ON $name.k = s.k
          WHEN NOT MATCHED BY SOURCE AND v >= 100 THEN UPDATE SET v = -v
          WHEN NOT MATCHED BY SOURCE AND v >= 80 THEN DELETE""")
    // 10,11 → v negated (first clause); 8,9 → deleted (second);
    // 6,7 → no clause → untouched; 0..5 matched → untouched
    assert(content(wh) ===
      base.filterNot(r => Set(8L, 9L, 10L, 11L).contains(r._1)) +
        ((10L, "a", -100L)) + ((11L, "b", -110L)))
  }

  test("MERGE matched condition may reference the target row") {
    val (wh, name) = fresh()
    srcView(Seq((1L, "b", 5L, false), (3L, "b", 500L, false)), "dml_srcD")
    // only update when the source value beats the target's (k=1: tgt
    // v=10 > 5 → skip; k=3: tgt v=30 < 500 → update)
    spark.sql(
      s"""MERGE INTO $name USING dml_srcD s ON $name.k = s.k
          WHEN MATCHED AND s.v > $name.v THEN UPDATE SET v = s.v""")
    assert(content(wh) === base.filterNot(_._1 == 3L) + ((3L, "b", 500L)))
  }

  test("MERGE rejects duplicate source keys (ANSI cardinality)") {
    val (_, name) = fresh()
    srcView(Seq((1L, "b", 1L, false), (1L, "b", 2L, false)), "dml_src8")
    val e = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO $name USING dml_src8 s ON $name.k = s.k
            WHEN MATCHED THEN UPDATE SET *""")
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("MERGE rejects unsupported shapes loudly") {
    val (_, name) = fresh()
    srcView(Seq((1L, "b", 1L, false)), "dml_src9")
    // non-key ON condition
    assert(intercept[IllegalArgumentException] {
      spark.sql(s"""MERGE INTO $name USING dml_src9 s ON $name.v = s.v
          WHEN MATCHED THEN UPDATE SET *""")
    }.getMessage.contains("registered with merge key"))
    // composite ON
    assert(intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO $name USING dml_src9 s
            ON $name.k = s.k AND $name.p = s.p
            WHEN MATCHED THEN UPDATE SET *""")
    }.getMessage.contains("single key equality"))
    // assigning a column the target does not have
    assert(intercept[IllegalArgumentException] {
      spark.sql(s"""MERGE INTO $name USING dml_src9 s ON $name.k = s.k
          WHEN MATCHED THEN UPDATE SET nosuch = s.v""")
    }.getMessage.contains("not in"))
    // assigning the merge key (a key change is a delete+insert)
    assert(intercept[IllegalArgumentException] {
      spark.sql(s"""MERGE INTO $name USING dml_src9 s ON $name.k = s.k
          WHEN MATCHED THEN UPDATE SET k = s.v""")
    }.getMessage.contains("merge key"))
    // a column-list INSERT that omits the merge key
    assert(intercept[IllegalArgumentException] {
      spark.sql(s"""MERGE INTO $name USING dml_src9 s ON $name.k = s.k
          WHEN NOT MATCHED THEN INSERT (p, v) VALUES (s.p, s.v)""")
    }.getMessage.contains("must include the merge key"))
    // a NOT MATCHED condition referencing the target (no target row)
    assert(intercept[IllegalArgumentException] {
      spark.sql(s"""MERGE INTO $name USING dml_src9 s ON $name.k = s.k
          WHEN NOT MATCHED AND $name.v > 5 THEN INSERT *""")
    }.getMessage.contains("no row in this clause"))
    // a NOT MATCHED BY SOURCE condition referencing the source
    assert(intercept[IllegalArgumentException] {
      spark.sql(s"""MERGE INTO $name USING dml_src9 s ON $name.k = s.k
          WHEN NOT MATCHED BY SOURCE AND s.v > 5 THEN DELETE""")
    }.getMessage.contains("no row in this clause"))
  }

  test("MERGE rejects assignments to GENERATED columns loudly (UPDATE " +
      "SET and column-list INSERT) — never silently discard-and-rederive") {
    n += 1
    val wh = Files.createTempDirectory("graft-dml").toString
    ManifestVersioned.writeFullMulti(spark, wh, "t",
      Seq((1L, java.sql.Timestamp.valueOf("2026-03-01 10:00:00")))
        .toDF("k", "ev")
        .withColumn("p_day", to_date(col("ev"))),
      Seq("p_day"),
      properties = Map("graft.generated.p_day" -> "days(ev)"))
    val name = GraftSqlTables.register(spark, wh, "t",
      asName = Some(s"dml_t$n"), keyCol = Some("k"))
    Seq((1L, java.sql.Timestamp.valueOf("2026-03-05 09:00:00")))
      .toDF("k", "ev").createOrReplaceTempView("dml_gen_src")
    // UPDATE SET on the generated column: the CASE-chain change
    // relation would NULL-fill it on non-assigning branches, so — per
    // the write-boundary contract — the assignment rejects instead of
    // being silently dropped and re-derived
    assert(intercept[IllegalArgumentException] {
      spark.sql(s"""MERGE INTO $name USING dml_gen_src s ON $name.k = s.k
          WHEN MATCHED THEN UPDATE SET p_day = DATE'1999-01-01'""")
    }.getMessage.contains("generated column 'p_day'"))
    // column-list INSERT naming it rejects the same way
    assert(intercept[IllegalArgumentException] {
      spark.sql(s"""MERGE INTO $name USING dml_gen_src s ON $name.k = s.k
          WHEN NOT MATCHED THEN INSERT (k, ev, p_day)
          VALUES (s.k, s.ev, DATE'1999-01-01')""")
    }.getMessage.contains("generated column 'p_day'"))
    // the sound spelling — omit it — re-derives per clause
    spark.sql(s"""MERGE INTO $name USING dml_gen_src s ON $name.k = s.k
        WHEN MATCHED THEN UPDATE SET ev = s.ev
        WHEN NOT MATCHED THEN INSERT (k, ev) VALUES (s.k, s.ev)""")
    assert(ManifestVersioned.read(spark, wh, "t")
      .select(col("p_day").cast("string")).as[String].head() ===
      "2026-03-05")
  }

  test("MERGE retries through racing writers: both batches survive") {
    val (wh, name) = fresh()
    // two writers upserting DISJOINT keys into the SAME partition,
    // interleaved: every commit is a read-modify-write over partition
    // 'a', so losers must re-run from the new head (the engine's
    // conflict path) — a lost update would drop a peer's key
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    def writer(id: Int): Future[Unit] = Future {
      (0 until 3).foreach { i =>
        val view = s"dml_race_${id}_$i"
        Seq((100L + id * 10 + i, "a", id * 1000L + i, false))
          .toDF("k", "p", "v", "del").createOrReplaceTempView(view)
        spark.sql(
          s"""MERGE INTO $name USING $view s ON $name.k = s.k
              WHEN MATCHED THEN UPDATE SET *
              WHEN NOT MATCHED THEN INSERT *""")
      }
    }
    Await.result(Future.sequence(Seq(writer(1), writer(2))), 5.minutes)
    val keys = content(wh).map(_._1)
    for (id <- 1 to 2; i <- 0 until 3)
      assert(keys.contains(100L + id * 10 + i),
        s"writer $id batch $i was lost to a concurrent commit")
  }

  test("MERGE conditional UPDATE: matched rows missing the condition " +
      "stay untouched") {
    val (wh, name) = fresh()
    srcView(Seq((2L, "a", 500L, false), (3L, "b", 5L, false)), "dml_srcA")
    spark.sql(
      s"""MERGE INTO $name USING dml_srcA s ON $name.k = s.k
          WHEN MATCHED AND s.v > 100 THEN UPDATE SET *""")
    val got = ManifestVersioned.read(spark, wh, "t").select("k", "p", "v")
      .as[(Long, String, Long)].collect().toSet
    assert(got === base.filterNot(_._1 == 2L) + ((2L, "a", 500L)),
      "k=3 (v=5, fails the condition) must keep its target row")
  }

  test("MERGE mixed conditional chain is first-match-wins across kinds") {
    val (wh, name) = fresh()
    // chain: DELETE if del; else UPDATE if v >= 100; else untouched
    srcView(Seq(
      (1L, "b", 999L, true),   // → delete (first clause wins)
      (2L, "a", 222L, false),  // → update (second clause)
      (3L, "b", 7L, false),    // → no clause → untouched
      (50L, "a", 500L, false)  // unmatched, insert cond v>=100 → insert
    ), "dml_srcB")
    spark.sql(
      s"""MERGE INTO $name USING dml_srcB s ON $name.k = s.k
          WHEN MATCHED AND s.del THEN DELETE
          WHEN MATCHED AND s.v >= 100 THEN UPDATE SET *
          WHEN NOT MATCHED AND s.v >= 100 THEN INSERT *""")
    val got = content(wh)
    assert(got === base.filterNot(r => Set(1L, 2L).contains(r._1)) ++
      Set((2L, "a", 222L), (50L, "a", 500L)))
  }

  test("MERGE conditional INSERT: unmatched rows failing the condition " +
      "do not insert") {
    val (wh, name) = fresh()
    srcView(Seq((60L, "a", 600L, false), (61L, "a", 6L, false)),
      "dml_srcC")
    spark.sql(
      s"""MERGE INTO $name USING dml_srcC s ON $name.k = s.k
          WHEN NOT MATCHED AND s.v >= 100 THEN INSERT *""")
    assert(content(wh) === base + ((60L, "a", 600L)), "k=61 fails cond")
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE THEN DELETE sweeps absent keys " +
      "in the same commit") {
    val (wh, name) = fresh()
    // source carries keys 0..5 only; sweep deletes target keys 6..11
    // with v >= 80 (condition over the TARGET row), updates 0..5
    srcView((0L until 6L).map(k =>
      (k, if (k % 2 == 0) "a" else "b", k * 100L, false)), "dml_srcD")
    val out = spark.sql(
      s"""MERGE INTO $name USING dml_srcD s ON $name.k = s.k
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED BY SOURCE AND v >= 80 THEN DELETE""").collect()
    assert(out.length === 1 && out(0).getInt(0) === 2,
      "update + sweep must be ONE committed version")
    val got = content(wh)
    val want =
      (0L until 6L).map(k =>
        (k, if (k % 2 == 0) "a" else "b", k * 100L)).toSet ++
      base.filter(r => r._1 >= 6L && r._3 < 80L)
    assert(got === want, "6,7 (v=60,70) survive; 8..11 swept")
  }

  test("MERGE NOT MATCHED BY SOURCE without a condition empties the " +
      "source-absent remainder") {
    val (wh, name) = fresh()
    srcView(Seq((0L, "a", 1L, false)), "dml_srcE")
    spark.sql(
      s"""MERGE INTO $name USING dml_srcE s ON $name.k = s.k
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(content(wh) === Set((0L, "a", 1L)))
  }

  test("randomized MERGE agrees with an in-memory ANSI model (seeded)") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val (wh, name) = fresh() // target keys 0..11, v = k*10
      val srcRows = rnd.shuffle((0L to 20L).toList).take(10).map { k =>
        (k, if (k % 2 == 0) "a" else "b", rnd.nextInt(1000).toLong,
          rnd.nextBoolean(), rnd.nextBoolean())
      }
      srcRows.toDF("k", "p", "v", "f1", "f2")
        .createOrReplaceTempView(s"dml_rand$seed")
      val withSweep = seed % 2 == 0
      val sweepCut = rnd.nextInt(120).toLong
      spark.sql(
        s"""MERGE INTO $name USING dml_rand$seed s ON $name.k = s.k
            WHEN MATCHED AND s.f1 THEN DELETE
            WHEN MATCHED AND s.f2 THEN UPDATE SET *
            WHEN NOT MATCHED AND s.v >= 300 THEN INSERT *""" +
          (if (withSweep)
            s" WHEN NOT MATCHED BY SOURCE AND v >= $sweepCut THEN DELETE"
          else ""))
      // the ANSI model, row by row
      val srcByKey = srcRows.map(r => r._1 -> r).toMap
      type Out = (Long, String, Long, Option[Boolean], Option[Boolean])
      val fromTarget: Seq[Out] = base.toSeq.flatMap { case (k, p, v) =>
        srcByKey.get(k) match {
          case Some((_, sp, sv, f1, f2)) =>
            if (f1) None // first clause wins: delete
            else if (f2) Some((k, sp, sv, Some(f1), Some(f2))) // update
            else Some((k, p, v, None, None)) // no clause: untouched
          case None =>
            if (withSweep && v >= sweepCut) None // swept
            else Some((k, p, v, None, None))
        }
      }
      val inserted: Seq[Out] = srcRows.collect {
        case (k, p, v, f1, f2)
            if !base.exists(_._1 == k) && v >= 300 =>
          (k, p, v, Some(f1), Some(f2))
      }
      // an all-no-clause draw commits nothing, so f1/f2 may not have
      // evolved into the schema — decode them as absent-means-NULL
      val head = ManifestVersioned.read(spark, wh, "t")
      val decoded = Seq("f1", "f2").foldLeft(head) { (d, c) =>
        if (d.columns.contains(c)) d
        else d.withColumn(c, lit(null).cast("boolean"))
      }
      val got = decoded.select("k", "p", "v", "f1", "f2")
        .as[(Long, String, Long, Option[Boolean], Option[Boolean])]
        .collect().toSet
      assert(got === (fromTarget ++ inserted).toSet, s"seed $seed")
    }
  }

  test("randomized COLUMN-LIST MERGE agrees with an in-memory ANSI model (seeded)") {
    for (seed <- 11 to 16) {
      val rnd = new scala.util.Random(seed)
      val (wh, name) = fresh() // target keys 0..11, v = k*10
      val srcRows = rnd.shuffle((0L to 20L).toList).take(10).map { k =>
        (k, if (k % 2 == 0) "a" else "b", rnd.nextInt(1000).toLong,
          rnd.nextBoolean())
      }
      srcRows.toDF("k", "p", "v", "f1")
        .createOrReplaceTempView(s"dml_randc$seed")
      val cut = rnd.nextInt(120).toLong
      // column-list everywhere: both-sides update values, a
      // target-reading condition, a NULL-filling insert list, and a
      // NOT-MATCHED-BY-SOURCE UPDATE chain
      spark.sql(
        s"""MERGE INTO $name USING dml_randc$seed s ON $name.k = s.k
            WHEN MATCHED AND s.f1 THEN UPDATE SET v = $name.v + s.v
            WHEN MATCHED AND $name.v >= $cut THEN DELETE
            WHEN NOT MATCHED AND s.v >= 300
              THEN INSERT (k, p) VALUES (s.k, concat(s.p, '_i'))
            WHEN NOT MATCHED BY SOURCE AND v < $cut
              THEN UPDATE SET v = -v""")
      val srcByKey = srcRows.map(r => r._1 -> r).toMap
      type Out = (Long, String, Option[Long])
      val fromTarget: Seq[Out] = base.toSeq.flatMap { case (k, p, v) =>
        srcByKey.get(k) match {
          case Some((_, _, sv, f1)) =>
            if (f1) Some((k, p, Some(v + sv))) // update: p stays TARGET's
            else if (v >= cut) None // second clause: delete
            else Some((k, p, Some(v))) // no clause: untouched
          case None =>
            if (v < cut) Some((k, p, Some(-v))) // NMBS update
            else Some((k, p, Some(v)))
        }
      }
      val inserted: Seq[Out] = srcRows.collect {
        case (k, p, v, _) if !base.exists(_._1 == k) && v >= 300 =>
          (k, p + "_i", None) // v unmentioned in the insert list: NULL
      }
      val got = ManifestVersioned.read(spark, wh, "t")
        .select("k", "p", "v").as[(Long, String, Option[Long])]
        .collect().toSet
      assert(got === (fromTarget ++ inserted).toSet, s"seed $seed")
    }
  }

  // ── DELETE FROM ─────────────────────────────────────────────────────

  test("DELETE FROM erases by predicate via delete vectors, not rewrites") {
    val (wh, name) = fresh()
    val out = spark.sql(s"DELETE FROM $name WHERE v >= 40 AND p = 'a'")
      .collect()
    assert(out(0).getInt(0) === 2) // committed version
    assert(content(wh) === base.filterNot(r => r._3 >= 40 && r._2 == "a"))
    // merge-on-read: partition 'a' gained a VECTOR; its generation dir
    // is untouched (O(delete bytes), not a rewrite)
    val entries = ManifestVersioned.manifestEntries(spark, wh, "t")
    assert(entries(ManifestVersioned.keyOf("a")).deletes.nonEmpty)
    val v1 = ManifestVersioned.manifestEntries(spark, wh, "t", Some(1))
    assert(entries(ManifestVersioned.keyOf("a")).dir ===
      v1(ManifestVersioned.keyOf("a")).dir)
    // qualified spelling resolves too; deleting nothing commits nothing
    val before = ManifestVersioned.currentVersion(spark, wh, "t")
    spark.sql(s"DELETE FROM $name WHERE $name.k = 99999")
    assert(ManifestVersioned.currentVersion(spark, wh, "t") === before)
  }

  test("DELETE FROM without a registered merge key refuses loudly") {
    val wh = Files.createTempDirectory("graft-dml-nokey").toString
    ManifestVersioned.writeFull(spark, wh, "t",
      Seq((1L, "a", 1L)).toDF("k", "p", "v"), "p")
    GraftSqlTables.register(spark, wh, "t", asName = Some("dml_nokey"))
    val e = intercept[IllegalArgumentException] {
      spark.sql("DELETE FROM dml_nokey WHERE k = 1")
    }
    assert(e.getMessage.contains("merge key"))
  }

  // ── INSERT ──────────────────────────────────────────────────────────

  test("INSERT INTO appends; untouched partitions are reused by reference") {
    val (wh, name) = fresh()
    val v1 = ManifestVersioned.manifestEntries(spark, wh, "t")
    spark.sql(s"INSERT INTO $name VALUES (100, 'a', 1000), (101, 'a', 1010)")
    assert(content(wh) === base ++ Set((100L, "a", 1000L), (101L, "a", 1010L)))
    val v2 = ManifestVersioned.manifestEntries(spark, wh, "t")
    assert(v2(ManifestVersioned.keyOf("b")) ===
      v1(ManifestVersioned.keyOf("b")),
      "partition b untouched — its entry must be reused byte-identical")
    assert(v2(ManifestVersioned.keyOf("a")).dir !==
      v1(ManifestVersioned.keyOf("a")).dir)
    // duplicate keys coexist (SQL INSERT has no key semantics)
    spark.sql(s"INSERT INTO $name VALUES (100, 'a', 9999)")
    assert(content(wh).count(_._1 == 100L) === 2)
  }

  test("INSERT column list, static PARTITION spec, and OVERWRITE semantics") {
    val (wh, name) = fresh()
    // column list: unmentioned columns insert NULL — but v is long in
    // a non-null base; recorded schema normalizes nullable, so NULL ok
    spark.sql(s"INSERT INTO $name (k, p) VALUES (200, 'b')")
    assert(ManifestVersioned.read(spark, wh, "t")
      .filter(col("k") === 200).select("v").collect()(0).isNullAt(0))
    // the k=200 row has NULL v from here on — read with a null-safe
    // decoder
    def contentN: Set[(Long, String, Option[Long])] =
      ManifestVersioned.read(spark, wh, "t").select("k", "p", "v")
        .as[(Long, String, Option[Long])].collect().toSet
    // static partition spec: positional columns exclude p
    spark.sql(s"INSERT INTO $name PARTITION (p = 'c') VALUES (300, 3000)")
    assert(contentN.contains((300L, "c", Some(3000L))))
    // OVERWRITE replaces exactly the partitions the rows land in
    spark.sql(s"INSERT OVERWRITE $name VALUES (400, 'c', 4000)")
    val got = contentN
    assert(got.filter(_._2 == "c") === Set((400L, "c", Some(4000L))),
      "partition c replaced wholesale")
    assert(got.filter(_._2 == "b").size === base.count(_._2 == "b") + 1,
      "partitions a/b untouched by the dynamic overwrite")
    // values cast to the recorded column types (ANSI INSERT coercion)
    spark.sql(s"INSERT INTO $name VALUES (CAST(500 AS INT), 'c', '5000')")
    assert(contentN.contains((500L, "c", Some(5000L))))
  }

  // ── UPDATE ──────────────────────────────────────────────────────────

  test("UPDATE applies self-referencing assignments to matching rows") {
    val (wh, name) = fresh()
    val out = spark.sql(
      s"UPDATE $name SET v = v * 2 + k WHERE k >= 6 AND p = 'a'").collect()
    assert(out.length === 1 && out(0).getInt(0) === 2)
    assert(content(wh) === base.map {
      case (k, p, v) if k >= 6 && p == "a" => (k, p, v * 2 + k)
      case r => r
    })
  }

  test("UPDATE without WHERE touches every row; values cast to the " +
      "recorded column type") {
    val (wh, name) = fresh()
    spark.sql(s"UPDATE $name SET v = '7'") // string literal → long column
    assert(content(wh) === base.map { case (k, p, _) => (k, p, 7L) })
  }

  test("UPDATE assigning a partition column moves rows between partitions") {
    val (wh, name) = fresh()
    spark.sql(s"UPDATE $name SET p = 'c' WHERE k = 1")
    val got = content(wh)
    assert(got.contains((1L, "c", 10L)) && !got.exists(
      r => r._1 == 1L && r._2 == "b"))
    assert(got.size === base.size)
  }

  test("UPDATE rejects key assignment, unknown columns, duplicate sets") {
    val (_, name) = fresh()
    assert(intercept[Exception] {
      spark.sql(s"UPDATE $name SET k = k + 100")
    }.getMessage.contains("merge key"))
    assert(intercept[Exception] {
      spark.sql(s"UPDATE $name SET nope = 1").collect()
    }.getMessage.contains("nope"))
    assert(intercept[Exception] {
      spark.sql(s"UPDATE $name SET v = 1, v = 2")
    }.getMessage.contains("twice"))
  }
}
