package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the two halves of exact heavy-hitter detection:
  *  - the Misra-Gries aggregate's SUPERSET guarantee (every key with
  *    count > N/(k+1) appears among the ≤k candidates) across hostile
  *    arrival orders and partitionings;
  *  - [[SketchState.heavyHitters]]'s exact, partitioning-invariant output
  *    (the confirm pass removes candidate-set noise).
  */
class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkDf(tokens: Seq[String], parts: Int) =
    tokens.toDF("tok").repartition(parts)

  /** zipf-ish corpus: "h1" 40%, "h2" 25%, tail of singletons. */
  private def corpus: Seq[String] =
    Seq.fill(400)("h1") ++ Seq.fill(250)("h2") ++
      (1 to 350).map(i => s"t$i")

  test("mg_sketch candidates are a superset of true heavy hitters, any layout") {
    graft.functions.MisraGriesExpressions.register(spark)
    for (parts <- Seq(1, 3, 32); order <- Seq("asis", "sorted", "reversed")) {
      val toks = order match {
        case "asis" => corpus
        case "sorted" => corpus.sorted
        case "reversed" => corpus.reverse
      }
      val cands = mkDf(toks, parts)
        .agg(expr("mg_sketch(tok, 4)")).as[Seq[String]].head()
      assert(cands.size <= 4, s"layout $parts/$order overflowed k")
      // true > N/5 (=200) hitters: h1 (400), h2 (250)
      assert(Set("h1", "h2").subsetOf(cands.toSet),
        s"layout $parts/$order lost a heavy hitter: $cands")
    }
  }

  test("heavyHitters is exact and partitioning-invariant") {
    val want = Map("h1" -> 400L, "h2" -> 250L) // > 1000/5
    for (parts <- Seq(1, 7, 32)) {
      val got = SketchState.heavyHitters(mkDf(corpus, parts), col("tok"), k = 4)
        .as[(String, Long)].collect().toMap
      assert(got === want, s"parts=$parts")
    }
  }

  test("heavyHitters matches brute force on a threshold-edge corpus") {
    // N=100, k=9 → keep count*10 > 100, i.e. count >= 11: "a" (30) and
    // "b" (11) qualify; "c" sits exactly AT N/(k+1)=10 and must NOT
    val toks = Seq.fill(30)("a") ++ Seq.fill(11)("b") ++ Seq.fill(10)("c") ++
      (1 to 49).map(i => s"x$i")
    val got = SketchState.heavyHitters(mkDf(toks, 5), col("tok"), k = 9)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 30L, "b" -> 11L))
  }

  test("empty and all-null inputs yield empty output") {
    val empty = SketchState.heavyHitters(
      Seq.empty[String].toDF("tok"), col("tok"), 3)
    assert(empty.count() === 0)
    val nulls = SketchState.heavyHitters(
      Seq[Option[String]](None, None).toDF("tok"), col("tok"), 3)
    assert(nulls.count() === 0)
  }

  test("stored summaries: chain ≡ from-scratch; candidates superset; replay inert") {
    val wh = java.nio.file.Files.createTempDirectory("graft-hh").toString
    // three hostile batches: h1 concentrated early, h2 spread, churny tail
    val b0 = Seq.fill(300)("h1") ++ (1 to 120).map(i => s"t$i")
    val b1 = Seq.fill(100)("h1") ++ Seq.fill(130)("h2") ++ (121 to 230).map(i => s"t$i")
    val b2 = Seq.fill(120)("h2") ++ (231 to 350).map(i => s"t$i")
    SketchState.createHhState(spark, wh, "hh", mkDf(b0, 3), col("tok"), 4)
    SketchState.appendHhState(spark, wh, "hh", mkDf(b1, 5), col("tok"), 4, "n2")
    SketchState.appendHhState(spark, wh, "hh", mkDf(b2, 2), col("tok"), 4, "n3")

    val all = b0 ++ b1 ++ b2 // N=1000; >200: h1 (400), h2 (250)
    assert(SketchState.hhStateTotal(spark, wh, "hh") === all.size.toLong)
    val cands = SketchState.readHhCandidates(spark, wh, "hh", 4)
      .select("key").as[String].collect().toSet
    assert(cands.size <= 4)
    assert(Set("h1", "h2").subsetOf(cands), s"merged summary lost a hitter: $cands")

    val got = SketchState.storedHeavyHitters(spark, wh, "hh",
      mkDf(all, 8), col("tok"), 4).as[(String, Long)].collect().toMap
    val want = SketchState.heavyHitters(mkDf(all, 8), col("tok"), 4)
      .as[(String, Long)].collect().toMap
    assert(got === want)
    assert(got === Map("h1" -> 400L, "h2" -> 250L))

    // at-least-once replay: the batch REPLACES its own partition
    SketchState.appendHhState(spark, wh, "hh", mkDf(b2, 7), col("tok"), 4, "n3")
    assert(SketchState.hhStateTotal(spark, wh, "hh") === all.size.toLong)
    assert(SketchState.storedHeavyHitters(spark, wh, "hh",
      mkDf(all, 8), col("tok"), 4).as[(String, Long)].collect().toMap === want)

    // an EMPTY batch keeps the state readable (marker row filtered at read)
    SketchState.appendHhState(spark, wh, "hh",
      mkDf(Nil, 1), col("tok"), 4, "n4")
    assert(SketchState.hhStateTotal(spark, wh, "hh") === all.size.toLong)
    assert(SketchState.storedHeavyHitters(spark, wh, "hh",
      mkDf(all, 8), col("tok"), 4).as[(String, Long)].collect().toMap === want)
  }

  test("windowed stored heavy hitters: exact over the window, prunes partitions") {
    val wh = java.nio.file.Files.createTempDirectory("graft-hhw").toString
    val b0 = Seq.fill(300)("h1") ++ (1 to 120).map(i => s"t$i")
    val b1 = Seq.fill(100)("h1") ++ Seq.fill(130)("h2") ++ (121 to 230).map(i => s"t$i")
    val b2 = Seq.fill(120)("h2") ++ (231 to 350).map(i => s"t$i")
    SketchState.createHhState(spark, wh, "hw", mkDf(b0, 3), col("tok"), 4)
    SketchState.appendHhState(spark, wh, "hw", mkDf(b1, 5), col("tok"), 4, "n2")
    SketchState.appendHhState(spark, wh, "hw", mkDf(b2, 2), col("tok"), 4, "n3")

    // window = n2 ∪ n3: N=580, threshold 116 — h2 (250) qualifies, h1
    // (100, window count only) correctly does NOT, though it dominates
    // the full history: the window genuinely changes the answer
    val win = b1 ++ b2
    assert(SketchState.hhStateTotalWindow(spark, wh, "hw", Seq("n2", "n3"))
      === win.size.toLong)
    val got = SketchState.storedHeavyHittersWindow(spark, wh, "hw",
      mkDf(win, 8), col("tok"), 4, Seq("n2", "n3"))
      .as[(String, Long)].collect().toMap
    val want = SketchState.heavyHitters(mkDf(win, 8), col("tok"), 4)
      .as[(String, Long)].collect().toMap
    assert(got === want, "windowed read must equal from-scratch over the window")
    assert(got === Map("h2" -> 250L))
    // h1 IS a full-history heavy hitter — the window genuinely differs
    assert(SketchState.storedHeavyHitters(spark, wh, "hw",
        mkDf(b0 ++ win, 8), col("tok"), 4)
      .as[(String, Long)].collect().toMap.contains("h1"))
    // the window's candidate merge partition-prunes the summary scan
    val cands = SketchState.readHhCandidatesWindow(spark, wh, "hw", 4,
      Seq("n2", "n3"))
    cands.count()
    val scan = cands.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*_ingest_batch[^\\]]*\\]".r
      .findFirstIn(scan).isDefined,
      s"window must land in PartitionFilters:\n$scan")
  }

  test("heavyHittersGrouped: per-group exact, matches per-group brute force") {
    // group g1: h1 heavy; group g2: different heavy key, different N
    val rows = (Seq.fill(50)("h1") ++ (1 to 50).map(i => s"t$i")).map(("g1", _)) ++
      (Seq.fill(30)("h2") ++ Seq.fill(8)("h1") ++ (1 to 22).map(i => s"u$i")).map(("g2", _))
    val df = rows.toDF("g", "tok").repartition(9)
    val got = SketchState.heavyHittersGrouped(df, "g", col("tok"), k = 4)
      .as[(String, String, Long)].collect().toSet
    // g1: N=100, keep cnt*5 > 100 -> h1 (50); g2: N=60, h2 (30) qualifies,
    // h1 (8) does NOT (8*5=40 < 60) — per-group thresholds, not global
    assert(got === Set(("g1", "h1", 50L), ("g2", "h2", 30L)))
  }

  test("mg_sketch_wt weights under-count by at most (N - M)/(k+1)") {
    graft.functions.MisraGriesExpressions.register(spark)
    val toks = corpus
    val m = mkDf(toks, 6).agg(expr("mg_sketch_wt(tok, 4)"))
      .as[Map[String, Long]].head()
    val n = toks.size.toLong
    val mSum = m.values.sum
    val truth = toks.groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
    m.foreach { case (key, wt) =>
      val t = truth(key)
      assert(wt <= t, s"$key weight $wt exceeds true count $t")
      assert(t - wt <= (n - mSum) / 5 + 1, s"$key under-counts too far")
    }
  }
}
