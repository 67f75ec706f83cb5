package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every declared query on SPARK_GRAFT_SF_DIR, one
  * JSON line on stdout plus the COMPLETE per-sample record written to
  * `bench/last_run.json` (committed each round, so regression audits and
  * wave forensics read from an artifact instead of a truncated stdout
  * tail).
  *
  * Timing policy. This container shows noisy-neighbor STARVATION WAVES —
  * minutes-long windows where identical work runs 10-100× slower (load >25
  * with zero local processes). Back-to-back samples of one query land in
  * the same wave, so per-query resampling alone cannot recover the true
  * time (r2: a 1.5 s query measured 218 s twice in a row). Instead samples
  * are taken in PASSES over the whole query list: consecutive samples of
  * the same query are separated by a full pass (~minutes), decorrelating
  * them from any single wave. Per query: stop early once the two fastest
  * samples agree within 20% (min then measures the engine), hard floor 3 /
  * cap 5 samples, report the min.
  *
  * Per-sample evidence (r9): every sample records (pass index, wall-clock
  * start, setup seconds, query seconds) and ALL of them persist to the
  * sidecar — so the wave theory is decidable from the artifact: a
  * wave-hit query shows a bimodal sample array (some passes inflated,
  * some not), a genuinely-slow query shows flat samples. Two rounds of
  * unfalsifiable claims about `q_canonical_docs` end here.
  */
object Bench {
  /** Parse the PRIOR run's sidecar: its sf dir and per-query min_s.
    * Minimal-regex (no JSON lib in the dependency budget); malformed
    * or missing input degrades to "no prior" — the gate must never
    * fail the bench itself.
    */
  private[graft] def parsePrior(txt: String): (Option[String], Map[String, Double]) = {
    val sf = "\"sf\":\"([^\"]+)\"".r.findFirstMatchIn(txt).map(_.group(1))
    val mins = "\"([A-Za-z0-9_]+)\":\\{\"min_s\":(-?[0-9.]+)".r
      .findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    (sf, mins)
  }

  private[graft] val RegrRatio = 1.5
  private[graft] val RegrFloorS = 0.5

  /** The regression gate: this run's min vs the prior recorded run's,
    * per query — ratio > [[RegrRatio]] with a [[RegrFloorS]] floor on
    * the slower side (sub-half-second queries are noise-dominated at
    * this grain). Prior runs at a DIFFERENT sf dir are incomparable
    * and gate nothing. Returns (query, prior_s, now_s) sorted
    * worst-ratio first.
    */
  private[graft] def regressionsOf(results: Seq[(String, Double)],
      sfDir: String, priorSf: Option[String],
      priorMin: Map[String, Double]): Seq[(String, Double, Double)] =
    if (!priorSf.contains(sfDir)) Nil
    else results.collect {
      // p must be STRICTLY positive: a 0.0 prior (sub-ms query, or a
      // failed -1 sentinel) would put Infinity in the emitted JSON
      case (k, v) if v >= RegrFloorS && priorMin.get(k).exists(p =>
        p > 0 && v > p * RegrRatio) => (k, priorMin(k), v)
    }.sortBy { case (_, p, v) => -(v / p) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench/last_run.json")
    // PRIOR run (the sidecar about to be overwritten) read FIRST: the
    // per-query regression gate compares this run's min_s against it.
    // The 2× rule used to live only in the judge loop — a regression
    // shipped a whole round before anyone saw it; this self-check puts
    // it in the bench artifact itself. Minimal-regex parse (no JSON
    // lib in the dependency budget); prior runs at a DIFFERENT sf dir
    // are incomparable and skip the gate.
    val (priorSf, priorMin): (Option[String], Map[String, Double]) =
      try {
        val p = java.nio.file.Paths.get(outPath)
        if (!java.nio.file.Files.exists(p)) (None, Map.empty)
        else parsePrior(new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8))
      } catch { case scala.util.control.NonFatal(_) => (None, Map.empty) }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val declared = SparkEntry.declared
    val benchT0 = System.currentTimeMillis()
    // Stateful queries declare a setup phase (state seeding); it is re-run
    // before EVERY sample (fn assumes a pristine seed) and timed
    // separately, so `queries` carries the operator's own cost and the
    // `setup` map carries the fixture cost. Total = setup + query, keeping
    // round-over-round totals comparable with the pre-split rounds.
    def timeOnce(name: String): (Double, Double) = {
      val q = declared(name)
      // Library builders cache() intermediates they consume more than once
      // (callers own cleanup); dropping them between samples — in a finally,
      // so failed samples clean up too — keeps ~300 invocations from
      // accumulating storage AND keeps every sample an honest cold run (a
      // later sample must not reuse an earlier sample's cached subtree via
      // plan-identity matching).
      try {
        val s0 = System.nanoTime()
        q.setup.foreach(st => st(spark, sfDir))
        val setupS = (System.nanoTime() - s0) / 1e9
        val t0 = System.nanoTime()
        q.fn(spark, sfDir).count()
        (setupS, (System.nanoTime() - t0) / 1e9) // timed BEFORE the cleanup
      } catch { case _: Throwable => (-1.0, -1.0) }
      finally spark.sharedState.cacheManager.clearCache()
    }
    val names = declared.keys.toSeq.sorted
    /** One timed sample: which pass took it, when it started (seconds
      * since bench start — wall-clock offsets are what locate a
      * starvation wave), and the split timings.
      */
    case class Sample(pass: Int, atS: Double, setupS: Double, queryS: Double)
    val samples = scala.collection.mutable.Map(
      names.map(_ -> scala.collection.mutable.ArrayBuffer.empty[Sample]): _*)
    val failed = scala.collection.mutable.Set.empty[String]
    val MinSamples = 3
    val MaxSamples = 5
    for (pass <- 1 to MaxSamples; name <- names if !failed(name)) {
      val s = samples(name)
      val sorted = s.map(_.queryS).sorted.toIndexedSeq
      val stable = s.size >= MinSamples && sorted(1) <= sorted(0) * 1.2
      if (!stable && s.size < MaxSamples) {
        val atS = (System.currentTimeMillis() - benchT0) / 1000.0
        val (st, t) = timeOnce(name)
        if (t < 0) failed += name
        else s += Sample(pass, atS, st, t)
      }
    }
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val results = names.map { name =>
      val s = samples(name)
      (name,
        if (failed(name) || s.isEmpty) -1.0 else r3(s.map(_.queryS).min),
        s.size)
    }
    val setupMin: Map[String, Double] = names.flatMap { name =>
      val st = samples(name)
      if (declared(name).setup.isEmpty || failed(name) || st.isEmpty) None
      else Some(name -> r3(st.map(_.setupS).min))
    }.toMap
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val ns = results.map { case (k, _, n) => "\"" + k + "\":" + n }
      .mkString("{", ",", "}")
    val setups = setupMin.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = r3(results.map(_._2).filter(_ >= 0).sum +
      setupMin.values.sum)
    val slow10 = results.filter(_._2 >= 0).sortBy(-_._2).take(10)
      .map { case (k, v, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // the regression gate: min-of-passes already decorrelates
    // starvation waves, so a flagged entry is a real plan/code change
    // until proven otherwise.
    val regressions = regressionsOf(
      results.map { case (k, v, _) => (k, v) }, sfDir, priorSf, priorMin)
    val regrJson = regressions
      .map { case (k, p, v) => "{\"q\":\"" + k + "\",\"prior_s\":" + p +
        ",\"now_s\":" + v + ",\"ratio\":" + r3(v / p) + "}" }
      .mkString("[", ",", "]")
    if (regressions.nonEmpty)
      System.err.println(s"BENCH REGRESSION GATE: ${regressions.size} " +
        s"query(ies) slower than ${RegrRatio}x the prior recorded run " +
        s"(floor ${RegrFloorS}s): " + regressions.map { case (k, p, v) =>
          f"$k $p%.2f->$v%.2f" }.mkString(", "))
    // FULL per-query artifact: min + every sample with its pass index
    // and wall offset. The driver snapshot keeps only a 2000-char stdout
    // tail, which truncated the per-query map from r8 on — this sidecar
    // is the durable record a round-over-round regression audit (and the
    // wave-vs-genuinely-slow question) needs. Committed by the round's
    // snapshot; path in the stdout JSON (`full_results`).
    val fullJson = {
      val per = names.map { name =>
        val s = samples(name)
        val arr = s.map(x => "{\"pass\":" + x.pass + ",\"at_s\":" +
          r3(x.atS) + ",\"setup_s\":" + r3(x.setupS) + ",\"query_s\":" +
          r3(x.queryS) + "}").mkString("[", ",", "]")
        val minQ = if (failed(name) || s.isEmpty) -1.0
          else r3(s.map(_.queryS).min)
        "\"" + name + "\":{\"min_s\":" + minQ +
          setupMin.get(name).map(v => ",\"setup_min_s\":" + v).getOrElse("") +
          ",\"samples\":" + arr + "}"
      }.mkString("{", ",", "}")
      "{\"sf\":\"" + sfDir + "\",\"cpus\":" + cpus +
        ",\"started_epoch_ms\":" + benchT0 +
        ",\"wall_s\":" + r3((System.currentTimeMillis() - benchT0) / 1000.0) +
        ",\"total_s\":" + total + ",\"failed\":" + failed.size +
        ",\"regressions\":" + regrJson +
        ",\"queries\":" + per + "}"
    }
    try {
      val p = java.nio.file.Paths.get(outPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p,
        fullJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"bench sidecar write failed ($outPath): $e")
    }
    // The driver's capture keeps only the TAIL of stdout (r2 and r4 both
    // lost the total + per-query timings to 2000-char truncation, keeping
    // just the sample-count map that happened to sit last). Defense in
    // depth: a human headline first for anyone reading the log top-down,
    // then ONE JSON line (the driver contract) whose KEY ORDER puts the
    // headline facts — setup split, slowest-10, failure count, total — at
    // the END of the line, inside any tail window. Key order is irrelevant
    // to a JSON parser, decisive for a truncated-text capture. The full
    // per-sample record lives in the sidecar (`full_results`).
    println(s"BENCH HEADLINE: total_s=$total queries=${names.size} failed=${failed.size} regressions=${regressions.size} sf=$sfDir full_results=$outPath slowest10=$slow10 setup_s=$setups")
    println(s"""{"samples":$ns,"queries":$qs,"runs_policy":"interleaved passes; per query min, stop when 2 fastest within 20%, 3..5 samples (floor 3 so one starvation wave cannot latch two adjacent-pass samples as converged); stateful queries re-seed per sample, seed time under setup_s (total = setup + query); ALL samples with pass+wall offsets in the full_results sidecar; regressions = queries >1.5x the prior recorded run's min (0.5s floor)","sf":"$sfDir","setup_s":$setups,"failed":${failed.size},"regressions":$regrJson,"slowest10":$slow10,"full_results":"$outPath","metric":"total","unit":"sec","value":$total}""")
    spark.stop()
  }
}
