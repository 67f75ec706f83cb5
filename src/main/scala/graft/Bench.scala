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
  /** Everything the gate needs from a PRIOR run's sidecar. `cpus` and
    * `calibration` are Options because pre-r12 sidecars lack them —
    * an absent cpus makes the prior INCOMPARABLE (the r11 lesson: a
    * 32-cpu driver run gated against a 4-cpu builder run emitted fake
    * 3× "regressions" into a durable artifact), an absent calibration
    * just skips drift normalization.
    */
  private[graft] case class Prior(sf: Option[String], cpus: Option[String],
      calibration: Option[Double], mins: Map[String, Double])

  /** Parse a PRIOR run's sidecar: sf dir, cpu count, calibration probe
    * and per-query min_s. Minimal-regex (no JSON lib in the dependency
    * budget); malformed or missing input degrades to "no prior" — the
    * gate must never fail the bench itself.
    */
  private[graft] def parsePrior(txt: String): Prior = {
    val sf = "\"sf\":\"([^\"]+)\"".r.findFirstMatchIn(txt).map(_.group(1))
    val cpus = "\"cpus\":\"?([0-9]+)".r.findFirstMatchIn(txt).map(_.group(1))
    val cal = "\"calibration_s\":(-?[0-9.]+)".r.findFirstMatchIn(txt)
      .map(_.group(1).toDouble).filter(_ > 0)
    val mins = "\"([A-Za-z0-9_]+)\":\\{\"min_s\":(-?[0-9.]+)".r
      .findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    Prior(sf, cpus, cal, mins)
  }

  private[graft] val RegrRatio = 1.5
  private[graft] val RegrFloorS = 0.5

  /** The regression gate: this run's min vs the prior recorded run's,
    * per query — ratio > [[RegrRatio]] with a [[RegrFloorS]] floor on
    * the slower side (sub-half-second queries are noise-dominated at
    * this grain). A prior at a DIFFERENT sf dir OR cpu count — or one
    * that never recorded cpus — is incomparable and gates NOTHING
    * (r11: the sf-only check compared a 32-cpu run against a 4-cpu
    * prior and committed 3× config noise as "regressions").
    *
    * Calibration normalization: when both runs carry the CPU-bound
    * calibration probe, the compared ratio is (now/prior) divided by
    * the machine drift (nowCal/priorCal) — a container that got
    * uniformly slower (the §8.6a forensics shape: r10's residual
    * 1.24× was machine-wide) stops tripping the gate on every
    * compute-bound query. The drift divisor is CLAMPED to ≥ 1: a
    * machine that got FASTER never inflates ratios into manufactured
    * regressions; a real code regression masked by a faster machine
    * surfaces the next same-speed round.
    *
    * Returns one [[Regression]] per flagged query, worst normalized
    * ratio first — RAW seconds stay in the record so the artifact is
    * an honest measurement; `ratioNormalized` is the drift-divided
    * ratio that decided membership, emitted per entry (r12's audit had
    * to recompute it by hand from the sidecar headers).
    */
  private[graft] case class Regression(q: String, priorS: Double,
      nowS: Double, ratioNormalized: Double)

  private[graft] def regressionsOf(results: Seq[(String, Double)],
      sfDir: String, cpus: String, calibrationS: Option[Double],
      prior: Prior): Seq[Regression] =
    if (!prior.sf.contains(sfDir) || !prior.cpus.contains(cpus)) Nil
    else {
      val drift = (for (now <- calibrationS; was <- prior.calibration)
        yield math.max(1.0, now / was)).getOrElse(1.0)
      results.collect {
        // p must be STRICTLY positive: a 0.0 prior (sub-ms query, or a
        // failed -1 sentinel) would put Infinity in the emitted JSON
        case (k, v) if v >= RegrFloorS && prior.mins.get(k).exists(p =>
          p > 0 && v / drift > p * RegrRatio) =>
          Regression(k, prior.mins(k), v, v / drift / prior.mins(k))
      }.sortBy(-_.ratioNormalized)
    }

  /** The machine-calibration probe: a fixed, pinned-seed, CPU-bound
    * kmeans workload on CONSTANT synthetic data, pure JVM and
    * single-threaded — zero Spark, zero IO, so its seconds measure the
    * container's effective CPU speed and nothing else. Recorded in
    * every sidecar as `calibration_s`; round-over-round forensics then
    * separate machine drift (probe moved with the queries) from code
    * drift (queries moved, probe flat) as a ratio-of-ratios instead of
    * the r10/r11 manual worktree-rebuild experiment. min of 3 runs,
    * same rationale as the query policy.
    */
  private[graft] def calibrate(): Double = {
    def once(): Double = {
      // sized to ~0.3-0.5 s on the reference container: long enough
      // that scheduler noise stops dominating the measurement (the
      // first cut ran 63 ms and would have made the drift ratio
      // jitter-bound), short enough to stay a negligible per-run cost
      val n = 60000; val dim = 32; val k = 16
      var seed = 0x9E3779B97F4A7C15L
      def nextF(): Float = {
        seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17
        (seed >>> 40).toFloat / (1 << 24)
      }
      val data = Array.fill(n * dim)(nextF())
      val cents = java.util.Arrays.copyOfRange(data, 0, k * dim)
      val t0 = System.nanoTime()
      var iter = 0
      var sink = 0.0
      while (iter < 16) {
        val sums = new Array[Double](k * dim)
        val counts = new Array[Int](k)
        var i = 0
        while (i < n) {
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var d = 0.0; var j = 0
            while (j < dim) {
              val diff = data(i * dim + j) - cents(c * dim + j)
              d += diff * diff; j += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          var j = 0
          while (j < dim) {
            sums(best * dim + j) += data(i * dim + j); j += 1
          }
          i += 1
        }
        var c = 0
        while (c < k) {
          if (counts(c) > 0) {
            var j = 0
            while (j < dim) {
              cents(c * dim + j) = (sums(c * dim + j) / counts(c)).toFloat
              j += 1
            }
          }
          c += 1
        }
        sink += bestSink(cents)
        iter += 1
      }
      // sink consumption keeps the JIT from eliding the loop
      if (sink == Double.MinValue) println("calibration sink")
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 3).map(_ => once()).min
  }
  private def bestSink(a: Array[Float]): Double = a(a.length - 1)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench/last_run.json")
    // PRIOR run read FIRST: the per-query regression gate compares this
    // run's min_s against it. The 2× rule used to live only in the
    // judge loop — a regression shipped a whole round before anyone saw
    // it; this self-check puts it in the bench artifact itself.
    // PRIOR SELECTION (the r11 fix): the per-CONFIG sidecar
    // (`last_<sf>_cpus<N>.json`, written by every run alongside the
    // main sidecar and committed at round boundaries) is preferred, so
    // the driver's 32-cpu run gates against the PREVIOUS round's 32-cpu
    // run even when a mid-round 4-cpu builder run overwrote
    // last_run.json in between; the main sidecar is the fallback, and
    // regressionsOf itself rejects any prior whose sf or cpus differ.
    val sfName = new java.io.File(sfDir).getName
    val cfgPath = {
      val p = java.nio.file.Paths.get(outPath)
      val dir = Option(p.getParent).map(_.toString).getOrElse(".")
      s"$dir/last_${sfName}_cpus$cpus.json"
    }
    def loadPrior(path: String): Option[Prior] =
      try {
        val p = java.nio.file.Paths.get(path)
        if (!java.nio.file.Files.exists(p)) None
        else Some(parsePrior(new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8)))
      } catch { case scala.util.control.NonFatal(_) => None }
    val prior: Prior = loadPrior(cfgPath)
      .filter(pr => pr.sf.contains(sfDir) && pr.cpus.contains(cpus))
      .orElse(loadPrior(outPath))
      .getOrElse(Prior(None, None, None, Map.empty))
    // machine-calibration probe BEFORE the session comes up (nothing
    // else is running, so the probe sees the bare container)
    val calibrationS = calibrate()
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
      results.map { case (k, v, _) => (k, v) }, sfDir, cpus,
      Some(calibrationS), prior)
    // per entry: raw ratio AND the normalized ratio that decided
    // membership, plus the prior's calibration when it carried one —
    // so an audit never has to re-derive the drift division by hand
    val regrJson = regressions
      .map { r => "{\"q\":\"" + r.q + "\",\"prior_s\":" + r.priorS +
        ",\"now_s\":" + r.nowS + ",\"ratio\":" + r3(r.nowS / r.priorS) +
        ",\"ratio_normalized\":" + r3(r.ratioNormalized) +
        prior.calibration.map(c =>
          ",\"prior_calibration_s\":" + r3(c)).getOrElse("") + "}" }
      .mkString("[", ",", "]")
    if (regressions.nonEmpty)
      System.err.println(s"BENCH REGRESSION GATE: ${regressions.size} " +
        s"query(ies) slower than ${RegrRatio}x the prior recorded run " +
        s"(floor ${RegrFloorS}s, calibration-normalized): " +
        regressions.map(r =>
          f"${r.q} ${r.priorS}%.2f->${r.nowS}%.2f (norm ${r.ratioNormalized}%.2fx)")
          .mkString(", "))
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
        ",\"calibration_s\":" + r3(calibrationS) +
        prior.calibration.map(c =>
          ",\"prior_calibration_s\":" + r3(c)).getOrElse("") +
        ",\"started_epoch_ms\":" + benchT0 +
        ",\"wall_s\":" + r3((System.currentTimeMillis() - benchT0) / 1000.0) +
        ",\"total_s\":" + total + ",\"failed\":" + failed.size +
        ",\"regressions\":" + regrJson +
        ",\"queries\":" + per + "}"
    }
    // main sidecar plus the per-config twin the NEXT same-config run's
    // gate will prefer as its prior (see prior selection above)
    Seq(outPath, cfgPath).foreach { path =>
      try {
        val p = java.nio.file.Paths.get(path)
        Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.write(p,
          fullJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"bench sidecar write failed ($path): $e")
      }
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
    println(s"BENCH HEADLINE: total_s=$total queries=${names.size} failed=${failed.size} regressions=${regressions.size} sf=$sfDir cpus=$cpus calibration_s=${r3(calibrationS)} full_results=$outPath slowest10=$slow10 setup_s=$setups")
    println(s"""{"samples":$ns,"queries":$qs,"runs_policy":"interleaved passes; per query min, stop when 2 fastest within 20%, 3..5 samples (floor 3 so one starvation wave cannot latch two adjacent-pass samples as converged); stateful queries re-seed per sample, seed time under setup_s (total = setup + query); ALL samples with pass+wall offsets in the full_results sidecar; regressions = queries >1.5x the prior recorded run's min (0.5s floor)","sf":"$sfDir","setup_s":$setups,"failed":${failed.size},"regressions":$regrJson,"slowest10":$slow10,"full_results":"$outPath","metric":"total","unit":"sec","value":$total}""")
    spark.stop()
  }
}
