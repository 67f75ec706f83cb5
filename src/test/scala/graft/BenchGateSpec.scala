package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's per-query perf-regression gate (VERDICT-r10 #2, made
  * config-aware in r12 per VERDICT-r11 #1): prior sidecar parse + the
  * ratio/floor rule, pinned without running a bench. The gate's
  * failure mode matters as much as its hit rule — a malformed prior
  * must gate NOTHING (never fail the bench), and a prior from a
  * different scale factor, a different CPU count, or one that never
  * recorded cpus is incomparable (r11 shipped fake 3× "regressions"
  * by comparing a 32-cpu run against a 4-cpu prior).
  */
class BenchGateSpec extends AnyFunSuite {

  private val sidecar =
    """{"sf":"/root/testdata/sf0.1","cpus":4,"calibration_s":1.0,
      |"total_s":10.0,
      |"regressions":[],"queries":{
      |"q_fast":{"min_s":0.2,"samples":[{"pass":1,"query_s":0.2}]},
      |"q_slow":{"min_s":2.0,"samples":[]},
      |"q_failed":{"min_s":-1.0,"samples":[]},
      |"q_state":{"min_s":1.0,"setup_min_s":3.0,"samples":[]}}}"""
      .stripMargin.replace("\n", "")

  test("parsePrior extracts sf, cpus, calibration and per-query min_s; " +
      "malformed input degrades to no-prior") {
    val p = Bench.parsePrior(sidecar)
    assert(p.sf === Some("/root/testdata/sf0.1"))
    assert(p.cpus === Some("4"))
    assert(p.calibration === Some(1.0))
    assert(p.mins === Map("q_fast" -> 0.2, "q_slow" -> 2.0,
      "q_failed" -> -1.0, "q_state" -> 1.0))
    val none = Bench.parsePrior("not json at all")
    assert(none.sf === None && none.cpus === None &&
      none.calibration === None && none.mins === Map.empty)
    assert(Bench.parsePrior("").mins === Map.empty)
    // a pre-r12 sidecar (no cpus, no calibration) parses but is
    // cpus-less — the gate below must treat it as incomparable
    val old = Bench.parsePrior(
      """{"sf":"x","queries":{"q":{"min_s":1.0}}}""")
    assert(old.sf === Some("x") && old.cpus === None &&
      old.calibration === None)
  }

  test("regressionsOf: ratio rule with floor; failed/absent priors " +
      "gate nothing; worst ratio first") {
    val p = Bench.parsePrior(sidecar)
    val now = Seq(
      "q_fast" -> 0.45, // 2.25x but under the 0.5s floor — not flagged
      "q_slow" -> 3.5, // 1.75x over floor — flagged
      "q_failed" -> 4.0, // prior failed (-1) — not flagged
      "q_state" -> 4.0, // 4x — flagged, worst
      "q_new" -> 9.0) // no prior — not flagged
    val r = Bench.regressionsOf(now, "/root/testdata/sf0.1", "4", None, p)
    // each entry carries the normalized ratio that decided membership
    // (no calibration on either side → drift 1, normalized == raw)
    assert(r === Seq(Bench.Regression("q_state", 1.0, 4.0, 4.0),
      Bench.Regression("q_slow", 2.0, 3.5, 1.75)))
    // exactly at the ratio is NOT a regression (strict >)
    assert(Bench.regressionsOf(Seq("q_slow" -> 3.0),
      "/root/testdata/sf0.1", "4", None, p) === Nil)
    // a 0.0 prior (sub-ms query rounded down) must gate nothing — a
    // v/0 ratio would serialize Infinity into the bench JSON
    val p0 = Bench.parsePrior(
      """{"sf":"x","cpus":4,"queries":{"q_zero":{"min_s":0.0}}}""")
    assert(Bench.regressionsOf(Seq("q_zero" -> 5.0), "x", "4", None, p0)
      === Nil)
  }

  test("config-awareness: a prior at another sf, another cpu count, or " +
      "with no recorded cpus gates NOTHING (the r11 32-vs-4-cpu bug)") {
    val p = Bench.parsePrior(sidecar) // sf0.1, cpus=4
    val now = Seq("q_slow" -> 20.0) // 10x — would flag if comparable
    // same config → flags
    assert(Bench.regressionsOf(now, "/root/testdata/sf0.1", "4", None, p)
      .nonEmpty)
    // other sf dir → incomparable
    assert(Bench.regressionsOf(now, "/root/testdata/sf0.01", "4", None, p)
      === Nil)
    // other cpu count → incomparable
    assert(Bench.regressionsOf(now, "/root/testdata/sf0.1", "32", None, p)
      === Nil)
    // pre-r12 prior without cpus → incomparable even at matching sf
    val old = Bench.parsePrior(
      """{"sf":"/root/testdata/sf0.1","queries":{"q_slow":{"min_s":2.0}}}""")
    assert(Bench.regressionsOf(now, "/root/testdata/sf0.1", "4", None, old)
      === Nil)
  }

  test("calibration normalization: machine-wide slowdown excuses " +
      "matching query drift; a faster machine never manufactures " +
      "regressions; raw seconds stay in the artifact") {
    val p = Bench.parsePrior(sidecar) // q_slow prior 2.0, cal 1.0
    // machine 2x slower (cal 1.0 -> 2.0): a 2x query drift is machine,
    // not code — normalized ratio 1.0, not flagged
    assert(Bench.regressionsOf(Seq("q_slow" -> 4.0),
      "/root/testdata/sf0.1", "4", Some(2.0), p) === Nil)
    // same machine drift but a 4x query drift: normalized 2x — flagged,
    // the recorded seconds are the RAW ones, and the entry itself
    // carries the normalized ratio (VERDICT-r12 #6: audits must not
    // have to re-derive the drift division from the sidecar headers)
    assert(Bench.regressionsOf(Seq("q_slow" -> 8.0),
      "/root/testdata/sf0.1", "4", Some(2.0), p) ===
      Seq(Bench.Regression("q_slow", 2.0, 8.0, 2.0)))
    // machine got FASTER (cal 1.0 -> 0.5): drift clamps to 1 — a flat
    // query is NOT flagged just because the machine sped up
    assert(Bench.regressionsOf(Seq("q_slow" -> 2.2),
      "/root/testdata/sf0.1", "4", Some(0.5), p) === Nil)
    // prior without calibration: no normalization, plain ratio rule
    val noCal = Bench.parsePrior(
      """{"sf":"x","cpus":4,"queries":{"q_slow":{"min_s":2.0}}}""")
    assert(Bench.regressionsOf(Seq("q_slow" -> 4.0), "x", "4", Some(9.0),
      noCal) === Seq(Bench.Regression("q_slow", 2.0, 4.0, 2.0)))
  }

  test("the calibration probe is deterministic work that takes real, " +
      "repeatable time") {
    val a = Bench.calibrate()
    assert(a > 0.01, s"probe finished implausibly fast ($a s) — the " +
      "JIT may have elided the workload")
    assert(a < 60.0, s"probe took $a s — too heavy for a per-run probe")
  }
}
