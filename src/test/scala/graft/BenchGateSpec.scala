package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's per-query perf-regression gate (VERDICT-r10 #2): prior
  * sidecar parse + the ratio/floor rule, pinned without running a
  * bench. The gate's failure mode matters as much as its hit rule — a
  * malformed prior must gate NOTHING (never fail the bench), and a
  * prior from a different scale factor is incomparable.
  */
class BenchGateSpec extends AnyFunSuite {

  private val sidecar =
    """{"sf":"/root/testdata/sf0.1","cpus":4,"total_s":10.0,
      |"regressions":[],"queries":{
      |"q_fast":{"min_s":0.2,"samples":[{"pass":1,"query_s":0.2}]},
      |"q_slow":{"min_s":2.0,"samples":[]},
      |"q_failed":{"min_s":-1.0,"samples":[]},
      |"q_state":{"min_s":1.0,"setup_min_s":3.0,"samples":[]}}}"""
      .stripMargin.replace("\n", "")

  test("parsePrior extracts sf and per-query min_s; malformed input " +
      "degrades to no-prior") {
    val (sf, mins) = Bench.parsePrior(sidecar)
    assert(sf === Some("/root/testdata/sf0.1"))
    assert(mins === Map("q_fast" -> 0.2, "q_slow" -> 2.0,
      "q_failed" -> -1.0, "q_state" -> 1.0))
    assert(Bench.parsePrior("not json at all") === (None, Map.empty))
    assert(Bench.parsePrior("") === (None, Map.empty))
  }

  test("regressionsOf: ratio rule with floor; failed/absent/other-sf " +
      "priors gate nothing; worst ratio first") {
    val (sf, mins) = Bench.parsePrior(sidecar)
    val now = Seq(
      "q_fast" -> 0.45, // 2.25x but under the 0.5s floor — not flagged
      "q_slow" -> 3.5, // 1.75x over floor — flagged
      "q_failed" -> 4.0, // prior failed (-1) — not flagged
      "q_state" -> 4.0, // 4x — flagged, worst
      "q_new" -> 9.0) // no prior — not flagged
    val r = Bench.regressionsOf(now, "/root/testdata/sf0.1", sf, mins)
    assert(r === Seq(("q_state", 1.0, 4.0), ("q_slow", 2.0, 3.5)))
    // a prior from another sf dir is incomparable
    assert(Bench.regressionsOf(now, "/root/testdata/sf0.01", sf, mins)
      === Nil)
    // exactly at the ratio is NOT a regression (strict >)
    assert(Bench.regressionsOf(Seq("q_slow" -> 3.0),
      "/root/testdata/sf0.1", sf, mins) === Nil)
    // a 0.0 prior (sub-ms query rounded down) must gate nothing — a
    // v/0 ratio would serialize Infinity into the bench JSON
    val (sf0, mins0) = Bench.parsePrior(
      """{"sf":"x","queries":{"q_zero":{"min_s":0.0}}}""")
    assert(Bench.regressionsOf(Seq("q_zero" -> 5.0), "x", sf0, mins0)
      === Nil)
  }
}
