package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pageRank: hub outranks leaves, exact fixed-point values, iteration-stable shape") {
    // star graph: 1 is the hub of {2,3,4}; 5-6 an isolated pair
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val ranks = Graph.pageRank(pairs, "id_a", "id_b", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(ranks.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(ranks(1L) > ranks(2L), "hub must outrank a leaf")
    assert(ranks(2L) === ranks(3L) && ranks(3L) === ranks(4L),
      "symmetric leaves get identical ranks (determinism)")
    assert(ranks(5L) === ranks(6L))
    // driver-side integer twin of the 3 unrolled iterations
    def step(r: Map[Long, Long]): Map[Long, Long] = {
      val edges = Seq(1L -> 2L, 2L -> 1L, 1L -> 3L, 3L -> 1L, 1L -> 4L,
        4L -> 1L, 5L -> 6L, 6L -> 5L)
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      deg.keys.map(v => v -> (150000L + 85L * contrib.getOrElse(v, 0L) / 100L)).toMap
    }
    val want = (1 to 3).foldLeft(
      Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L, 4L -> 1000000L,
        5L -> 1000000L, 6L -> 1000000L))((r, _) => step(r))
    assert(ranks === want)
  }

  test("triangleCounts: known graph — K4 ∪ triangle ∪ triangle-free star") {
    // K4 on {1,2,3,4} (4 triangles, each node in 3); a separate triangle
    // {5,6,7}; a star hub 8-{9,10} with no closure (0 triangles)
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val pairs = (k4 ++ Seq((5L, 6L), (6L, 7L), (5L, 7L), (8L, 9L), (8L, 10L)))
      .toDF("id_a", "id_b")
    val got = Graph.triangleCounts(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(
      1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 1L, 6L -> 1L, 7L -> 1L,
      8L -> 0L, 9L -> 0L, 10L -> 0L))
  }

  test("triangleCounts: degree orientation ≡ brute force on a random graph") {
    // deterministic pseudo-random graph, incl. duplicate + reversed input
    // pairs (the relation must canonicalize, not double-count)
    val rnd = new scala.util.Random(42)
    val edges = (1 to 120).map { _ =>
      val a = rnd.nextInt(20).toLong; val b = rnd.nextInt(20).toLong; (a, b)
    }.filter { case (a, b) => a != b }
    val pairs = (edges ++ edges.take(20).map(_.swap)).toDF("id_a", "id_b")
    val got = Graph.triangleCounts(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap

    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val nodes = und.map(_._1)
    val brute = nodes.map { v =>
      val nb = und.filter(_._1 == v).map(_._2)
      v -> nb.toSeq.combinations(2).count {
        case Seq(x, y) => und.contains((x, y))
        case _ => false
      }.toLong
    }.toMap
    assert(got === brute)
    // 3-sum identity: every triangle contributes exactly 3 corner counts
    assert(got.values.sum % 3 === 0L)
  }

  test("bfsHops: min-hop labels on a chain+cycle graph; radius bound; isolated seed") {
    // chain 1-2-3-4-5, cycle 10-11-12-10 bridged at 3-10; 99 isolated
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L), (3L, 10L))
      .toDF("a", "b")
    val seeds = Seq(1L, 99L).toDF("s")
    val got = Graph.bfsHops(edges, "a", "b", seeds, "s", maxHops = 3)
      .as[(Long, Long)].collect().toMap
    // two equal-length paths to 12 (via 10 and 11): min hop is structural
    assert(got === Map(1L -> 0L, 99L -> 0L, 2L -> 1L, 3L -> 2L,
      4L -> 3L, 10L -> 3L))

    // radius 5 reaches the cycle fully; 12's two 5-hop parents collapse
    val far = Graph.bfsHops(edges, "a", "b", seeds, "s", maxHops = 5)
      .as[(Long, Long)].collect().toMap
    assert(far === got ++ Map(5L -> 4L, 11L -> 4L, 12L -> 4L))

    // a seed already inside another seed's tree keeps hop 0
    val twoSeeds = Graph.bfsHops(edges, "a", "b",
      Seq(1L, 3L).toDF("s"), "s", maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(twoSeeds(3L) === 0L && twoSeeds(4L) === 1L && twoSeeds(10L) === 1L)
  }

  test("kCore: K4 + tail chain — 2-core keeps the clique, peels the tail") {
    // K4 on {1,2,3,4}; a tail 4-5-6 hanging off the clique
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val pairs = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("id_a", "id_b")
    val core2 = Graph.kCore(pairs, "id_a", "id_b", k = 2, maxIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(core2.keySet === Set(1L, 2L, 3L, 4L),
      s"2-core must peel the 4-5-6 tail: $core2")
    assert(core2.values.forall(_ == 3L), "within-K4 degree is 3")
    val core3 = Graph.kCore(pairs, "id_a", "id_b", k = 3, maxIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(core3.keySet === Set(1L, 2L, 3L, 4L) && core3.values.forall(_ == 3L))
    // the whole graph dissolves at k = 4: cascade must reach the empty set
    assert(Graph.kCore(pairs, "id_a", "id_b", k = 4, maxIter = 10).isEmpty)
  }

  test("kCore: early fixpoint stop equals exhaustive iteration (idempotence)") {
    // chain of 6 — peeling cascades one endpoint layer per round
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    def run(iters: Int) = Graph.kCore(chain, "id_a", "id_b", k = 2, maxIter = iters)
      .as[(Long, Long)].collect().toSet
    assert(run(10) === run(50), "extra rounds past the fixpoint are no-ops")
    assert(run(10) === Set.empty, "a chain has no 2-core")
    // partial peel: after exactly 1 round only the endpoints are gone
    assert(run(1) === Set((2L, 1L), (3L, 2L), (4L, 2L), (5L, 1L)))
  }
}
