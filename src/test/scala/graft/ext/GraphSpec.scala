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
}
