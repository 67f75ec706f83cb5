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
}
