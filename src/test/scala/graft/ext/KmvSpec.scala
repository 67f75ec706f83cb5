package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the KMV bottom-k sketch ([[graft.functions.KmvExpressions]] +
  * [[SketchState.kmvSketch]]/[[SketchState.kmvOverlap]]): order/layout
  * invariance (the sketch is a pure function of the SET), exactness
  * below k, and estimator error within published bounds above k.
  */
class KmvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sketch is layout-invariant and equals the brute-force bottom-k distinct") {
    val keys = (1 to 5000).map(i => s"key$i") ++ (1 to 2500).map(i => s"key$i")
    val brute = SketchState.kmvSketch(keys.toDF("x").repartition(1),
      col("x"), 64).as[Long].collect().toSeq
    for (parts <- Seq(3, 17, 32)) {
      val got = SketchState.kmvSketch(keys.toDF("x").repartition(parts),
        col("x"), 64).as[Long].collect().toSeq
      assert(got === brute, s"parts=$parts")
    }
    assert(brute.size === 64 && brute === brute.sorted)
  }

  test("below k the sketch IS the set and every overlap estimate is exact") {
    val a = (1 to 30).map(i => s"a$i") ++ (1 to 20).map(i => s"c$i")
    val b = (1 to 40).map(i => s"b$i") ++ (1 to 20).map(i => s"c$i")
    val row = SketchState.kmvOverlap(a.toDF("x"), col("x"),
      b.toDF("x"), col("x"), k = 256).head()
    assert(row.getAs[Long]("u_cnt") === 90L) // 30 + 40 + 20 distinct union
    assert(row.getAs[Long]("m_both") === 20L)
    assert(row.getAs[Double]("est_union") === 90.0)
    assert(row.getAs[Double]("est_inter") === 20.0)
  }

  test("above k: union and intersection estimates land within 3 sigma") {
    // |A|=6000, |B|=6000, |A∩B|=2000 -> |A∪B|=10000, J=0.2
    val shared = (1 to 2000).map(i => s"s$i")
    val a = (1 to 4000).map(i => s"a$i") ++ shared
    val b = (1 to 4000).map(i => s"b$i") ++ shared
    val k = 512
    val row = SketchState.kmvOverlap(a.toDF("x").repartition(8), col("x"),
      b.toDF("x").repartition(5), col("x"), k).head()
    assert(row.getAs[Long]("u_cnt") === k.toLong)
    val sigma = 1.0 / math.sqrt(k - 2.0)
    val estU = row.getAs[Double]("est_union")
    assert(math.abs(estU - 10000.0) <= 3 * sigma * 10000.0,
      s"union estimate $estU outside 3 sigma of 10000")
    // Jaccard: m/k is a hypergeometric draw of k from the union sample;
    // sd ~ sqrt(J(1-J)/k); intersection compounds both errors
    val estI = row.getAs[Double]("est_inter")
    val jSigma = math.sqrt(0.2 * 0.8 / k)
    val bound = 3 * (sigma * 0.2 + jSigma) * 10000.0
    assert(math.abs(estI - 2000.0) <= bound,
      s"intersection estimate $estI outside $bound of 2000")
  }

  test("kmv sketches are exactly mergeable: sketch(A ∪ B) = bottom-k of sketches") {
    val a = (1 to 3000).map(i => s"a$i")
    val b = (1 to 3000).map(i => s"b$i")
    val k = 128
    val direct = SketchState.kmvSketch((a ++ b).toDF("x"), col("x"), k)
      .as[Long].collect().toSeq
    val merged = SketchState.kmvSketch(a.toDF("x"), col("x"), k)
      .unionByName(SketchState.kmvSketch(b.toDF("x"), col("x"), k))
      .distinct().orderBy("hv").limit(k).as[Long].collect().toSeq
    assert(merged === direct)
  }

  test("single-scan split overlap ≡ the two-scan form, bit for bit") {
    val rows = ((1 to 900).map(i => (s"a$i", true)) ++
      (1 to 700).map(i => (s"b$i", false)) ++
      (1 to 300).map(i => (s"c$i", true)) ++
      (1 to 300).map(i => (s"c$i", false))).toDF("x", "is_a")
    val split = SketchState.kmvOverlapSplit(rows.repartition(7), col("x"),
      col("is_a"), k = 128).collect().toSeq
    val twoScan = SketchState.kmvOverlap(
      rows.filter(col("is_a")), col("x"),
      rows.filter(!col("is_a")), col("x"), k = 128).collect().toSeq
    assert(split === twoScan)
  }

  test("stored KMV chain reconstructs the live sketch losslessly; replay inert") {
    val wh = java.nio.file.Files.createTempDirectory("graft-kmv").toString
    val batches = Seq(
      (1 to 2000).map(i => s"x$i"),
      (1500 to 3500).map(i => s"x$i"), // overlaps batch 1
      (3000 to 5000).map(i => s"x$i"))
    val k = 64
    SketchState.createKmvState(spark, wh, "kv", batches(0).toDF("x"),
      col("x"), k)
    SketchState.appendKmvState(spark, wh, "kv", batches(1).toDF("x"),
      col("x"), k, "n2")
    SketchState.appendKmvState(spark, wh, "kv", batches(2).toDF("x"),
      col("x"), k, "n3")
    val live = SketchState.kmvSketch(batches.flatten.toDF("x"), col("x"), k)
      .as[Long].collect().toSeq
    def stored() = SketchState.readKmvSketch(spark, wh, "kv", k)
      .as[Long].collect().toSeq
    assert(stored() === live)
    // at-least-once replay replaces the batch's own partition
    SketchState.appendKmvState(spark, wh, "kv", batches(2).toDF("x"),
      col("x"), k, "n3")
    assert(stored() === live)
  }

  test("overlap matrix: every pair cell equals the pairwise kmvOverlap row") {
    val rows =
      (1 to 30).map(i => ("s1", s"a$i")) ++ (1 to 20).map(i => ("s1", s"c$i")) ++
      (1 to 40).map(i => ("s2", s"b$i")) ++ (1 to 20).map(i => ("s2", s"c$i")) ++
      (1 to 10).map(i => ("s3", s"c$i")) ++ (1 to 5).map(i => ("s3", s"d$i"))
    val df = rows.toDF("src", "x")
    for (k <- Seq(16, 256)) { // above-k estimate branch and exact branch
      val matrix = SketchState.kmvOverlapMatrix(df, "src", col("x"), k)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2))
        .toMap
      assert(matrix.keySet === Set("s1" -> "s2", "s1" -> "s3", "s2" -> "s3"))
      for (((ga, gb), cell) <- matrix) {
        val pair = SketchState.kmvOverlap(
          df.filter(col("src") === ga).select("x"), col("x"),
          df.filter(col("src") === gb).select("x"), col("x"), k)
          .head().toSeq
        assert(cell === pair, s"($ga,$gb) k=$k: matrix cell must equal " +
          s"the two-relation kmvOverlap row")
      }
    }
    // exact-branch sanity on known sets: s1∩s3 = c1..c10
    val exact = SketchState.kmvOverlapMatrix(df, "src", col("x"), 256)
      .filter(col("g_a") === "s1" && col("g_b") === "s3").head()
    assert(exact.getAs[Long]("u_cnt") === 55L) // 50 ∪ 15 with 10 common
    assert(exact.getAs[Long]("m_both") === 10L)
    assert(exact.getAs[Double]("est_inter") === 10.0)
  }
}
