package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Convergence contract for [[Dedup.connectedComponents]]: the closure
  * iterates to FIXPOINT (correctness cannot depend on a caller-supplied
  * round budget — the r6 `weak`: fixed-iteration min-label silently
  * under-merges any component whose diameter exceeds the guess), and
  * pointer doubling converges in O(log diameter) rounds, not
  * O(diameter) — the property that makes a 10⁶-long duplicate chain
  * tractable at 100 TB (≈20 rounds) instead of 10⁶ rounds.
  */
class CcConvergenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A path graph 0-1-2-…-n: diameter n, worst case for label propagation
    * (the min label must travel the whole chain).
    */
  private def chain(n: Int) =
    (0 until n).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")

  test("a chain deeper than any legacy round budget still fully merges") {
    // diameter 40 — far beyond the fixed budgets the pre-fixpoint callers
    // passed (2, 3, 6, 8). Plain min-label at 6 rounds would leave node 40
    // labeled 34, i.e. TWO labels for one component; the fixpoint closure
    // must collapse everything to 0.
    val labels = Dedup.connectedComponents(chain(40), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(labels.size === 41)
    assert(labels.values.toSet === Set(0L),
      s"deep chain must collapse to its minimum: ${labels.filter(_._2 != 0L)}")
  }

  test("rounds grow logarithmically with diameter, not linearly") {
    // Pointer doubling: distance-to-min at least halves per round, so a
    // diameter-255 chain needs ~log2(255)+slack rounds. Plain propagation
    // would need 255. The +fixpoint-confirmation round and the initial
    // propagation give slack; 2*log2(d)+4 is a loose but linear-excluding
    // bound (for d=255: 20 vs plain propagation's 256).
    for (d <- Seq(15, 63, 255)) {
      val (labels, rounds) =
        Dedup.connectedComponentsWithRounds(chain(d), "id_a", "id_b")
      assert(labels.filter(col("comp") =!= 0L).count() === 0L,
        s"diameter-$d chain must fully merge")
      val bound = 2 * (math.log(d.toDouble) / math.log(2)).ceil.toInt + 4
      assert(rounds <= bound,
        s"diameter $d took $rounds rounds — expected O(log d) ≤ $bound")
    }
  }

  test("star, clique, and singleton-free mixed graphs reach exact closure") {
    // star (diameter 2), triangle clique, disjoint pair — the fixpoint
    // must agree with an exhaustive union-find on all of them at once.
    val pairs = Seq(
      (100L, 101L), (100L, 102L), (100L, 103L), // star centered at 100
      (7L, 8L), (8L, 9L), (7L, 9L),             // triangle
      (50L, 51L))                               // pair
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(
      100L -> 100L, 101L -> 100L, 102L -> 100L, 103L -> 100L,
      7L -> 7L, 8L -> 7L, 9L -> 7L,
      50L -> 50L, 51L -> 50L))
  }

  test("empty pair relation yields an empty labeling, zero propagate cost") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty, "id_a", "id_b").count() === 0L)
  }

  test("randomized graphs: fixpoint labels equal an exhaustive union-find") {
    // 12 seeded random graphs spanning sparse chains to dense blobs —
    // the adversarial check that the fixpoint + shortcut interplay never
    // mislabels on shapes nobody hand-picked. Deterministic (fixed
    // seeds), so a failure reproduces.
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed)
      val n = 10 + rnd.nextInt(50)
      val m = 5 + rnd.nextInt(80)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // reference: plain union-find with min-root union
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(x => x -> find(x)).toMap
        val got = Dedup
          .connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b")
          .as[(Long, Long)].collect().toMap
        assert(got === want, s"seed=$seed n=$n m=$m")
      }
    }
  }

  test("string node ids converge identically (the non-Long fallback path)") {
    // CcState's distributed fallback runs this code on arbitrary orderable
    // ids; min is lexicographic for strings.
    val pairs = Seq(("b", "c"), ("c", "d"), ("a", "d"), ("x", "y"))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(String, String)].collect().toMap
    assert(got === Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "x" -> "x", "y" -> "x"))
  }
}
