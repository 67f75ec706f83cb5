package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over pair relations (the near-dup candidate graph,
  * user-interaction graphs): iterative algorithms in the same bounded
  * shape as [[Dedup.connectedComponents]] — every iteration shuffles the
  * EDGE relation, never a corpus, with eager `localCheckpoint` truncation
  * so plan depth stays flat at any iteration count.
  */
object Graph {

  /** PageRank in FIXED-POINT integer arithmetic: ranks are integers at
    * `scale` (1e6 = 6 decimal digits), the damping factor is the rational
    * dampNum/dampDen (default 85/100), and every per-edge contribution is
    * an integer division — so the result is bit-exact in any engine (no
    * float summation order, no libm), replayable by the oracle through
    * unrolled SQL iterations. On the near-dup pair graph this is the
    * centrality form of canonical-document selection: the highest-rank
    * member of a duplicate cluster is the best-connected version, a
    * quality-aware alternative to min-id survivorship.
    *
    * Undirected: each pair contributes both directions. Each iteration is
    * one (edges ⋈ ranks ⋈ degrees) shuffle keyed by the node id + one
    * aggregation — O(edges), corpus never touched. Truncation per
    * iteration caps lineage exactly like connectedComponents. All
    * intermediate products stay < 2^53 for graphs up to ~10^5·scale rank
    * mass per node, so the long-cast divisions are exact.
    */
  def pageRank(pairs: DataFrame, aCol: String, bCol: String, iters: Int,
      dampNum: Long = 85L, dampDen: Long = 100L,
      scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampDen > dampNum && scale > 0,
      "iters >= 1, 0 < dampNum < dampDen, scale > 0")
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .cache()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).cache()
    val base = scale * (dampDen - dampNum) / dampDen // exact in Scala longs
    var rank = deg.select(col("src").as("id"), lit(scale).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(rank.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("id"),
          (col("rank") / col("deg")).cast("long").as("c"))
        .groupBy("id").agg(sum(col("c")).as("contrib"))
      rank = deg.select(col("src").as("id"))
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) +
            (lit(dampNum) * coalesce(col("contrib"), lit(0L)) / lit(dampDen))
              .cast("long")).as("rank"))
        .localCheckpoint(true)
    }
    deg.unpersist()
    edges.unpersist()
    rank
  }
}
