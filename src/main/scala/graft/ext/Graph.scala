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

  /** Item CO-OCCURRENCE edges from a (group, item) relation — the
    * market-basket / co-citation projection that FEEDS the pair-graph
    * operators ([[pageRank]], [[triangleCounts]],
    * [[Dedup.connectedComponents]]): items sharing ≥ `minCount` groups
    * become weighted edges.
    *
    * Scale levers, both load-bearing at 100 TB:
    *  - `maxGroupSize` caps the quadratic: one celebrity group of size g
    *    emits g²/2 pairs — a single 10⁶-item group would produce 5·10¹¹
    *    rows from one key. Groups above the cap are DROPPED (and at this
    *    size carry no pairwise signal — membership in a near-universal
    *    group says nothing about item affinity; the same reasoning as
    *    the LSH hot-bucket cap, and like there the drop is explicit and
    *    auditable via [[coOccurrenceDroppedGroups]]).
    *  - pairs form by a WITHIN-GROUP self-join on the group key with an
    *    `item_a < item_b` orientation — the join's fan-out is bounded by
    *    the cap, every exchange keys on the group or the pair, and the
    *    final count aggregates map-side like any groupBy.
    */
  /** BFS from a seed set: minimum hop distance (≤ `maxHops`) from any
    * seed to every reachable node, over an undirected pair relation —
    * the reachability/radius probe for the dup-cluster and interaction
    * graphs ("everything within 2 links of a known-bad domain").
    *
    * Level-synchronous frontier expansion: iteration k joins the CURRENT
    * FRONTIER (nodes first reached at hop k−1) against the edge
    * relation, anti-joins the visited set, and labels survivors hop k.
    * Each iteration shuffles |frontier ⋈ edges| — bounded by the edge
    * relation, never corpus-sized — and the visited set grows
    * append-only. `localCheckpoint` truncates lineage per level (the
    * [[pageRank]] discipline) so plan depth stays flat at any radius.
    * Per-node min-hop is structural (a node enters `visited` exactly
    * once, at its first discovery level), so no final min-aggregate is
    * needed — BFS order IS the minimum.
    */
  def bfsHops(pairs: DataFrame, aCol: String, bCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops >= 0")
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .cache()
    var visited = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("hop", lit(0L))
      .localCheckpoint(true)
    var frontier = visited
    var k = 1
    while (k <= maxHops && !frontier.isEmpty) {
      val next = frontier.select(col("node").as("src"))
        .join(edges, "src")
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("hop", lit(k.toLong))
        .localCheckpoint(true)
      visited = visited.unionByName(next).localCheckpoint(true)
      frontier = next
      k += 1
    }
    edges.unpersist()
    visited
  }

  def coOccurrence(df: DataFrame, groupCol: String, itemCol: String,
      maxGroupSize: Int, minCount: Long): DataFrame = {
    val mem = df.select(col(groupCol).as("g"), col(itemCol).as("i")).distinct()
    val small = mem.groupBy("g").agg(count(lit(1)).as("sz"))
      .filter(col("sz") <= maxGroupSize)
      .select("g")
    val capped = mem.join(small, "g")
    capped.select(col("g"), col("i").as("item_a"))
      .join(capped.select(col("g"), col("i").as("item_b")), "g")
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_groups"))
      .filter(col("n_groups") >= minCount)
  }

  /** Audit twin of [[coOccurrence]]'s cap: the groups it dropped, with
    * sizes — the explicit record that keeps the cap honest.
    */
  def coOccurrenceDroppedGroups(df: DataFrame, groupCol: String,
      itemCol: String, maxGroupSize: Int): DataFrame =
    df.select(col(groupCol).as("g"), col(itemCol).as("i")).distinct()
      .groupBy("g").agg(count(lit(1)).as("sz"))
      .filter(col("sz") > maxGroupSize)

  /** Per-node TRIANGLE counts over an undirected pair relation — the
    * clustering-structure probe of the dup graph (a doc in many triangles
    * sits in a dense near-dup cluster, not a chance pairwise collision).
    *
    * Degree-oriented (compact-forward): each edge is directed from its
    * lower-(degree, id) endpoint to the higher, so every out-neighborhood
    * is O(√m) even on power-law graphs — the wedge self-join's fan-out is
    * Σ outdeg² ≤ O(m^1.5) with NO hub blowup (a naive a<b orientation
    * lets one celebrity node pair all its neighbors). Each triangle is
    * counted exactly once: its two lowest-rank corners form the wedge, the
    * closing edge is matched by an equi-join on BOTH endpoints. Everything
    * shuffles edge keys; the corpus behind the pair relation is never
    * touched. The edge and oriented relations are eagerly
    * localCheckpoint-ed: each feeds ≥2 downstream joins, and without
    * materialization every reuse would replay the upstream pair pipeline
    * (LSH at corpus scale).
    *
    * Output: (id, n_triangles) for EVERY node of the graph, zeros
    * included. Orientation only affects join cost, never the triangle
    * set, so the oracle may count via plain id-ordering — output
    * equality across orientations is itself evidence the orientation
    * logic is sound.
    */
  def triangleCounts(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val und = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .unionAll(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    val deg = und.groupBy("u").agg(count(lit(1)).as("deg"))
    val oriented = und
      .join(deg, "u")
      .join(deg.select(col("u").as("v"), col("deg").as("degv")), "v")
      .filter(struct(col("deg"), col("u")) < struct(col("degv"), col("v")))
      .select(col("u").as("src"), col("v").as("dst"), col("degv").as("ddeg"))
      .localCheckpoint(true)
    val e1 = oriented.select(col("src").as("a"), col("dst").as("b"),
      col("ddeg").as("db"))
    val e2 = oriented.select(col("src").as("a"), col("dst").as("c"),
      col("ddeg").as("dc"))
    val tris = e1.join(e2, "a")
      .filter(struct(col("db"), col("b")) < struct(col("dc"), col("c")))
      .join(oriented.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
      .select(col("a"), col("b"), col("c"))
    val perNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    deg.select(col("u").as("id"))
      .join(perNode, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** k-CORE: the maximal subgraph in which every surviving node keeps
    * degree ≥ k — the standard density probe between "has neighbors"
    * (degree) and "fully mutual" (triangles/cliques). On the near-dup
    * pair graph it separates template families (deep cores: every member
    * overlaps many others) from chain artifacts (shallow cores from
    * A≈B≈C transitive links) — exactly the split a dedup auditor needs
    * before trusting transitive-closure clusters.
    *
    * Iterative peel: compute degrees over the surviving edge relation,
    * drop nodes below k, drop their edges, repeat. Every iteration is
    * one partial-agg degree shuffle plus two key-joins on the EDGE
    * relation (never corpus-sized); `localCheckpoint` truncates lineage
    * per round ([[pageRank]] discipline). Peeling is DETERMINISTIC and
    * IDEMPOTENT at the fixpoint, so stopping early at the fixpoint (the
    * edge-count check) and an oracle that unrolls exactly `maxIter`
    * rounds agree on ANY input: whichever side peels "extra" rounds
    * peels nothing. Output: (node, deg) — core members with their
    * within-core degree.
    */
  def kCore(pairs: DataFrame, aCol: String, bCol: String, k: Int,
      maxIter: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    require(maxIter >= 1, "maxIter >= 1")
    var edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    var nEdges = edges.count()
    var it = 0
    var done = nEdges == 0L
    while (it < maxIter && !done) {
      val keep = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("src")
      val pruned = edges
        .join(keep, "src")
        .join(keep.select(col("src").as("dst")), "dst")
        .select("src", "dst")
        .localCheckpoint(true)
      val n = pruned.count()
      done = n == nEdges // no node dropped ⇒ fixpoint
      edges = pruned
      nEdges = n
      it += 1
    }
    edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
  }
}
