package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation and join: the salting patterns for heavy-hitter
  * keys.
  *
  * A plain `groupBy(k).agg(...)` sends every row of a hot key to one
  * reducer. Salting splits each key into `nSalts` deterministic sub-keys
  * (hash of a unique column, NOT rand() — reruns must reproduce), runs the
  * partial aggregate on (key, salt), then combines the partials with a
  * second tiny aggregation on the key alone. Phase 1 parallelism is
  * nSalts× per hot key; phase 2 input is |keys| × nSalts rows, negligible.
  *
  * Only algebraic aggregates compose this way — sums/counts/min/max here;
  * avg must be derived as sum/count by the caller (exactly how Spark's own
  * partial aggregation decomposes it). Results are bit-identical to the
  * direct groupBy, which is what the oracle checks.
  *
  * The join twin ([[saltedJoin]]) covers the other half of the production
  * skew problem: a shuffled equi-join whose probe side concentrates on a
  * few hot keys (the fact-dim shape once the dim outgrows the broadcast
  * threshold). AQE's skew-join split handles sort-merge cases adaptively;
  * the explicit salt is the deterministic, planner-independent form.
  */
object Skew {

  /** Two-phase salted sum/count aggregation.
    *
    * @param saltSource a column whose hash spreads rows (ideally unique)
    * @param sums       (inputCol → outputName) columns summed as DECIMAL(18,2)
    *                   and emitted as double (the engine's money contract)
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], saltSource: Column,
      sums: Seq[(String, String)], countName: String, nSalts: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltSource), lit(nSalts)))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(
        count(lit(1)).as("__pc"),
        sums.map { case (c, n) =>
          sum(col(c).cast("decimal(18,2)")).as(s"__ps_$n")
        }: _*)
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("__pc")).as(countName),
        sums.map { case (_, n) =>
          sum(col(s"__ps_$n")).cast("double").as(n)
        }: _*)
  }

  /** Skew-safe equi-join: salt the skewed (big) side's key with a
    * deterministic hash of `saltSource`, replicate every small-side row
    * across all `nSalts` salt values, join on (keys, salt), strip the
    * salt. Each hot key's rows now spread over `nSalts` reducers instead
    * of one; the small side grows nSalts× (fine — it is the SMALL side;
    * if it fit the broadcast threshold you would broadcast instead and
    * skew would not matter). Results are bit-identical to the direct
    * join: a big row matches exactly the small rows sharing its key,
    * once, because the replication covers every salt value exactly once.
    *
    * Supported joinTypes: "inner", "left", "left_semi", "left_anti" (big
    * side preserved — replication never duplicates unmatched big rows).
    * Right/full-outer would surface the replicated small rows; use the
    * direct join for those.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltSource: Column, nSalts: Int,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti")
      .contains(joinType), s"unsupported salted joinType: $joinType")
    // nSalts = 0 would yield NULL salts (pmod by zero) on the big side and
    // a DESCENDING [0, -1] sequence (Spark auto-step) on the small side —
    // silently empty/all-null joins instead of an error.
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(nSalts)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    bigS.join(smallS, keys :+ "__salt", joinType).drop("__salt")
  }

  /** POLICY-driven equi-join: [[skewReport]] composed with
    * [[saltedJoin]] into the decision a pipeline author otherwise makes
    * by hand after a 100 TB shuffle blows up. Strategy, in priority
    * order (thresholds explicit, decision returned for observability):
    *
    *  1. BROADCAST — the small side probes under BOTH `broadcastRows`
    *     (bounded `limit(n+1).count()`, never a full count of a
    *     surprise-huge dim) and `broadcastBytes` (avg serialized row
    *     size over a bounded sample × row count — a 1M-row dim of 1 KB
    *     rows is a 1 GB driver/executor broadcast however few its rows;
    *     the r7 rows-only gate could OOM the driver on wide dims): skew
    *     is irrelevant because the big side never shuffles. Only for
    *     join types whose RIGHT side may build (inner, the left
    *     family, cross);
    *     right/full outer must stream the right side to null-extend it
    *     — Spark would silently ignore the hint there and the returned
    *     decision would lie about the executed plan. The probe rows are
    *     cached and REUSED as the broadcast build side, so an expensive
    *     small-side plan executes once, not twice.
    *  2. SALTED — the big side's hottest key carries ≥
    *     `hotRatioX100`/100 × the ceiled mean key count
    *     ([[skewReport]]'s `ratio_x100`, one partial-agg pass over the
    *     key column — distinct-key-sized, cheap vs the join itself):
    *     [[saltedJoin]] with `nSalts`. Only for salting-safe join
    *     types; an outer/full joinType falls through to plain.
    *  3. PLAIN — no broadcast fit, no hot key: a regular shuffled join,
    *     AQE handling residual imbalance.
    *
    * All three paths are BIT-IDENTICAL in rows and columns (keys first,
    * then big's, then small's remaining columns) — pinned in SkewSpec —
    * so the policy can never change results, only the plan.
    *
    * @param smallRows caller-supplied exact row count of `small` (the
    *        `jaccardPairs` contract) — skips the count probe entirely;
    *        the byte estimate still samples. Must be exact: an
    *        undercount would gate-in a broadcast the caller pays for.
    * @return (joined frame, decision ∈ "broadcast" | "salted" | "plain")
    */
  def joinWithSkewPolicy(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltSource: Column, joinType: String = "inner", nSalts: Int = 16,
      hotRatioX100: Long = 1000L,
      broadcastRows: Long = 1000000L,
      broadcastBytes: Long = 128L << 20,
      smallRows: Option[Long] = None): (DataFrame, String) = {
    require(keys.nonEmpty, "keys must be nonempty")
    val rightCanBuild = Set("inner", "left", "left_outer", "left_semi",
      "left_anti", "cross").contains(joinType)
    if (rightCanBuild && smallRows.forall(_ <= broadcastRows)) {
      val probeN = math.min(broadcastRows + 1, (Int.MaxValue - 1).toLong).toInt
      smallRows match {
        case Some(n) =>
          // count known: no probe; sample a bounded slice for bytes only
          if (estBytes(small.limit(SizeSampleRows), n)
              .forall(_ <= broadcastBytes))
            return (big.join(broadcast(small), keys, joinType), "broadcast")
        case None =>
          // probe once, cache, and — on a fit — broadcast the CACHED
          // probe itself (limit ≥ count ⇒ the probe IS small, and the
          // small side's plan never executes a second time)
          val probe = small.limit(probeN).cache()
          val n = probe.count()
          if (n <= broadcastRows &&
              estBytes(probe.limit(SizeSampleRows), n)
                .forall(_ <= broadcastBytes))
            return (big.join(broadcast(probe), keys, joinType), "broadcast")
          probe.unpersist(false)
      }
    }
    val saltable = Set("inner", "left", "left_outer", "left_semi",
      "left_anti").contains(joinType)
    val hot = skewReport(big,
        struct(keys.map(col): _*), topK = 1)
      .select("ratio_x100").collect()
      .headOption.map(_.getLong(0)).getOrElse(0L)
    if (saltable && hot >= hotRatioX100)
      (saltedJoin(big, small, keys, saltSource, nSalts, joinType), "salted")
    else
      (big.join(small, keys, joinType), "plain")
  }

  private val SizeSampleRows = 1000

  /** Estimated broadcast bytes of an `n`-row relation: average JSON-
    * serialized row length over a bounded sample × n. JSON overstates
    * binary/array payloads (base64, digit strings) — conservatism in
    * the safe direction for a does-it-fit gate. None = unestimable
    * (exotic type, empty sample with n>0 impossible) → the caller
    * falls back to the row gate alone (the r7 behavior).
    */
  private def estBytes(sample: DataFrame, n: Long): Option[Long] =
    try {
      val a = sample
        .select(avg(length(to_json(struct(sample.columns.map(col): _*)))))
        .collect()(0)
      if (a.isNullAt(0)) Some(0L) else Some((a.getDouble(0) * n).toLong)
    } catch { case _: Exception => None }

  /** Pre-flight skew DIAGNOSIS for a join/aggregation key: the top-k
    * hottest keys with exact counts, ppm share of the relation, and the
    * hot-to-mean ratio — the report that decides between a plain
    * shuffle, AQE's skew split, [[saltedJoin]], or a broadcast, BEFORE
    * burning a 100 TB shuffle to find out. One partial-agg shuffle
    * (carries distinct keys), a k-row TakeOrdered, totals attached by
    * column-derived constant-key broadcast. All-integer output
    * (`share_ppm`, `ratio_x100` vs the CEILED mean — ceiling keeps the
    * divisor nonzero and the arithmetic inside exact long range at any
    * corpus size), so the report hash-verifies.
    */
  def skewReport(df: DataFrame, key: Column, topK: Int): DataFrame = {
    require(topK >= 1, "topK >= 1")
    val counts = df.select(key.cast("string").as("key"))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
    val totals = counts
      .agg(sum("cnt").as("n_rows"), count(lit(1)).as("n_keys"))
      // column-derived constant key: a bare lit folds away → keyless
      // nested loop (the q_collocations lesson)
      .withColumn("__k", pmod(xxhash64(col("n_rows")), lit(1)))
    counts
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(topK)
      .withColumn("__k", pmod(xxhash64(col("cnt")), lit(1)))
      .join(broadcast(totals), "__k")
      .select(col("key"), col("cnt"), col("n_rows"), col("n_keys"),
        expr("cnt * 1000000L div n_rows").as("share_ppm"),
        expr("cnt * 100L div ((n_rows + n_keys - 1L) div n_keys)")
          .as("ratio_x100"))
  }
}
