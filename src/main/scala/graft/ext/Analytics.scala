package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Star-schema / event analytics operators (SURVEY.md §7.4 extension layer).
  *
  * The reference exercises only a sliver of the relational surface (one
  * anti-join, one ranking window — SURVEY.md §2.3/§2.5); these operators fill
  * in the rest of a general-purpose engine: equi/broadcast joins, hash
  * aggregation, grouping sets, analytic windows, top-k, set ops, and
  * batch-mode tumbling/session windows (the batch twins of the streaming
  * operators in `graft.streaming`).
  *
  * Scale notes (100 TB):
  *  - Dimension joins take `broadcast()` hints — at warehouse scale the dim
  *    tables (region/nation/part/supplier) stay far under the broadcast
  *    threshold while the fact table never shuffles for them.
  *  - `topKPerGroup` is one hash shuffle + per-partition sort; rank filter is
  *    applied before any downstream exchange, and Spark pushes the
  *    `row_number <= k` limit into the sort via `WindowGroupLimit` (rank
  *    pushdown), so no partition materializes more than k rows per key
  *    beyond the sort buffer.
  *  - `sessionize` uses Spark's native `session_window` aggregation — the
  *    same operator Structured Streaming uses for state merging, so the
  *    batch and streaming paths share semantics by construction.
  *
  * Determinism note (oracle hash-compare, SURVEY.md §5.2): money aggregates
  * are summed as DECIMAL (exact, associative — order-insensitive across
  * engines) and emitted as DOUBLE; float-sum nondeterminism would otherwise
  * flake the driver's exact hash compare.
  */
object Analytics {

  /** Exact decimal sum of a 2-decimal money column, emitted as double. */
  def moneySum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact decimal sum of `price * (1 - discount)` (both 2-decimal). */
  def discountedRevenue(price: Column, discount: Column): Column =
    sum(price.cast("decimal(18,2)") * (lit(1).cast("decimal(3,2)") - discount.cast("decimal(3,2)")))
      .cast("double")

  /** Top-k rows per group under a total order (pass a deterministic
    * tiebreaker). One shuffle on `partitionCols`; Catalyst's
    * WindowGroupLimit pushes `rn <= k` below the window sort.
    */
  def topKPerGroup(
      df: DataFrame,
      partitionCols: Seq[String],
      order: Seq[Column],
      k: Int,
      rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Global top-k under a total order — Spark plans TakeOrderedAndProject:
    * per-partition heaps + a k-row driver merge, never a full global sort.
    */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Batch sessionization: merge each key's events into sessions separated
    * by gaps >= `gap`. Emits `session_start` (first event), `session_end`
    * (last event + gap, Spark's session_window contract) per key.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, gap: String): DataFrame =
    df.groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("session_value"))
      .select(
        col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"),
        col("session_value"))

  /** Batch tumbling window aggregation per key — the batch twin of the
    * streaming windowed agg in `graft.streaming.Streams`.
    */
  def tumbling(df: DataFrame, tsCol: String, width: String, keys: Seq[String]): DataFrame =
    sliding(df, tsCol, width, width, keys) // slide == width ⇒ no replication

  /** Cohort retention — the product-analytics companion to [[funnel]]:
    * each user joins the COHORT of its first active period (`date_trunc`
    * of the earliest event), and the matrix counts users active again k
    * periods later, per cohort. `unitDays` converts the period gap to an
    * integer offset (1 for 'day', 7 for 'week').
    *
    * Scale: the event scan collapses immediately to DISTINCT
    * (user, period) pairs — partial-aggregated map-side, so the first
    * shuffle carries user-periods, not events. The cohort (per-user min)
    * rides a window over a user-hash shuffle of that already-tiny
    * relation, and the final (cohort, offset) aggregate is
    * matrix-sized. No event row is shuffled twice; nothing collects.
    * Counts are exact longs — a (user, period) pair is unique by the
    * distinct, so `count(*)` IS `countDistinct(user)` without the
    * distinct-agg expansion.
    */
  def retention(df: DataFrame, userCol: String, tsCol: String,
      unit: String, unitDays: Int): DataFrame = {
    val activity = df
      .select(col(userCol), to_date(date_trunc(unit, col(tsCol))).as("period"))
      .distinct()
    val w = Window.partitionBy(col(userCol))
    activity
      .withColumn("cohort", min(col("period")).over(w))
      .withColumn("period_offset",
        floor(datediff(col("period"), col("cohort")) / unitDays).cast("long"))
      .groupBy("cohort", "period_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** EXACT-INTEGER volume anomaly flags: slots whose count deviates from
    * their group's mean by more than `sigmas` population standard
    * deviations — the ingest-monitoring screen ("why did tuesday's
    * crawl drop 80%?") that pairs with [[expectations]]' row-level
    * rules.
    *
    * The σ test runs ENTIRELY in integer arithmetic: with n slots,
    * S = Σcnt, SS = Σcnt², flag iff
    *
    *   (cnt·n − S)² > sigmas²·(n·SS − S²)
    *
    * — both sides exact longs (|cnt·n − S| < S·2 and n·SS fit 2^63 for
    * counts·√n below ~3·10⁹; a decade of daily slots leaves 8 orders of
    * magnitude of headroom per group), so the flag set hash-verifies
    * against plain SQL with no float tolerance. Scale shape: the slot
    * aggregate is one partial-agg shuffle on (group, slot); the stats
    * relation is |groups|-sized and BROADCASTS back onto the slot
    * relation — the corpus is scanned once, nothing corpus-sized
    * shuffles twice.
    */
  def anomalousSlots(df: DataFrame, groupCol: String, tsCol: String,
      width: String, sigmas: Int): DataFrame = {
    // materialize the (groups × slots)-sized relation so the corpus is
    // scanned ONCE — both the flag side and the stats side read the
    // checkpointed slots, not the events
    val slots = df
      .groupBy(col(groupCol), date_trunc(width, col(tsCol)).as("slot"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val stats = slots.groupBy(col(groupCol)).agg(
      count(lit(1)).as("__n"), sum("cnt").as("__s"),
      sum(col("cnt") * col("cnt")).as("__ss"))
    val dev = col("cnt") * col("__n") - col("__s")
    slots.join(broadcast(stats), groupCol)
      .filter(dev * dev > lit(sigmas.toLong * sigmas)
        * (col("__n") * col("__ss") - col("__s") * col("__s")))
      .select(col(groupCol), col("slot"), col("cnt"))
  }

  /** GAP-FILL + forward-fill resample: one row per (key, grid slot) over
    * each key's own observed span — absent slots materialize with
    * count 0 and the last observed value carried forward (nulls before
    * the first observation). The time-series regularization every
    * downstream window/trainer assumes: models read a dense matrix, the
    * warehouse stores a sparse one.
    *
    * Shapes that matter at 100 TB:
    *  - the grid derives from per-key min/max (2 longs per key), never a
    *    global span — a key active one week costs 7 slots even if the
    *    corpus spans a decade;
    *  - slot explosion is `sequence()` per key row (map-side, no join
    *    against a calendar dimension), then ONE left join back to the
    *    per-slot aggregates and ONE running-window pass, all on the same
    *    key partitioning — Catalyst reuses the shuffle;
    *  - the forward fill is `last(_, ignoreNulls)` over an unbounded-
    *    preceding ROWS frame: a running carry, not a per-slot lookback
    *    scan. Grid size is span/width per key — the caller picks a
    *    width that keeps (max span)/width bounded, the usual resample
    *    contract.
    */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String, valueFp: Column,
      width: String): DataFrame = {
    val slot = date_trunc(width, col(tsCol))
    val perSlot = df
      .groupBy(col(keyCol), slot.as("slot"))
      .agg(count(lit(1)).as("cnt"), max(valueFp).as("__v"))
    val grid = perSlot
      .groupBy(col(keyCol))
      .agg(min("slot").as("__d0"), max("slot").as("__d1"))
      .select(col(keyCol),
        explode(sequence(col("__d0"), col("__d1"),
          expr(s"INTERVAL 1 $width"))).as("slot"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perSlot, Seq(keyCol, "slot"), "left")
      .select(col(keyCol), col("slot"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        last(col("__v"), ignoreNulls = true).over(w).as("v_ff"))
  }

  /** Ordered event funnel: for each user, the earliest time of stage 1,
    * the earliest stage-2 event STRICTLY AFTER it, the earliest stage-3
    * event strictly after that, and so on — the product-analytics
    * conversion primitive. One conditional aggregate per stage over the
    * SAME key shuffle (the per-stage relations re-join on the group key,
    * all post-aggregation — tiny vs the event scan): stage k's aggregate
    * is min(ts) filtered by `event_type = stages(k) AND ts > t_{k-1}`.
    * Nulls propagate: a user who never reaches stage k has NULL from k on.
    */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one stage")
    val first = df.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("t1"))
    stages.zipWithIndex.tail.foldLeft(first) { case (acc, (stage, i)) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      val nxt = df.filter(col(typeCol) === stage)
        .select(col(userCol), col(tsCol).as("__ts"))
        .join(acc.select(col(userCol), col(prev)), userCol)
        .filter(col("__ts") > col(prev))
        .groupBy(col(userCol))
        .agg(min(col("__ts")).as(cur))
      acc.join(nxt, Seq(userCol), "left")
    }
  }

  /** [[funnel]] with a CONVERSION WINDOW: stage k counts only within
    * `window` of stage k−1's instant (the product-analytics default —
    * "purchased within 24h of clicking", not ever-after). Same
    * per-stage conditional-min shape and the same scale contract; only
    * the residual predicate gains the upper bound. Nulls cascade
    * identically: a user converting outside the window is NULL from
    * that stage on.
    */
  def funnelWindowed(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String], window: String): DataFrame = {
    require(stages.nonEmpty, "at least one stage")
    val first = df.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("t1"))
    stages.zipWithIndex.tail.foldLeft(first) { case (acc, (stage, i)) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      val nxt = df.filter(col(typeCol) === stage)
        .select(col(userCol), col(tsCol).as("__ts"))
        .join(acc.select(col(userCol), col(prev)), userCol)
        .filter(col("__ts") > col(prev) &&
          col("__ts") <= col(prev) + expr(s"INTERVAL $window"))
        .groupBy(col(userCol))
        .agg(min(col("__ts")).as(cur))
      acc.join(nxt, Seq(userCol), "left")
    }
  }

  /** Per-column data-quality profile in ONE pass: row count, nulls,
    * exact distinct count, min/max (stringified so heterogeneous column
    * types share a schema), emitted long-format (one row per column).
    * All measures ride a single aggregate over a single scan — Spark
    * plans the multi-column distinct as one Expand-based aggregate, so
    * profiling N columns costs one shuffle, not N jobs (the schema-
    * inference-era `describe` loop shape). The natural post-ingest DQ
    * gate for the reference's inferred-schema CSV loads.
    */
  /** Declarative data-quality EXPECTATIONS (the Great-Expectations /
    * dbt-test shape as one operator): each rule is a name + a boolean
    * predicate column; the report is one row per rule with checked and
    * violation counts and a pass flag. ALL rules evaluate in a SINGLE
    * aggregate pass over ONE scan — a quality gate over 100 TB costs one
    * read no matter how many rules it carries (conditional sums fold
    * into the same partial-agg tree), then the 1×N-rule row pivots to
    * N rows by an explode over a literal struct array (metadata scale).
    * Null predicate results count as VIOLATIONS (a rule that cannot
    * evaluate is a failed expectation, the conservative read).
    */
  def expectations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col("__n").as("n_checked"),
        coalesce(col(s"__v$i"), lit(0L)).as("n_violations"))
    }: _*)
    one.select(explode(rows).as("r"))
      .select(col("r.rule"), col("r.n_checked"), col("r.n_violations"))
      .withColumn("pass", col("n_violations") === 0L)
  }

  def profileTable(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val arms = cols.map(c => struct(
      lit(c).as("col_name"),
      col("__n").as("n_rows"),
      (col("__n") - col(s"__nn_$c")).as("n_null"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__mn_$c").as("min_value"),
      col(s"__mx_$c").as("max_value")))
    wide.select(explode(array(arms: _*)).as("p")).select("p.*")
  }

  /** Batch sliding (hopping) window aggregation: width-`width` windows
    * every `slide` — each event replicates into width/slide overlapping
    * windows (Spark plans the replication as an Expand feeding ONE hash
    * aggregate, so the shuffle is keyed by (window, keys) and partial
    * aggregation still applies). Keep the width/slide ratio small at
    * scale: the Expand multiplies the pre-shuffle row count by it.
    * Streaming twin: the same `window(ts, width, slide)` under a
    * watermark in `streaming/EventStreams`.
    */
  def sliding(df: DataFrame, tsCol: String, width: String, slide: String,
      keys: Seq[String]): DataFrame =
    df.groupBy(window(col(tsCol), width, slide) +: keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("window_value"))
      .select(
        keys.map(col) ++ Seq(
          col("window.start").as("window_start"),
          col("n_events"),
          col("window_value")): _*)

  /** Per-key EWMA smoothing in EXACT fixed-point arithmetic:
    * s₁ = x₁, sₜ = (num·xₜ + (den−num)·sₜ₋₁) div den, every value an
    * integer (α = num/den rational; inputs pre-scaled by the caller, e.g.
    * `floor(value·100)`). The recurrence is NON-associative — no window
    * frame or scan-style aggregate expresses it — so the fold runs
    * per key over that key's own ordered event array
    * (`sort_array(collect_list)` → an `aggregate` HOF building the
    * running array → `posexplode`): one key shuffle, group-local
    * sequential work, corpus never re-scanned. Per-key arrays are
    * per-entity event runs (the sessionization boundedness assumption —
    * document/enforce an event cap upstream for adversarial keys).
    * Because every step is integer, the smoothed series replays
    * bit-for-bat in the oracle's recursive CTE. Output: (key, seq
    * [1-based event rank], x_fp, s_fp).
    *
    * Overflow bound: |num·x + (den−num)·s| must stay under 2^63 —
    * den·max|x_fp| < 2^63, comfortable for ppm-scaled metrics.
    */
  /** [[ewmaFixedPoint]] + an EWMA band → per-event ANOMALY flags, still
    * exact integer: alongside the smoothed level sₜ, a second recurrence
    * smooths the absolute residual dₜ = (num·rₜ + (den−num)·dₜ₋₁) div den
    * with rₜ = |xₜ − sₜ₋₁|, and event t flags when its residual exceeds
    * the band, rₜ·bandDen > bandNum·dₜ₋₁ (e.g. 3/1 = "3× the running
    * typical deviation" — the EWMA control-chart test). The first event
    * seeds (s=x, d=0) and never flags; a zero band (constant history)
    * flags ANY deviation, the conservative reading. Same fold shape,
    * shuffle cost, boundedness assumption, and recursive-CTE
    * verifiability as the plain smoother. Output: (key, seq, x_fp, s_fp,
    * d_fp, is_anom).
    */
  def ewmaAnomaly(df: DataFrame, keyCol: String, orderCol: Column,
      xFp: Column, num: Long, den: Long, bandNum: Long,
      bandDen: Long): DataFrame = {
    require(num >= 1 && num <= den, "alpha = num/den must be in (0, 1]")
    require(bandNum >= 1 && bandDen >= 1, "band must be positive")
    val packed = df
      .select(col(keyCol), struct(orderCol.as("__o"), xFp.as("x")).as("__e"))
      .groupBy(keyCol)
      .agg(sort_array(collect_list(col("__e"))).as("__es"))
    val folded = packed.withColumn("__ss",
      expr(s"""aggregate(
                 __es,
                 CAST(array() AS ARRAY<STRUCT<s: BIGINT, d: BIGINT, a: BOOLEAN>>),
                 (acc, e) -> CASE WHEN size(acc) = 0
                   THEN array(named_struct('s', e.x, 'd', CAST(0 AS BIGINT),
                                           'a', false))
                   ELSE array_append(acc, named_struct(
                     's', ${fdiv(s"${num}L * e.x " +
                            s"+ ${den - num}L * element_at(acc, -1).s", den)},
                     'd', ${fdiv(s"${num}L * abs(e.x - element_at(acc, -1).s) " +
                            s"+ ${den - num}L * element_at(acc, -1).d", den)},
                     'a', abs(e.x - element_at(acc, -1).s) * ${bandDen}L
                          > ${bandNum}L * element_at(acc, -1).d)) END)"""))
    folded
      .select(col(keyCol), posexplode(arrays_zip(col("__es"), col("__ss"))))
      .select(col(keyCol), (col("pos") + 1).as("seq"),
        col("col.__es.x").as("x_fp"), col("col.__ss.s").as("s_fp"),
        col("col.__ss.d").as("d_fp"), col("col.__ss.a").as("is_anom"))
  }

  def ewmaFixedPoint(df: DataFrame, keyCol: String, orderCol: Column,
      xFp: Column, num: Long, den: Long): DataFrame = {
    require(num >= 1 && num <= den, "alpha = num/den must be in (0, 1]")
    val packed = df
      .select(col(keyCol), struct(orderCol.as("__o"), xFp.as("x")).as("__e"))
      .groupBy(keyCol)
      .agg(sort_array(collect_list(col("__e"))).as("__es"))
    // fold building the running-smoothed array: state = array of s so far
    val folded = packed.withColumn("__ss",
      expr(s"""aggregate(
                 __es,
                 CAST(array() AS ARRAY<BIGINT>),
                 (acc, e) -> CASE WHEN size(acc) = 0 THEN array(e.x)
                   ELSE array_append(acc,
                     ${fdiv(s"${num}L * e.x " +
                       s"+ ${den - num}L * element_at(acc, -1)", den)}) END)"""))
    folded
      .select(col(keyCol), posexplode(arrays_zip(col("__es"), col("__ss"))))
      .select(col(keyCol), (col("pos") + 1).as("seq"),
        col("col.__es.x").as("x_fp"), col("col.__ss").as("s_fp"))
  }

  /** SQL FLOOR-division `⌊a / d⌋` for a literal positive `d`: Spark's
    * `div` truncates toward zero while the DuckDB oracles' `//` floors,
    * so the two silently diverge on NEGATIVE numerators (a negative
    * x_fp, or a negative smoothed level produced from one). Subtracting
    * `pmod` (always in [0, d)) first makes the numerator an exact
    * multiple of `d`, on which truncation IS floor — both engines then
    * agree on ALL longs, closing the former nonnegative-input caveat by
    * construction instead of guarding it. Identical to plain `div` for
    * nonnegative numerators, so every existing oracle hash holds.
    */
  private[ext] def fdiv(a: String, d: Long): String =
    s"((($a) - pmod(($a), ${d}L)) div ${d}L)"
}
