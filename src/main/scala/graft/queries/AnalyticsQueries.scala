package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.DeclaredQuery
import graft.ext.Analytics
import graft.io.Tables

/** Star-schema / event analytics queries (SURVEY.md §7.4 extension layer):
  * the general relational surface the reference never exercises, declared
  * over the driver corpus with DuckDB oracles.
  *
  * Money aggregates follow the determinism contract in `Analytics`: exact
  * DECIMAL sums emitted as DOUBLE on both the Spark and the oracle side.
  */
object AnalyticsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.testTable(s, dir, name)

  /** Shared nightly-batch fixtures for the incremental-join queries. */
  private def joinOrders(s: SparkSession, dir: String, i: Int): DataFrame =
    t(s, dir, "orders")
      .select(col("o_custkey").as("custkey"), col("o_orderkey"),
        col("o_totalprice"))
      .filter(col("o_orderkey") % 3 === i)

  private def joinCust(s: SparkSession, dir: String, i: Int): DataFrame =
    t(s, dir, "customer")
      .select(col("c_custkey").as("custkey"), col("c_name"),
        col("c_mktsegment"))
      .filter(col("custkey") % 2 === i)

  import ReferenceQueries.EvCte

  val all: Seq[DeclaredQuery] = Seq(

    // TPC-H Q1-shaped pricing summary: hash aggregation with partial
    // (map-side) aggregation — the canonical "would survive 100 TB" agg.
    DeclaredQuery(
      "q_pricing_summary",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            Analytics.moneySum(col("l_quantity")).as("sum_qty"),
            Analytics.moneySum(col("l_extendedprice")).as("sum_base_price"),
            Analytics.discountedRevenue(col("l_extendedprice"), col("l_discount"))
              .as("sum_disc_price"),
            (Analytics.moneySum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
                     COUNT(*) AS count_order
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              GROUP BY l_returnflag, l_linestatus""")),

    // TPC-H Q5-shaped star join: fact table shuffles only for the
    // fact-fact join; every dimension is broadcast (customer/supplier/
    // nation/region stay tiny relative to lineitem at any SF).
    DeclaredQuery(
      "q_star_revenue",
      (s, dir) => {
        val orders = t(s, dir, "orders")
          .filter(
            col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
              col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        t(s, dir, "lineitem")
          .join(orders, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
          .join(
            broadcast(t(s, dir, "supplier")),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(
            broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(Analytics.discountedRevenue(col("l_extendedprice"), col("l_discount"))
            .as("revenue"))
      },
      Some("""SELECT n_name,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
              FROM lineitem, orders, customer, supplier, nation, region
              WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
                AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
                AND r_name = 'ASIA'
                AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              GROUP BY n_name""")),

    // Top-k per group: rank pushdown (WindowGroupLimit) keeps only k rows
    // per key below the window sort.
    DeclaredQuery(
      "q_topk_per_group",
      (s, dir) =>
        Analytics.topKPerGroup(
          t(s, dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
          Seq("o_custkey"),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc),
          k = 3),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn
              FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                           ROW_NUMBER() OVER (PARTITION BY o_custkey
                                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                    FROM orders)
              WHERE rn <= 3""")),

    // Grouping sets: ROLLUP over status × priority.
    DeclaredQuery(
      "q_rollup",
      (s, dir) =>
        t(s, dir, "orders")
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(
            count(lit(1)).as("n_orders"),
            Analytics.moneySum(col("o_totalprice")).as("total_spend")),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
              FROM orders
              GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""")),

    // Grouping sets: full CUBE over status × priority (2^2 groupings).
    DeclaredQuery(
      "q_cube",
      (s, dir) =>
        t(s, dir, "orders")
          .cube("o_orderstatus", "o_orderpriority")
          .agg(
            count(lit(1)).as("n_orders"),
            Analytics.moneySum(col("o_totalprice")).as("total_spend")),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
              FROM orders
              GROUP BY CUBE(o_orderstatus, o_orderpriority)""")),

    // Explicit GROUPING SETS (the general form rollup/cube desugar to) —
    // Expand-based, partial agg applies to every grouping set.
    DeclaredQuery(
      "q_grouping_sets",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders_v")
        s.sql("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
                        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                          AS total_spend
                 FROM orders_v
                 GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
              FROM orders
              GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")),

    // Conditional aggregation (SQL FILTER clause ≡ sum(when...)): one scan
    // computing disjoint-segment aggregates — the idiom that replaces N
    // separate filtered scans with one pass at warehouse scale.
    DeclaredQuery(
      "q_filtered_agg",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n_total"),
            count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
            count(when(col("o_orderstatus") === "O", 1)).as("n_open"),
            Analytics.moneySum(
              when(col("o_orderstatus") === "F", col("o_totalprice")))
              .as("spend_finished")),
      Some("""SELECT o_orderpriority,
                     COUNT(*) AS n_total,
                     COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
                     COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                          FILTER (WHERE o_orderstatus = 'F') AS DOUBLE)
                       AS spend_finished
              FROM orders GROUP BY o_orderpriority""")),

    // ntile bucketing: equal-frequency quartiles per customer — the
    // windowed binning primitive behind quantile-based corpus filtering.
    // Deterministic tiebreak on the unique order key.
    DeclaredQuery(
      "q_ntile",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            ntile(4).over(w).as("price_quartile"))
      },
      Some("""SELECT o_orderkey, o_custkey,
                     NTILE(4) OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice ASC, o_orderkey ASC)
                       AS price_quartile
              FROM orders""")),

    // Analytic windows: lag/lead + running total + sequence per customer.
    DeclaredQuery(
      "q_window_analytics",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders").select(
          col("o_custkey"),
          col("o_orderkey"),
          col("o_totalprice"),
          lag("o_totalprice", 1).over(w).as("prev_price"),
          lead("o_totalprice", 1).over(w).as("next_price"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("cum_spend"),
          row_number().over(w).as("order_seq"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
                     LAG(o_totalprice, 1) OVER w AS prev_price,
                     LEAD(o_totalprice, 1) OVER w AS next_price,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                       (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_spend,
                     ROW_NUMBER() OVER w AS order_seq
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""")),

    // RANGE-frame window: per customer, trailing-90-day order spend — a
    // value-range frame over event time (not a row count), the shape of
    // every "trailing N days" metric.
    DeclaredQuery(
      "q_range_frame",
      (s, dir) => {
        // NTZ → LTZ (session is UTC) → epoch seconds for the range frame
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
          .rangeBetween(-90L * 86400, 0)
        t(s, dir, "orders").select(
          col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double").as("trailing_90d_spend"),
          count(lit(1)).over(w).as("trailing_90d_orders"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
                       AS trailing_90d_spend,
                     COUNT(*) OVER w AS trailing_90d_orders
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                           RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)""")),

    // Distinct aggregates (expand + two-phase agg under the hood).
    DeclaredQuery(
      "q_distinct_agg",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(col("l_partkey")).as("n_part"),
            count(lit(1)).as("n_rows")),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
                     COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n_rows
              FROM lineitem GROUP BY l_returnflag""")),

    // Left-semi join: existence filtering without row duplication (the
    // general form of the reference's NOT IN, positive polarity).
    DeclaredQuery(
      "q_semi_join",
      (s, dir) => {
        val bigSpenders = t(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
        t(s, dir, "customer")
          .join(bigSpenders, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name", "c_acctbal")
      },
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
              WHERE EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_totalprice > 300000.0)""")),

    // Ordered conversion funnel view → click → purchase: earliest stage-k
    // event strictly after stage k−1, NULL once a user drops out. The
    // oracle chains the same strictly-after minimums.
    DeclaredQuery(
      "q_funnel",
      (s, dir) =>
        Analytics.funnel(t(s, dir, "events"), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase")),
      Some(s"""$EvCte,
              a AS (SELECT user_id, MIN(ts) AS t1 FROM ev
                    WHERE event_type = 'view' GROUP BY user_id),
              b AS (SELECT e.user_id, MIN(e.ts) AS t2
                    FROM ev e JOIN a ON a.user_id = e.user_id
                    WHERE e.event_type = 'click' AND e.ts > a.t1
                    GROUP BY e.user_id),
              c AS (SELECT e.user_id, MIN(e.ts) AS t3
                    FROM ev e JOIN b ON b.user_id = e.user_id
                    WHERE e.event_type = 'purchase' AND e.ts > b.t2
                    GROUP BY e.user_id)
              SELECT a.user_id, a.t1, b.t2, c.t3
              FROM a LEFT JOIN b ON b.user_id = a.user_id
                     LEFT JOIN c ON c.user_id = a.user_id""")),

    // WINDOWED funnel: each stage converts only within 48h of the
    // previous one — the time-bound form every conversion metric
    // actually uses. Same per-stage conditional-min plan; only the
    // residual predicate gains the upper bound, so users converting
    // late null out from that stage on.
    DeclaredQuery(
      "q_funnel_windowed",
      (s, dir) =>
        Analytics.funnelWindowed(t(s, dir, "events"), "user_id", "ts",
          "event_type", Seq("view", "click", "purchase"), "48 hours"),
      Some(s"""$EvCte,
              a AS (SELECT user_id, MIN(ts) AS t1 FROM ev
                    WHERE event_type = 'view' GROUP BY user_id),
              b AS (SELECT e.user_id, MIN(e.ts) AS t2
                    FROM ev e JOIN a ON a.user_id = e.user_id
                    WHERE e.event_type = 'click' AND e.ts > a.t1
                      AND e.ts <= a.t1 + INTERVAL 48 HOUR
                    GROUP BY e.user_id),
              c AS (SELECT e.user_id, MIN(e.ts) AS t3
                    FROM ev e JOIN b ON b.user_id = e.user_id
                    WHERE e.event_type = 'purchase' AND e.ts > b.t2
                      AND e.ts <= b.t2 + INTERVAL 48 HOUR
                    GROUP BY e.user_id)
              SELECT a.user_id, a.t1, b.t2, c.t3
              FROM a LEFT JOIN b ON b.user_id = a.user_id
                     LEFT JOIN c ON c.user_id = a.user_id""")),

    // Cohort retention matrix (day-granularity): users bucketed by first
    // active day, counted again at each later active-day offset. The event
    // scan collapses to distinct (user, day) pairs map-side, so no shuffle
    // carries event rows — see Analytics.retention's scale contract.
    DeclaredQuery(
      "q_retention",
      (s, dir) =>
        Analytics.retention(t(s, dir, "events"), "user_id", "ts", "day", 1),
      Some(s"""$EvCte,
              act AS (SELECT DISTINCT user_id,
                             CAST(date_trunc('day', ts) AS DATE) AS period
                      FROM ev),
              coh AS (SELECT user_id, MIN(period) AS cohort
                      FROM act GROUP BY user_id)
              SELECT cohort,
                     CAST(date_diff('day', cohort, period) AS BIGINT) AS period_offset,
                     COUNT(*) AS n_users
              FROM act JOIN coh USING (user_id)
              GROUP BY 1, 2""")),

    // GAP-FILL + forward-fill resample: dense per-(user, day) grid over
    // each user's own active span — missing days appear with cnt=0 and
    // the last observed day-max value carried forward. Grid from per-key
    // min/max + sequence() (no calendar-dimension join); fill is one
    // running ROWS window on the same key shuffle. Values fixed-point so
    // both engines land on identical longs.
    DeclaredQuery(
      "q_gap_fill",
      (s, dir) =>
        Analytics.gapFill(
          t(s, dir, "events").filter(col("user_id") % 10 === 0),
          "user_id", "ts", floor(col("value") * 100).cast("long"), "day"),
      Some(s"""$EvCte,
              daily AS (SELECT user_id, date_trunc('day', ts) AS slot,
                               COUNT(*) AS cnt,
                               MAX(CAST(floor(value * 100) AS BIGINT)) AS v
                        FROM ev WHERE user_id % 10 = 0
                        GROUP BY 1, 2),
              span AS (SELECT user_id, MIN(slot) AS d0, MAX(slot) AS d1
                       FROM daily GROUP BY user_id),
              grid AS (SELECT user_id,
                              unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS slot
                       FROM span)
              SELECT g.user_id, g.slot, COALESCE(d.cnt, 0) AS cnt,
                     LAST_VALUE(d.v IGNORE NULLS) OVER (
                       PARTITION BY g.user_id ORDER BY g.slot
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff
              FROM grid g LEFT JOIN daily d USING (user_id, slot)""")),

    // EXACT-INTEGER anomaly flags over daily ingest volume: days whose
    // event count sits more than 2 population σ from their type's mean,
    // tested as (cnt·n − S)² > 4·(n·SS − S²) — pure long arithmetic, no
    // float tolerance in the comparison, so the flag set hash-verifies.
    // One (type, day) partial-agg shuffle; the |types|-row stats side
    // broadcasts back.
    DeclaredQuery(
      "q_anomaly_days",
      (s, dir) =>
        Analytics.anomalousSlots(t(s, dir, "events"), "event_type", "ts",
          "day", sigmas = 2),
      Some(s"""$EvCte,
              slots AS (SELECT event_type,
                               CAST(date_trunc('day', ts) AS TIMESTAMP) AS slot,
                               COUNT(*) AS cnt
                        FROM ev GROUP BY 1, 2),
              st AS (SELECT event_type, COUNT(*) AS n, SUM(cnt) AS s,
                            SUM(cnt * cnt) AS ss
                     FROM slots GROUP BY event_type)
              SELECT slots.event_type, slot, cnt
              FROM slots JOIN st USING (event_type)
              WHERE (cnt * n - s) * (cnt * n - s) > 4 * (n * ss - s * s)""")),

    // Single-pass per-column DQ profile: rows/nulls/exact-distinct/extrema
    // for 4 columns in ONE Expand-based aggregate over one scan (the
    // post-ingest quality gate for inferred-schema loads). Long-format
    // output; doubles/timestamps excluded from the fixture because their
    // string renderings are engine-specific.
    DeclaredQuery(
      "q_profile_table",
      (s, dir) =>
        Analytics.profileTable(t(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")),
      Some {
        def arm(c: String) =
          s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
                     COUNT(*) - COUNT($c) AS n_null,
                     COUNT(DISTINCT $c) AS n_distinct,
                     MIN($c)::VARCHAR AS min_value,
                     MAX($c)::VARCHAR AS max_value
              FROM orders"""
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
          .map(arm).mkString(" UNION ALL ")
      }),

    // Morton (Z-order) key — the 2-D layout kernel behind
    // Tables.writeWarehouseZOrdered, verified as a scalar: 16-bit min/max
    // bucketing + the bit-spreading interleave ladder, pure integer/
    // double arithmetic with identical operation order in both engines.
    DeclaredQuery(
      "q_zorder_key",
      (s, dir) =>
        t(s, dir, "customer").select(col("c_custkey"),
          Tables.mortonKey(col("c_acctbal"), -1000.0, 10000.0,
            col("c_custkey"), 0.0, 200000.0).as("zkey")),
      Some {
        def spread(x: String): String = {
          val s1 = s"((($x) | (($x) << 8)) & 16711935)"
          val s2 = s"((($s1) | (($s1) << 4)) & 252645135)"
          val s3 = s"((($s2) | (($s2) << 2)) & 858993459)"
          s"((($s3) | (($s3) << 1)) & 1431655765)"
        }
        def bucket(c: String, mn: String, scale: String): String =
          s"CAST(least(greatest(floor((($c::DOUBLE) - ($mn)) * 65535.0 / ($scale)), 0.0), 65535.0) AS BIGINT)"
        val bx = bucket("c_acctbal", "-1000.0", "11000.0")
        val by = bucket("c_custkey", "0.0", "200000.0")
        s"""WITH b AS (SELECT c_custkey, $bx AS bx, $by AS by FROM customer)
            SELECT c_custkey, (${spread("bx")} | (${spread("by")} << 1)) AS zkey
            FROM b"""
      }),

    // Full outer join — both-sides-preserved merge of two aggregates whose
    // key sets only partially overlap (the filters manufacture one-sided
    // nations). Shuffle on the join key with null-filled absentees; the
    // COALESCE'd key keeps the output schema total.
    DeclaredQuery(
      "q_full_outer",
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_acctbal") > 7000.0)
          .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_rich_cust"))
        val sp = t(s, dir, "supplier").filter(col("s_acctbal") < 0.0)
          .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_poor_supp"))
        c.join(sp, col("c_nationkey") === col("s_nationkey"), "full_outer")
          .select(
            coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
            col("n_rich_cust"), col("n_poor_supp"))
      },
      Some("""WITH c AS (SELECT c_nationkey, COUNT(*) AS n_rich_cust
                         FROM customer WHERE c_acctbal > 7000.0
                         GROUP BY c_nationkey),
                   s AS (SELECT s_nationkey, COUNT(*) AS n_poor_supp
                         FROM supplier WHERE s_acctbal < 0.0
                         GROUP BY s_nationkey)
              SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
                     n_rich_cust, n_poor_supp
              FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey""")),

    // Pivot: event counts per user spread into one column per event type
    // (Spark pivot with an explicit value list = deterministic schema; the
    // oracle is the equivalent conditional aggregation).
    DeclaredQuery(
      "q_pivot",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
          .agg(count(lit(1)))
          .na.fill(0L),
      Some(s"""$EvCte
              SELECT user_id,
                     COUNT(*) FILTER (event_type = 'click') AS click,
                     COUNT(*) FILTER (event_type = 'view') AS view,
                     COUNT(*) FILTER (event_type = 'purchase') AS purchase,
                     COUNT(*) FILTER (event_type = 'signup') AS signup,
                     COUNT(*) FILTER (event_type = 'error') AS error
              FROM ev GROUP BY user_id""")),

    // Native unpivot (melt): wide measure columns → long (measure, value)
    // rows, re-aggregated per flag — the Expand-based inverse of pivot.
    DeclaredQuery(
      "q_unpivot",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select("l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
          .unpivot(
            Array(col("l_returnflag")),
            Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
            "measure", "value")
          .groupBy("l_returnflag", "measure")
          .agg(
            Analytics.moneySum(col("value")).as("total"),
            count(lit(1)).as("n")),
      Some("""WITH m AS (
                SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS value
                FROM lineitem
                UNION ALL
                SELECT l_returnflag, 'l_extendedprice', l_extendedprice
                FROM lineitem
                UNION ALL
                SELECT l_returnflag, 'l_discount', l_discount FROM lineitem)
              SELECT l_returnflag, measure,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
                     COUNT(*) AS n
              FROM m GROUP BY l_returnflag, measure""")),

    // Set ops (both distinct-set semantics in Spark and ANSI SQL).
    DeclaredQuery(
      "q_intersect",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderstatus") === "O").select("o_custkey")
          .intersect(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
              INTERSECT
              SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""")),

    DeclaredQuery(
      "q_except",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderstatus") === "O").select("o_custkey")
          .except(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
              EXCEPT
              SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""")),

    // Global top-k: TakeOrderedAndProject (per-partition heaps + k-row
    // driver merge) — never a full global sort.
    DeclaredQuery(
      "q_sort_limit",
      (s, dir) =>
        Analytics.topK(
          t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice"),
          Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc),
          k = 20),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
              FROM lineitem
              ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
              LIMIT 20""")),

    // Exact interpolated percentiles (single-pass sort-based agg; both
    // engines implement the standard (n-1)p interpolation identically).
    DeclaredQuery(
      "q_percentile",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            expr("percentile(l_quantity, 0.5)").as("median_qty"),
            expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
            expr("percentile(l_extendedprice, 0.75)").as("p75_price")),
      Some("""SELECT l_returnflag,
                     quantile_cont(l_quantity, 0.5) AS median_qty,
                     quantile_cont(l_extendedprice, 0.25) AS p25_price,
                     quantile_cont(l_extendedprice, 0.75) AS p75_price
              FROM lineitem GROUP BY l_returnflag""")),

    // Sketch aggregates: HLL++ distinct and GK-style quantile estimates.
    // Raw approximations are engine-specific (no SQL twin), so the query
    // emits the EXACT values side-by-side with deterministic error-bound
    // flags: |approx − exact| must clear published bounds with wide margin
    // (3×rsd for HLL++; the exact p45..p55 band for the high-accuracy
    // median sketch), making the flags stable TRUE regardless of merge
    // order — which the oracle asserts literally. Hash-green therefore
    // verifies the exact columns bit-for-bit AND pins the sketches inside
    // their bounds; SketchSpec additionally bounds the raw errors.
    DeclaredQuery(
      "q_sketch_approx",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n_rows"),
            countDistinct(col("l_partkey")).as("exact_parts"),
            approx_count_distinct(col("l_partkey"), rsd = 0.02).as("__ap"),
            expr("percentile(l_extendedprice, 0.5)").as("exact_median_price"),
            expr("percentile(l_extendedprice, 0.45)").as("__p45"),
            expr("percentile(l_extendedprice, 0.55)").as("__p55"),
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
              .as("__am"))
          .select(
            col("l_returnflag"), col("n_rows"), col("exact_parts"),
            (abs(col("__ap") - col("exact_parts"))
              <= col("exact_parts") * 0.06).as("approx_parts_ok"),
            col("exact_median_price"),
            (col("__am") >= col("__p45") && col("__am") <= col("__p55"))
              .as("approx_median_ok")),
      Some("""SELECT l_returnflag,
                     COUNT(*) AS n_rows,
                     COUNT(DISTINCT l_partkey) AS exact_parts,
                     TRUE AS approx_parts_ok,
                     quantile_cont(l_extendedprice, 0.5) AS exact_median_price,
                     TRUE AS approx_median_ok
              FROM lineitem GROUP BY l_returnflag""")),

    // Semi-structured: JSON field extraction from the events props column,
    // aggregated per type (codegen'd JsonPath evaluation, no UDF).
    DeclaredQuery(
      "q_json_extract",
      (s, dir) =>
        t(s, dir, "events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("k")).as("sum_k"),
            max(col("k")).as("max_k")),
      // CAST the SUM: DuckDB widens SUM(int) to HUGEINT (int128); Spark's
      // sum(int) is bigint and the driver's hash compare is type-sensitive.
      Some(s"""$EvCte
              SELECT event_type, COUNT(*) AS n_events,
                     CAST(SUM((props->>'k')::INT) AS BIGINT) AS sum_k,
                     MAX((props->>'k')::INT) AS max_k
              FROM ev GROUP BY event_type""")),

    // Per-key EWMA smoothing in exact fixed-point (α = 1/5): the
    // monitoring smoother whose recurrence no window frame expresses
    // (non-associative) — one key shuffle, per-key ordered array fold,
    // all-integer so every step replays bit-for-bit in the oracle's
    // recursive CTE. The fold divides with FLOOR semantics
    // (Analytics.fdiv), matching the oracle's `//` on all longs — no
    // nonnegative-input caveat.
    DeclaredQuery(
      "q_ewma",
      (s, dir) => {
        import ReferenceQueries.EvCte
        Analytics.ewmaFixedPoint(
          t(s, dir, "events"),
          "user_id",
          struct(col("ts"), col("event_id")),
          floor(col("value") * 100).cast("long"),
          num = 2L, den = 10L)
      },
      Some(s"""$EvCte,
                   o AS (SELECT user_id,
                                CAST(floor(value * 100) AS BIGINT) AS x,
                                row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS seq
                         FROM ev),
                   r AS (SELECT user_id, seq, x, x AS s FROM o WHERE seq = 1
                         UNION ALL
                         SELECT o.user_id, o.seq, o.x,
                                (2 * o.x + 8 * r.s) // 10
                         FROM r JOIN o ON o.user_id = r.user_id
                                      AND o.seq = r.seq + 1)
              SELECT user_id, CAST(seq AS INTEGER) AS seq,
                     x AS x_fp, s AS s_fp
              FROM r"""
        .replaceFirst("WITH ev AS", "WITH RECURSIVE ev AS"))),

    // EWMA CONTROL-CHART anomalies: the level recurrence plus a second
    // recurrence smoothing the absolute residual; event t flags when
    // |xₜ − sₜ₋₁| exceeds 3× the running typical deviation. Both
    // recurrences and the band test are exact integers, so every flag
    // replays bit-for-bit in the extended recursive oracle.
    DeclaredQuery(
      "q_ewma_anomaly",
      (s, dir) =>
        Analytics.ewmaAnomaly(
          t(s, dir, "events"),
          "user_id",
          struct(col("ts"), col("event_id")),
          floor(col("value") * 100).cast("long"),
          num = 2L, den = 10L, bandNum = 3L, bandDen = 1L),
      Some(s"""$EvCte,
                   o AS (SELECT user_id,
                                CAST(floor(value * 100) AS BIGINT) AS x,
                                row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS seq
                         FROM ev),
                   r AS (SELECT user_id, seq, x, x AS s,
                                CAST(0 AS BIGINT) AS d, false AS a
                         FROM o WHERE seq = 1
                         UNION ALL
                         SELECT o.user_id, o.seq, o.x,
                                (2 * o.x + 8 * r.s) // 10,
                                (2 * abs(o.x - r.s) + 8 * r.d) // 10,
                                abs(o.x - r.s) * 1 > 3 * r.d
                         FROM r JOIN o ON o.user_id = r.user_id
                                      AND o.seq = r.seq + 1)
              SELECT user_id, CAST(seq AS INTEGER) AS seq,
                     x AS x_fp, s AS s_fp, d AS d_fp, a AS is_anom
              FROM r"""
        .replaceFirst("WITH ev AS", "WITH RECURSIVE ev AS"))),

    // STORED anomaly stream: both recurrences are Markov in (s, d), so
    // the persisted pair per key resumes the control chart exactly —
    // chain ≡ from-scratch at any ordered batch split, against the same
    // full-history recursive oracle (projected to the flag columns).
    DeclaredQuery(
      "q_ewma_anomaly_stored",
      (s, dir) => {
        import graft.ext.EwmaState
        val wh = s"/tmp/graft_ewmawh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        def night(lo: String, hi: String) = t(s, dir, "events")
          .filter(col("ts") >= lit(lo).cast("timestamp") &&
            col("ts") < lit(hi).cast("timestamp"))
        for ((b, i) <- Seq(("2024-01-11", "2024-01-21"),
            ("2024-01-21", "2024-02-01")).zipWithIndex)
          EwmaState.appendEwmaAnomalyBatch(s, wh, "ewa", night(b._1, b._2),
            "user_id", struct(col("ts"), col("event_id")),
            floor(col("value") * 100).cast("long"), 2L, 10L, 3L, 1L,
            seq = i + 1)
        EwmaState.readEwmaAnomalySeries(s, wh, "ewa")
          .select(col("key").cast("long").as("user_id"),
            col("o.event_id").as("event_id"), col("x_fp"), col("s_fp"),
            col("d_fp"), col("is_anom"))
      },
      setup = Some((s, dir) => {
        import graft.ext.EwmaState
        val wh = s"/tmp/graft_ewmawh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        EwmaState.createEwmaAnomalyState(s, wh, "ewa",
          t(s, dir, "events")
            .filter(col("ts") < lit("2024-01-11").cast("timestamp")),
          "user_id", struct(col("ts"), col("event_id")),
          floor(col("value") * 100).cast("long"), 2L, 10L, 3L, 1L)
      }),
      oracle = Some(s"""$EvCte,
                   o AS (SELECT user_id, event_id,
                                CAST(floor(value * 100) AS BIGINT) AS x,
                                row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS seq
                         FROM ev),
                   r AS (SELECT user_id, event_id, seq, x, x AS s,
                                CAST(0 AS BIGINT) AS d, false AS a
                         FROM o WHERE seq = 1
                         UNION ALL
                         SELECT o.user_id, o.event_id, o.seq, o.x,
                                (2 * o.x + 8 * r.s) // 10,
                                (2 * abs(o.x - r.s) + 8 * r.d) // 10,
                                abs(o.x - r.s) * 1 > 3 * r.d
                         FROM r JOIN o ON o.user_id = r.user_id
                                      AND o.seq = r.seq + 1)
              SELECT user_id, event_id, x AS x_fp, s AS s_fp,
                     d AS d_fp, a AS is_anom
              FROM r"""
        .replaceFirst("WITH ev AS", "WITH RECURSIVE ev AS"))),

    // STORED EWMA: the same smoothed stream maintained incrementally —
    // EWMA is Markov, so the persisted resume value per key is the whole
    // sufficient statistic and each nightly ts-range batch folds in
    // O(batch). Chain ≡ from-scratch at any batch split, which is
    // exactly what the full-history recursive oracle checks.
    DeclaredQuery(
      "q_ewma_stored",
      (s, dir) => {
        import graft.ext.EwmaState
        val wh = s"/tmp/graft_ewmawh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        def night(lo: String, hi: String) = t(s, dir, "events")
          .filter(col("ts") >= lit(lo).cast("timestamp") &&
            col("ts") < lit(hi).cast("timestamp"))
        for ((b, i) <- Seq(("2024-01-11", "2024-01-21"),
            ("2024-01-21", "2024-02-01")).zipWithIndex)
          EwmaState.appendEwmaBatch(s, wh, "ew", night(b._1, b._2),
            "user_id", struct(col("ts"), col("event_id")),
            floor(col("value") * 100).cast("long"), 2L, 10L, seq = i + 1)
        EwmaState.readEwmaSeries(s, wh, "ew")
          .select(col("key").cast("long").as("user_id"),
            col("o.event_id").as("event_id"), col("x_fp"), col("s_fp"))
      },
      setup = Some((s, dir) => {
        import graft.ext.EwmaState
        val wh = s"/tmp/graft_ewmawh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        EwmaState.createEwmaState(s, wh, "ew",
          t(s, dir, "events")
            .filter(col("ts") < lit("2024-01-11").cast("timestamp")),
          "user_id", struct(col("ts"), col("event_id")),
          floor(col("value") * 100).cast("long"), 2L, 10L)
      }),
      oracle = Some(s"""$EvCte,
                   o AS (SELECT user_id, event_id,
                                CAST(floor(value * 100) AS BIGINT) AS x,
                                row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS seq
                         FROM ev),
                   r AS (SELECT user_id, event_id, seq, x, x AS s
                         FROM o WHERE seq = 1
                         UNION ALL
                         SELECT o.user_id, o.event_id, o.seq, o.x,
                                (2 * o.x + 8 * r.s) // 10
                         FROM r JOIN o ON o.user_id = r.user_id
                                      AND o.seq = r.seq + 1)
              SELECT user_id, event_id, x AS x_fp, s AS s_fp
              FROM r"""
        .replaceFirst("WITH ev AS", "WITH RECURSIVE ev AS"))),

    // Pre-flight SKEW REPORT for a join/aggregation key: the top-20
    // hottest keys with exact counts, ppm share, and hot/ceiled-mean
    // ratio — the decision input for plain-shuffle vs AQE split vs
    // salting vs broadcast, costed at one distinct-key shuffle + a k-row
    // TakeOrdered instead of the 100 TB shuffle it prevents.
    DeclaredQuery(
      "q_skew_report",
      (s, dir) =>
        graft.ext.Skew.skewReport(t(s, dir, "orders"), col("o_custkey"),
          topK = 20),
      Some("""WITH c AS (SELECT o_custkey::VARCHAR AS key, COUNT(*) AS cnt
                         FROM orders GROUP BY 1),
                   t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
                                COUNT(*) AS n_keys FROM c),
                   k AS (SELECT key, cnt FROM c
                         ORDER BY cnt DESC, key ASC LIMIT 20)
              SELECT key, cnt, n_rows, n_keys,
                     cnt * 1000000 // n_rows AS share_ppm,
                     cnt * 100 // ((n_rows + n_keys - 1) // n_keys) AS ratio_x100
              FROM k, t""")),

    // Skew-safe salted aggregation: two-phase sum/count over a 3-value hot
    // key; bit-identical to the direct groupBy (which is what the oracle
    // runs) — the salting only changes the physical shuffle shape.
    DeclaredQuery(
      "q_salted_agg",
      (s, dir) =>
        graft.ext.Skew.saltedSumCount(
          t(s, dir, "lineitem"),
          keyCols = Seq("l_returnflag"),
          saltSource = col("l_orderkey") * 8 + col("l_linenumber"),
          sums = Seq("l_quantity" -> "sum_qty", "l_extendedprice" -> "sum_price"),
          countName = "n_items",
          nSalts = 32),
      Some("""SELECT l_returnflag, COUNT(*) AS n_items,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
              FROM lineitem GROUP BY l_returnflag""")),

    // Skew-safe salted equi-join: lineitem's 3-value l_returnflag is the
    // planted hot key (every key is a heavy hitter); the per-flag dim is
    // replicated across 16 salts so each hot key spreads over 16 reducers.
    // The oracle is the PLAIN join — salting must be bit-invisible.
    DeclaredQuery(
      "q_salted_join",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val dim = li.groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_flag"))
        graft.ext.Skew.saltedJoin(
          li.select("l_orderkey", "l_linenumber", "l_returnflag"),
          dim, keys = Seq("l_returnflag"),
          saltSource = col("l_orderkey") * 8 + col("l_linenumber"),
          nSalts = 16)
      },
      Some("""SELECT l_returnflag, l_orderkey, l_linenumber, n_flag
              FROM lineitem
              JOIN (SELECT l_returnflag, COUNT(*) AS n_flag
                    FROM lineitem GROUP BY l_returnflag) USING (l_returnflag)""")),

    // POLICY join: skewReport + saltedJoin composed into the decision
    // (broadcast under the small-side gate / salted past the hot-key
    // ratio / plain otherwise — thresholds explicit, decisions pinned in
    // SkewSpec on both skewed and uniform fixtures). The derived key
    // plants a 90% heavy hitter (hot/mean ratio ≈ 7×) and the dim is
    // forced past the tiny broadcast gate, so the policy MUST pick
    // "salted"; the oracle is the plain join over the same derivation —
    // the policy may only change the plan, never a row.
    DeclaredQuery(
      "q_join_skew_policy",
      (s, dir) => {
        val hk = when(col("l_orderkey") % 10 < 9, lit(0L))
          .otherwise(col("l_orderkey") % 7).as("hk")
        val big = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), hk)
        val dim = big.groupBy("hk").agg(count(lit(1)).as("n_k"))
        val (out, decision) = graft.ext.Skew.joinWithSkewPolicy(
          big, dim, keys = Seq("hk"),
          saltSource = col("l_orderkey") * 8 + col("l_linenumber"),
          nSalts = 16, hotRatioX100 = 500L, broadcastRows = 1L)
        require(decision == "salted",
          s"90%-hot-key fixture must salt, got $decision")
        out
      },
      Some("""WITH b AS (SELECT l_orderkey, l_linenumber,
                       CASE WHEN l_orderkey % 10 < 9 THEN 0
                            ELSE l_orderkey % 7 END AS hk
                FROM lineitem),
                   d AS (SELECT hk, COUNT(*) AS n_k FROM b GROUP BY hk)
              SELECT hk, l_orderkey, l_linenumber, n_k
              FROM b JOIN d USING (hk)""")),

    // Tumbling event-time window (batch twin of the streaming agg).
    DeclaredQuery(
      "q_tumbling_window",
      (s, dir) =>
        Analytics.tumbling(t(s, dir, "events"), "ts", "1 hour", Seq("event_type")),
      Some(s"""$EvCte
              SELECT event_type, date_trunc('hour', ts) AS window_start,
                     COUNT(*) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS window_value
              FROM ev GROUP BY event_type, date_trunc('hour', ts)""")),

    // Sliding (hopping) windows — 1-hour windows every 30 minutes, so each
    // event lands in exactly 2 windows. The oracle replays the replication
    // arithmetically: window starts are the slide-grid points
    // floor(t/slide)·slide − j·slide for j in [0, width/slide), identical
    // to Spark's epoch-aligned assignment.
    DeclaredQuery(
      "q_sliding_window",
      (s, dir) =>
        Analytics.sliding(t(s, dir, "events"), "ts", "1 hour", "30 minutes",
          Seq("event_type")),
      Some(s"""$EvCte
              SELECT event_type,
                     make_timestamp((epoch_us(ts) // 1800000000) * 1800000000
                                    - j * 1800000000) AS window_start,
                     COUNT(*) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS window_value
              FROM ev CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS j)
              GROUP BY 1, 2""")),

    // Session windows (30-min gap) — Spark's native session_window
    // aggregation; oracle derives the same sessions via gaps-and-islands.
    DeclaredQuery(
      "q_session_window",
      (s, dir) =>
        Analytics.sessionize(t(s, dir, "events"), "user_id", "ts", "30 minutes"),
      Some(s"""$EvCte,
              marked AS (
                SELECT user_id, ts, event_id, value,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                 < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_s
                FROM ev),
              sess AS (
                SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM marked)
              SELECT user_id, MIN(ts) AS session_start,
                     MAX(ts) + INTERVAL 30 MINUTE AS session_end,
                     COUNT(*) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
              FROM sess GROUP BY user_id, sid""")),

    // Incrementally-MAINTAINED aggregate state: the events table arrives
    // as three nightly batches; each night aggregates ONLY its batch and
    // merges into the stored per-group state (IncrementalAgg) — zero
    // re-scans of prior nights. The oracle is the from-scratch aggregate
    // over the whole table: maintained state ≡ recomputed state IS the
    // check. Sums are fixed-point longs (cents) so every batch order is
    // bit-identical — see IncrementalAgg's determinism contract.
    DeclaredQuery(
      "q_agg_stored",
      (s, dir) => {
        import graft.ext.IncrementalAgg
        val ev = t(s, dir, "events")
        def batch(i: Int) = ev.filter(col("event_id") % 3 === i)
        val fp = floor(col("value") * 100).cast("long")
        val wh = s"/tmp/graft_aggwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        IncrementalAgg.appendStored(s, wh, "agg_state", batch(1),
          Seq("event_type"), fp)
        IncrementalAgg.appendStored(s, wh, "agg_state", batch(2),
          Seq("event_type"), fp)
        IncrementalAgg.readStored(s, wh, "agg_state")
      },
      setup = Some((s, dir) => {
        import graft.ext.IncrementalAgg
        val wh = s"/tmp/graft_aggwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/agg_state")
        base.getFileSystem(s.sparkContext.hadoopConfiguration).delete(base, true)
        IncrementalAgg.createStored(wh, "agg_state",
          t(s, dir, "events").filter(col("event_id") % 3 === 0),
          Seq("event_type"), floor(col("value") * 100).cast("long"))
      }),
      oracle = Some("""SELECT event_type, COUNT(*) AS cnt,
                     CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_fp,
                     MIN(CAST(floor(value * 100) AS BIGINT)) AS min_fp,
                     MAX(CAST(floor(value * 100) AS BIGINT)) AS max_fp
              FROM events GROUP BY event_type""")),

    // RETRACTABLE aggregate state (the counted completion of
    // q_agg_stored; the aggregate twin of q_join_stored_cdc): night 3
    // DELETES a slice of night 1's events via a signed batch whose
    // negative contributions cancel at read — cnt/sum stay exact,
    // min/max are deliberately out (extrema are not retractable).
    // Oracle = the from-scratch aggregate over the SURVIVING rows.
    DeclaredQuery(
      "q_agg_stored_cdc",
      (s, dir) => {
        import graft.ext.IncrementalAgg
        val ev = t(s, dir, "events")
        val fp = floor(col("value") * 100).cast("long")
        val wh = s"/tmp/graft_aggcdcwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        IncrementalAgg.appendRetractable(wh, "ragg_state",
          ev.filter(col("event_id") % 3 === 1), Seq("event_type"), fp,
          lit(1L), "n2")
        IncrementalAgg.appendRetractable(wh, "ragg_state",
          ev.filter(col("event_id") % 3 === 2), Seq("event_type"), fp,
          lit(1L), "n3")
        IncrementalAgg.appendRetractable(wh, "ragg_state",
          ev.filter(col("event_id") % 15 === 0), Seq("event_type"), fp,
          lit(-1L), "n3del")
        IncrementalAgg.readRetractable(s, wh, "ragg_state", Seq("event_type"))
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_aggcdcwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.ext.IncrementalAgg.createRetractable(wh, "ragg_state",
          t(s, dir, "events").filter(col("event_id") % 3 === 0),
          Seq("event_type"), floor(col("value") * 100).cast("long"))
      }),
      oracle = Some("""SELECT event_type, COUNT(*) AS cnt,
                     CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_fp
              FROM events WHERE event_id % 15 <> 0
              GROUP BY event_type""")),

    // TIME-TRAVEL read of the retractable aggregate state: the same
    // ingest history as q_agg_stored_cdc (n2 inserts, n3 inserts, n3del
    // deletes), but read AS OF n2 — the n3 partitions are pruned at the
    // scan, so the n3del deletions are NOT yet applied and the view is
    // the aggregate as it stood that night. Oracle = the from-scratch
    // aggregate over exactly the first two batches.
    DeclaredQuery(
      "q_agg_asof",
      (s, dir) => {
        import graft.ext.IncrementalAgg
        val ev = t(s, dir, "events")
        val fp = floor(col("value") * 100).cast("long")
        val wh = s"/tmp/graft_aggasofwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        IncrementalAgg.appendRetractable(wh, "asof_state",
          ev.filter(col("event_id") % 3 === 1), Seq("event_type"), fp,
          lit(1L), "n2")
        IncrementalAgg.appendRetractable(wh, "asof_state",
          ev.filter(col("event_id") % 3 === 2), Seq("event_type"), fp,
          lit(1L), "n3")
        IncrementalAgg.appendRetractable(wh, "asof_state",
          ev.filter(col("event_id") % 15 === 0), Seq("event_type"), fp,
          lit(-1L), "n3del")
        IncrementalAgg.readRetractableAsOf(s, wh, "asof_state",
          Seq("event_type"), Seq("base", "n2"))
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_aggasofwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.ext.IncrementalAgg.createRetractable(wh, "asof_state",
          t(s, dir, "events").filter(col("event_id") % 3 === 0),
          Seq("event_type"), floor(col("value") * 100).cast("long"))
      }),
      oracle = Some("""SELECT event_type, COUNT(*) AS cnt,
                     CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_fp
              FROM events WHERE event_id % 3 IN (0, 1)
              GROUP BY event_type""")),

    // Incrementally-MAINTAINED join state (the join half of the
    // materialized-view story; q_agg_stored is the aggregate half):
    // orders arrive as three nightly batches and customers as two; each
    // append applies the delta rule ΔL⋈R₀ ∪ L₀⋈ΔR ∪ ΔL⋈ΔR against
    // BUCKETED state — the stored side is never shuffled and the full
    // join is never recomputed. Oracle = the from-scratch join over the
    // whole tables: maintained ≡ recomputed IS the check.
    DeclaredQuery(
      "q_join_stored",
      (s, dir) => {
        import graft.ext.IncrementalJoin
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val wh = s"/tmp/graft_joinwh$tag"
        IncrementalJoin.appendStored(s, wh, s"ivmjoin$tag",
          joinOrders(s, dir, 1), joinCust(s, dir, 1), "custkey")
        IncrementalJoin.appendStored(s, wh, s"ivmjoin$tag",
          joinOrders(s, dir, 2), joinCust(s, dir, 0).limit(0), "custkey")
        IncrementalJoin.readStored(s, s"ivmjoin$tag")
      },
      setup = Some((s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.ext.IncrementalJoin.createStored(s, s"/tmp/graft_joinwh$tag",
          s"ivmjoin$tag", joinOrders(s, dir, 0), joinCust(s, dir, 0),
          "custkey", 4)
      }),
      oracle = Some("""SELECT o_custkey AS custkey, o_orderkey, o_totalprice,
                     c_name, c_mktsegment
              FROM orders JOIN customer ON o_custkey = c_custkey""")),

    // COUNTED join state with retractions: same materialized view, but
    // night 3 DELETES previously-inserted rows on both sides (the CDC
    // shape Merge tombstones produce) — the bag-algebra delta rule
    // cancels their contributions by signed multiplicity, no re-derive.
    // Oracle = the from-scratch join over exactly the surviving rows:
    // maintained-with-retractions ≡ recomputed IS the check.
    DeclaredQuery(
      "q_join_stored_cdc",
      (s, dir) => {
        import graft.ext.IncrementalJoin
        val orders = t(s, dir, "orders").select(
          col("o_custkey").as("custkey"), col("o_orderkey"), col("o_totalprice"))
        val cust = t(s, dir, "customer").select(
          col("c_custkey").as("custkey"), col("c_name"), col("c_mktsegment"))
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val wh = s"/tmp/graft_joincdcwh$tag"
        val nm = s"ivmjoincdc$tag"
        IncrementalJoin.appendStoredCounted(s, wh, nm,
          IncrementalJoin.inserts(joinOrders(s, dir, 1)),
          IncrementalJoin.inserts(joinCust(s, dir, 1)), "custkey",
          batchTag = "n2")
        val delOrders = IncrementalJoin.deletes(
          orders.filter(col("o_orderkey") % 3 =!= 2 && col("o_orderkey") % 5 === 0))
        val delCust = IncrementalJoin.deletes(
          cust.filter(col("custkey") % 7 === 0))
        IncrementalJoin.appendStoredCounted(s, wh, nm,
          IncrementalJoin.inserts(joinOrders(s, dir, 2)).unionByName(delOrders),
          delCust, "custkey", batchTag = "n3")
        IncrementalJoin.readStoredCounted(s, nm)
      },
      setup = Some((s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.ext.IncrementalJoin.createStoredCounted(s,
          s"/tmp/graft_joincdcwh$tag", s"ivmjoincdc$tag",
          joinOrders(s, dir, 0), joinCust(s, dir, 0), "custkey", 4)
      }),
      oracle = Some("""SELECT o_custkey AS custkey, o_orderkey, o_totalprice,
                     c_name, c_mktsegment
              FROM orders JOIN customer ON o_custkey = c_custkey
              WHERE NOT (o_orderkey % 3 <> 2 AND o_orderkey % 5 = 0)
                AND c_custkey % 7 <> 0""")),

    // TIME-TRAVEL read of the counted join view: same ingest history as
    // q_join_stored_cdc (n2 inserts both sides, n3 inserts + deletes),
    // read AS OF n2 — batch n3's contribution rows (including every
    // delete's negative contributions) are filtered out of the fold, so
    // the view is the join exactly as it stood after night 2: orders
    // batches 0–1 against the full customer table, deletes not yet
    // applied. Oracle = the from-scratch join over those inputs.
    DeclaredQuery(
      "q_join_cdc_asof",
      (s, dir) => {
        import graft.ext.IncrementalJoin
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val wh = s"/tmp/graft_joinasofwh$tag"
        val nm = s"ivmjoinasof$tag"
        IncrementalJoin.appendStoredCounted(s, wh, nm,
          IncrementalJoin.inserts(joinOrders(s, dir, 1)),
          IncrementalJoin.inserts(joinCust(s, dir, 1)), "custkey",
          batchTag = "n2")
        val orders = t(s, dir, "orders").select(
          col("o_custkey").as("custkey"), col("o_orderkey"), col("o_totalprice"))
        val cust = t(s, dir, "customer").select(
          col("c_custkey").as("custkey"), col("c_name"), col("c_mktsegment"))
        val delOrders = IncrementalJoin.deletes(
          orders.filter(col("o_orderkey") % 3 =!= 2 && col("o_orderkey") % 5 === 0))
        val delCust = IncrementalJoin.deletes(
          cust.filter(col("custkey") % 7 === 0))
        IncrementalJoin.appendStoredCounted(s, wh, nm,
          IncrementalJoin.inserts(joinOrders(s, dir, 2)).unionByName(delOrders),
          delCust, "custkey", batchTag = "n3")
        IncrementalJoin.readStoredCountedAsOf(s, nm, Seq("base", "n2"))
      },
      setup = Some((s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.ext.IncrementalJoin.createStoredCounted(s,
          s"/tmp/graft_joinasofwh$tag", s"ivmjoinasof$tag",
          joinOrders(s, dir, 0), joinCust(s, dir, 0), "custkey", 4)
      }),
      oracle = Some("""SELECT o_custkey AS custkey, o_orderkey, o_totalprice,
                     c_name, c_mktsegment
              FROM orders JOIN customer ON o_custkey = c_custkey
              WHERE o_orderkey % 3 <> 2""")),

    // Item co-occurrence (market-basket) edges over lineitem: parts
    // sharing >= 2 orders, group-size-capped at 10 so one hot order can
    // never go quadratic (see Graph.coOccurrence's scale contract). The
    // oracle replays the cap, so the drop policy is verified, not just
    // the happy path.
    DeclaredQuery(
      "q_copurchase",
      (s, dir) =>
        graft.ext.Graph.coOccurrence(
          Tables.fanOut(t(s, dir, "lineitem"), col("l_orderkey")),
          "l_orderkey", "l_partkey", maxGroupSize = 10, minCount = 2L),
      Some("""WITH mem AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                           FROM lineitem),
                   small AS (SELECT g FROM mem GROUP BY g
                             HAVING COUNT(*) <= 10),
                   capped AS (SELECT mem.* FROM mem JOIN small USING (g))
              SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS n_groups
              FROM capped a JOIN capped b
                ON a.g = b.g AND a.i < b.i
              GROUP BY a.i, b.i
              HAVING COUNT(*) >= 2""")),

    // BFS min-hop distances over the co-purchase graph from a seed set
    // (every 97th part), radius 3: level-synchronous frontier expansion
    // where each level shuffles |frontier ⋈ edges|, never the corpus.
    // The oracle unrolls the three levels as SQL CTEs (the PageRank
    // replay idiom) — BFS-order-is-minimum falls out of the per-level
    // anti-joins in both engines.
    DeclaredQuery(
      "q_bfs_hops",
      (s, dir) => {
        // the membership distinct's map side is the only corpus-wide
        // stage: fan the degenerate scan out first
        val li = Tables.fanOut(t(s, dir, "lineitem"), col("l_orderkey"))
        val edges = graft.ext.Graph.coOccurrence(li, "l_orderkey",
          "l_partkey", maxGroupSize = 10, minCount = 2L)
        val seeds = li.filter(col("l_partkey") % 97 === 0)
          .select(col("l_partkey"))
        graft.ext.Graph.bfsHops(edges, "item_a", "item_b", seeds,
          "l_partkey", maxHops = 3)
      },
      Some("""WITH mem AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                           FROM lineitem),
                   small AS (SELECT g FROM mem GROUP BY g
                             HAVING COUNT(*) <= 10),
                   capped AS (SELECT mem.* FROM mem JOIN small USING (g)),
                   e0 AS (SELECT a.i AS item_a, b.i AS item_b
                          FROM capped a JOIN capped b
                            ON a.g = b.g AND a.i < b.i
                          GROUP BY a.i, b.i
                          HAVING COUNT(*) >= 2),
                   ed AS (SELECT item_a AS src, item_b AS dst FROM e0
                          UNION
                          SELECT item_b, item_a FROM e0),
                   h0 AS (SELECT DISTINCT l_partkey AS node FROM lineitem
                          WHERE l_partkey % 97 = 0),
                   r1 AS (SELECT DISTINCT e.dst AS node
                          FROM h0 JOIN ed e ON h0.node = e.src
                          WHERE e.dst NOT IN (SELECT node FROM h0)),
                   r2 AS (SELECT DISTINCT e.dst AS node
                          FROM r1 JOIN ed e ON r1.node = e.src
                          WHERE e.dst NOT IN (SELECT node FROM h0)
                            AND e.dst NOT IN (SELECT node FROM r1)),
                   r3 AS (SELECT DISTINCT e.dst AS node
                          FROM r2 JOIN ed e ON r2.node = e.src
                          WHERE e.dst NOT IN (SELECT node FROM h0)
                            AND e.dst NOT IN (SELECT node FROM r1)
                            AND e.dst NOT IN (SELECT node FROM r2))
              SELECT node, CAST(0 AS BIGINT) AS hop FROM h0
              UNION ALL SELECT node, 1 FROM r1
              UNION ALL SELECT node, 2 FROM r2
              UNION ALL SELECT node, 3 FROM r3""")),

    // DETERMINISTIC HyperLogLog as warehouse state: registers built on
    // the even-orderkey half, the odd half APPENDED as delta rows
    // (max-merge at read — appends are O(batch) and replay-inert), then
    // per-flag distinct-orderkey estimates next to the exact counts with
    // a 3-sigma error flag. Registers derive from md5 and the estimate
    // is ONE fixed IEEE op sequence, so state AND estimate hash-verify
    // against the oracle's replay — a portable, verifiable sketch, which
    // approx_count_distinct's engine-private binary state is not.
    DeclaredQuery(
      "q_hll_stored",
      (s, dir) => {
        import graft.ext.SketchState
        val li = t(s, dir, "lineitem")
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        SketchState.appendHllState(s, s"hll$tag",
          li.filter(col("l_orderkey") % 2 === 1),
          "l_returnflag", col("l_orderkey"), numBuckets = 4)
        val est = SketchState.hllEstimateStored(s, s"hll$tag", "l_returnflag")
        val exact = li.groupBy("l_returnflag")
          .agg(countDistinct(col("l_orderkey")).as("n_exact"))
        est.join(exact, "l_returnflag")
          .withColumn("err_ok",
            abs(col("hll_est") - col("n_exact").cast("double")) <=
              expr("CAST('0.195' AS DOUBLE)") * col("n_exact").cast("double"))
          .select("l_returnflag", "s_fx", "v", "hll_est", "n_exact", "err_ok")
      },
      setup = Some((s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.ext.SketchState.writeHllState(
          t(s, dir, "lineitem").filter(col("l_orderkey") % 2 === 0),
          "l_returnflag", col("l_orderkey"),
          s"/tmp/graft_skwh$tag", s"hll$tag", numBuckets = 4)
      }),
      oracle = Some(s"""WITH h AS (SELECT l_returnflag AS g,
                                 ${DuckSql.md5Long("'hll:' || l_orderkey::VARCHAR")} AS hv
                          FROM lineitem),
                    r AS (SELECT g, hv % 256 AS bucket,
                                 LEAST(CASE WHEN (hv // 256) = 0 THEN 45
                                            ELSE length(printf('%b',
                                              (hv // 256) & -(hv // 256))) END,
                                       45) AS rho
                          FROM h),
                    m AS (SELECT g, bucket, MAX(rho) AS rho FROM r
                          GROUP BY g, bucket),
                    sfx AS (SELECT g,
                                   CAST(SUM(1::BIGINT << (45 - rho)) AS BIGINT)
                                     + ((256 - COUNT(*))::BIGINT << 45) AS s_fx,
                                   256 - COUNT(*) AS v
                            FROM m GROUP BY g),
                    est AS (SELECT g, s_fx, v,
                                   CAST('${graft.ext.SketchState.HllAlphaM2}' AS DOUBLE) *
                                     (CAST('${graft.ext.SketchState.HllPowStr}' AS DOUBLE)
                                      / CAST(s_fx AS DOUBLE))
                                     AS hll_est
                            FROM sfx),
                    ex AS (SELECT l_returnflag AS g,
                                  COUNT(DISTINCT l_orderkey) AS n_exact
                           FROM lineitem GROUP BY 1)
               SELECT g AS l_returnflag, s_fx, v, hll_est, n_exact,
                      (abs(hll_est - CAST(n_exact AS DOUBLE)) <=
                       CAST('0.195' AS DOUBLE) * CAST(n_exact AS DOUBLE)) AS err_ok
               FROM est JOIN ex USING (g)""")),

    // SLIDING-WINDOW HLL distinct counts: "distinct keys per group over
    // the last two batches" — the question the append-only max-fold
    // state can never answer (MAX never forgets). Per-batch register
    // partitions; the window's isin filter partition-prunes, and
    // MAX-associativity makes the window fold bit-identical to a
    // from-scratch build over the windowed union — which is exactly what
    // the oracle replays.
    DeclaredQuery(
      "q_hll_window",
      (s, dir) => {
        import graft.ext.SketchState
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        SketchState.readHllWindow(s, s"/tmp/graft_hllwwh$tag", "hllw",
          "l_returnflag", Seq("n2", "n3"))
      },
      setup = Some((s, dir) => {
        import graft.ext.SketchState
        val li = t(s, dir, "lineitem")
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val wh = s"/tmp/graft_hllwwh$tag"
        for ((m, b) <- Seq(0 -> "n1", 1 -> "n2", 2 -> "n3"))
          SketchState.appendHllWindowState(s, wh, "hllw",
            li.filter(col("l_orderkey") % 3 === m),
            "l_returnflag", col("l_orderkey"), b)
      }),
      oracle = Some(s"""WITH h AS (SELECT l_returnflag AS g,
                                 ${DuckSql.md5Long("'hll:' || l_orderkey::VARCHAR")} AS hv
                          FROM lineitem WHERE l_orderkey % 3 IN (1, 2)),
                    r AS (SELECT g, hv % 256 AS bucket,
                                 LEAST(CASE WHEN (hv // 256) = 0 THEN 45
                                            ELSE length(printf('%b',
                                              (hv // 256) & -(hv // 256))) END,
                                       45) AS rho
                          FROM h),
                    m AS (SELECT g, bucket, MAX(rho) AS rho FROM r
                          GROUP BY g, bucket),
                    sfx AS (SELECT g,
                                   CAST(SUM(1::BIGINT << (45 - rho)) AS BIGINT)
                                     + ((256 - COUNT(*))::BIGINT << 45) AS s_fx,
                                   256 - COUNT(*) AS v
                            FROM m GROUP BY g)
               SELECT g AS l_returnflag, s_fx, v,
                      CAST('${graft.ext.SketchState.HllAlphaM2}' AS DOUBLE) *
                        (CAST('${graft.ext.SketchState.HllPowStr}' AS DOUBLE)
                         / CAST(s_fx AS DOUBLE)) AS hll_est
               FROM sfx""")),

    // Mergeable HISTOGRAM quantile state: bin counts built on half the
    // data, the other half appended (sum-merge at read), then p50/p95
    // upper bounds per flag — quantile monitoring over 100 TB with no
    // sort and O(batch) nightly cost. All integer (floor-binning,
    // ceiling-rank pick), so state and estimates replay exactly.
    DeclaredQuery(
      "q_hist_quantile",
      (s, dir) => {
        import graft.ext.SketchState
        val li = t(s, dir, "lineitem")
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        SketchState.writeHistState(li.filter(col("l_orderkey") % 2 === 0),
          "l_returnflag", col("l_quantity"), binWidth = 5L,
          s"/tmp/graft_skwh$tag", s"hq$tag", numBuckets = 4)
        SketchState.appendHistState(s, s"hq$tag",
          li.filter(col("l_orderkey") % 2 === 1),
          "l_returnflag", col("l_quantity"), binWidth = 5L, numBuckets = 4)
        SketchState.histQuantilesStored(s, s"hq$tag", "l_returnflag",
          binWidth = 5L, qsPpm = Seq(500000L, 950000L))
      },
      Some("""WITH b AS (SELECT l_returnflag AS g,
                                CAST(floor(l_quantity) AS BIGINT) // 5 AS bin,
                                COUNT(*) AS cnt
                         FROM lineitem GROUP BY 1, 2),
                   n AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n FROM b GROUP BY g),
                   c AS (SELECT b.g, bin, cnt,
                                CAST(SUM(cnt) OVER (PARTITION BY b.g ORDER BY bin)
                                     AS BIGINT) AS cum,
                                n.n
                         FROM b JOIN n USING (g))
              SELECT g AS l_returnflag,
                     MIN(CASE WHEN cum >= (500000 * n + 999999) // 1000000
                              THEN (bin + 1) * 5 END) AS p50_ub,
                     MIN(CASE WHEN cum >= (950000 * n + 999999) // 1000000
                              THEN (bin + 1) * 5 END) AS p95_ub
              FROM c GROUP BY g""")),

    // SLIDING-WINDOW histogram quantiles: "p50/p95 over the last two
    // batches" from batch-partitioned bin counts — the window filter
    // partition-prunes, count additivity makes the fold exactly the
    // windowed histogram, and the partitioned layout is also the
    // REPLAY-SAFE form of the histogram family (partition replace vs the
    // bucketed append's double-count on replay). Oracle = the quantile
    // arithmetic over exactly the windowed subset.
    DeclaredQuery(
      "q_hist_window",
      (s, dir) => {
        import graft.ext.SketchState
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        SketchState.readHistWindowQuantiles(s, s"/tmp/graft_histwwh$tag",
          "hw", "l_returnflag", binWidth = 5L,
          qsPpm = Seq(500000L, 950000L), Seq("n2", "n3"))
      },
      setup = Some((s, dir) => {
        import graft.ext.SketchState
        val li = t(s, dir, "lineitem")
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val wh = s"/tmp/graft_histwwh$tag"
        for ((m, b) <- Seq(0 -> "n1", 1 -> "n2", 2 -> "n3"))
          SketchState.appendHistWindowState(s, wh, "hw",
            li.filter(col("l_orderkey") % 3 === m),
            "l_returnflag", col("l_quantity"), binWidth = 5L, b)
      }),
      oracle = Some("""WITH b AS (SELECT l_returnflag AS g,
                                CAST(floor(l_quantity) AS BIGINT) // 5 AS bin,
                                COUNT(*) AS cnt
                         FROM lineitem
                         WHERE l_orderkey % 3 IN (1, 2)
                         GROUP BY 1, 2),
                   n AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n FROM b GROUP BY g),
                   c AS (SELECT b.g, bin, cnt,
                                CAST(SUM(cnt) OVER (PARTITION BY b.g ORDER BY bin)
                                     AS BIGINT) AS cum,
                                n.n
                         FROM b JOIN n USING (g))
              SELECT g AS l_returnflag,
                     MIN(CASE WHEN cum >= (500000 * n + 999999) // 1000000
                              THEN (bin + 1) * 5 END) AS p50_ub,
                     MIN(CASE WHEN cum >= (950000 * n + 999999) // 1000000
                              THEN (bin + 1) * 5 END) AS p95_ub
              FROM c GROUP BY g""")),

    // Declarative data-quality EXPECTATIONS: five rules evaluated in ONE
    // aggregate pass over ONE scan (conditional sums share the
    // partial-agg tree), reported one row per rule. Two rules are
    // deliberately tight so the violation path is exercised.
    DeclaredQuery(
      "q_expectations",
      (s, dir) =>
        Analytics.expectations(t(s, dir, "lineitem"), Seq(
          "quantity_in_range" -> col("l_quantity").between(1, 50),
          "quantity_le_30" -> (col("l_quantity") <= 30),
          "positive_price" -> (col("l_extendedprice") > 0),
          "tax_bounded" -> (col("l_tax") <= 0.06),
          "known_flag" -> col("l_returnflag").isin("A", "N", "R"))),
      Some("""WITH agg AS (
                SELECT COUNT(*) AS n,
                       SUM(CASE WHEN COALESCE(l_quantity BETWEEN 1 AND 50, false)
                                THEN 0 ELSE 1 END) AS v0,
                       SUM(CASE WHEN COALESCE(l_quantity <= 30, false)
                                THEN 0 ELSE 1 END) AS v1,
                       SUM(CASE WHEN COALESCE(l_extendedprice > 0, false)
                                THEN 0 ELSE 1 END) AS v2,
                       SUM(CASE WHEN COALESCE(l_tax <= 0.06, false)
                                THEN 0 ELSE 1 END) AS v3,
                       SUM(CASE WHEN COALESCE(l_returnflag IN ('A', 'N', 'R'), false)
                                THEN 0 ELSE 1 END) AS v4
                FROM lineitem)
              SELECT 'quantity_in_range' AS rule, n AS n_checked,
                     CAST(v0 AS BIGINT) AS n_violations, v0 = 0 AS pass FROM agg
              UNION ALL SELECT 'quantity_le_30', n, CAST(v1 AS BIGINT), v1 = 0 FROM agg
              UNION ALL SELECT 'positive_price', n, CAST(v2 AS BIGINT), v2 = 0 FROM agg
              UNION ALL SELECT 'tax_bounded', n, CAST(v3 AS BIGINT), v3 = 0 FROM agg
              UNION ALL SELECT 'known_flag', n, CAST(v4 AS BIGINT), v4 = 0 FROM agg""")),

    // Row-level TABLE DIFF: the data-regression audit between two
    // versions of a keyed relation — one full-outer co-shuffle, data
    // columns packed into one struct per side, null-safe comparison,
    // per-column change list only for rows that differ. The fixture
    // derives both versions from `orders` with disjoint key arithmetic
    // so every status (added / removed / changed) and the empty
    // intersection case (keys dropped from both) are exercised.
    DeclaredQuery(
      "q_table_diff",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("o_orderstatus"))
        val old = o.filter(col("o_orderkey") % 19 =!= 0)
        val neu = o.filter(col("o_orderkey") % 13 =!= 0)
          .withColumn("o_custkey",
            when(col("o_orderkey") % 23 === 0, col("o_custkey") + 1)
              .otherwise(col("o_custkey")))
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 17 === 0,
                (col("o_totalprice") + 1).cast("decimal(15,2)"))
              .otherwise(col("o_totalprice")))
        graft.ext.Diff.diff(old, neu, Seq("o_orderkey"))
          .select(col("o_orderkey"), col("status"),
            concat_ws(",", col("changed_cols")).as("changed_cols"))
      },
      Some("""WITH old AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
                           FROM orders WHERE o_orderkey % 19 <> 0),
                   neu AS (SELECT o_orderkey,
                                  CASE WHEN o_orderkey % 23 = 0 THEN o_custkey + 1
                                       ELSE o_custkey END AS o_custkey,
                                  CASE WHEN o_orderkey % 17 = 0 THEN o_totalprice + 1
                                       ELSE o_totalprice END AS o_totalprice,
                                  o_orderstatus
                           FROM orders WHERE o_orderkey % 13 <> 0),
                   j AS (SELECT COALESCE(old.o_orderkey, neu.o_orderkey) AS o_orderkey,
                                old.o_orderkey IS NULL AS is_add,
                                neu.o_orderkey IS NULL AS is_del,
                                old.o_custkey IS DISTINCT FROM neu.o_custkey AS d_ck,
                                old.o_totalprice IS DISTINCT FROM neu.o_totalprice AS d_tp,
                                old.o_orderstatus IS DISTINCT FROM neu.o_orderstatus AS d_os
                         FROM old FULL OUTER JOIN neu USING (o_orderkey))
              SELECT o_orderkey,
                     CASE WHEN is_add THEN 'added'
                          WHEN is_del THEN 'removed'
                          ELSE 'changed' END AS status,
                     CASE WHEN is_add OR is_del THEN ''
                          ELSE array_to_string(list_sort(list_filter(
                                 [CASE WHEN d_ck THEN 'o_custkey' END,
                                  CASE WHEN d_tp THEN 'o_totalprice' END,
                                  CASE WHEN d_os THEN 'o_orderstatus' END],
                                 x -> x IS NOT NULL)), ',') END AS changed_cols
              FROM j
              WHERE is_add OR is_del OR d_ck OR d_tp OR d_os""")),

    // Aggregate diff dashboard: row counts per status plus per-column
    // change frequencies — the one-line "what did the rebuild touch"
    // answer, computed from the already-reduced diff relation.
    DeclaredQuery(
      "q_table_diff_summary",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("o_orderstatus"))
        val old = o.filter(col("o_orderkey") % 19 =!= 0)
        val neu = o.filter(col("o_orderkey") % 13 =!= 0)
          .withColumn("o_custkey",
            when(col("o_orderkey") % 23 === 0, col("o_custkey") + 1)
              .otherwise(col("o_custkey")))
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 17 === 0,
                (col("o_totalprice") + 1).cast("decimal(15,2)"))
              .otherwise(col("o_totalprice")))
        graft.ext.Diff.diffSummary(
            graft.ext.Diff.diff(old, neu, Seq("o_orderkey")))
          .select(col("status"), coalesce(col("col_name"), lit("")).as("col_name"),
            col("n"))
      },
      Some("""WITH old AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
                           FROM orders WHERE o_orderkey % 19 <> 0),
                   neu AS (SELECT o_orderkey,
                                  CASE WHEN o_orderkey % 23 = 0 THEN o_custkey + 1
                                       ELSE o_custkey END AS o_custkey,
                                  CASE WHEN o_orderkey % 17 = 0 THEN o_totalprice + 1
                                       ELSE o_totalprice END AS o_totalprice,
                                  o_orderstatus
                           FROM orders WHERE o_orderkey % 13 <> 0),
                   j AS (SELECT COALESCE(old.o_orderkey, neu.o_orderkey) AS o_orderkey,
                                old.o_orderkey IS NULL AS is_add,
                                neu.o_orderkey IS NULL AS is_del,
                                old.o_custkey IS DISTINCT FROM neu.o_custkey AS d_ck,
                                old.o_totalprice IS DISTINCT FROM neu.o_totalprice AS d_tp,
                                old.o_orderstatus IS DISTINCT FROM neu.o_orderstatus AS d_os
                         FROM old FULL OUTER JOIN neu USING (o_orderkey)),
                   d AS (SELECT o_orderkey,
                                CASE WHEN is_add THEN 'added'
                                     WHEN is_del THEN 'removed'
                                     ELSE 'changed' END AS status,
                                CASE WHEN is_add OR is_del THEN []::VARCHAR[]
                                     ELSE list_filter(
                                       [CASE WHEN d_ck THEN 'o_custkey' END,
                                        CASE WHEN d_tp THEN 'o_totalprice' END,
                                        CASE WHEN d_os THEN 'o_orderstatus' END],
                                       x -> x IS NOT NULL) END AS cc
                         FROM j
                         WHERE is_add OR is_del OR d_ck OR d_tp OR d_os),
                   ex AS (SELECT status, unnest(CASE WHEN len(cc) = 0 THEN [NULL]
                                                ELSE cc END) AS col_name
                          FROM d)
              SELECT status, COALESCE(col_name, '') AS col_name,
                     COUNT(*) AS n
              FROM ex GROUP BY status, col_name""")))
}
