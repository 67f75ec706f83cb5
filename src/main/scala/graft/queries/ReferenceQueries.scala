package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DeclaredQuery
import graft.core.{Merge, Normalize, Temporal, WatermarkStore}
import graft.io.{Tables, Versioned}

/** Declared queries for every reference-derived operator (SURVEY.md §2),
  * re-expressed over the driver test corpus so each one is verifiable against
  * the DuckDB oracle. The bc2adls CSV shapes themselves are exercised in unit
  * and e2e tests (`FIXTURES.md` §A); these queries pin the operator SEMANTICS.
  */
object ReferenceQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.testTable(s, dir, name)

  /** DuckDB-side equivalent of `Tables.testTable(_, _, "events")`'s
    * nanosecond->microsecond timestamp normalization.
    */
  val EvCte: String =
    """WITH ev AS (SELECT event_id, make_timestamp(epoch_ns(ts)//1000) AS ts,
                          user_id, event_type, value, props FROM events)"""

  /** Shared location/fixture helpers for q_scd_stored's setup + fn. */
  private def scdLoc(dir: String): (String, String) = {
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    (s"/tmp/graft_scdwh$tag", s"scd$tag")
  }

  private def scdNight(s: SparkSession, dir: String, lo: String,
      hi: String): DataFrame =
    t(s, dir, "events")
      .select("event_id", "user_id", "event_type", "ts")
      .filter(col("ts") >= lit(lo).cast("timestamp") &&
        col("ts") < lit(hi).cast("timestamp"))

  /** Shared state for q_snapshot_diff / q_snapshot_rowdiff: customer
    * segments manifest-versioned twice — v1 without BUILDING; v2 adds
    * BUILDING, rewrites MACHINERY with +10 balances, drops FURNITURE.
    * Deterministic rebuild per invocation.
    */
  private def seedCustMv(s: SparkSession, dir: String): Unit = {
    val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val base = new org.apache.hadoop.fs.Path(s"$wh/cust_mv.mv")
    base.getFileSystem(s.sparkContext.hadoopConfiguration).delete(base, true)
    val c = t(s, dir, "customer")
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    graft.io.ManifestVersioned.writeFull(s, wh, "cust_mv",
      c.filter(col("c_mktsegment") =!= "BUILDING"), "c_mktsegment")
    graft.io.ManifestVersioned.writeDelta(s, wh, "cust_mv",
      c.filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .withColumn("c_acctbal",
          when(col("c_mktsegment") === "MACHINERY", col("c_acctbal") + 10.0)
            .otherwise(col("c_acctbal"))),
      "c_mktsegment", dropParts = Seq("FURNITURE"))
  }

  /** Shared fixtures for the partitioned-merge queries' setup + fn. */
  private def mergeChangeSet(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val updates = orders
      .filter(col("o_orderkey") % 7 === 0)
      .select(
        col("o_orderkey"), col("o_custkey"),
        lit("U").as("o_orderstatus"),
        (col("o_totalprice") + 1000.0).as("o_totalprice"),
        (col("o_orderdate") + expr("INTERVAL 400 DAYS")).as("o_orderdate"),
        col("o_orderpriority"))
    val tombstones = orders
      .filter(col("o_orderkey") % 13 === 0)
      .select(
        col("o_orderkey"),
        lit(null).cast("bigint").as("o_custkey"),
        lit("DELETED").as("o_orderstatus"),
        lit(null).cast("double").as("o_totalprice"),
        lit(null).cast("timestamp").as("o_orderdate"),
        lit(null).cast("string").as("o_orderpriority"))
    updates.unionAll(tombstones)
  }

  /** Pristine partitioned seed every sample: STATIC overwrite semantics
    * via dir delete — a dynamic overwrite would leave last run's 'U'
    * partition standing in the seed. Drops any key-locate index too (the
    * non-indexed path must measure without one; the indexed setup
    * rebuilds it).
    */
  private def seedMergeWarehouse(s: SparkSession, dir: String,
      wh: String): Unit = {
    for (tbl <- Seq("orders_part", Merge.keyIndexName("orders_part"))) {
      val p = new org.apache.hadoop.fs.Path(s"$wh/$tbl")
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
    Tables.writeWarehousePartitioned(t(s, dir, "orders"), wh, "orders_part",
      Seq("o_orderstatus"))
  }

  val all: Seq[DeclaredQuery] = Seq(

    // S1/S4 — columnar scan with filter + projection pushed to the source.
    DeclaredQuery(
      "q_scan_project",
      (s, dir) =>
        t(s, dir, "customer")
          .filter(col("c_acctbal") > 5000.0)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal")),
      Some("""SELECT c_custkey, c_name, c_acctbal
              FROM customer WHERE c_acctbal > 5000.0""")),

    // P1+P2+P3 — Dynamics suffix strip + lowercase + drop-all-duplicates.
    // `Value-5` and `value-6` both normalize to `value` -> BOTH dropped
    // (the reference's quirk, helper_functions.py:132-137).
    DeclaredQuery(
      "q_normalize_dedup_cols",
      (s, dir) => {
        val suffixed = t(s, dir, "events").select(
          col("event_id").as("Event_Id-2000000001"),
          col("ts").as("TS-2000000002"),
          col("user_id").as("User_Id-3"),
          col("event_type").as("Event_Type-4"),
          col("value").as("Value-5"),
          col("props").as("value-6"))
        Normalize.normalizeColumns(suffixed)
      },
      Some(s"$EvCte SELECT event_id, ts, user_id, event_type FROM ev")),

    // P4/P5 — temporal stringify to the pinned format.
    DeclaredQuery(
      "q_temporal_stringify",
      (s, dir) =>
        Temporal.stringifyTemporals(t(s, dir, "orders"))
          .select("o_orderkey", "o_orderdate"),
      Some("""SELECT o_orderkey,
                     strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate
              FROM orders""")),

    // P7 — audit column with a pinned clock (Nairobi = UTC+3, no DST).
    DeclaredQuery(
      "q_extracted_at",
      (s, dir) =>
        Temporal.withExtractedAt(
          t(s, dir, "orders").select("o_orderkey"),
          clock = to_timestamp(lit("2026-01-01 00:00:00"))),
      Some("""SELECT o_orderkey,
                     TIMESTAMP '2026-01-01 03:00:00' AS extracted_at
              FROM orders""")),

    // J1 — tombstone anti-join: one marker row kills ALL rows of that key.
    // Null-safe hash anti join; key is never NULL here so it coincides with
    // the reference's NOT IN (3VL fidelity is covered by MergeSpec).
    DeclaredQuery(
      "q_tombstone_antijoin",
      (s, dir) =>
        Merge.tombstoneFilter(
          t(s, dir, "events"),
          "user_id",
          col("event_type") === "error" && col("value") > 190.0),
      Some(s"""$EvCte
              SELECT event_id, ts, user_id, event_type, value, props
              FROM ev
              WHERE user_id NOT IN (
                SELECT user_id FROM ev
                WHERE event_type = 'error' AND value > 190.0)""")),

    // W1 — latest-wins dedup with a deterministic tiebreaker.
    DeclaredQuery(
      "q_latest_wins",
      (s, dir) =>
        Merge.latestWins(
          t(s, dir, "events"),
          Seq("user_id"),
          Seq(col("ts").desc_nulls_last, col("event_id").desc)),
      Some(s"""$EvCte
              SELECT event_id, ts, user_id, event_type, value, props
              FROM (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY user_id
                      ORDER BY ts DESC NULLS LAST, event_id DESC) AS rn
                    FROM ev)
              WHERE rn = 1""")),

    // W1 alternative — SCD Type-2 history: every version kept with its
    // [valid_from, valid_to) range and is_current flag (the reference
    // keeps only the latest-wins survivor; a warehouse wanting history
    // uses this form). Same single key shuffle as latestWins.
    DeclaredQuery(
      "q_scd_history",
      (s, dir) =>
        Merge.scdHistory(t(s, dir, "events"), Seq("user_id"), "ts",
            col("event_id"))
          .select("event_id", "user_id", "event_type",
            "valid_from", "valid_to", "is_current"),
      Some(s"""$EvCte
              SELECT event_id, user_id, event_type,
                     ts AS valid_from,
                     LEAD(ts) OVER w AS valid_to,
                     (LEAD(ts) OVER w IS NULL) AS is_current
              FROM ev
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY ts ASC NULLS FIRST, event_id ASC)""")),

    // W1-alt, STORED: the same SCD2 history maintained INCREMENTALLY —
    // events arrive as three nightly ts-range batches; each night closes
    // superseded versions (appended to the bucketed history, never
    // rewritten) and replaces only the current-row slice. Oracle = the
    // identical from-scratch derivation as q_scd_history: chain-of-appends
    // ≡ one-pass history IS the check.
    DeclaredQuery(
      "q_scd_stored",
      (s, dir) => {
        import graft.ext.ScdState
        val (wh, nm) = scdLoc(dir)
        ScdState.appendStored(s, wh, nm,
          scdNight(s, dir, "2024-01-11", "2024-01-21"), "user_id", "ts",
          col("event_id"))
        ScdState.appendStored(s, wh, nm,
          scdNight(s, dir, "2024-01-21", "2024-02-01"), "user_id", "ts",
          col("event_id"))
        ScdState.readStored(s, wh, nm)
          .select("event_id", "user_id", "event_type",
            "valid_from", "valid_to", "is_current")
      },
      oracle = Some(s"""$EvCte
              SELECT event_id, user_id, event_type,
                     ts AS valid_from,
                     LEAD(ts) OVER w AS valid_to,
                     (LEAD(ts) OVER w IS NULL) AS is_current
              FROM ev
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY ts ASC NULLS FIRST, event_id ASC)"""),
      // pristine seed every sample (createStored overwrites all state);
      // the measured part is the two nightly appends + the serving read
      setup = Some((s, dir) => {
        val (wh, nm) = scdLoc(dir)
        graft.ext.ScdState.createStored(s, wh, nm,
          scdNight(s, dir, "2024-01-01", "2024-01-11"), "user_id", "ts",
          col("event_id"), 4)
      })),

    // Incrementally-maintained SESSIONIZATION state: events arrive as
    // three nightly ts-range batches; each night folds (open-session
    // pseudo-events ∪ batch) under ONE native session_window pass,
    // appends watermark-closed sessions to the bucketed history and
    // replaces only the |keys|-bounded open slice. Oracle = the one-pass
    // gaps-and-islands derivation over ALL events: chain ≡ derivation at
    // any batch split IS the check (midnight-spanning sessions must
    // reassemble across batches).
    DeclaredQuery(
      "q_session_stored",
      (s, dir) => {
        import graft.ext.SessionState
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val (wh, nm) = (s"/tmp/graft_sesswh$tag", s"sess$tag")
        def night(lo: String, hi: String) =
          t(s, dir, "events")
            .select("event_id", "user_id", "ts", "value")
            .filter(col("ts") >= lit(lo).cast("timestamp") &&
              col("ts") < lit(hi).cast("timestamp"))
        val fp = floor(col("value") * 100).cast("long")
        SessionState.appendStored(s, wh, nm,
          night("2024-01-11", "2024-01-21"), "user_id", "ts", fp,
          "30 minutes")
        SessionState.appendStored(s, wh, nm,
          night("2024-01-21", "2024-02-01"), "user_id", "ts", fp,
          "30 minutes")
        SessionState.readStored(s, wh, nm, "user_id")
      },
      setup = Some((s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.ext.SessionState.createStored(s, s"/tmp/graft_sesswh$tag",
          s"sess$tag",
          t(s, dir, "events")
            .select("event_id", "user_id", "ts", "value")
            .filter(col("ts") < lit("2024-01-11").cast("timestamp")),
          "user_id", "ts", floor(col("value") * 100).cast("long"),
          "30 minutes", 4)
      }),
      oracle = Some(s"""$EvCte,
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
                     CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_fp
              FROM sess GROUP BY user_id, sid""")),

    // Dimension SNAPSHOT as of one instant, from the stored SCD2 state:
    // the per-key version whose validity interval holds 2024-01-15
    // 12:00 — "the table as it stood then", one row filter over the
    // history (range-clustered valid_from gives file-level skipping at
    // scale). Oracle = the windowed derivation filtered identically.
    DeclaredQuery(
      "q_scd_snapshot",
      (s, dir) => {
        import graft.ext.ScdState
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val (wh, nm) = (s"/tmp/graft_scdsnapwh$tag", s"scdsnap$tag")
        ScdState.appendStored(s, wh, nm,
          scdNight(s, dir, "2024-01-11", "2024-01-21"), "user_id", "ts",
          col("event_id"))
        ScdState.snapshot(ScdState.readStored(s, wh, nm),
            lit("2024-01-15 12:00:00").cast("timestamp"))
          .select("event_id", "user_id", "event_type", "valid_from")
      },
      setup = Some((s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.ext.ScdState.createStored(s, s"/tmp/graft_scdsnapwh$tag",
          s"scdsnap$tag", scdNight(s, dir, "2024-01-01", "2024-01-11"),
          "user_id", "ts", col("event_id"), 4)
      }),
      oracle = Some(s"""$EvCte,
              scd AS (SELECT event_id, user_id, event_type,
                             ts AS valid_from,
                             LEAD(ts) OVER w AS valid_to
                      FROM ev WHERE ts < TIMESTAMP '2024-01-21 00:00:00'
                      WINDOW w AS (PARTITION BY user_id
                                   ORDER BY ts ASC NULLS FIRST, event_id ASC))
              SELECT event_id, user_id, event_type, valid_from
              FROM scd
              WHERE valid_from <= TIMESTAMP '2024-01-15 12:00:00'
                AND (valid_to IS NULL OR TIMESTAMP '2024-01-15 12:00:00' < valid_to)""")),

    // POINT-IN-TIME enrichment against the stored SCD2 dimension: each
    // fact (a probe 3 days after its source event) picks up the
    // dimension version valid AT that instant — the as-it-stood lookup
    // that prevents feature leakage. Equi-join on the key, validity
    // range as a residual predicate (never an interval cross product).
    // Oracle derives the same history via window SQL and applies the
    // identical BETWEEN-style predicate.
    DeclaredQuery(
      "q_scd_pointintime",
      (s, dir) => {
        import graft.ext.ScdState
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val (wh, nm) = (s"/tmp/graft_scdpitwh$tag", s"scdpit$tag")
        ScdState.appendStored(s, wh, nm,
          scdNight(s, dir, "2024-01-11", "2024-01-21"), "user_id", "ts",
          col("event_id"))
        ScdState.appendStored(s, wh, nm,
          scdNight(s, dir, "2024-01-21", "2024-02-01"), "user_id", "ts",
          col("event_id"))
        val dim = ScdState.readStored(s, wh, nm)
          .select("event_id", "user_id", "event_type", "valid_from",
            "valid_to")
        val facts = t(s, dir, "events")
          .filter(col("event_id") % 5 === 0)
          .select(col("event_id").as("fact_id"), col("user_id"),
            (col("ts") + expr("INTERVAL 3 DAYS")).as("probe_ts"))
        ScdState.pointInTime(dim, facts, "user_id", "probe_ts")
          .select(col("fact_id"), col("user_id"),
            col("event_id").as("version_id"), col("event_type"),
            col("valid_from"))
      },
      setup = Some((s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.ext.ScdState.createStored(s, s"/tmp/graft_scdpitwh$tag",
          s"scdpit$tag", scdNight(s, dir, "2024-01-01", "2024-01-11"),
          "user_id", "ts", col("event_id"), 4)
      }),
      oracle = Some(s"""$EvCte,
              scd AS (SELECT event_id, user_id, event_type,
                             ts AS valid_from,
                             LEAD(ts) OVER w AS valid_to
                      FROM ev
                      WINDOW w AS (PARTITION BY user_id
                                   ORDER BY ts ASC NULLS FIRST, event_id ASC)),
              f AS (SELECT event_id AS fact_id, user_id,
                           ts + INTERVAL 3 DAY AS probe_ts
                    FROM ev WHERE event_id % 5 = 0)
              SELECT f.fact_id, f.user_id, s.event_id AS version_id,
                     s.event_type, s.valid_from
              FROM f JOIN scd s ON f.user_id = s.user_id
               AND f.probe_ts >= s.valid_from
               AND (s.valid_to IS NULL OR f.probe_ts < s.valid_to)""")),

    // U2+P9 — schema-drifted union: change-set is missing o_orderpriority,
    // carries o_totalprice as a string (CSV-typed), and adds source_file;
    // target types stay authoritative for common columns.
    DeclaredQuery(
      "q_aligned_union",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val change = orders
          .filter(col("o_orderkey") % 10 === 0)
          .select(
            col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice").cast("string").as("o_totalprice"),
            col("o_orderdate"),
            lit("batch_2026_01.csv").as("source_file"))
        Merge.alignedUnion(orders, change)
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                     o_orderdate, CAST(NULL AS VARCHAR) AS source_file,
                     o_orderpriority
              FROM orders
              UNION ALL
              SELECT o_orderkey, o_custkey, o_orderstatus,
                     CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE),
                     o_orderdate, 'batch_2026_01.csv',
                     CAST(NULL AS VARCHAR)
              FROM orders WHERE o_orderkey % 10 = 0""")),

    // J1+W1+U2 — the flagship full merge: updates (newer version wins) +
    // tombstones (key vanishes) merged onto the current table.
    DeclaredQuery(
      "q_merge_full",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val updates = orders
          .filter(col("o_orderkey") % 7 === 0)
          .select(
            col("o_orderkey"), col("o_custkey"),
            lit("U").as("o_orderstatus"),
            (col("o_totalprice") + 1000.0).as("o_totalprice"),
            (col("o_orderdate") + expr("INTERVAL 400 DAYS")).as("o_orderdate"),
            col("o_orderpriority"))
        val tombstones = orders
          .filter(col("o_orderkey") % 13 === 0)
          .select(
            col("o_orderkey"),
            lit(null).cast("bigint").as("o_custkey"),
            lit("DELETED").as("o_orderstatus"),
            lit(null).cast("double").as("o_totalprice"),
            lit(null).cast("timestamp").as("o_orderdate"),
            lit(null).cast("string").as("o_orderpriority"))
        Merge.merge(
          orders,
          updates.unionAll(tombstones),
          "o_orderkey",
          Seq(col("o_orderdate").desc_nulls_last, col("o_totalprice").desc_nulls_last),
          col("o_orderstatus") === "DELETED")
      },
      Some("""WITH change AS (
                SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                       o_totalprice + 1000.0 AS o_totalprice,
                       o_orderdate + INTERVAL 400 DAY AS o_orderdate,
                       o_orderpriority
                FROM orders WHERE o_orderkey % 7 = 0
                UNION ALL
                SELECT o_orderkey, CAST(NULL AS BIGINT), 'DELETED',
                       CAST(NULL AS DOUBLE), CAST(NULL AS TIMESTAMP),
                       CAST(NULL AS VARCHAR)
                FROM orders WHERE o_orderkey % 13 = 0),
              unioned AS (
                SELECT * FROM orders UNION ALL SELECT * FROM change),
              alive AS (
                SELECT * FROM unioned
                WHERE o_orderkey NOT IN (
                  SELECT o_orderkey FROM unioned WHERE o_orderstatus = 'DELETED')),
              ranked AS (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY o_orderkey
                  ORDER BY o_orderdate DESC NULLS LAST,
                           o_totalprice DESC NULLS LAST) AS rn
                FROM alive)
              SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                     o_orderdate, o_orderpriority
              FROM ranked WHERE rn = 1""")),

    // J1+W1+U2+K2 — the SAME flagship merge, executed through the
    // PARTITION-PRUNED warehouse path (Merge.mergePartitioned): target is
    // seeded as a parquet table partitioned by o_orderstatus, the change-set
    // is applied via touched-partition resolution + dynamic partition
    // overwrite, and the read-back table is the result. The oracle is the
    // SAME SQL as q_merge_full — output equivalence of the pruned write
    // path and the logical merge IS the check (MergePartitionedSpec
    // additionally pins that untouched partitions' files are not
    // rewritten). Updates move rows 'O'/'F'/'P' -> 'U' across partition
    // directories, so the cross-partition-move case is exercised, not just
    // in-place rewrite.
    DeclaredQuery(
      "q_merge_partitioned",
      (s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val wh = s"/tmp/graft_mergewh$tag"
        Merge.mergePartitioned(s, wh, "orders_part",
          mergeChangeSet(s, dir), "o_orderkey", "o_orderstatus",
          Seq(col("o_orderdate").desc_nulls_last, col("o_totalprice").desc_nulls_last),
          col("o_orderstatus") === "DELETED")
        Tables.readWarehouse(s, wh, "orders_part")
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority")
      },
      setup = Some((s, dir) =>
        seedMergeWarehouse(s, dir,
          s"/tmp/graft_mergewh${dir.replaceAll("[^a-zA-Z0-9]", "_")}")),
      oracle = Some("""WITH change AS (
                SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                       o_totalprice + 1000.0 AS o_totalprice,
                       o_orderdate + INTERVAL 400 DAY AS o_orderdate,
                       o_orderpriority
                FROM orders WHERE o_orderkey % 7 = 0
                UNION ALL
                SELECT o_orderkey, CAST(NULL AS BIGINT), 'DELETED',
                       CAST(NULL AS DOUBLE), CAST(NULL AS TIMESTAMP),
                       CAST(NULL AS VARCHAR)
                FROM orders WHERE o_orderkey % 13 = 0),
              unioned AS (
                SELECT * FROM orders UNION ALL SELECT * FROM change),
              alive AS (
                SELECT * FROM unioned
                WHERE o_orderkey NOT IN (
                  SELECT o_orderkey FROM unioned WHERE o_orderstatus = 'DELETED')),
              ranked AS (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY o_orderkey
                  ORDER BY o_orderdate DESC NULLS LAST,
                           o_totalprice DESC NULLS LAST) AS rn
                FROM alive)
              SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                     o_orderdate, o_orderpriority
              FROM ranked WHERE rn = 1""")),

    // The SAME flagship merge through the INDEXED partitioned path
    // (Merge.mergePartitionedIndexed): a key→partition locate index is
    // built once beside the table, the change-set's touched partitions are
    // resolved by joining change keys against that slim metadata relation
    // (zero reads of the data table outside the pruned slice —
    // MergeKeyIndexSpec pins the locate plan's scan set), and the index is
    // maintained in the same dynamic-overwrite pass as the data. Oracle =
    // the same SQL as q_merge_full: output equivalence of locate-scan,
    // indexed, and logical merge is the three-way check.
    DeclaredQuery(
      "q_merge_partitioned_idx",
      (s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val wh = s"/tmp/graft_mergeidxwh$tag"
        Merge.mergePartitionedIndexed(s, wh, "orders_part",
          mergeChangeSet(s, dir), "o_orderkey", "o_orderstatus",
          Seq(col("o_orderdate").desc_nulls_last, col("o_totalprice").desc_nulls_last),
          col("o_orderstatus") === "DELETED")
        Tables.readWarehouse(s, wh, "orders_part")
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_mergeidxwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        seedMergeWarehouse(s, dir, wh)
        Merge.buildKeyIndex(s, wh, "orders_part", "o_orderkey", "o_orderstatus")
      }),
      oracle = Some("""WITH change AS (
                SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                       o_totalprice + 1000.0 AS o_totalprice,
                       o_orderdate + INTERVAL 400 DAY AS o_orderdate,
                       o_orderpriority
                FROM orders WHERE o_orderkey % 7 = 0
                UNION ALL
                SELECT o_orderkey, CAST(NULL AS BIGINT), 'DELETED',
                       CAST(NULL AS DOUBLE), CAST(NULL AS TIMESTAMP),
                       CAST(NULL AS VARCHAR)
                FROM orders WHERE o_orderkey % 13 = 0),
              unioned AS (
                SELECT * FROM orders UNION ALL SELECT * FROM change),
              alive AS (
                SELECT * FROM unioned
                WHERE o_orderkey NOT IN (
                  SELECT o_orderkey FROM unioned WHERE o_orderstatus = 'DELETED')),
              ranked AS (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY o_orderkey
                  ORDER BY o_orderdate DESC NULLS LAST,
                           o_totalprice DESC NULLS LAST) AS rn
                FROM alive)
              SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                     o_orderdate, o_orderpriority
              FROM ranked WHERE rn = 1""")),

    // CDC change feed over the flagship merge: same change-set as
    // q_merge_full plus a fresh-key insert batch, classified per key as
    // insert / update / delete by Merge.changeFeed (unchanged keys are
    // filtered — a CDC feed IS the delta). Presence is marker-based, so
    // the all-NULL tombstoned columns never masquerade as absence.
    DeclaredQuery(
      "q_merge_cdc",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val updates = orders
          .filter(col("o_orderkey") % 7 === 0)
          .select(
            col("o_orderkey"), col("o_custkey"),
            lit("U").as("o_orderstatus"),
            (col("o_totalprice") + 1000.0).as("o_totalprice"),
            (col("o_orderdate") + expr("INTERVAL 400 DAYS")).as("o_orderdate"),
            col("o_orderpriority"))
        val inserts = orders
          .filter(col("o_orderkey") % 11 === 0)
          .select(
            (col("o_orderkey") + 100000000L).as("o_orderkey"), col("o_custkey"),
            lit("N").as("o_orderstatus"), col("o_totalprice"),
            col("o_orderdate"), col("o_orderpriority"))
        val tombstones = orders
          .filter(col("o_orderkey") % 13 === 0)
          .select(
            col("o_orderkey"),
            lit(null).cast("bigint").as("o_custkey"),
            lit("DELETED").as("o_orderstatus"),
            lit(null).cast("double").as("o_totalprice"),
            lit(null).cast("timestamp").as("o_orderdate"),
            lit(null).cast("string").as("o_orderpriority"))
        val merged = Merge.merge(
          orders,
          updates.unionAll(inserts).unionAll(tombstones),
          "o_orderkey",
          Seq(col("o_orderdate").desc_nulls_last, col("o_totalprice").desc_nulls_last),
          col("o_orderstatus") === "DELETED")
        Merge.changeFeed(orders, merged, "o_orderkey",
          Seq("o_orderstatus", "o_totalprice"))
      },
      Some("""WITH change AS (
                SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                       o_totalprice + 1000.0 AS o_totalprice,
                       o_orderdate + INTERVAL 400 DAY AS o_orderdate,
                       o_orderpriority
                FROM orders WHERE o_orderkey % 7 = 0
                UNION ALL
                SELECT o_orderkey + 100000000, o_custkey, 'N', o_totalprice,
                       o_orderdate, o_orderpriority
                FROM orders WHERE o_orderkey % 11 = 0
                UNION ALL
                SELECT o_orderkey, CAST(NULL AS BIGINT), 'DELETED',
                       CAST(NULL AS DOUBLE), CAST(NULL AS TIMESTAMP),
                       CAST(NULL AS VARCHAR)
                FROM orders WHERE o_orderkey % 13 = 0),
              unioned AS (
                SELECT * FROM orders UNION ALL SELECT * FROM change),
              alive AS (
                SELECT * FROM unioned
                WHERE o_orderkey NOT IN (
                  SELECT o_orderkey FROM unioned WHERE o_orderstatus = 'DELETED')),
              ranked AS (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY o_orderkey
                  ORDER BY o_orderdate DESC NULLS LAST,
                           o_totalprice DESC NULLS LAST) AS rn
                FROM alive),
              merged AS (
                SELECT o_orderkey, o_orderstatus, o_totalprice
                FROM ranked WHERE rn = 1),
              feed AS (
                SELECT coalesce(t.o_orderkey, m.o_orderkey) AS o_orderkey,
                       CASE WHEN t.o_orderkey IS NULL THEN 'insert'
                            WHEN m.o_orderkey IS NULL THEN 'delete'
                            WHEN NOT (t.o_orderstatus IS NOT DISTINCT FROM m.o_orderstatus
                                      AND t.o_totalprice IS NOT DISTINCT FROM m.o_totalprice)
                            THEN 'update' ELSE 'unchanged' END AS change_type,
                       t.o_orderstatus AS old_o_orderstatus,
                       m.o_orderstatus AS new_o_orderstatus,
                       t.o_totalprice AS old_o_totalprice,
                       m.o_totalprice AS new_o_totalprice
                FROM orders t FULL OUTER JOIN merged m
                  ON t.o_orderkey = m.o_orderkey)
              SELECT * FROM feed WHERE change_type <> 'unchanged'""")),

    // A1 (distributed) — watermark max-by per group as one hash aggregation.
    DeclaredQuery(
      "q_watermark_maxby",
      (s, dir) =>
        WatermarkStore.latestPerGroup(
          t(s, dir, "orders"), "o_custkey", "o_orderkey", "o_orderdate"),
      Some("""SELECT o_custkey, o_orderkey AS latest_name, max_created_at
              FROM (SELECT o_custkey, o_orderkey,
                           ROW_NUMBER() OVER (
                             PARTITION BY o_custkey
                             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn,
                           MAX(o_orderdate) OVER (PARTITION BY o_custkey)
                             AS max_created_at
                    FROM orders)
              WHERE rn = 1""")),

    // U1 — plain append union.
    DeclaredQuery(
      "q_union_append",
      (s, dir) => {
        val n = t(s, dir, "nation")
        n.filter(col("n_regionkey") === 0).select(col("n_nationkey"), col("n_name"))
          .union(
            n.filter(col("n_regionkey") === 1).select(col("n_nationkey"), col("n_name")))
      },
      Some("""SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 0
              UNION ALL
              SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 1""")),

    // S1+P1-P3+P6+P10 end-to-end on the REAL ingest format: a deterministic
    // bc2adls-shaped CSV fixture (written fresh by the query itself) goes
    // through the inferred-schema folder scan, normalize (the `Name-123` /
    // `name` pair collapses to a duplicate and BOTH drop — the reference
    // quirk), the `$company` -> `_company` reserved rename (parquet column
    // names cannot carry `$`, so this is the only oracle-visible route for
    // P6), and table-name sanitization as a literal column. The oracle is
    // the expected VALUES relation — self-contained, no file dependency.
    DeclaredQuery(
      "q_csv_ingest_e2e",
      (s, _) => {
        val dir = java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), "graft_csv_fixture")
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.writeString(dir.resolve("Accounts-1.csv"),
          "id,Name-123,name,$company,amount\n" +
            "1,alpha,a,acme,10.5\n2,beta,b,globex,20.25\n")
        java.nio.file.Files.writeString(dir.resolve("Accounts-2.csv"),
          "id,Name-123,name,$company,amount\n" +
            "3,gamma,c,acme,30.75\n")
        val raw = Tables.readCsvFolder(s, dir.toString)
        Normalize.renameReserved(Normalize.normalizeColumns(raw))
          .withColumn("src_table", lit(Normalize.tableName(dir.toString)))
      },
      Some("""SELECT id, _company, CAST(amount AS DOUBLE) AS amount, src_table
              FROM (VALUES
                (1, 'acme',   10.5,  'graftcsvfixture'),
                (2, 'globex', 20.25, 'graftcsvfixture'),
                (3, 'acme',   30.75, 'graftcsvfixture'))
              AS t(id, _company, amount, src_table)""")),

    // JSONL ingest e2e: the API-export drop shape — line-delimited JSON
    // (splittable, unlike the reference's multiline CSVs) with nested
    // objects flattened to warehouse columns by a pure zero-shuffle
    // projection; arrays stay intact for downstream explode decisions
    // (surfaced here as a size). Oracle pins the flattened names, the
    // nested values, and the inferred types.
    DeclaredQuery(
      "q_json_ingest_e2e",
      (s, _) => {
        val dir = java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), "graft_json_fixture")
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.writeString(dir.resolve("drop-1.jsonl"),
          """{"id":1,"name":"alpha","address":{"city":"rome","geo":{"lat":1.5}},"tags":["x","y"]}""" + "\n" +
            """{"id":2,"name":"beta","address":{"city":"oslo","geo":{"lat":2.5}},"tags":[]}""" + "\n")
        java.nio.file.Files.writeString(dir.resolve("drop-2.jsonl"),
          """{"id":3,"name":"gamma","address":{"city":"lima","geo":{"lat":3.5}},"tags":["z"]}""" + "\n")
        Normalize.flattenStructs(Tables.readJsonFolder(s, dir.toString))
          .select(col("id"), col("name"), col("address_city"),
            col("address_geo_lat"), size(col("tags")).as("n_tags"))
      },
      Some("""SELECT CAST(id AS BIGINT) AS id, name, address_city,
                     CAST(lat AS DOUBLE) AS address_geo_lat,
                     CAST(n AS INTEGER) AS n_tags
              FROM (VALUES
                (1, 'alpha', 'rome', 1.5, 2),
                (2, 'beta',  'oslo', 2.5, 0),
                (3, 'gamma', 'lima', 3.5, 1))
              AS t(id, name, address_city, lat, n)""")),

    // Snapshot-versioned table TIME TRAVEL: two committed versions of a
    // dimension read side by side — the reference's full-overwrite sink
    // upgraded to MVCC (immutable version dirs + one atomic pointer
    // commit), so readers never see a torn table, history stays
    // addressable, and rollback is a pointer move. Oracle recomputes
    // both snapshots from the source.
    DeclaredQuery(
      "q_time_travel",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        Versioned.readVersioned(s, wh, "cust_dim", Some(1))
          .withColumn("version", lit(1L))
          .unionByName(Versioned.readVersioned(s, wh, "cust_dim")
            .withColumn("version", lit(2L)))
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/cust_dim.v")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        val c = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        Versioned.writeVersioned(s, wh, "cust_dim",
          c.filter(col("c_custkey") % 3 === 0))
        Versioned.writeVersioned(s, wh, "cust_dim",
          c.filter(col("c_custkey") % 3 =!= 2)
            .withColumn("c_acctbal",
              when(col("c_custkey") % 3 === 1, col("c_acctbal") + 10.0)
                .otherwise(col("c_acctbal"))))
      }),
      oracle = Some("""SELECT c_custkey, c_mktsegment, c_acctbal,
                     CAST(1 AS BIGINT) AS version
              FROM customer WHERE c_custkey % 3 = 0
              UNION ALL
              SELECT c_custkey, c_mktsegment,
                     CASE WHEN c_custkey % 3 = 1 THEN c_acctbal + 10
                          ELSE c_acctbal END,
                     CAST(2 AS BIGINT)
              FROM customer WHERE c_custkey % 3 <> 2""")),

    // MERGE composed with the VERSIONED sink: the nightly merge writes
    // its result as the next snapshot instead of overwriting — readers
    // keep last night's version until the atomic pointer commit, and the
    // pre-merge snapshot stays addressable for diff/rollback. Oracle =
    // q_merge_full's: path equivalence through the versioned layer IS
    // the check.
    DeclaredQuery(
      "q_merge_versioned",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val target = Versioned.readVersioned(s, wh, "orders_ver")
        val merged = Merge.merge(
          target, mergeChangeSet(s, dir), "o_orderkey",
          Seq(col("o_orderdate").desc_nulls_last,
            col("o_totalprice").desc_nulls_last),
          col("o_orderstatus") === "DELETED")
        Versioned.writeVersioned(s, wh, "orders_ver", merged)
        Versioned.readVersioned(s, wh, "orders_ver")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_ver.v")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        Versioned.writeVersioned(s, wh, "orders_ver", t(s, dir, "orders"))
      }),
      oracle = Some("""WITH change AS (
                SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                       o_totalprice + 1000.0 AS o_totalprice,
                       o_orderdate + INTERVAL 400 DAY AS o_orderdate,
                       o_orderpriority
                FROM orders WHERE o_orderkey % 7 = 0
                UNION ALL
                SELECT o_orderkey, CAST(NULL AS BIGINT), 'DELETED',
                       CAST(NULL AS DOUBLE), CAST(NULL AS TIMESTAMP),
                       CAST(NULL AS VARCHAR)
                FROM orders WHERE o_orderkey % 13 = 0),
              unioned AS (
                SELECT * FROM orders UNION ALL SELECT * FROM change),
              alive AS (
                SELECT * FROM unioned
                WHERE o_orderkey NOT IN (
                  SELECT o_orderkey FROM unioned WHERE o_orderstatus = 'DELETED')),
              ranked AS (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY o_orderkey
                  ORDER BY o_orderdate DESC NULLS LAST,
                           o_totalprice DESC NULLS LAST) AS rn
                FROM alive)
              SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                     o_orderdate, o_orderpriority
              FROM ranked WHERE rn = 1""")),

    // DIFF composed with the VERSIONED table: "what changed between
    // yesterday's and today's snapshot" — the audit the version layer
    // makes cheap (both sides are immutable dirs; one full-outer
    // co-shuffle answers it). Fixture exercises all three statuses.
    DeclaredQuery(
      "q_version_diff",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.ext.Diff.diff(
            Versioned.readVersioned(s, wh, "cust_dim2", Some(1)),
            Versioned.readVersioned(s, wh, "cust_dim2", Some(2)),
            Seq("c_custkey"))
          .select(col("c_custkey"), col("status"),
            concat_ws(",", col("changed_cols")).as("changed_cols"))
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/cust_dim2.v")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        val c = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        Versioned.writeVersioned(s, wh, "cust_dim2",
          c.filter(col("c_custkey") % 3 =!= 1))
        Versioned.writeVersioned(s, wh, "cust_dim2",
          c.filter(col("c_custkey") % 3 =!= 2)
            .withColumn("c_acctbal",
              when(col("c_custkey") % 6 === 0, col("c_acctbal") + 10.0)
                .otherwise(col("c_acctbal"))))
      }),
      oracle = Some("""SELECT c_custkey, 'added' AS status, '' AS changed_cols
              FROM customer WHERE c_custkey % 3 = 1
              UNION ALL
              SELECT c_custkey, 'removed', ''
              FROM customer WHERE c_custkey % 3 = 2
              UNION ALL
              SELECT c_custkey, 'changed', 'c_acctbal'
              FROM customer WHERE c_custkey % 6 = 0""")),

    // MANIFEST-versioned INCREMENTAL snapshot: the versioned sink with
    // FILE REUSE (a version = manifest of immutable partition dirs), so
    // the nightly delta below rewrites ONLY the touched partition and a
    // new committed version appears whose other partitions share last
    // night's files byte-for-byte (reuse is spec-pinned in
    // ManifestVersionedSpec; this query verifies the read SEMANTICS:
    // partition-replace through the manifest layer). Timed section =
    // the 1-partition delta commit + current read — the operator's real
    // nightly cost; the full bootstrap write is setup.
    DeclaredQuery(
      "q_incremental_snapshot",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val delta = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        graft.io.ManifestVersioned.writeDelta(s, wh, "orders_mv", delta,
          "o_orderpriority")
        graft.io.ManifestVersioned.read(s, wh, "orders_mv")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_mv.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_mv",
          t(s, dir, "orders"), "o_orderpriority")
      }),
      oracle = Some("""SELECT o_orderkey, o_custkey, o_orderstatus,
                     CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice + 1000.0 ELSE o_totalprice END
                       AS o_totalprice,
                     o_orderdate, o_orderpriority
              FROM orders""")),

    // Partition-level SNAPSHOT DIFF off the manifests alone — "which
    // partitions changed between last night and tonight" answered with
    // ZERO data reads (two k-line manifest files), the audit that decides
    // what downstream consumers must reprocess. Fixture exercises all
    // three statuses: a segment added, one dropped, one rewritten (with
    // changed balances — q_snapshot_rowdiff reuses the same state).
    DeclaredQuery(
      "q_snapshot_diff",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.io.ManifestVersioned.manifestDiff(s, wh, "cust_mv", 1, 2)
      },
      setup = Some(seedCustMv),
      oracle = Some("""SELECT 'BUILDING' AS part_value, 'added' AS status
              UNION ALL SELECT 'FURNITURE', 'removed'
              UNION ALL SELECT 'MACHINERY', 'changed'""")),

    // ROW-level diff between the same two snapshots, PARTITION-PRUNED
    // off the manifests: the free metadata pre-pass picks the three
    // changed segments and ONLY their generation dirs are scanned on
    // either side — the untouched segments contribute zero IO to the
    // "what actually moved last night" audit (a plain two-snapshot diff
    // co-shuffles both full versions). Oracle recomputes all three row
    // statuses from the source.
    DeclaredQuery(
      "q_snapshot_rowdiff",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.ext.Diff.diffVersions(s, wh, "cust_mv", 1, 2,
            Seq("c_custkey"))
          .select(col("c_custkey"), col("status"),
            concat_ws(",", col("changed_cols")).as("changed_cols"))
      },
      setup = Some(seedCustMv),
      oracle = Some("""SELECT c_custkey, 'added' AS status, '' AS changed_cols
              FROM customer WHERE c_mktsegment = 'BUILDING'
              UNION ALL
              SELECT c_custkey, 'removed', ''
              FROM customer WHERE c_mktsegment = 'FURNITURE'
              UNION ALL
              SELECT c_custkey, 'changed', 'c_acctbal'
              FROM customer WHERE c_mktsegment = 'MACHINERY'""")),

    // The NIGHTLY MERGE through the manifest layer: partition-pruned
    // latest-wins/tombstone merge whose survivors commit as ONE atomic
    // manifest version — touched partitions write new generation dirs,
    // untouched partitions share last night's files byte-for-byte
    // (reuse + emptied-partition drop spec-pinned in
    // ManifestVersionedSpec), and the pre-merge snapshot stays
    // time-travelable. Oracle = q_merge_versioned's from-scratch merge:
    // path equivalence through prune + manifest commit IS the check.
    DeclaredQuery(
      "q_merge_manifest",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.io.ManifestVersioned.mergeVersioned(s, wh, "orders_mrgmv",
          mergeChangeSet(s, dir), "o_orderkey", "o_orderpriority",
          Seq(col("o_orderdate").desc_nulls_last,
            col("o_totalprice").desc_nulls_last),
          col("o_orderstatus") === "DELETED")
        graft.io.ManifestVersioned.read(s, wh, "orders_mrgmv")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_mrgmv.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_mrgmv",
          t(s, dir, "orders"), "o_orderpriority")
      }),
      oracle = Some("""WITH change AS (
                SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                       o_totalprice + 1000.0 AS o_totalprice,
                       o_orderdate + INTERVAL 400 DAY AS o_orderdate,
                       o_orderpriority
                FROM orders WHERE o_orderkey % 7 = 0
                UNION ALL
                SELECT o_orderkey, CAST(NULL AS BIGINT), 'DELETED',
                       CAST(NULL AS DOUBLE), CAST(NULL AS TIMESTAMP),
                       CAST(NULL AS VARCHAR)
                FROM orders WHERE o_orderkey % 13 = 0),
              unioned AS (
                SELECT * FROM orders UNION ALL SELECT * FROM change),
              alive AS (
                SELECT * FROM unioned
                WHERE o_orderkey NOT IN (
                  SELECT o_orderkey FROM unioned WHERE o_orderstatus = 'DELETED')),
              ranked AS (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY o_orderkey
                  ORDER BY o_orderdate DESC NULLS LAST,
                           o_totalprice DESC NULLS LAST) AS rn
                FROM alive)
              SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                     o_orderdate, o_orderpriority
              FROM ranked WHERE rn = 1""")),

    // ADDITIVE schema evolution: a table widened mid-life (early files
    // lack `o_prio`) reads whole through the merge-by-name reader — old
    // rows surface the new column as NULL, and widening cost ZERO
    // rewrites. The plain reader would silently drop or keep the column
    // depending on which file seeds the schema; the evolved read is the
    // contract for any table that ever widened. Oracle = the two epochs
    // unioned by name with an explicit NULL for the missing column.
    DeclaredQuery(
      "q_schema_evolution",
      (s, dir) => {
        val wh = s"/tmp/graft_evowh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        Tables.readWarehouseEvolved(s, wh, "orders_evo")
          .select(col("o_orderkey"), col("o_totalprice"), col("o_prio"))
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_evowh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val o = t(s, dir, "orders")
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_evo")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        // epoch 1: narrow schema
        o.filter(col("o_orderkey") % 2 === 0)
          .select("o_orderkey", "o_totalprice")
          .write.mode("append").parquet(base.toString)
        // epoch 2: widened with o_prio
        o.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_totalprice"),
            (col("o_orderkey") % 7).as("o_prio"))
          .write.mode("append").parquet(base.toString)
      }),
      oracle = Some("""SELECT o_orderkey, o_totalprice,
                     CAST(NULL AS BIGINT) AS o_prio
              FROM orders WHERE o_orderkey % 2 = 0
              UNION ALL
              SELECT o_orderkey, o_totalprice, o_orderkey % 7 AS o_prio
              FROM orders WHERE o_orderkey % 2 = 1""")),

    // RENAME schema evolution through the guard's explicit rename map:
    // a real Dynamics-style source RENAMES columns across API versions
    // (the reference's regex-suffix normalization exists because names
    // churn); additive widening alone can't express that — the naive
    // append would land the renamed column as (old=NULL, new=extra).
    // Here night 2's batch arrives with `total_price` and the declared
    // map folds it onto the stored `o_totalprice`, so the table keeps
    // ONE coherent schema (the stored one stays authoritative; an
    // UNDECLARED rename still rejects loudly — SchemaGuardSpec pins the
    // reject path). Timed section = the guarded append + evolved read.
    DeclaredQuery(
      "q_rename_evolution",
      (s, dir) => {
        val wh = s"/tmp/graft_evowh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val stored = Tables.readWarehouse(s, wh, "orders_ren").schema
        val renamedBatch = t(s, dir, "orders")
          .filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"),
            (col("o_totalprice") + 500.0).as("total_price"))
        val conformed = graft.core.SchemaGuard.conform(stored, renamedBatch,
          align = false, "orders_ren",
          renames = Map("total_price" -> "o_totalprice"))
        Tables.appendWarehouse(conformed, wh, "orders_ren")
        Tables.readWarehouseEvolved(s, wh, "orders_ren")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_evowh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_ren")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        Tables.writeWarehouse(
          t(s, dir, "orders").filter(col("o_orderkey") % 2 === 0)
            .select("o_orderkey", "o_totalprice"),
          wh, "orders_ren")
      }),
      oracle = Some("""SELECT o_orderkey, o_totalprice
              FROM orders WHERE o_orderkey % 2 = 0
              UNION ALL
              SELECT o_orderkey, o_totalprice + 500.0
              FROM orders WHERE o_orderkey % 2 = 1""")),

    // DELETE VECTORS (merge-on-read): a GDPR-style scattered delete —
    // keys sprinkled across EVERY partition — commits as tiny per-
    // partition tombstone dirs referenced by one new manifest version;
    // NO data partition is rewritten (spec-pinned: zero new generation
    // dirs), and the read applies the vectors as a broadcast anti-join.
    // The rewrite path (mergeVersioned with tombstones) would pay every
    // touched partition's full write amplification for the same rows;
    // oracle equivalence against the plain filter IS the
    // three-way-path check. Timed section = the DV commit + MoR read.
    DeclaredQuery(
      "q_delete_vectors",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.io.ManifestVersioned.deleteRows(s, wh, "orders_dvmv",
          t(s, dir, "orders").filter(col("o_orderkey") % 97 === 0)
            .select("o_orderkey", "o_orderpriority"),
          "o_orderkey", Seq("o_orderpriority"))
        graft.io.ManifestVersioned.read(s, wh, "orders_dvmv")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_dvmv.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_dvmv",
          t(s, dir, "orders"), "o_orderpriority")
      }),
      oracle = Some("""SELECT o_orderkey, o_custkey, o_orderstatus,
                     o_totalprice, o_orderdate, o_orderpriority
              FROM orders WHERE o_orderkey % 97 <> 0""")),

    // ZONE-MAP-pruned read: the manifest records per-partition min/max
    // for every column at commit time, and a selective predicate on a
    // NON-partition column (o_orderdate, against a year-partitioned
    // layout) prunes partitions at the MANIFEST level — pruned years
    // are never listed, never planned, never scanned (stronger than
    // footer skipping, which still lists and opens every file). The
    // residual row filter guarantees exactness whatever pruned
    // (spec-pinned in ManifestVersionedR8Spec; the scanned-set shrink
    // is pinned there too). Oracle = the plain filter.
    DeclaredQuery(
      "q_zonemap_read",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        // o_orderdate is TIMESTAMP_NTZ in the driver corpus: the pred
        // value is a LocalDateTime (exact type-family match — the zone
        // maps prune; a zoned Timestamp would conservatively scan all)
        graft.io.ManifestVersioned.readWhere(s, wh, "orders_zmv",
          Seq(graft.io.ZoneGe("o_orderdate",
            java.time.LocalDateTime.parse("1997-06-01T00:00:00"))))
          .select("o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_zmv.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_zmv",
          t(s, dir, "orders")
            .withColumn("o_year", year(col("o_orderdate")).cast("string")),
          "o_year")
      }),
      oracle = Some("""SELECT o_orderkey, o_custkey, o_orderstatus,
                     o_totalprice, o_orderdate, o_orderpriority
              FROM orders
              WHERE o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'""")),

    // Row-level CHANGE FEED between committed versions — the
    // subscription form of the snapshot diff: what a downstream
    // pipeline CONSUMES after each nightly commit instead of re-diffing
    // two snapshots (Delta CDF shape: version, key, change_type,
    // old/new values). Partition-pruned off the manifest pair — the
    // untouched segments contribute zero IO and provably zero feed
    // rows. Fixture = the q_snapshot_diff state (segment added /
    // dropped / rewritten); oracle recomputes all three change kinds
    // from the source.
    DeclaredQuery(
      "q_change_feed",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.io.ManifestVersioned.readChangesSince(s, wh, "cust_mv", 1,
          "c_custkey")
      },
      setup = Some(seedCustMv),
      oracle = Some("""SELECT 2 AS version, c_custkey,
                     'insert' AS change_type,
                     CAST(NULL AS VARCHAR) AS old_c_mktsegment,
                     c_mktsegment AS new_c_mktsegment,
                     CAST(NULL AS DOUBLE) AS old_c_acctbal,
                     c_acctbal AS new_c_acctbal
              FROM customer WHERE c_mktsegment = 'BUILDING'
              UNION ALL
              SELECT 2, c_custkey, 'delete', c_mktsegment,
                     CAST(NULL AS VARCHAR), c_acctbal, CAST(NULL AS DOUBLE)
              FROM customer WHERE c_mktsegment = 'FURNITURE'
              UNION ALL
              SELECT 2, c_custkey, 'update', c_mktsegment, c_mktsegment,
                     c_acctbal, c_acctbal + 10.0
              FROM customer WHERE c_mktsegment = 'MACHINERY'""")),

    // The FIRST-CLASS streaming source (r9, `format("graft")`) driven
    // end-to-end: subscribe at version cursor 1, drain every available
    // micro-batch into a memory sink, return the sink — the SAME
    // oracle as q_change_feed, so the stream's micro-batches are
    // oracle-verified to be exactly the batch change feed (offsets =
    // manifest versions; each batch = readChangesSince through the
    // pruned engine path).
    DeclaredQuery(
      "q_stream_changefeed",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        s.catalog.dropTempView("stream_cf_out"): Unit
        val q = s.readStream.format("graft")
          .option("warehouse", wh).option("table", "cust_mv")
          .option("keyCol", "c_custkey").option("startingVersion", "1")
          .load()
          .writeStream.format("memory").queryName("stream_cf_out").start()
        try q.processAllAvailable() finally q.stop()
        s.table("stream_cf_out")
      },
      setup = Some(seedCustMv),
      oracle = Some("""SELECT 2 AS version, c_custkey,
                     'insert' AS change_type,
                     CAST(NULL AS VARCHAR) AS old_c_mktsegment,
                     c_mktsegment AS new_c_mktsegment,
                     CAST(NULL AS DOUBLE) AS old_c_acctbal,
                     c_acctbal AS new_c_acctbal
              FROM customer WHERE c_mktsegment = 'BUILDING'
              UNION ALL
              SELECT 2, c_custkey, 'delete', c_mktsegment,
                     CAST(NULL AS VARCHAR), c_acctbal, CAST(NULL AS DOUBLE)
              FROM customer WHERE c_mktsegment = 'FURNITURE'
              UNION ALL
              SELECT 2, c_custkey, 'update', c_mktsegment, c_mktsegment,
                     c_acctbal, c_acctbal + 10.0
              FROM customer WHERE c_mktsegment = 'MACHINERY'""")),

    // The streaming SINK (r9, `writeStream.format("graft")` in merge
    // mode) driven end-to-end: the nightly CDC batch arrives as a file
    // stream and commits through mergeVersionedMulti(sourceWins) with
    // the ledger-free batch-id note guard — the reference's whole job
    // as a streaming pipe. Oracle = the same merge algebra as
    // q_sql_merge replayed in DuckDB (the change batch is identical).
    DeclaredQuery(
      "q_stream_sink_merge",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val inSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("o_orderkey",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("o_orderstatus",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("o_totalprice",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("o_orderpriority",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("is_del",
            org.apache.spark.sql.types.BooleanType)))
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft-ssk-ck").toString
        val q = s.readStream.schema(inSchema).parquet(s"$wh/ssk_in")
          .writeStream.format("graft")
          .option("warehouse", wh).option("table", "orders_ssk")
          .option("commitMode", "merge").option("keyCol", "o_orderkey")
          .option("tombstoneCol", "is_del")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        graft.io.ManifestVersioned.read(s, wh, "orders_ssk")
          .select("o_orderkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority", "is_del")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_ssk.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        val o = t(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority")
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_ssk", o,
          "o_orderpriority")
        val updates = o.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
          .withColumn("is_del", lit(false))
        val dels = o.filter(col("o_orderkey") % 11 === 0 &&
            col("o_orderkey") % 7 =!= 0)
          .withColumn("is_del", lit(true))
        val ins = o.filter(col("o_orderkey") % 13 === 0)
          .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"), lit(1.0).as("o_totalprice"),
            lit("9-NEW").as("o_orderpriority"), lit(false).as("is_del"))
        updates.unionAll(dels).unionAll(ins)
          .coalesce(1).write.mode("overwrite").parquet(s"$wh/ssk_in")
      }),
      oracle = Some("""WITH src AS (
                SELECT o_orderkey, o_orderstatus,
                       o_totalprice + 1000.0 AS o_totalprice,
                       o_orderpriority, FALSE AS is_del
                FROM orders WHERE o_orderkey % 7 = 0
                UNION ALL
                SELECT o_orderkey, o_orderstatus, o_totalprice,
                       o_orderpriority, TRUE
                FROM orders WHERE o_orderkey % 11 = 0 AND o_orderkey % 7 <> 0
                UNION ALL
                SELECT o_orderkey + 100000000, 'N', 1.0, '9-NEW', FALSE
                FROM orders WHERE o_orderkey % 13 = 0)
              SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice,
                     o.o_orderpriority, CAST(NULL AS BOOLEAN) AS is_del
              FROM orders o
              WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM src)
              UNION ALL
              SELECT o_orderkey, o_orderstatus, o_totalprice,
                     o_orderpriority, is_del
              FROM src WHERE NOT is_del""")),

    // MANIFEST-only table statistics: per-partition row counts answered
    // with ZERO data reads and ZERO directory listing (every commit
    // records its staged partitions' counts in the manifest entry) —
    // the count(*)-shaped health check and the compaction planner's
    // sizing input that would otherwise scan 100 TB nightly. `is_exact`
    // goes false when outstanding delete vectors make a count an upper
    // bound (folding restores it). Oracle = the real GROUP BY count.
    DeclaredQuery(
      "q_table_stats",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.io.ManifestVersioned.partitionRowStats(s, wh, "orders_rsmv")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_rsmv.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_rsmv",
          t(s, dir, "orders"), "o_orderpriority")
      }),
      oracle = Some("""SELECT o_orderpriority AS part_value,
                     count(*) AS n_rows, TRUE AS is_exact
              FROM orders GROUP BY o_orderpriority""")),

    // BLOOM-pruned merge locate: order keys are SCATTERED across the
    // priority partitions (every partition's [min, max] key range spans
    // the whole table), so the zone maps keep all of them and the
    // locate semi-join would scan the full key column. Under the bloom
    // policy each partition's sidecar disproves membership of the
    // point-shaped change batch, and the locate reads only the
    // partitions that can hold a change key (spec-pinned candidate
    // set, BloomSidecarSpec). Oracle = the from-scratch SQL merge —
    // path equivalence with or without pruning IS the check.
    DeclaredQuery(
      "q_bloom_locate",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val change = t(s, dir, "orders")
          .filter(col("o_orderkey") % 499 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
          .withColumn("o_orderstatus",
            when(col("o_orderkey") % 998 === 0, lit("DELETED"))
              .otherwise(lit("U")))
        graft.io.ManifestVersioned.mergeVersioned(s, wh, "orders_blmv",
          change, "o_orderkey", "o_orderpriority",
          Seq(col("o_totalprice").desc_nulls_last),
          col("o_orderstatus") === "DELETED")
        graft.io.ManifestVersioned.read(s, wh, "orders_blmv")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_blmv.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_blmv",
          t(s, dir, "orders"), "o_orderpriority",
          bloomCols = Seq("o_orderkey"))
      }),
      oracle = Some("""WITH change AS (
                SELECT o_orderkey, o_custkey,
                       CASE WHEN o_orderkey % 998 = 0 THEN 'DELETED'
                            ELSE 'U' END AS o_orderstatus,
                       o_totalprice + 1000.0 AS o_totalprice,
                       o_orderdate, o_orderpriority
                FROM orders WHERE o_orderkey % 499 = 0),
              unioned AS (
                SELECT * FROM orders UNION ALL SELECT * FROM change),
              alive AS (
                SELECT * FROM unioned
                WHERE o_orderkey NOT IN (
                  SELECT o_orderkey FROM unioned
                  WHERE o_orderstatus = 'DELETED')),
              ranked AS (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY o_orderkey
                  ORDER BY o_totalprice DESC NULLS LAST) AS rn
                FROM alive)
              SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                     o_orderdate, o_orderpriority
              FROM ranked WHERE rn = 1""")),

    // Bloom locate ACROSS A WIDENED HISTORY: the base table records the
    // key as INT under a bloom policy; a long-keyed merge widens it
    // (the commit REBUILDS every live sidecar at the new type — r10),
    // then a locate-delete probes PRE-widening keys hashed at the new
    // long type through the rebuilt sidecars. Without the rebuild the
    // xxhash64(long) probes would miss every int-built sidecar, the
    // partitions holding those keys would wrongly prune, and the
    // deletes would be silently SKIPPED — extra rows vs the oracle.
    DeclaredQuery(
      "q_bloom_widened",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val change = t(s, dir, "orders")
          .filter(col("o_orderkey") % 499 === 0)
          .select(col("o_orderkey"), col("o_orderpriority"),
            (col("o_totalprice") + 1000.0).as("o_totalprice"))
        // long-keyed change over the int-keyed base: widening + rebuild
        graft.io.ManifestVersioned.mergeVersionedMulti(s, wh,
          "orders_blw", change, "o_orderkey", Seq("o_orderpriority"),
          order = Nil, isTombstone = lit(false), sourceWins = true)
        // pre-widening keys erased through the REBUILT sidecars
        graft.io.ManifestVersioned.deleteRowsLocate(s, wh, "orders_blw",
          t(s, dir, "orders").filter(col("o_orderkey") % 998 === 0)
            .select("o_orderkey"),
          "o_orderkey")
        graft.io.ManifestVersioned.read(s, wh, "orders_blw")
          .select("o_orderkey", "o_orderpriority", "o_totalprice")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_blw.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFullMulti(s, wh, "orders_blw",
          t(s, dir, "orders")
            .select(col("o_orderkey").cast("int").as("o_orderkey"),
              col("o_orderpriority"), col("o_totalprice")),
          Seq("o_orderpriority"), bloomCols = Seq("o_orderkey"))
      }),
      oracle = Some("""SELECT o_orderkey, o_orderpriority,
                     CASE WHEN o_orderkey % 499 = 0
                          THEN o_totalprice + 1000.0
                          ELSE o_totalprice END AS o_totalprice
              FROM orders
              WHERE o_orderkey % 998 <> 0""")),

    // CONVERT in place — zero-copy onboarding of an existing
    // hive-partitioned parquet lake: version 1's manifest REFERENCES
    // the source's leaf dirs (no bytes move), then the table is fully
    // live — the query upserts a change batch through the nightly
    // merge (touched partitions localize into native generations,
    // untouched keep foreign references) and reads the head. Oracle =
    // the source rows with the upsert algebra applied.
    DeclaredQuery(
      "q_convert_inplace",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val src = s"$wh/orders_conv_lake"
        graft.io.ManifestVersioned.convertTable(s, wh, "orders_conv",
          src, Seq("o_orderpriority"), dirCols = Seq("pd"))
        val change = t(s, dir, "orders")
          .filter(col("o_orderkey") % 11 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_totalprice") * 2.0).as("o_totalprice"),
            col("o_orderpriority"))
        graft.io.ManifestVersioned.mergeVersionedMulti(s, wh,
          "orders_conv", change, "o_orderkey", Seq("o_orderpriority"),
          order = Nil, isTombstone = lit(false), sourceWins = true)
        graft.io.ManifestVersioned.read(s, wh, "orders_conv")
          .select("o_orderkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val fsroot = new org.apache.hadoop.fs.Path(s"$wh/orders_conv.mv")
        val fs = fsroot.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(fsroot, true)
        val src = new org.apache.hadoop.fs.Path(s"$wh/orders_conv_lake")
        fs.delete(src, true)
        // the lake: hive layout with the partition value duplicated
        // in-file (partitionBy consumes its own column)
        t(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority")
          .withColumn("pd", col("o_orderpriority"))
          .write.partitionBy("pd").parquet(src.toString)
      }),
      oracle = Some("""SELECT o_orderkey, o_orderstatus,
                     CASE WHEN o_orderkey % 11 = 0
                          THEN o_totalprice * 2.0
                          ELSE o_totalprice END AS o_totalprice,
                     o_orderpriority
              FROM orders""")),

    // SQL RESTORE — roll the head back to a historical version as a
    // NEW commit (nothing lost; the rolled-back work stays
    // time-travelable). The query damages the table with an UPDATE and
    // a DELETE, restores to the pre-damage version, then proves the
    // head equals the original rows — the oracle is simply the input.
    DeclaredQuery(
      "q_sql_restore",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.plans.GraftSqlTables.register(s, wh, "orders_res",
          keyCol = Some("o_orderkey"))
        s.sql("UPDATE orders_res SET o_totalprice = 0.0 " +
          "WHERE o_orderkey % 3 = 0")
        s.sql("DELETE FROM orders_res WHERE o_orderkey % 5 = 0")
        s.sql("RESTORE orders_res TO VERSION AS OF 1")
        s.sql("""SELECT o_orderkey, o_orderstatus, o_totalprice,
                        o_orderpriority
                 FROM orders_res""")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_res.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_res",
          t(s, dir, "orders")
            .select("o_orderkey", "o_orderstatus", "o_totalprice",
              "o_orderpriority"),
          "o_orderpriority")
      }),
      oracle = Some("""SELECT o_orderkey, o_orderstatus, o_totalprice,
                     o_orderpriority
              FROM orders""")),

    // SQL SHALLOW CLONE — the zero-copy branch through the Delta
    // spelling: `CREATE TABLE br SHALLOW CLONE src` gives the branch a
    // v1 that REFERENCES the source's generation dirs (no bytes move),
    // divergence is copy-on-write, and the durable graft.mergeKey
    // property rides the cloned headers so the branch is DML-able
    // immediately. The query clones, diverges the branch with an
    // UPDATE, and returns the key join of source and branch balances —
    // pinning BOTH directions of isolation (branch sees the update,
    // source never does) in one relation the oracle replays.
    DeclaredQuery(
      "q_sql_clone",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.plans.GraftSqlTables.register(s, wh, "cust_clsrc")
        s.sql("CREATE TABLE cust_clbr SHALLOW CLONE cust_clsrc")
        s.sql("UPDATE cust_clbr SET c_acctbal = c_acctbal + 5.0 " +
          "WHERE c_mktsegment = 'MACHINERY'")
        s.sql("""SELECT src.c_custkey, src.c_acctbal AS src_bal,
                        br.c_acctbal AS br_bal
                 FROM cust_clsrc src JOIN cust_clbr br
                   ON src.c_custkey = br.c_custkey""")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val fs = new org.apache.hadoop.fs.Path(wh)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(s"$wh/cust_clsrc.mv"), true)
        fs.delete(new org.apache.hadoop.fs.Path(s"$wh/cust_clbr.mv"), true)
        graft.io.ManifestVersioned.writeFull(s, wh, "cust_clsrc",
          t(s, dir, "customer")
            .select("c_custkey", "c_mktsegment", "c_acctbal"),
          "c_mktsegment")
        // the durable merge key the clone must carry to its branch
        graft.io.ManifestVersioned.setTableProperties(s, wh, "cust_clsrc",
          Map("graft.mergeKey" -> "c_custkey"))
      }),
      oracle = Some("""SELECT c_custkey, c_acctbal AS src_bal,
                     CASE WHEN c_mktsegment = 'MACHINERY'
                          THEN c_acctbal + 5.0 ELSE c_acctbal END AS br_bal
              FROM customer""")),

    // CHANGE FEED AS SQL — table_changes('t', from[, to]) (the Delta
    // CDF spelling as an injected table-valued function): per-version
    // key-level diffs with old/new images, partition-pruned off the
    // manifest diffs. The fixture commits an UPDATE (v2) then a DELETE
    // (v3) through SQL DML and reads the whole feed since v2; the
    // oracle replays both diffs from the input algebraically —
    // including the %77 overlap where the delete's OLD image must
    // show the update's effect.
    DeclaredQuery(
      "q_sql_changes",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.plans.GraftSqlTables.register(s, wh, "orders_tc",
          keyCol = Some("o_orderkey"))
        s.sql("UPDATE orders_tc SET o_totalprice = o_totalprice + 1.0 " +
          "WHERE o_orderkey % 7 = 0")
        s.sql("DELETE FROM orders_tc WHERE o_orderkey % 11 = 0")
        s.sql("""SELECT version, o_orderkey, change_type,
                        old_o_totalprice, new_o_totalprice
                 FROM table_changes('orders_tc', 2)""")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_tc.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_tc",
          t(s, dir, "orders")
            .select("o_orderkey", "o_orderpriority", "o_totalprice"),
          "o_orderpriority")
      }),
      oracle = Some("""SELECT 2 AS version, o_orderkey,
                     'update' AS change_type,
                     o_totalprice AS old_o_totalprice,
                     o_totalprice + 1.0 AS new_o_totalprice
              FROM orders WHERE o_orderkey % 7 = 0
              UNION ALL
              SELECT 3, o_orderkey, 'delete',
                     CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                          ELSE o_totalprice END,
                     CAST(NULL AS DOUBLE)
              FROM orders WHERE o_orderkey % 11 = 0""")),

    // ANALYZE FROM THE MANIFEST — per-column statistics with ZERO data
    // reads (Spark's own ANALYZE scans; the zone stats, null counts
    // and NDV sketches already know): min/max as strings, null count,
    // NDV where policied (honest NULL where not), exactness flags.
    // The oracle recomputes every statistic from the raw input.
    DeclaredQuery(
      "q_sql_analyze",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.plans.GraftSqlTables.register(s, wh, "orders_an")
        s.sql("ANALYZE TABLE orders_an COMPUTE STATISTICS " +
          "FOR COLUMNS o_orderkey, o_orderpriority")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_an.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFullMulti(s, wh, "orders_an",
          t(s, dir, "orders")
            .select("o_orderkey", "o_orderpriority", "o_totalprice"),
          Seq("o_orderpriority"), ndvCols = Seq("o_orderpriority"))
      }),
      oracle = Some("""SELECT 'o_orderkey' AS col_name,
                     CAST(min(o_orderkey) AS VARCHAR) AS min_value,
                     CAST(max(o_orderkey) AS VARCHAR) AS max_value,
                     CAST(0 AS BIGINT) AS null_count,
                     CAST(NULL AS BIGINT) AS ndv,
                     TRUE AS range_exact, FALSE AS ndv_exact FROM orders
              UNION ALL
              SELECT 'o_orderpriority', min(o_orderpriority),
                     max(o_orderpriority), 0,
                     count(DISTINCT o_orderpriority), TRUE, TRUE
              FROM orders""")),

    // COPY INTO — idempotent incremental folder loading as SQL (the
    // reference's watermark ingest model: list, load strictly-newer
    // files, advance the watermark IN the data commit). The query runs
    // the statement TWICE — the second run must load nothing (the
    // oracle's exact row count and hash would expose any double-load)
    // — then reads the table.
    DeclaredQuery(
      "q_sql_copy",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.plans.GraftSqlTables.register(s, wh, "orders_cp",
          keyCol = Some("o_orderkey"))
        val src = s"$wh/orders_cp_in"
        val stmt =
          s"""COPY INTO orders_cp FROM '$src' FILEFORMAT = CSV
              PATTERN = '*.csv' FORMAT_OPTIONS ('header' = 'true')"""
        val first = s.sql(stmt).collect()(0)
        require(first.getLong(2) > 0L, "first COPY must load rows")
        val second = s.sql(stmt).collect()(0)
        require(second.getLong(1) == 0L && second.getLong(2) == 0L,
          "the second COPY must be a watermark no-op")
        s.sql("SELECT o_orderkey, o_orderpriority, o_totalprice " +
          "FROM orders_cp")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val fs = new org.apache.hadoop.fs.Path(wh)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(s"$wh/orders_cp.mv"), true)
        fs.delete(new org.apache.hadoop.fs.Path(s"$wh/orders_cp_in"), true)
        t(s, dir, "orders")
          .select("o_orderkey", "o_orderpriority", "o_totalprice")
          .repartition(4)
          .write.option("header", "true").csv(s"$wh/orders_cp_in")
        s.sql(
          s"""CREATE TABLE IF NOT EXISTS orders_cp (
                o_orderkey BIGINT, o_orderpriority STRING,
                o_totalprice DOUBLE)
              USING graft PARTITIONED BY (o_orderpriority)
              OPTIONS (warehouse '$wh', keyCol 'o_orderkey')""")
      }),
      oracle = Some("""SELECT o_orderkey, o_orderpriority, o_totalprice
              FROM orders""")),

    // REPLACE WHERE — predicate-scoped atomic overwrite (the Delta
    // replaceWhere spelling), the backfill primitive: one statement
    // replaces exactly the predicate's rows with a corrected batch,
    // and the manifest's zone pruning decides the touched partitions
    // (at 100 TB a date-range backfill rewrites the range's sliver,
    // never the table — GraftDdlSpec pins the untouched generation
    // dirs stay byte-identical). Oracle = the CASE composition.
    DeclaredQuery(
      "q_sql_replace_where",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.plans.GraftSqlTables.register(s, wh, "orders_rw",
          keyCol = Some("o_orderkey"))
        t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_orderpriority"),
            (col("o_totalprice") * 2.0).as("o_totalprice"))
          .createOrReplaceTempView("orders_rw_fix")
        s.sql("""INSERT INTO orders_rw
                 REPLACE WHERE o_orderpriority = '1-URGENT'
                 SELECT * FROM orders_rw_fix""")
        s.sql("SELECT o_orderkey, o_orderpriority, o_totalprice " +
          "FROM orders_rw")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_rw.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_rw",
          t(s, dir, "orders")
            .select("o_orderkey", "o_orderpriority", "o_totalprice"),
          "o_orderpriority")
      }),
      oracle = Some("""SELECT o_orderkey, o_orderpriority,
                     CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice * 2.0 ELSE o_totalprice END
                       AS o_totalprice
              FROM orders""")),

    // SHOW PARTITIONS from the manifest: one row per live partition
    // with the recorded row count — zero data reads, zero listing
    // (the 100 TB "how is my table laid out" answer). Oracle = the
    // plain GROUP BY.
    DeclaredQuery(
      "q_sql_show_partitions",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.plans.GraftSqlTables.register(s, wh, "orders_shp")
        s.sql("SHOW PARTITIONS orders_shp")
          .select("partition", "n_rows", "is_exact")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_shp.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_shp",
          t(s, dir, "orders")
            .select("o_orderkey", "o_orderpriority", "o_totalprice"),
          "o_orderpriority")
      }),
      oracle = Some("""SELECT 'o_orderpriority=' || o_orderpriority
                       AS partition,
                     count(*) AS n_rows, TRUE AS is_exact
              FROM orders GROUP BY o_orderpriority""")),

    // GENERATED PARTITION COLUMNS (hidden partitioning): the table
    // declares p_day = days(ts) as a durable property; the writer
    // never computes the day (the engine derives it at staging) and
    // the reader never mentions it — the raw-timestamp predicate
    // below derives a p_day range that prunes at the manifest level
    // (p_day is the partition column, so its per-partition zone range
    // is a single value). This matters doubly for the events corpus:
    // the ts column is wall-clock typed, where the zone layer's
    // cross-family conservatism declines instant-literal compares —
    // the derived DATE pred is what actually prunes. Oracle = the
    // plain range filter.
    DeclaredQuery(
      "q_gen_partition",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.io.ManifestVersioned.readFiltered(s, wh, "events_genmv",
          col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
            col("ts") < lit("2024-01-13 00:00:00").cast("timestamp"))
          .select("event_id", "user_id", "value")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/events_genmv.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFullMulti(s, wh, "events_genmv",
          t(s, dir, "events").select("event_id", "ts", "user_id", "value"),
          Seq("p_day"),
          properties = Map("graft.generated.p_day" -> "days(ts)"))
      }),
      oracle = Some(s"""$EvCte SELECT event_id, user_id, value FROM ev
              WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
                AND ts < TIMESTAMP '2024-01-13 00:00:00'""")),

    // BLOOM point lookup: fetch an id-list from a table whose key is
    // scattered across every partition — the shape zone maps provably
    // cannot prune (every partition's range covers every key) and a
    // plain reader scans the whole table for. readWhere consults the
    // per-partition sidecars and lists only the partitions that may
    // hold one of the probe keys; the residual IN filter guarantees
    // exactness whatever pruned. Oracle = the plain IN filter.
    DeclaredQuery(
      "q_bloom_point",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        // the id list a caller would hand us: metadata-scale, collected
        // once (≤ ~100 keys at sf0.1)
        val ids = t(s, dir, "orders")
          .filter(col("o_orderkey") % 191 === 0)
          .select("o_orderkey").as[Long](s.implicits.newLongEncoder)
          .collect().toSeq
        graft.io.ManifestVersioned.readWhere(s, wh, "orders_blpt",
          Seq(graft.io.ZoneIn("o_orderkey", ids)))
          .select("o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_blpt.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_blpt",
          t(s, dir, "orders"), "o_orderpriority",
          bloomCols = Seq("o_orderkey"))
      }),
      oracle = Some("""SELECT o_orderkey, o_custkey, o_orderstatus,
                     o_totalprice, o_orderdate, o_orderpriority
              FROM orders WHERE o_orderkey % 191 = 0""")),

    // MANIFEST-only column ranges: table-wide min/max folded from the
    // per-partition zone maps with ZERO data reads and zero listing —
    // the range-shaped health check (freshness watermarks, partition
    // layout sanity, planner range inputs) that would otherwise scan
    // 100 TB. Exactness is tracked like q_table_stats' counts:
    // outstanding delete vectors or any stat-less entry flip
    // `is_exact` (and a non-covering fold reports NULL rather than
    // masquerade as a bound). Oracle = the real aggregation.
    DeclaredQuery(
      "q_column_ranges",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.io.ManifestVersioned.columnRanges(s, wh, "orders_crmv",
          Seq("o_totalprice", "o_orderdate", "o_custkey"))
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_crmv.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_crmv",
          t(s, dir, "orders"), "o_orderpriority")
      }),
      oracle = Some("""SELECT min(o_totalprice) AS min_o_totalprice,
                     max(o_totalprice) AS max_o_totalprice,
                     min(o_orderdate) AS min_o_orderdate,
                     max(o_orderdate) AS max_o_orderdate,
                     min(o_custkey) AS min_o_custkey,
                     max(o_custkey) AS max_o_custkey,
                     TRUE AS is_exact
              FROM orders""")),

    // GDPR-shaped erasure from BARE keys: the request arrives as ids
    // with no partition values; deleteRowsLocate resolves each id's
    // partitions through the zone+bloom locate (under the bloom policy
    // the candidate scan touches only partitions that may hold an id —
    // scattered keys, so range pruning is blind) and commits ordinary
    // delete vectors: zero partition rewrites, O(delete bytes) night.
    // Oracle = the plain filter, the same three-way path check as
    // q_delete_vectors but with the locate doing the work the caller
    // did there.
    DeclaredQuery(
      "q_delete_locate",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.io.ManifestVersioned.deleteRowsLocate(s, wh, "orders_dlmv",
          t(s, dir, "orders").filter(col("o_orderkey") % 97 === 0)
            .select("o_orderkey"),
          "o_orderkey")
        graft.io.ManifestVersioned.read(s, wh, "orders_dlmv")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_dlmv.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_dlmv",
          t(s, dir, "orders"), "o_orderpriority",
          bloomCols = Seq("o_orderkey"))
      }),
      oracle = Some("""SELECT o_orderkey, o_custkey, o_orderstatus,
                     o_totalprice, o_orderdate, o_orderpriority
              FROM orders WHERE o_orderkey % 97 <> 0""")),

    // CHANGE FEED → MATERIALIZED VIEW: the serving completion of the
    // CDC story — a retractable aggregate (revenue per priority)
    // maintained from the manifest table's row-level feed. The seed
    // paid one snapshot pass (setup); after the nightly merge the
    // TIMED refresh reads ONLY the feed slice (partition-pruned off
    // the manifest pair — untouched partitions contribute zero IO)
    // and appends one signed batch: updates retract the old value and
    // contribute the new, tombstones retract, inserts contribute.
    // Oracle = the from-scratch aggregate over the post-merge state —
    // O(changes) maintenance provably equals the O(table) recompute.
    DeclaredQuery(
      "q_feed_view",
      (s, dir) => {
        import graft.ext.IncrementalAgg
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        IncrementalAgg.syncRetractableFromManifest(s, wh, "orders_famv",
          "orders_famv_agg", "o_orderkey", Seq("o_orderpriority"),
          Seq("o_totalprice"),
          floor(col("o_totalprice") * 100).cast("long"))
        IncrementalAgg.readRetractable(s, wh, "orders_famv_agg",
          Seq("o_orderpriority"))
      },
      setup = Some((s, dir) => {
        import graft.ext.IncrementalAgg
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val fs = new org.apache.hadoop.fs.Path(wh)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(s"$wh/orders_famv.mv"), true)
        fs.delete(new org.apache.hadoop.fs.Path(s"$wh/orders_famv_agg"), true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_famv",
          t(s, dir, "orders"), "o_orderpriority")
        IncrementalAgg.syncRetractableFromManifest(s, wh, "orders_famv",
          "orders_famv_agg", "o_orderkey", Seq("o_orderpriority"),
          Seq("o_totalprice"),
          floor(col("o_totalprice") * 100).cast("long"))
        val change = t(s, dir, "orders")
          .filter(col("o_orderkey") % 499 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
          .withColumn("o_orderstatus",
            when(col("o_orderkey") % 998 === 0, lit("DELETED"))
              .otherwise(lit("U")))
        graft.io.ManifestVersioned.mergeVersioned(s, wh, "orders_famv",
          change, "o_orderkey", "o_orderpriority",
          Seq(col("o_totalprice").desc_nulls_last),
          col("o_orderstatus") === "DELETED")
      }),
      oracle = Some("""WITH change AS (
                SELECT o_orderkey, o_custkey,
                       CASE WHEN o_orderkey % 998 = 0 THEN 'DELETED'
                            ELSE 'U' END AS o_orderstatus,
                       o_totalprice + 1000.0 AS o_totalprice,
                       o_orderdate, o_orderpriority
                FROM orders WHERE o_orderkey % 499 = 0),
              unioned AS (
                SELECT * FROM orders UNION ALL SELECT * FROM change),
              alive AS (
                SELECT * FROM unioned
                WHERE o_orderkey NOT IN (
                  SELECT o_orderkey FROM unioned
                  WHERE o_orderstatus = 'DELETED')),
              ranked AS (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY o_orderkey
                  ORDER BY o_totalprice DESC NULLS LAST) AS rn
                FROM alive)
              SELECT o_orderpriority, count(*) AS cnt,
                     CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS sum_fp
              FROM ranked WHERE rn = 1
              GROUP BY o_orderpriority""")),

    // FILE-level zone-map pruning on a CLUSTERED layout: every staged
    // generation records per-FILE min/max (`_filestats` sidecar inside
    // the generation dir), and after optimizeClustered lays each file
    // out as a narrow l_orderkey slice, a range predicate scans only
    // the files whose slice intersects it — partition pruning's
    // granularity taken one level down, the step that matters when one
    // date partition is 100 GB across hundreds of files (Iceberg's
    // per-file stats story). FileStatsSpec pins the scanned-file
    // shrink; the residual filter guarantees exactness whatever
    // pruned. Oracle = the plain filter. Timed = the pruned read.
    DeclaredQuery(
      "q_file_prune",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.io.ManifestVersioned.readWhere(s, wh, "li_fpmv",
          Seq(graft.io.ZoneGe("l_orderkey", 500L),
            graft.io.ZoneLt("l_orderkey", 1000L)))
          .select("l_orderkey", "l_partkey", "l_quantity",
            "l_extendedprice", "l_returnflag")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/li_fpmv.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        // scattered ingest (interleaved keys: every file spans the
        // domain), then the maintenance rewrite that makes file stats
        // selective
        graft.io.ManifestVersioned.writeFull(s, wh, "li_fpmv",
          t(s, dir, "lineitem")
            .select("l_orderkey", "l_partkey", "l_quantity",
              "l_extendedprice", "l_returnflag")
            .repartition(8),
          "l_returnflag")
        graft.io.ManifestVersioned.optimizeClustered(s, wh, "li_fpmv",
          Seq("l_returnflag"), Seq(Seq("A"), Seq("N"), Seq("R")),
          Seq("l_orderkey"), filesPerPartition = 8)
      }),
      oracle = Some("""SELECT l_orderkey, l_partkey, l_quantity,
                     l_extendedprice, l_returnflag
              FROM lineitem
              WHERE l_orderkey >= 500 AND l_orderkey < 1000""")),

    // Z-ORDERED file pruning on the SECOND dimension: clustering on
    // l_orderkey alone would leave l_partkey spanning its full domain
    // in every file (zero skipping on it); the Morton-interleaved
    // rewrite gives every file a small rectangle of the
    // (l_orderkey, l_partkey) plane, so a predicate on EITHER column
    // prunes files — here the query filters only l_partkey, the
    // dimension the single-key layout cannot serve. Oracle = the
    // plain filter. Timed = the pruned read.
    DeclaredQuery(
      "q_zorder_prune",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.io.ManifestVersioned.readWhere(s, wh, "li_zpmv",
          Seq(graft.io.ZoneGe("l_partkey", 1L),
            graft.io.ZoneLt("l_partkey", 100L)))
          .select("l_orderkey", "l_partkey", "l_quantity",
            "l_extendedprice", "l_returnflag")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/li_zpmv.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "li_zpmv",
          t(s, dir, "lineitem")
            .select("l_orderkey", "l_partkey", "l_quantity",
              "l_extendedprice", "l_returnflag")
            .repartition(8),
          "l_returnflag")
        graft.io.ManifestVersioned.optimizeZOrdered(s, wh, "li_zpmv",
          Seq("l_returnflag"), Seq(Seq("A"), Seq("N"), Seq("R")),
          "l_orderkey", "l_partkey", filesPerPartition = 8)
      }),
      oracle = Some("""SELECT l_orderkey, l_partkey, l_quantity,
                     l_extendedprice, l_returnflag
              FROM lineitem
              WHERE l_partkey >= 1 AND l_partkey < 100""")),

    // NATIVE-Column filtered read: the caller writes an ordinary Spark
    // predicate — a prunable range AND an OR-residual — and
    // readFiltered extracts the implied conjuncts (graftbridge
    // PredExtract walks the ColumnNode tree), drives the
    // zone → bloom → file pruning stack with them, and applies the
    // ORIGINAL Column as the row filter, so the OR term is decided
    // row-by-row while the range still skips partitions and files.
    // Oracle = the same predicate in SQL.
    DeclaredQuery(
      "q_filtered_read",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.io.ManifestVersioned.readFiltered(s, wh, "li_fpmv",
          col("l_orderkey") >= 500L && col("l_orderkey") < 1000L &&
            (col("l_quantity") < 10.0 || col("l_returnflag") === "N"))
          .select("l_orderkey", "l_partkey", "l_quantity",
            "l_extendedprice", "l_returnflag")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/li_fpmv.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "li_fpmv",
          t(s, dir, "lineitem")
            .select("l_orderkey", "l_partkey", "l_quantity",
              "l_extendedprice", "l_returnflag")
            .repartition(8),
          "l_returnflag")
        graft.io.ManifestVersioned.optimizeClustered(s, wh, "li_fpmv",
          Seq("l_returnflag"), Seq(Seq("A"), Seq("N"), Seq("R")),
          Seq("l_orderkey"), filesPerPartition = 8)
      }),
      oracle = Some("""SELECT l_orderkey, l_partkey, l_quantity,
                     l_extendedprice, l_returnflag
              FROM lineitem
              WHERE l_orderkey >= 500 AND l_orderkey < 1000
                AND (l_quantity < 10.0 OR l_returnflag = 'N')""")),

    // NULL-count zone pruning: IS NULL is the one predicate a value
    // range cannot decide — the manifests now record per-column NULL
    // counts (same single stats job), so a "find the unenriched rows"
    // sweep scans ONLY the partitions (and files) that hold any nulls
    // of the column; null-free partitions are never listed. The
    // fixture plants nulls in exactly one priority's rows. Oracle =
    // the plain IS NULL filter.
    DeclaredQuery(
      "q_isnull_prune",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.io.ManifestVersioned.readFiltered(s, wh, "orders_nnmv",
          col("o_enriched").isNull)
          .select("o_orderkey", "o_orderpriority")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_nnmv.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_nnmv",
          t(s, dir, "orders")
            .select(col("o_orderkey"), col("o_orderpriority"),
              when(col("o_orderpriority") === "1-URGENT" &&
                col("o_orderkey") % 13 === 0, lit(null))
                .otherwise(col("o_totalprice")).as("o_enriched")),
          "o_orderpriority")
      }),
      oracle = Some("""SELECT o_orderkey, o_orderpriority
              FROM orders
              WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 13 = 0""")),

    // MANIFEST-only NDV: table-wide distinct counts folded from
    // per-partition KMV sketches with ZERO data reads — the planner /
    // data-quality stat (enum drift, join-side selection) that would
    // otherwise cost a full count-distinct scan. The sketches are
    // EXACT while complete (< k distinct hashes ⇒ the sketch IS the
    // distinct set; merging complete sets stays complete), so for
    // low-cardinality columns the zero-read answer hash-matches the
    // real COUNT(DISTINCT) — which is precisely what the oracle
    // replays. Saturated sketches degrade to a deterministic estimate
    // with is_exact=false (spec-pinned, not oracle territory).
    DeclaredQuery(
      "q_ndv_stats",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.io.ManifestVersioned.columnNdv(s, wh, "orders_ndvmv",
          Seq("o_orderpriority", "o_orderstatus"))
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_ndvmv.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_ndvmv",
          t(s, dir, "orders"), "o_orderpriority",
          ndvCols = Seq("o_orderpriority", "o_orderstatus"))
      }),
      oracle = Some("""SELECT 'o_orderpriority' AS col_name,
                     count(DISTINCT o_orderpriority) AS ndv,
                     TRUE AS is_exact FROM orders
              UNION ALL
              SELECT 'o_orderstatus',
                     count(DISTINCT o_orderstatus), TRUE FROM orders""")),

    // NDV across a TYPE WIDENING: the sketches hash the STRING
    // rendering of the value, and the safe-retype lattice's integral
    // chain never changes a rendering ("5" is "5" at int and at long) —
    // so widening an NDV-policied column is accepted with ZERO sidecar
    // maintenance and the fold over MIXED-WIDTH generations (v1 staged
    // at int, the widening delta at long) stays exact. The fixture
    // widens by replacing the 1-URGENT partition with long-range bucket
    // values; the oracle replays the union and counts distinct — a
    // stale or double-counted sketch would miss the hash.
    DeclaredQuery(
      "q_ndv_widened",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.io.ManifestVersioned.columnNdv(s, wh, "orders_ndvwmv",
          Seq("o_bucket"))
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_ndvwmv.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        val o = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"))
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_ndvwmv",
          o.withColumn("o_bucket", (col("o_orderkey") % 500).cast("int")),
          "o_orderpriority", ndvCols = Seq("o_bucket"))
        graft.io.ManifestVersioned.writeDelta(s, wh, "orders_ndvwmv",
          o.filter(col("o_orderpriority") === "1-URGENT")
            .withColumn("o_bucket",
              col("o_orderkey") % 500 + lit(5000000000L)),
          "o_orderpriority")
      }),
      oracle = Some("""SELECT 'o_bucket' AS col_name,
                     count(DISTINCT b) AS ndv, TRUE AS is_exact
              FROM (SELECT o_orderkey % 500 AS b FROM orders
                    WHERE o_orderpriority <> '1-URGENT'
                    UNION ALL
                    SELECT o_orderkey % 500 + 5000000000 FROM orders
                    WHERE o_orderpriority = '1-URGENT') t""")),

    // ZERO-PROBE broadcast planning: the fact-to-dimension join
    // decides broadcast from MANIFEST metadata alone (recorded row
    // counts + on-disk bytes — no probe job, no second execution of
    // the dim's plan; contrast joinWithSkewPolicy, which must probe an
    // arbitrary DataFrame). At 100 TB the dim catalog answers in
    // microseconds what a COUNT probe would answer in a scan. The
    // revenue-by-brand rollup is the classic star shape; oracle = the
    // plain SQL join+agg — decision and plan must not change the
    // numbers.
    DeclaredQuery(
      "q_join_manifest_stats",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val fact = t(s, dir, "lineitem")
          .select(col("l_partkey").as("p_partkey"), col("l_extendedprice"))
        val (joined, how) = graft.io.ManifestVersioned.joinWithStats(
          s, wh, "part_jsmv", fact, Seq("p_partkey"))
        require(how == "broadcast",
          s"the part dim must pass the metadata gate, got $how")
        joined.groupBy("p_brand")
          .agg(sum(floor(col("l_extendedprice") * 100).cast("long"))
            .as("rev_fp"))
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/part_jsmv.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "part_jsmv",
          t(s, dir, "part").select("p_partkey", "p_brand"), "p_brand")
      }),
      oracle = Some("""SELECT p_brand,
                     CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                       AS BIGINT) AS rev_fp
              FROM lineitem JOIN part ON l_partkey = p_partkey
              GROUP BY p_brand""")),

    // The SQL SURFACE: plain `spark.sql` over a registered manifest
    // table — ResolveGraftTables resolves the name to the head
    // version, PruneGraftScans converts the resolved WHERE into the
    // zone → file pruned scan (the Filter stays as the residual, so
    // the OR term is decided row-by-row while the range skips files).
    // This is what "a user of the reference could switch" ultimately
    // means: their SQL keeps working AND picks up manifest pruning
    // for free. Oracle = the same SQL in DuckDB over the raw table.
    DeclaredQuery(
      "q_sql_pruned",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.plans.GraftSqlTables.register(s, wh, "li_sqlmv")
        s.sql("""SELECT l_orderkey, l_partkey, l_quantity, l_returnflag
                 FROM li_sqlmv
                 WHERE l_orderkey >= 500 AND l_orderkey < 1000
                   AND (l_quantity < 10.0 OR l_returnflag = 'N')""")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/li_sqlmv.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "li_sqlmv",
          t(s, dir, "lineitem")
            .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
            .repartition(8),
          "l_returnflag")
        graft.io.ManifestVersioned.optimizeClustered(s, wh, "li_sqlmv",
          Seq("l_returnflag"), Seq(Seq("A"), Seq("N"), Seq("R")),
          Seq("l_orderkey"), filesPerPartition = 8)
      }),
      oracle = Some("""SELECT l_orderkey, l_partkey, l_quantity,
                     l_returnflag
              FROM lineitem
              WHERE l_orderkey >= 500 AND l_orderkey < 1000
                AND (l_quantity < 10.0 OR l_returnflag = 'N')""")),

    // METADATA-ONLY aggregates through SQL: count(*)/count(col)/min/max
    // over a manifest table answer from the recorded stats — exact row
    // counts, null counts and zone-map folds — planning ZERO files
    // (GraftSqlSpec pins empty inputFiles; inexact stats or any
    // unsupported shape fall back to the real scan). At 100 TB this is
    // the difference between a health check and a half-hour job.
    // Oracle = the same aggregate computed the honest way.
    DeclaredQuery(
      "q_sql_meta_agg",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.plans.GraftSqlTables.register(s, wh, "orders_mamv")
        s.sql("""SELECT count(*) AS n_rows, count(o_orderdate) AS n_dated,
                        min(o_orderkey) AS min_k, max(o_orderkey) AS max_k,
                        min(o_totalprice) AS min_p, max(o_totalprice) AS max_p
                 FROM orders_mamv""")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_mamv.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_mamv",
          t(s, dir, "orders"), "o_orderpriority")
      }),
      oracle = Some("""SELECT count(*) AS n_rows,
                     count(o_orderdate) AS n_dated,
                     min(o_orderkey) AS min_k, max(o_orderkey) AS max_k,
                     min(o_totalprice) AS min_p, max(o_totalprice) AS max_p
              FROM orders""")),

    // TYPE-WIDENING schema evolution: v1 writes o_custkey as INT;
    // the delta rewrites the 1-URGENT partition with BIGINT keys past
    // int range. The recorded head schema widens along the safe
    // value-preserving lattice and OLD generations read up through the
    // parquet reader's native widening (cast-on-read) — no rewrite of
    // the untouched 99%. The oracle replays the same algebra over the
    // raw table; zone stats stay sound because every allowed widening
    // is exact (ManifestVersionedR9Spec pins the mixed-token pruning).
    DeclaredQuery(
      "q_type_widening",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.io.ManifestVersioned.read(s, wh, "orders_twmv")
          .select("o_orderkey", "o_custkey", "o_orderpriority")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_twmv.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        val o = t(s, dir, "orders")
          .select(col("o_orderkey"),
            col("o_custkey").cast("int").as("o_custkey"),
            col("o_orderpriority"))
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_twmv", o,
          "o_orderpriority")
        graft.io.ManifestVersioned.writeDelta(s, wh, "orders_twmv",
          o.filter(col("o_orderpriority") === "1-URGENT")
            .withColumn("o_custkey",
              col("o_custkey").cast("long") + 5000000000L),
          "o_orderpriority")
      }),
      oracle = Some("""SELECT o_orderkey,
                     CAST(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_custkey + 5000000000
                          ELSE o_custkey END AS BIGINT) AS o_custkey,
                     o_orderpriority
              FROM orders""")),

    // OR-OF-CONJUNCTS pruning: the date-range-union shape —
    // `(k IN [a,b)) OR (k IN [c,d))` — prunes with the UNION of each
    // branch's zone → file survivors (bounded-DNF extraction,
    // readPrunedOr); the pre-r9 conjunct-only extraction scanned the
    // whole table for this shape. Clustered layout makes the file-level
    // effect measurable (plan evidence in PLANS.md); oracle = the plain
    // filter.
    DeclaredQuery(
      "q_or_union_prune",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.io.ManifestVersioned.readFiltered(s, wh, "li_ormv",
          (col("l_orderkey") >= 100L && col("l_orderkey") < 300L) ||
            (col("l_orderkey") >= 5000L && col("l_orderkey") < 5200L))
          .select("l_orderkey", "l_partkey", "l_quantity")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/li_ormv.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "li_ormv",
          t(s, dir, "lineitem")
            .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
            .repartition(8),
          "l_returnflag")
        graft.io.ManifestVersioned.optimizeClustered(s, wh, "li_ormv",
          Seq("l_returnflag"), Seq(Seq("A"), Seq("N"), Seq("R")),
          Seq("l_orderkey"), filesPerPartition = 8)
      }),
      oracle = Some("""SELECT l_orderkey, l_partkey, l_quantity
              FROM lineitem
              WHERE (l_orderkey >= 100 AND l_orderkey < 300)
                 OR (l_orderkey >= 5000 AND l_orderkey < 5200)""")),

    // SQL DML — MERGE INTO: the reference's ENTIRE job
    // (incremental_etl_v1.py:120-181 — change-set upsert + tombstone
    // delete + insert) as the one statement it conceptually is.
    // ResolveGraftDml rewrites the parsed MergeIntoTable to
    // mergeVersionedMulti in ANSI source-wins mode, so SQL and the
    // DataFrame API share one code path: zone/bloom key-locate
    // pruning, partition-reuse commit, conflict re-run. The source
    // derives three deterministic slices from orders (updates %7,
    // deletes %11, inserts %13 key-shifted into a new partition);
    // UPDATE SET * carries the is_del flag into the table exactly
    // like the reference's CDC op columns. Oracle = the merge
    // algebra replayed in DuckDB.
    DeclaredQuery(
      "q_sql_merge",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.plans.GraftSqlTables.register(s, wh, "orders_sqlm",
          keyCol = Some("o_orderkey"))
        val o = t(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority")
        val updates = o.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
          .withColumn("is_del", lit(false))
        val dels = o.filter(col("o_orderkey") % 11 === 0 &&
            col("o_orderkey") % 7 =!= 0)
          .withColumn("is_del", lit(true))
        val ins = o.filter(col("o_orderkey") % 13 === 0)
          .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"), lit(1.0).as("o_totalprice"),
            lit("9-NEW").as("o_orderpriority"), lit(false).as("is_del"))
        updates.unionAll(dels).unionAll(ins)
          .createOrReplaceTempView("sqlm_src")
        s.sql("""MERGE INTO orders_sqlm USING sqlm_src s
                 ON orders_sqlm.o_orderkey = s.o_orderkey
                 WHEN MATCHED AND s.is_del THEN DELETE
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
        s.sql("""SELECT o_orderkey, o_orderstatus, o_totalprice,
                        o_orderpriority, is_del
                 FROM orders_sqlm""")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_sqlm.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_sqlm",
          t(s, dir, "orders")
            .select("o_orderkey", "o_orderstatus", "o_totalprice",
              "o_orderpriority"),
          "o_orderpriority")
      }),
      oracle = Some("""WITH src AS (
                SELECT o_orderkey, o_orderstatus,
                       o_totalprice + 1000.0 AS o_totalprice,
                       o_orderpriority, FALSE AS is_del
                FROM orders WHERE o_orderkey % 7 = 0
                UNION ALL
                SELECT o_orderkey, o_orderstatus, o_totalprice,
                       o_orderpriority, TRUE
                FROM orders WHERE o_orderkey % 11 = 0 AND o_orderkey % 7 <> 0
                UNION ALL
                SELECT o_orderkey + 100000000, 'N', 1.0, '9-NEW', FALSE
                FROM orders WHERE o_orderkey % 13 = 0)
              SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice,
                     o.o_orderpriority, CAST(NULL AS BOOLEAN) AS is_del
              FROM orders o
              WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM src)
              UNION ALL
              SELECT o_orderkey, o_orderstatus, o_totalprice,
                     o_orderpriority, is_del
              FROM src WHERE NOT is_del""")),

    // SQL DML — DELETE FROM: the predicate plans through the
    // registered SQL read path (zone → bloom → file pruning decides
    // which partitions the matching-row scan even lists), then the
    // matching keys erase as DELETE VECTORS via deleteRowsLocate —
    // O(delete bytes) merge-on-read, no partition rewrites
    // (GraftDmlSpec pins the untouched generation dirs). Oracle =
    // the surviving rows.
    DeclaredQuery(
      "q_sql_delete",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.plans.GraftSqlTables.register(s, wh, "orders_sqld",
          keyCol = Some("o_orderkey"))
        s.sql("""DELETE FROM orders_sqld
                 WHERE o_orderpriority = '1-URGENT'
                   AND o_totalprice < 150000.0""")
        s.sql("""SELECT o_orderkey, o_orderstatus, o_totalprice,
                        o_orderpriority
                 FROM orders_sqld""")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_sqld.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_sqld",
          t(s, dir, "orders")
            .select("o_orderkey", "o_orderstatus", "o_totalprice",
              "o_orderpriority"),
          "o_orderpriority")
      }),
      oracle = Some("""SELECT o_orderkey, o_orderstatus, o_totalprice,
                     o_orderpriority
              FROM orders
              WHERE o_orderpriority <> '1-URGENT'
                 OR o_totalprice >= 150000.0""")),

    // SQL DML — INSERT INTO: append semantics over the manifest table
    // (appendRows: touched partitions fold slice ∪ new rows under an
    // expectation-carrying commit; untouched partitions are reused by
    // reference — GraftDmlSpec pins the byte-identical entries).
    // Values cast to the recorded column types positionally, ANSI
    // style. Oracle = orders plus the inserted slice.
    DeclaredQuery(
      "q_sql_insert",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.plans.GraftSqlTables.register(s, wh, "orders_sqli")
        t(s, dir, "orders").createOrReplaceTempView("sqli_src")
        s.sql("""INSERT INTO orders_sqli
                 SELECT o_orderkey + 200000000, 'P', o_totalprice,
                        o_orderpriority
                 FROM sqli_src WHERE o_orderkey % 17 = 0""")
        s.sql("""SELECT o_orderkey, o_orderstatus, o_totalprice,
                        o_orderpriority
                 FROM orders_sqli""")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_sqli.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_sqli",
          t(s, dir, "orders")
            .select("o_orderkey", "o_orderstatus", "o_totalprice",
              "o_orderpriority"),
          "o_orderpriority")
      }),
      oracle = Some("""SELECT o_orderkey, o_orderstatus, o_totalprice,
                     o_orderpriority
              FROM orders
              UNION ALL
              SELECT o_orderkey + 200000000, 'P', o_totalprice,
                     o_orderpriority
              FROM orders WHERE o_orderkey % 17 = 0""")),

    // SQL DML — UPDATE: matching rows read through the registered
    // relation (the WHERE prunes at the zone/bloom/file level before
    // any data scan), self-referencing assignments apply with an ANSI
    // cast to the recorded column types, and ONE atomic source-wins
    // merge replaces the updated keys (copy-on-write; assigning a
    // partition column would move rows correctly through the same
    // path — GraftDmlSpec pins it). Oracle = CASE WHEN over the base.
    DeclaredQuery(
      "q_sql_update",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.plans.GraftSqlTables.register(s, wh, "orders_sqlu",
          keyCol = Some("o_orderkey"))
        s.sql("""UPDATE orders_sqlu
                 SET o_totalprice = o_totalprice + 1000.0,
                     o_orderstatus = 'U'
                 WHERE o_orderpriority = '2-HIGH'
                   AND o_totalprice >= 100000.0""")
        s.sql("""SELECT o_orderkey, o_orderstatus, o_totalprice,
                        o_orderpriority
                 FROM orders_sqlu""")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_sqlu.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_sqlu",
          t(s, dir, "orders")
            .select("o_orderkey", "o_orderstatus", "o_totalprice",
              "o_orderpriority"),
          "o_orderpriority")
      }),
      oracle = Some("""SELECT o_orderkey,
                     CASE WHEN o_orderpriority = '2-HIGH'
                           AND o_totalprice >= 100000.0
                          THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
                     CASE WHEN o_orderpriority = '2-HIGH'
                           AND o_totalprice >= 100000.0
                          THEN o_totalprice + 1000.0
                          ELSE o_totalprice END AS o_totalprice,
                     o_orderpriority
              FROM orders""")),

    // SQL-ONLY lifecycle (r9 DDL): CREATE TABLE ... USING graft AS
    // SELECT bootstraps v1 + registers the name, then UPDATE and
    // DELETE mutate it — no DataFrame API anywhere. The setup only
    // clears the directory; the CREATE under test performs the
    // bootstrap itself. Oracle = the lifecycle's algebra over orders.
    DeclaredQuery(
      "q_sql_lifecycle",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        t(s, dir, "orders").createOrReplaceTempView("sqllc_src")
        s.sql(s"""CREATE TABLE orders_sqllc USING graft
                  PARTITIONED BY (o_orderpriority)
                  OPTIONS (warehouse '$wh', keyCol 'o_orderkey')
                  AS SELECT o_orderkey, o_orderstatus, o_totalprice,
                            o_orderpriority
                     FROM sqllc_src""")
        s.sql("""UPDATE orders_sqllc SET o_totalprice = o_totalprice + 500.0
                 WHERE o_orderstatus = 'F'""")
        s.sql("DELETE FROM orders_sqllc WHERE o_orderkey % 19 = 0")
        s.sql("""SELECT o_orderkey, o_orderstatus, o_totalprice,
                        o_orderpriority
                 FROM orders_sqllc""")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_sqllc.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true): Unit
      }),
      oracle = Some("""SELECT o_orderkey, o_orderstatus,
                     CASE WHEN o_orderstatus = 'F'
                          THEN o_totalprice + 500.0
                          ELSE o_totalprice END AS o_totalprice,
                     o_orderpriority
              FROM orders
              WHERE o_orderkey % 19 <> 0""")),

    // SQL MERGE with COLUMN-LIST assignments — the most common ANSI
    // MERGE spelling after star-expansion (the reference's own
    // per-column cast step, incremental_etl_v1.py:139-143, is exactly
    // this shape): WHEN MATCHED updates read BOTH sides (t.price +
    // s.delta), unassigned columns keep the TARGET's values, and the
    // column-list INSERT NULL-fills unmentioned columns. The matched
    // target rows come through rowsForKeys (zone+bloom locate, never a
    // full pass). Oracle = the clause algebra replayed in DuckDB.
    DeclaredQuery(
      "q_sql_merge_cols",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.plans.GraftSqlTables.register(s, wh, "orders_sqlmc",
          keyCol = Some("o_orderkey"))
        val o = t(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority")
        val bumps = o.filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), lit(250.0).as("delta"))
        val ins = o.filter(col("o_orderkey") % 13 === 0)
          .select((col("o_orderkey") + 300000000L).as("o_orderkey"),
            lit(0.0).as("delta"))
        bumps.unionAll(ins).createOrReplaceTempView("sqlmc_src")
        s.sql("""MERGE INTO orders_sqlmc t USING sqlmc_src s
                 ON t.o_orderkey = s.o_orderkey
                 WHEN MATCHED AND t.o_totalprice < 200000.0
                   THEN UPDATE SET o_totalprice = t.o_totalprice + s.delta,
                                   o_orderstatus = 'B'
                 WHEN NOT MATCHED
                   THEN INSERT (o_orderkey, o_orderpriority)
                        VALUES (s.o_orderkey, '9-COLS')""")
        s.sql("""SELECT o_orderkey, o_orderstatus, o_totalprice,
                        o_orderpriority
                 FROM orders_sqlmc""")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_sqlmc.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_sqlmc",
          t(s, dir, "orders")
            .select("o_orderkey", "o_orderstatus", "o_totalprice",
              "o_orderpriority"),
          "o_orderpriority")
      }),
      oracle = Some("""SELECT o.o_orderkey,
                     CASE WHEN o.o_orderkey % 7 = 0
                           AND o.o_totalprice < 200000.0
                          THEN 'B' ELSE o.o_orderstatus
                     END AS o_orderstatus,
                     CASE WHEN o.o_orderkey % 7 = 0
                           AND o.o_totalprice < 200000.0
                          THEN o.o_totalprice + 250.0
                          ELSE o.o_totalprice
                     END AS o_totalprice,
                     o.o_orderpriority
              FROM orders o
              UNION ALL
              SELECT o_orderkey + 300000000, CAST(NULL AS VARCHAR),
                     CAST(NULL AS DOUBLE), '9-COLS'
              FROM orders WHERE o_orderkey % 13 = 0""")),

    // SQL table maintenance — OPTIMIZE (measure-then-fold compaction +
    // ZORDER rewrite) and VACUUM (time-retention sweep) issued as the
    // statements a lakehouse operator expects, intercepted by the
    // injected parser (Spark's grammar has no node for either). The
    // oracle pins BIT-IDENTITY: three appends + a Z-order rewrite + a
    // vacuum later, the rows are exactly the input's — layout and
    // history are the only things maintenance may change.
    DeclaredQuery(
      "q_sql_optimize",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.plans.GraftSqlTables.register(s, wh, "li_sqlopt",
          keyCol = Some("l_orderkey"))
        s.sql("OPTIMIZE li_sqlopt")
        s.sql("OPTIMIZE li_sqlopt ZORDER BY (l_orderkey, l_partkey)")
        s.sql("VACUUM li_sqlopt RETAIN 0 HOURS")
        s.sql("""SELECT l_orderkey, l_partkey, l_quantity, l_returnflag
                 FROM li_sqlopt""")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/li_sqlopt.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        val li = t(s, dir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
        // three generations per partition: the small-files disease
        // OPTIMIZE exists to cure
        graft.io.ManifestVersioned.writeFull(s, wh, "li_sqlopt",
          li.filter(col("l_orderkey") % 3 === 0), "l_returnflag")
        graft.io.ManifestVersioned.appendRows(s, wh, "li_sqlopt",
          li.filter(col("l_orderkey") % 3 === 1))
        graft.io.ManifestVersioned.appendRows(s, wh, "li_sqlopt",
          li.filter(col("l_orderkey") % 3 === 2))
      }),
      oracle = Some("""SELECT l_orderkey, l_partkey, l_quantity, l_returnflag
              FROM lineitem""")),

    // ALTER TABLE RENAME COLUMN — the O(1) schema-only commit with
    // column-mapping semantics (the physical on-disk name stays the
    // original; reads project, writes map back, zone stats re-key).
    // The query CROSSES the rename: pre-rename generations, the
    // rename, then an UPDATE + INSERT under the new name, read back
    // with a pruning predicate ON the renamed column. Oracle = the
    // same algebra over orders with the column simply called by its
    // new name.
    DeclaredQuery(
      "q_rename_column",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.plans.GraftSqlTables.register(s, wh, "orders_ren",
          keyCol = Some("o_orderkey"))
        s.sql("ALTER TABLE orders_ren RENAME COLUMN o_totalprice TO price")
        s.sql("UPDATE orders_ren SET price = price + 100.0 " +
          "WHERE o_orderkey % 5 = 0")
        s.sql("INSERT INTO orders_ren VALUES " +
          "(400000001, 'R', 1234.5, '9-REN')")
        s.sql("""SELECT o_orderkey, o_orderstatus, price, o_orderpriority
                 FROM orders_ren WHERE price >= 1000.0""")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_ren.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_ren",
          t(s, dir, "orders")
            .select("o_orderkey", "o_orderstatus", "o_totalprice",
              "o_orderpriority"),
          "o_orderpriority")
      }),
      oracle = Some("""SELECT o_orderkey, o_orderstatus,
                     CASE WHEN o_orderkey % 5 = 0
                          THEN o_totalprice + 100.0
                          ELSE o_totalprice END AS price,
                     o_orderpriority
              FROM orders
              WHERE (CASE WHEN o_orderkey % 5 = 0
                          THEN o_totalprice + 100.0
                          ELSE o_totalprice END) >= 1000.0
              UNION ALL
              SELECT 400000001, 'R', 1234.5, '9-REN'""")),

    // ALTER TABLE ... ALTER COLUMN c TYPE t — the EXPLICIT SQL
    // spelling of type widening (the implicit wider-typed-write path
    // is q_bloom_widened). The query CROSSES the widening: int-keyed
    // generations, the SQL widening to BIGINT, then an UPDATE and an
    // INSERT whose key EXCEEDS Int.MaxValue (impossible pre-widening),
    // read back with a pruning predicate ON the widened column — so
    // pre-widening zone tokens (recorded at int) must bound post-
    // widening long probes. Oracle = the same algebra over orders.
    DeclaredQuery(
      "q_sql_widen",
      (s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        graft.plans.GraftSqlTables.register(s, wh, "orders_wid",
          keyCol = Some("o_orderkey"))
        s.sql("ALTER TABLE orders_wid ALTER COLUMN o_orderkey TYPE BIGINT")
        s.sql("UPDATE orders_wid SET o_totalprice = o_totalprice + 50.0 " +
          "WHERE o_orderkey % 7 = 0")
        s.sql("INSERT INTO orders_wid VALUES " +
          "(4000000000, 'W', 999999.0, '9-WID')")
        s.sql("""SELECT o_orderkey, o_orderstatus, o_totalprice,
                        o_orderpriority
                 FROM orders_wid WHERE o_orderkey >= 1000""")
      },
      setup = Some((s, dir) => {
        val wh = s"/tmp/graft_verwh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val base = new org.apache.hadoop.fs.Path(s"$wh/orders_wid.mv")
        base.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(base, true)
        graft.io.ManifestVersioned.writeFull(s, wh, "orders_wid",
          t(s, dir, "orders")
            .select(col("o_orderkey").cast("int").as("o_orderkey"),
              col("o_orderstatus"), col("o_totalprice"),
              col("o_orderpriority")),
          "o_orderpriority")
      }),
      oracle = Some("""SELECT o_orderkey, o_orderstatus,
                     CASE WHEN o_orderkey % 7 = 0
                          THEN o_totalprice + 50.0
                          ELSE o_totalprice END AS o_totalprice,
                     o_orderpriority
              FROM orders
              WHERE o_orderkey >= 1000
              UNION ALL
              SELECT 4000000000, 'W', 999999.0, '9-WID'""")))
}
