package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DeclaredQuery
import graft.ext.TemporalJoins
import graft.io.Tables

/** As-of and range joins over the `events` stream table — temporal
  * operators Spark has no native join type for, composed scale-first
  * (single key shuffle / bounded bucket replication; see
  * [[graft.ext.TemporalJoins]]).
  */
object TemporalJoinQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.testTable(s, dir, name)

  import ReferenceQueries.EvCte

  val all: Seq[DeclaredQuery] = Seq(

    // As-of: every 'view' event is annotated with the user's most recent
    // 'purchase' at-or-before it (latest purchase value + its event id).
    DeclaredQuery(
      "q_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val views = ev.filter(col("event_type") === "view")
          .select("event_id", "user_id", "ts")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("value").as("purchase_value"),
            col("event_id").as("purchase_id"))
        TemporalJoins.asOfJoin(
          views, purchases, "user_id", "ts", "ts",
          Seq("purchase_value", "purchase_id"), tiebreakCol = Some("purchase_id"))
      },
      Some(s"""$EvCte,
               u AS (
                 SELECT event_id, user_id, ts AS t, 1 AS isl,
                        CAST(NULL AS DOUBLE) AS pv, CAST(NULL AS BIGINT) AS pid,
                        ts
                 FROM ev WHERE event_type = 'view'
                 UNION ALL
                 SELECT NULL, user_id, ts, 0, value, event_id, CAST(NULL AS TIMESTAMP)
                 FROM ev WHERE event_type = 'purchase'),
               c AS (
                 SELECT event_id, user_id, ts, isl,
                        LAST_VALUE(pv IGNORE NULLS) OVER w AS purchase_value,
                        LAST_VALUE(pid IGNORE NULLS) OVER w AS purchase_id
                 FROM u
                 WINDOW w AS (PARTITION BY user_id
                              ORDER BY t ASC, isl ASC, pid ASC NULLS FIRST
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               SELECT event_id, user_id, ts, purchase_value, purchase_id
               FROM c WHERE isl = 1""")),

    // FORWARD as-of: the NEXT purchase at or after each view (the
    // attribution direction) — mirrored union-and-window carry, one key
    // shuffle, deterministic tiebreak on equal timestamps.
    DeclaredQuery(
      "q_asof_forward",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val views = ev.filter(col("event_type") === "view")
          .select("event_id", "user_id", "ts")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("value").as("purchase_value"),
            col("event_id").as("purchase_id"))
        TemporalJoins.asOfJoinForward(
          views, purchases, "user_id", "ts", "ts",
          Seq("purchase_value", "purchase_id"), tiebreakCol = Some("purchase_id"))
      },
      Some(s"""$EvCte,
               u AS (
                 SELECT event_id, user_id, ts AS t, 1 AS isl,
                        CAST(NULL AS DOUBLE) AS pv, CAST(NULL AS BIGINT) AS pid,
                        ts
                 FROM ev WHERE event_type = 'view'
                 UNION ALL
                 SELECT NULL, user_id, ts, 0, value, event_id, CAST(NULL AS TIMESTAMP)
                 FROM ev WHERE event_type = 'purchase'),
               c AS (
                 SELECT event_id, user_id, ts, isl,
                        FIRST_VALUE(pv IGNORE NULLS) OVER w AS purchase_value,
                        FIRST_VALUE(pid IGNORE NULLS) OVER w AS purchase_id
                 FROM u
                 WINDOW w AS (PARTITION BY user_id
                              ORDER BY t ASC, isl DESC, pid ASC NULLS FIRST
                              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
               SELECT event_id, user_id, ts, purchase_value, purchase_id
               FROM c WHERE isl = 1""")),

    // Range join: for every 'click', how many same-user events landed in
    // the preceding hour (inclusive), via bucketized equi-join.
    DeclaredQuery(
      "q_range_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val all = ev.select(col("user_id").as("r_user"),
          col("ts").as("r_ts"), col("event_id").as("r_id"))
        TemporalJoins.rangeJoin(
            clicks, all, "user_id", "r_user",
            col("ts"), col("r_ts"), rangeSec = 3600, bucketSec = 3600)
          .groupBy("event_id", "user_id", "ts")
          .agg(count(lit(1)).as("n_prior_hour"))
      },
      Some(s"""$EvCte
               SELECT c.event_id, c.user_id, c.ts, COUNT(*) AS n_prior_hour
               FROM ev c JOIN ev r
                 ON c.user_id = r.user_id
                AND epoch_us(r.ts) >= epoch_us(c.ts) - 3600000000
                AND epoch_us(r.ts) <= epoch_us(c.ts)
               WHERE c.event_type = 'click'
               GROUP BY c.event_id, c.user_id, c.ts""")))
}
