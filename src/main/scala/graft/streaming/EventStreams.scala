package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event analytics: watermarked windowed aggregation and custom
  * session state — the streaming twins of `Analytics.tumbling` /
  * `Analytics.sessionize` (same output schemas, so batch backfill and the
  * live stream can share downstream consumers).
  *
  * Scale notes: state is keyed by (group, window) / (user) and pruned by
  * the event-time watermark, so state size is bounded by active keys ×
  * allowed lateness, not by stream length. `flatMapGroupsWithState` with
  * ProcessingTimeTimeout would be the wall-clock variant; event-time
  * timeout keeps results reprocessing-deterministic.
  */
object EventStreams {

  /** Tumbling event-time window counts/sums with a lateness watermark.
    * Late rows beyond `lateness` are dropped; each (group, window) emits
    * once the watermark passes (Append mode compatible).
    */
  def tumblingCounts(events: DataFrame, tsCol: String, width: String,
      lateness: String, groupCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy((groupCols.map(col) :+ window(col(tsCol), width)): _*)
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("window_value"))
      .select((groupCols.map(col) :+
        col("window.start").as("window_start") :+
        col("n_events") :+ col("window_value")): _*)

  /** Sliding (hopping) twin of [[tumblingCounts]]: width-`width` windows
    * every `slide` under the same lateness watermark — the streaming form
    * of `ext.Analytics.sliding`, sharing its window arithmetic (state per
    * open window instance is bounded by width/slide × groups; the
    * watermark closes instances exactly as it does tumbling ones).
    */
  def slidingCounts(events: DataFrame, tsCol: String, width: String,
      slide: String, lateness: String, groupCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy((groupCols.map(col) :+ window(col(tsCol), width, slide)): _*)
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("window_value"))
      .select((groupCols.map(col) :+
        col("window.start").as("window_start") :+
        col("n_events") :+ col("window_value")): _*)

  /** STREAM-STREAM interval join: each left event pairs with same-key
    * right events whose timestamp falls in [left.ts, left.ts + within] —
    * the attribution shape (click ↔ conversion within an hour). Both
    * sides carry watermarks and the join condition bounds event-time
    * distance, so Spark provably expires state: a buffered row is dropped
    * once the other side's watermark passes its timestamp + within +
    * lateness. Without the time bound the state store grows forever —
    * the condition is not an optimization, it IS the state contract.
    * Batch twin: `ext.TemporalJoins.rangeJoin` (same pairs, bucketed
    * equi-join instead of buffered state).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, lateness: String,
      within: String): DataFrame = {
    val l = left.withWatermark(leftTs, lateness).alias("l")
    val r = right.withWatermark(rightTs, lateness).alias("r")
    val keyEq = keyCols.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    l.join(r, keyEq &&
      col(s"r.$rightTs") >= col(s"l.$leftTs") &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within"))
  }

  /** Streaming exact dedup: drop re-deliveries of the same key arriving
    * within the watermark horizon (state for a key is freed once the
    * event-time watermark passes its timestamp + lateness — bounded state,
    * unlike an unbounded `dropDuplicates`). The streaming twin of
    * `Dedup.exactDedup` for at-least-once upstream sources.
    */
  def dedupedStream(events: DataFrame, keyCols: Seq[String], tsCol: String,
      lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionAgg(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      session_value: Double)
  // public: the state encoder's generated code must see the constructor
  case class SessionState(
      start: Long, last: Long, n: Long, total: Double)

  /** Custom sessionization via flatMapGroupsWithState: a session closes
    * when the event-time watermark passes last-event + gap (event-time
    * timeout), emitting one row per closed session — the streaming
    * equivalent of the batch gaps-and-islands / session_window query.
    */
  def sessionize(events: Dataset[Event], gapMs: Long, lateness: String)
      : Dataset[SessionAgg] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAgg](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionAgg(user, new Timestamp(s.start),
              new Timestamp(s.last + gapMs), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionAgg]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last < gapMs =>
                  cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1,
                    total = s.total + e.value))
                case Some(s) =>
                  closed ::= SessionAgg(user, new Timestamp(s.start),
                    new Timestamp(s.last + gapMs), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
