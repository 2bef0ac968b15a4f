package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value). Each has a batch twin in
  * graft.Queries so correctness is pinned by the DuckDB oracle while the
  * streaming path is pinned by streaming==batch suite checks.
  *
  * Scale notes: all three are keyed-state operators whose state is bounded
  * by watermarking — the 100 TB/day version only tunes watermark delay,
  * shuffle partitions, and state-store provider (RocksDB).
  */
object StreamingOps {

  /** Tumbling 1h windowed aggregation with watermark — the streaming twin
    * of Queries.q6EventWindows.
    */
  def windowedEventCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("event_count"), sum("value").as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("event_count"), col("sum_value"))

  /** Gap-based sessions via the built-in session_window (Catalyst-native
    * state merging) — streaming twin of Queries.pSessions.
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        unix_timestamp(col("session_window.end")).as("session_end"),
        col("n_events"))

  /** Streaming exact dedup: first occurrence of each content fingerprint
    * wins; watermarking bounds the dedup state to the lateness horizon —
    * the streaming twin of Dedup.exactDedup for continuous ingestion.
    */
  def dedupStream(
      docs: DataFrame,
      fingerprintCol: String,
      eventTimeCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark(eventTimeCol, watermark)
      // WithinWatermark, not plain dropDuplicates: only the watermarked
      // variant lets the state store purge expired fingerprints — the
      // plain one keys state on fingerprint forever (unbounded state)
      .dropDuplicatesWithinWatermark(fingerprintCol)

  /** Stream-stream interval join: match each `right` event to `left`
    * events of the same user within [0, window] after the left event —
    * e.g. purchases attributed to clicks. State on both sides is bounded
    * by the watermark + interval condition.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("l_ts"), col("event_id").as("l_id"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"), col("event_id").as("r_id"))
    l.join(
      r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $window"))
      .select(col("user_id"), col("l_id"), col("r_id"),
        unix_timestamp(col("l_ts")).as("l_epoch"),
        unix_timestamp(col("r_ts")).as("r_epoch"))
  }

  // -------- custom keyed state: running per-user counters ----------------

  case class UserEvent(user_id: Long, event_type: String, value: Double)
  case class UserStats(user_id: Long, n_events: Long, sum_value: Double)

  /** flatMapGroupsWithState running aggregate: emits the refreshed per-user
    * stats on every batch — the template for custom state the declarative
    * operators can't express.
    */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStats, UserStats](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(userId, 0L, 0.0))
          var n = prev.n_events
          var s = prev.sum_value
          rows.foreach { e => n += 1; s += e.value }
          val next = UserStats(userId, n, s)
          state.update(next)
          Iterator.single(next)
      }
  }
}
