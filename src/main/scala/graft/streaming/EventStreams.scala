package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming versions of the event-pipeline operators.
  *
  * The batch twins registered in AnalyticsQueries (`events_windowed`,
  * `events_sessionize`) share these semantics; this module provides the
  * streaming execution: watermarked tumbling-window aggregation and
  * stateful sessionization via `flatMapGroupsWithState`. State is keyed by
  * user — at 100 TB the state store shards with the shuffle partitioning
  * and each key's state is O(1), so the operator scales horizontally.
  */
object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  case class SessionState(sessionIdx: Long, lastTs: Long, nEvents: Long, startTs: Long, sumValue: Double)

  case class SessionOut(
      user_id: Long,
      session_idx: Long,
      n_events: Long,
      session_start: Timestamp,
      sum_value: Double
  )

  val SessionGapMicros: Long = 1800000000L // 30 min

  /** Watermarked tumbling-window aggregation (streaming twin of the
    * `events_windowed` batch query).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_value")
      )
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("sum_value")
      )

  /** Stateful sessionization: a session closes after a 30-minute event-time
    * gap; closed sessions are emitted, the open session is kept in state
    * (emitted on timeout). Streaming twin of `events_sessionize`.
    */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout
      ) { (userId, it, state: GroupState[SessionState]) =>
        if (state.hasTimedOut) {
          val s = state.get
          state.remove()
          Iterator(
            SessionOut(userId, s.sessionIdx, s.nEvents, new Timestamp(s.startTs / 1000), s.sumValue)
          )
        } else {
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var cur = state.getOption
          val out = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            val tsMicros = e.ts.getTime * 1000
            cur match {
              case Some(s) if tsMicros - s.lastTs <= SessionGapMicros =>
                cur = Some(s.copy(lastTs = tsMicros, nEvents = s.nEvents + 1, sumValue = s.sumValue + e.value))
              case Some(s) =>
                out += SessionOut(userId, s.sessionIdx, s.nEvents, new Timestamp(s.startTs / 1000), s.sumValue)
                cur = Some(SessionState(s.sessionIdx + 1, tsMicros, 1, tsMicros, e.value))
              case None =>
                cur = Some(SessionState(1, tsMicros, 1, tsMicros, e.value))
            }
          }
          cur.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(s.lastTs / 1000 + 30 * 60 * 1000)
          }
          out.result().iterator
        }
      }
  }

  /** Streaming exact dedup: drop events repeating the same (user, type,
    * value) key within the watermark horizon — the streaming twin of the
    * hash-key exact dedup operator. State is bounded by the watermark,
    * which is what makes it runnable forever at production volume.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "value")

  /** Stream-stream interval join — the streaming twin of the
    * `events_interval_join` batch query: every click attributed to a
    * later purchase of the same user within the 30-minute window.
    * Watermarks on BOTH sides plus the two-sided time-range predicate
    * are what let Spark bound the join state: a click can be dropped
    * from state once the watermark passes its ts + 30 min, a purchase
    * once matched candidates are exhausted. Without the range condition
    * the state store grows forever; with it, state per key is O(events
    * in the window) and the operator runs indefinitely at production
    * volume — same micro-batch shuffle on user_id as the batch
    * equi-join on (user, bucket).
    */
  def intervalJoinStream(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .filter(col("event_type") === "click")
      .select(
        col("user_id").as("c_user_id"),
        col("event_id").as("click_event_id"),
        col("ts").as("click_ts")
      )
      .withWatermark("click_ts", "1 hour")
    val p = purchases
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("p_user_id"),
        col("event_id").as("purchase_event_id"),
        col("ts").as("purchase_ts")
      )
      .withWatermark("purchase_ts", "1 hour")
    p.join(
      c,
      col("c_user_id") === col("p_user_id") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES") &&
        col("click_ts") < col("purchase_ts")
    ).select(
      col("p_user_id").as("user_id"),
      col("purchase_event_id"),
      col("click_event_id"),
      (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).as("gap_us")
    )
  }

  /** Wire a parquet-directory source through the streaming operators — the
    * production entry point (`readStream` → transform → `writeStream`).
    */
  def streamFromDirectory(spark: SparkSession, dir: String): DataFrame =
    windowedCounts(
      spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
        .parquet(dir)
    )
}
