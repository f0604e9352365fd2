package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events schema (SURVEY.md §7
  * stretch; the reference has no streaming — its page loop is batch
  * chunking, `pyrfc_read_table.py:66-83`). Batch twins of these
  * semantics are q80/q81; these transforms run on an unbounded
  * `readStream` source with event-time watermarks.
  *
  * Scale: all three are keyed stateful aggregations — state is
  * hash-partitioned by group key across executors, and the watermark
  * bounds state size (late rows are dropped, closed windows evicted).
  */
object EventStreams {

  /** Streaming input row (event-time as a real timestamp — a streaming
    * source delivers typed events; the ns-long quirk is a property of the
    * parquet testdata, not of the stream). */
  final case class SEvent(event_id: Long, ts: Timestamp, user_id: Long,
                          event_type: String, value: Double)

  /** Per-user running aggregate maintained by [[runningUserCounts]]. */
  final case class UserAgg(user_id: Long, n_events: Long, sum_value: Double,
                           last_type: String)

  /** A session emitted by [[closedSessions]] once its inactivity timeout
    * fires (times in epoch ms). */
  final case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long,
                                 n_events: Long)

  /** 1-hour tumbling counts per event type, 2-hour watermark: the
    * streaming twin of q80. Append mode — a window emits once closed. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_val"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("cnt"), col("sum_val"))

  /** 30-minute-gap session windows per user: the streaming twin of q81,
    * via the built-in `session_window` instead of lag+cumsum (which need
    * an unbounded history — exactly what streaming state avoids). */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_val"))
      .select(col("session_window.start").as("ss"),
        col("session_window.end").as("se"), col("user_id"), col("cnt"),
        col("sum_val"))

  /** Custom keyed state via `mapGroupsWithState`: a per-user running
    * profile (event count, value sum, last event type). Update output
    * mode; state lives for the key's lifetime (NoTimeout — a production
    * job would set a processing/event-time timeout to bound state). */
  def runningUserCounts(events: Dataset[SEvent]): Dataset[UserAgg] = {
    implicit val aggEnc: Encoder[UserAgg] = Encoders.product[UserAgg]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[SEvent], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0.0, ""))
          // deterministic in-batch order: by event time then id
          val batch = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val next = batch.foldLeft(prev) { (a, e) =>
            UserAgg(uid, a.n_events + 1, a.sum_value + e.value, e.event_type)
          }
          state.update(next)
          next
      }
  }

  /** Fully custom sessionization with `flatMapGroupsWithState` +
    * event-time timeouts — the pattern `session_window` can't express
    * (per-session custom state, emit-on-close): a user's open session
    * accumulates in state; when the watermark passes the session's
    * inactivity deadline (last event + 30 min) the timeout fires, the
    * closed session is EMITTED, and its state evicted. Requires a
    * watermark on the input (drives both timeouts and state cleanup). */
  def closedSessions(events: Dataset[SEvent]): Dataset[ClosedSession] = {
    implicit val outEnc: Encoder[ClosedSession] = Encoders.product[ClosedSession]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    val gapMs = 30L * 60 * 1000
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[SEvent], state: GroupState[ClosedSession]) =>
          if (state.hasTimedOut) {
            val closed = state.get
            state.remove()
            Iterator.single(closed)
          } else {
            val batch = rows.toSeq
            val lo = batch.map(_.ts.getTime).min
            val hi = batch.map(_.ts.getTime).max
            val prev = state.getOption
            // batch events extend the open session (the 2 h watermark
            // exceeds the 30 min gap, so same-session events cannot be
            // split across a fired timeout)
            val next = prev match {
              case Some(s) => ClosedSession(uid, math.min(s.start_ms, lo),
                math.max(s.end_ms, hi), s.n_events + batch.size)
              case None => ClosedSession(uid, lo, hi, batch.size.toLong)
            }
            state.update(next)
            state.setTimeoutTimestamp(next.end_ms + gapMs)
            Iterator.empty
          }
      }
  }

  /** Output mode each transform requires (kept next to the transforms so
    * callers don't guess): tumbling/session → Append, custom state →
    * Update. */
  val TumblingMode: OutputMode = OutputMode.Append()
  val SessionMode: OutputMode = OutputMode.Append()
  val RunningMode: OutputMode = OutputMode.Update()
  val ClosedSessionsMode: OutputMode = OutputMode.Append()
}
