package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming extension ops (SURVEY §2.8 lists these as extension
  * surface — the reference pipeline is stateless): event-time tumbling
  * window aggregation with watermark, and gap-based sessionization via
  * `flatMapGroupsWithState` custom state. */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  final case class SessionState(start: Long, lastSeen: Long, nEvents: Long)
  final case class SessionOut(
      user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)

  /** Tumbling event-time window with watermark: rows older than the
    * watermark are dropped, finalized windows emit exactly once in append
    * mode. */
  def windowedCounts(events: Dataset[Event], window: String = "1 hour",
      watermark: String = "2 hours"): Dataset[org.apache.spark.sql.Row] =
    events.toDF()
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization: a session closes after `gapSeconds` of
    * silence (processing-time timeout). Emits one row per closed session —
    * custom state the built-in window functions can't express on a stream. */
  def sessions(
      spark: SparkSession,
      events: Dataset[Event],
      gapSeconds: Long = 1800): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new Timestamp(s.start), new Timestamp(s.lastSeen), s.nEvents))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var out = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen > gapSeconds * 1000 =>
                  out ::= SessionOut(userId, new Timestamp(s.start), new Timestamp(s.lastSeen), s.nEvents)
                  cur = Some(SessionState(t, t, 1))
                case Some(s) =>
                  cur = Some(s.copy(lastSeen = math.max(s.lastSeen, t), nEvents = s.nEvents + 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(gapSeconds * 1000)
            }
            out.reverseIterator
          }
      }
  }
}
