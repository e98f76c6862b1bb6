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
  final case class MultiSessionState(sessions: List[SessionState])
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

  /** EVENT-TIME sessionization: like [[sessions]] but closure is driven by
    * the watermark, not wall-clock silence, so a replay or backfill at any
    * speed — and any arrival order inside the watermark — produces the
    * SAME sessions as a batch lag-based computation over the full log.
    *
    * State is the full set of open sessions per key (an interval-merge,
    * like Spark's native `session_window`, rather than [[sessions]]'
    * newest-only state): an out-of-order event either extends an open
    * session, bridges two into one, or opens its own — whichever the batch
    * semantics dictate. A session closes exactly when the watermark passes
    * `last_event + gap` (no event that could still extend it can arrive),
    * emitted on the watermark-advance no-data batch or the next batch. */
  def sessionsEventTime(
      spark: SparkSession,
      events: Dataset[Event],
      gapSeconds: Long = 1800,
      watermark: String = "2 hours"): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapSeconds * 1000
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[MultiSessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[MultiSessionState]) =>
          val wm = state.getCurrentWatermarkMs()
          // open sessions + this batch's events, interval-merged on the
          // gap: identical to what batch lag-based grouping would build
          val incoming = rows.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1L)).toList
          val all = state.getOption.map(_.sessions).getOrElse(Nil) ++ incoming
          val merged = all.sortBy(s => (s.start, s.lastSeen))
            .foldLeft(List.empty[SessionState]) { (acc, s) =>
              acc match {
                case h :: t if s.start - h.lastSeen <= gapMs =>
                  SessionState(h.start, math.max(h.lastSeen, s.lastSeen),
                    h.nEvents + s.nEvents) :: t
                case _ => s :: acc
              }
            }.reverse
          // closed = nothing inside the gap can still arrive (all such
          // events have ts <= lastSeen + gap <= watermark)
          val (closed, open) = merged.partition(_.lastSeen + gapMs <= wm)
          if (open.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(MultiSessionState(open))
            // earliest possible closure; must sit strictly past the watermark
            state.setTimeoutTimestamp(math.max(open.map(_.lastSeen).min + gapMs, wm + 1))
          }
          closed.sortBy(_.start).map(s =>
            SessionOut(userId, new Timestamp(s.start), new Timestamp(s.lastSeen), s.nEvents)
          ).iterator
      }
  }
}
