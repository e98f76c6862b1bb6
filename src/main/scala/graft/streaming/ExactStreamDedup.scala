package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** INGEST-TIME EXACT deduplication — the lightweight companion of
  * [[StreamDedup]] (which is the NEAR-dup path: MinHash-LSH against a
  * parquet signature store). Here the first document per content
  * fingerprint passes and every later arrival — same micro-batch or any
  * later one — drops, with the seen-set in Spark's KEYED STATE STORE
  * (checkpointed, so the guarantee survives restarts) instead of a
  * parquet relation: exact dedup needs only a per-key boolean, which is
  * exactly what the state store prices best.
  *
  * Spark-first shape: streaming `dropDuplicates` also keeps state, but
  * offers no within-batch tie-break (task order decides the survivor)
  * and no eviction story in processing time. This keys on the
  * fingerprint, picks the MIN doc_id within a batch (deterministic
  * replay ⇒ deterministic output — the property every oracle in this
  * repo leans on), and bounds state with a processing-time TTL: at
  * 100 TB of arriving text the fingerprint space is unbounded, and the
  * TTL is the explicit memory-vs-horizon knob (after `ttlSeconds` of
  * silence a fingerprint evicts and the key dedupes afresh — the same
  * contract as upstream's `dropDuplicatesWithinWatermark`, in
  * processing time). */
object ExactStreamDedup {

  final case class KeyedDoc(key: String, doc_id: Long, text: String)

  /** [[KeyedDoc]] plus the EVENT time the watermark variant keys its
    * horizon on. */
  final case class KeyedEventDoc(key: String, doc_id: Long, text: String,
                                 event_ts: java.sql.Timestamp)

  /** md5-fingerprint a raw (doc_id, text) stream into [[KeyedDoc]]s —
    * the same exact-dedup fingerprint convention as the batch path
    * (q22's hash-groupBy). */
  def byContent(spark: SparkSession, docs: DataFrame): Dataset[KeyedDoc] = {
    import spark.implicits._
    docs.select(md5(col("text")).as("key"), col("doc_id"), col("text"))
      .as[KeyedDoc]
  }

  /** First document per key, across micro-batches; `ttlSeconds > 0`
    * bounds state (a key quiet that long evicts and re-opens). */
  def firstPerKey(
      spark: SparkSession,
      docs: Dataset[KeyedDoc],
      ttlSeconds: Long = 0L): Dataset[KeyedDoc] = {
    import spark.implicits._
    docs
      .groupByKey(_.key)
      .flatMapGroupsWithState[Boolean, KeyedDoc](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (_: String, rows: Iterator[KeyedDoc], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            // quiet past the TTL: evict — memory stays bounded by the
            // ACTIVE fingerprint set, not the all-time one
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            if (ttlSeconds > 0) state.setTimeoutDuration(ttlSeconds * 1000)
            Iterator.empty
          } else {
            state.update(true)
            if (ttlSeconds > 0) state.setTimeoutDuration(ttlSeconds * 1000)
            // min doc_id, not iterator order: within-batch duplicates
            // must pick the same survivor on every replay
            Iterator(rows.minBy(_.doc_id))
          }
      }
  }

  /** md5-fingerprint a raw (doc_id, text, event_ts) stream into
    * [[KeyedEventDoc]]s — [[byContent]] with the event clock kept. */
  def byContentEvent(spark: SparkSession,
                     docs: DataFrame): Dataset[KeyedEventDoc] = {
    import spark.implicits._
    docs.select(md5(col("text")).as("key"), col("doc_id"), col("text"),
      col("event_ts")).as[KeyedEventDoc]
  }

  /** EVENT-TIME variant of [[firstPerKey]] — watermark-horizon
    * eviction in the `dropDuplicatesWithinWatermark` mold (parity on
    * the anchor policy is the `slideOnDuplicates = false` form below),
    * closing [[firstPerKey]]'s one determinism hole (round-16 verdict): the
    * processing-time TTL evicts by WALL clock, so replaying the same
    * stream on a slower day can evict differently and change the
    * output. Here the horizon rides the WATERMARK, which is derived
    * from the DATA (max event time minus the configured delay, per
    * batch): replaying identical batches produces identical watermarks
    * and therefore identical dedup decisions, whatever the wall clock
    * does between them.
    *
    * Contract: the first document per fingerprint passes (min doc_id
    * within a batch, deterministic); later arrivals drop while the
    * fingerprint is live; a fingerprint evicts once the watermark
    * REACHES `anchorEventTime + horizonMs` — the boundary instant is
    * pinned: at `watermark == anchor + horizonMs` the key is already
    * evicted and dedupes afresh (live iff `watermark < anchor +
    * horizonMs`, strictly). Eviction is checked on the DATA path
    * against the current watermark, not just via the timeout
    * callback — Spark only reports `hasTimedOut` on batches where the
    * key is silent, and a duplicate arriving in the first batch AFTER
    * the horizon passed must already re-open the key, exactly as
    * `dropDuplicatesWithinWatermark` would. The timeout callback is
    * pure state CLEANUP for keys that stay silent (state stays bounded
    * by the fingerprints inside the horizon, the 100 TB requirement).
    *
    * The ANCHOR is a policy knob, and the default is NOT upstream
    * parity — stated plainly: with `slideOnDuplicates = true` the
    * anchor is the newest sighting's event time, so a steadily
    * repeating fingerprint keeps renewing its horizon and never
    * re-emits (usually what dedup wants); upstream's
    * `dropDuplicatesWithinWatermark` instead expires relative to the
    * FIRST arrival, re-emitting a steady repeater once per horizon.
    * Pass `slideOnDuplicates = false` for that first-arrival-anchored
    * parity form. Both are deterministic on the event clock.
    *
    * `docs` must already carry a watermark on `event_ts`
    * (`withWatermark("event_ts", delay)`) — the delay is the lateness
    * tolerance, `horizonMs` the dedup window; the two knobs are
    * deliberately separate, like upstream's. */
  def firstPerKeyEventTime(
      spark: SparkSession,
      docs: Dataset[KeyedEventDoc],
      horizonMs: Long,
      slideOnDuplicates: Boolean = true): Dataset[KeyedEventDoc] = {
    import spark.implicits._
    docs
      .groupByKey(_.key)
      .flatMapGroupsWithState[Long, KeyedEventDoc](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rows: Iterator[KeyedEventDoc], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // silent past the horizon: cleanup — eviction for ARRIVING
            // duplicates is decided on the data path below, so this
            // branch only bounds state
            state.remove()
            Iterator.empty
          } else {
            val rs = rows.toSeq
            val maxEv = rs.iterator.map(_.event_ts.getTime).max
            val wm = state.getCurrentWatermarkMs()
            // live STRICTLY below anchor + horizon: at wm == anchor +
            // horizon the key has evicted (boundary pinned by spec)
            val live = state.exists && wm < state.get + horizonMs
            def arm(anchor: Long): Unit = {
              state.update(anchor)
              // cleanup timeout: fire once the watermark passes the
              // horizon (must stay strictly above the current watermark)
              state.setTimeoutTimestamp(
                math.max(anchor + horizonMs, wm + 1L))
            }
            if (live) {
              // duplicate inside the horizon: drop; sliding policy
              // advances the anchor to the newest sighting (event
              // clock, not wall), first-arrival policy leaves it alone
              if (slideOnDuplicates) arm(math.max(state.get, maxEv))
              Iterator.empty
            } else {
              // fresh key OR horizon passed (even with state still
              // present): dedupe afresh, deterministic survivor
              arm(maxEv)
              Iterator(rs.minBy(_.doc_id))
            }
          }
      }
  }
}
