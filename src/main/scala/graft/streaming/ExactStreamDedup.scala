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
}
