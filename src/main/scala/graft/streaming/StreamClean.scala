package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Decontaminate, TextDedup}

/** Ingest-time benchmark decontamination: the streaming form of
  * [[graft.operators.Decontaminate]] (q51). Documents arrive as a stream;
  * anything overlapping the (static) benchmark corpus is dropped before it
  * ever lands in the training store.
  *
  * Decontamination is EMBARRASSINGLY INCREMENTAL: contamination is a
  * per-train-doc property against a fixed eval set, so filtering each
  * micro-batch independently produces exactly the batch operator's result
  * — no cross-batch state, no watermark, nothing to replay (unlike dedup,
  * where duplicates span batches). That makes `foreachBatch` + the batch
  * operator the production shape; the eval shingle relation is computed
  * and persisted ONCE at start and reused by every batch.
  *
  * Scale shape: the eval side is benchmark-sized (fixed, small), so each
  * micro-batch does one broadcast hash join against its own shingles —
  * zero shuffle of the stream side, state O(eval), throughput bounded by
  * the scan.
  */
object StreamClean {

  /** Start cleaning `docsStream` (doc_id, text, …) against `eval`; clean
    * rows land under `outDir/batch=<id>/`, contaminated rows are dropped.
    * foreachBatch is at-least-once (it does NOT go through the streaming
    * file-sink commit log), so each batch OVERWRITES its own `batch=<id>`
    * directory — a crash-replayed batch rewrites the same path instead of
    * appending duplicates (the [[StreamDedup]]/[[StreamShard]] replay
    * discipline).
    */
  def start(
      docsStream: DataFrame,
      eval: DataFrame,
      outDir: String,
      checkpoint: String,
      n: Int = 3,
      minOverlap: Long = 10,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery = {
    val evalSh = TextDedup.shingles(eval, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        cleanBatch(batch, evalSh, n, minOverlap)
          .write.mode("overwrite").parquet(s"$outDir/batch=$id")
        ()
      }
      .start()
  }

  /** One micro-batch filtered against a precomputed eval shingle relation
    * — also the unit the spec pins against the batch operator. */
  def cleanBatch(
      batch: DataFrame,
      evalSh: DataFrame,
      n: Int = 3,
      minOverlap: Long = 10): DataFrame =
    cleanBatchFromShingles(batch, TextDedup.shingles(batch, n), evalSh,
      minOverlap)

  /** [[cleanBatch]] with the batch's shingle relation precomputed — the
    * composed pipeline ([[StreamCorpusIngest]]) already holds a persisted
    * shingle pass from its dedup stage, and re-tokenizing the survivors
    * would double the per-batch shingling CPU (the q19/q56 one-shingle-
    * pass lesson, applied across stages). */
  def cleanBatchFromShingles(
      batch: DataFrame,
      batchSh: DataFrame,
      evalSh: DataFrame,
      minOverlap: Long = 10): DataFrame = {
    val contaminated = Decontaminate
      .overlapsAgainst(batchSh, evalSh,
        minOverlap = minOverlap, broadcastEval = true)
      .select(col("train_id").as("doc_id")).distinct()
    batch.join(contaminated, Seq("doc_id"), "left_anti")
  }
}
