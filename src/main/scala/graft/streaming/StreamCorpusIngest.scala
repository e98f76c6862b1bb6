package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextDedup

/** The composed ingest loop — the streaming form of the q56 pipeline,
  * in the SAME stage order: every micro-batch is DEDUPED within itself
  * and against all previously dedup-accepted docs
  * ([[StreamDedup.cleanBatchWithSigs]] + signature store), then
  * DECONTAMINATED against the static benchmark
  * ([[StreamClean.cleanBatch]]), then PACKED into token-budget shards
  * continuing the carried running total ([[StreamShard.processBatch]]).
  * One foreachBatch, three library calls — the same operators, in the
  * same order, as the batch pipeline, so batch and stream stay
  * semantically aligned by construction.
  *
  * All three outputs (shard-partitioned docs, signature layer, state
  * layer) write under the batch's own `batch=<id>` directories with
  * overwrite, and cross-batch reads exclude the current id — the replay
  * discipline shared by [[StreamDedup]]/[[StreamShard]].
  */
object StreamCorpusIngest {

  def start(
      docsStream: DataFrame,
      eval: DataFrame,
      outDir: String,
      sigStoreDir: String,
      stateDir: String,
      checkpoint: String,
      n: Int = 3,
      minOverlap: Long = 10,
      minJaccard: Double = 0.5,
      budget: Long = 10000L,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery = {
    val evalSh = TextDedup.shingles(eval, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, evalSh, outDir, sigStoreDir, stateDir,
          n, minOverlap, minJaccard, budget)
      }
      .start()
  }

  def processBatch(
      batch: DataFrame,
      id: Long,
      evalSh: DataFrame,
      outDir: String,
      sigStoreDir: String,
      stateDir: String,
      n: Int = 3,
      minOverlap: Long = 10,
      minJaccard: Double = 0.5,
      budget: Long = 10000L): Unit = {
    val spark = batch.sparkSession
    // stage 1: dedup FIRST — matching the q56 batch pipeline, where
    // near-dup clustering runs on the raw corpus BEFORE decontamination:
    // a near-dup of a contaminated doc is dropped as a dup either way,
    // and the canonical copy is then removed by the decontamination
    // stage. Running decon first would let such a dup slip through
    // (its partner already gone, not enough eval overlap of its own).
    val (deduped0, sigs, sh) = StreamDedup.cleanBatchWithSigs(batch,
      StreamDedup.readStore(spark, sigStoreDir, excludeBatch = id),
      n, minJaccard)
    val deduped = deduped0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the store layer holds DEDUP survivors (pre-decontamination) so a
    // later near-dup of a contaminated doc still finds its match —
    // exactly the membership q56's cluster step sees
    sigs.join(deduped.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .write.mode("overwrite").parquet(s"$sigStoreDir/batch=$id")
    // stage 2: decontaminate the survivors against the benchmark —
    // restricting the ALREADY-persisted batch shingle relation to the
    // dedup survivors instead of re-tokenizing their text (one shingle
    // pass serves dedup, the sig store, and decontamination)
    val clean = StreamClean.cleanBatchFromShingles(deduped,
      sh.join(deduped.select(col("doc_id")), Seq("doc_id"), "left_semi"),
      evalSh, minOverlap)
    // stage 3: pack + carry the running token total (StreamShard's own
    // batch unit — shared code, shared replay discipline)
    StreamShard.processBatch(clean, id, outDir, stateDir, budget)
    deduped.unpersist(); sigs.unpersist(); sh.unpersist()
    ()
  }
}
