package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{ShardPack, TextDedup}

/** The composed ingest loop — the streaming form of the q56 pipeline:
  * every micro-batch is DECONTAMINATED against the static benchmark
  * ([[StreamClean.cleanBatch]]), DEDUPED within itself and against all
  * previously accepted docs ([[StreamDedup.cleanBatch]] + signature
  * store), then PACKED into token-budget shards continuing the carried
  * running total ([[StreamShard]] semantics). One foreachBatch, three
  * library calls — the same operators the batch pipeline composes, so
  * batch and stream stay semantically aligned by construction.
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
    import spark.implicits._
    // stage 1: drop anything overlapping the benchmark
    val clean = StreamClean.cleanBatch(batch, evalSh, n, minOverlap)
    // stage 2: drop near-dups (intra-batch exact; cross-batch vs store)
    val accepted = StreamDedup.cleanBatch(clean,
        StreamDedup.readStore(spark, sigStoreDir, excludeBatch = id),
        n, minJaccard)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // stage 3: pack survivors, continuing the carried token total
    val prev = StreamShard.readCum(spark, stateDir, id)
    val packed = ShardPack.pack(
        accepted.withColumn("ntok", size(split(col("text"), " ")).cast("long")),
        col("doc_id"), col("ntok"), budget)
      .withColumn("shard", expr(s"(cum_before + ${prev}L) div ${budget}L"))
      .drop("cum_before")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    packed.write.mode("overwrite")
      .partitionBy("shard").parquet(s"$outDir/batch=$id")
    TextDedup.minhashSignaturesSketch(TextDedup.shingles(accepted, n), 64)
      .write.mode("overwrite").parquet(s"$sigStoreDir/batch=$id")
    val total = packed.agg(coalesce(sum(col("ntok")), lit(0L)))
      .collect()(0).getLong(0)
    Seq(prev + total).toDF("cum")
      .write.mode("overwrite").parquet(s"$stateDir/batch=$id")
    packed.unpersist(); accepted.unpersist()
    ()
  }
}
