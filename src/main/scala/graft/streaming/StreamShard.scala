package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.ShardPack

/** Incremental shard packing: the streaming form of [[ShardPack]] (q55) —
  * the sequential shard writer at the end of a training-ingest pipeline.
  * Each micro-batch is laid out in deterministic hash order WITHIN the
  * batch and packed into token-budget shards CONTINUING from the
  * cumulative count carried over from all previous batches, so shards
  * fill in arrival order and span batch boundaries; a loader mounts shard
  * k as the `shard=k` directories across every `batch=<b>` layer.
  *
  * State is one number — the running token total — persisted as a
  * `batch=<id>` layer per batch (tiny parquet), same replay discipline as
  * [[StreamDedup]]: a batch reads the LATEST layer BELOW its own id, so a
  * replayed batch ignores its failed attempt's layer and recomputes
  * identically; both writes are `overwrite` under the batch's own
  * directories, so nothing duplicates.
  *
  * Scale shape: per batch, exactly [[ShardPack.pack]]'s cost (bucketed
  * parallel prefix sum) plus one one-row state write. Output is
  * append-order deterministic: the same batch sequence produces the same
  * shard membership on any cluster shape.
  */
object StreamShard {

  def start(
      docsStream: DataFrame,
      outDir: String,
      stateDir: String,
      checkpoint: String,
      budget: Long = 10000L,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, outDir, stateDir, budget)
      }
      .start()

  /** Cumulative token total after the latest batch BELOW `beforeBatch`
    * (a replayed batch must not read its own failed attempt's layer). */
  def readCum(spark: SparkSession, stateDir: String, beforeBatch: Long): Long =
    try {
      spark.read.parquet(stateDir)
        .filter(col("batch") < beforeBatch)
        .orderBy(col("batch").desc)
        .select(col("cum")).limit(1)
        .collect().headOption.map(_.getLong(0)).getOrElse(0L)
    } catch { case _: org.apache.spark.sql.AnalysisException => 0L }

  def processBatch(
      batch: DataFrame,
      id: Long,
      outDir: String,
      stateDir: String,
      budget: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val prev = readCum(spark, stateDir, id)
    val d = batch.withColumn("ntok",
      size(split(col("text"), " ")).cast("long"))
    val packed = ShardPack.pack(d, col("doc_id"), col("ntok"), budget)
      .withColumn("shard", expr(s"(cum_before + ${prev}L) div ${budget}L"))
      .drop("cum_before")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    packed.write.mode("overwrite")
      .partitionBy("shard").parquet(s"$outDir/batch=$id")
    val total = packed.agg(coalesce(sum(col("ntok")), lit(0L)))
      .collect()(0).getLong(0)
    Seq(prev + total).toDF("cum")
      .write.mode("overwrite").parquet(s"$stateDir/batch=$id")
    packed.unpersist()
    ()
  }
}
