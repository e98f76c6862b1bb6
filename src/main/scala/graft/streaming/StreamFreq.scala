package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge => CB}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.FreqItemsSketch

/** Streaming heavy hitters: the ingest-time form of q64. Each micro-batch
  * folds its items into a Misra–Gries summary (ONE aggregate pass,
  * [[FreqItemsSketch]]) and writes the ≤ capacity counters as a
  * `batch=<id>` layer — the [[IncrementalAgg]]/[[StreamDedup]] idempotent
  * overwrite scheme, so at-least-once replays converge without a
  * transaction log. State per batch is O(capacity), never O(stream).
  *
  * The read-side fold (groupBy item, sum counts) is itself a valid
  * mergeable-summaries combine (it is the Agarwal et al. merge WITHOUT
  * the final truncation — strictly more accurate): folded counts
  * undershoot true frequencies by at most N/(capacity+1) in total, and
  * when capacity covers each batch's distinct items the result is EXACT
  * — equal to running batch `freq_items` over the concatenated stream.
  */
object StreamFreq {

  /** Per-batch Misra–Gries summary as (item, cnt) rows. */
  def batchSummary(items: DataFrame, itemCol: String, capacity: Int): DataFrame =
    items
      .agg(CB.column(FreqItemsSketch(CB.expression(col(itemCol)), capacity)
        .toAggregateExpression()).as("f"))
      .select(explode(col("f")).as("e"))
      .select(col("e.item").as("item"), col("e.cnt").as("cnt"))

  /** Idempotent layer write (same scheme as [[IncrementalAgg.applyBatch]]). */
  def applyBatch(summary: DataFrame, path: String, batchId: Long): Unit =
    summary.write.mode("overwrite").parquet(s"$path/batch=$batchId")

  /** Fold every layer into the current top-k, ties broken on the item.
    * Before the first layer commits (fresh deployment, stream started
    * but not yet triggered) the top-k is simply empty, not an error. */
  def topK(spark: SparkSession, path: String, k: Int): DataFrame = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(target)) {
      import spark.implicits._
      return Seq.empty[(String, Long)].toDF("item", "cnt")
    }
    LayerStore.recover(spark, path)
    spark.read.parquet(path)
      .groupBy(col("item"))
      .agg(sum(col("cnt")).as("cnt"))
      .orderBy(desc("cnt"), asc("item"))
      .limit(k)
  }

  /** Fold committed summary layers into one ([[LayerStore.compact]]) so
    * [[topK]]'s fold width stays bounded on a long-running stream. Guarded:
    * applied to a WINDOWED store it would merge counts across windows —
    * [[LayerStore.compact]]'s schema check rejects it; use
    * [[compactWindowed]] there. */
  def compact(spark: SparkSession, path: String): Unit =
    LayerStore.compact(spark, path, "item", Seq("cnt"))

  /** Compaction for [[startWindowed]] stores: the window start is part of
    * the group key, so layers fold WITHIN each event-time window and the
    * (win_start, item, cnt) schema is preserved. */
  def compactWindowed(spark: SparkSession, path: String): Unit =
    LayerStore.compact(spark, path, Seq("win_start", "item"), Seq("cnt"))

  /** The always-on form: item stream → per-batch summary layers. */
  def start(
      items: DataFrame,
      itemCol: String,
      path: String,
      checkpoint: String,
      capacity: Int = 4096,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    items.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        applyBatch(batchSummary(batch.toDF(), itemCol, capacity), path, batchId)
      }
      .start()

  // --- event-time trending ---------------------------------------------------

  /** Per-EVENT-TIME-WINDOW Misra–Gries summaries for one batch:
    * (win_start, item, cnt) rows, one sketch per window the batch
    * touches. Grouped [[FreqItemsSketch]] runs as a normal batch
    * ObjectHashAggregate inside foreachBatch — no streaming state store,
    * so capacity bounds memory per (window × partition). */
  def windowedSummary(
      events: DataFrame, tsCol: String, itemCol: String,
      windowDuration: String, capacity: Int): DataFrame =
    events
      .groupBy(window(col(tsCol), windowDuration).as("w"))
      .agg(CB.column(FreqItemsSketch(CB.expression(col(itemCol)), capacity)
        .toAggregateExpression()).as("f"))
      .select(col("w.start").as("win_start"), explode(col("f")).as("e"))
      .select(col("win_start"), col("e.item").as("item"), col("e.cnt").as("cnt"))

  /** Trending view: top-k per window across every layer. Late events that
    * arrived in later batches fold additively into their window — no
    * watermark is needed for correctness, only for bounding how far back
    * layers keep receiving contributions (drop late rows upstream with
    * `withWatermark` if the business rule demands finality). */
  def trending(spark: SparkSession, path: String, k: Int): DataFrame = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(target)) {
      import spark.implicits._
      return Seq.empty[(java.sql.Timestamp, String, Long)]
        .toDF("win_start", "item", "cnt")
    }
    LayerStore.recover(spark, path)
    val folded = spark.read.parquet(path)
      .groupBy(col("win_start"), col("item"))
      .agg(sum(col("cnt")).as("cnt"))
    folded
      .withColumn("rnk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("win_start"))
          .orderBy(desc("cnt"), asc("item"))))
      .filter(col("rnk") <= k)
      .select(col("win_start"), col("item"), col("cnt"))
  }

  /** The always-on trending form: (ts, item) stream → per-batch windowed
    * summary layers. */
  def startWindowed(
      events: DataFrame,
      tsCol: String,
      itemCol: String,
      path: String,
      checkpoint: String,
      windowDuration: String = "1 hour",
      capacity: Int = 4096,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        applyBatch(
          windowedSummary(batch.toDF(), tsCol, itemCol, windowDuration, capacity),
          path, batchId)
      }
      .start()
}
