package graft.streaming

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.domain.Ops

/** The reference's always-on CDC ingest pipeline (SURVEY §3.1), source- and
  * sink-agnostic: Kafka in production, MemoryStream/rate in tests — the
  * transform in the middle is identical (`Ops.decodeCdc`).
  *
  * Reference behavior preserved (SURVEY §2.8): append output mode, 30 s
  * processing-time trigger, checkpointed exactly-once sink, no watermark
  * (stateless map/filter pipeline).
  */
object CdcIngest {

  /** Kafka source identical to ref `SaveDelta.scala:104-112`. */
  def kafkaSource(
      spark: SparkSession,
      bootstrap: String,
      topic: String = "sport.sport_advantages.sport_activities"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("failOnDataLoss", "false")
      .option("kafka.group.id", "spark-delta-lake-group")
      .load()

  /** Rate-source fallback (ref `SaveDelta.scala:123-127`) — wraps the rate
    * stream into an empty-envelope value column for harness testing. */
  def rateSource(spark: SparkSession): DataFrame =
    spark.readStream.format("rate").option("rowsPerSecond", "1").load()
      .select(to_json(struct(col("value").as("id"))).as("value"))

  /** The transform: raw (key,value) stream → typed activity rows. */
  def pipeline(raw: DataFrame): DataFrame = Ops.decodeCdc(raw)

  /** Pipeline + streaming dedup on the CDC primary key: replays / at-least-
    * once upstream deliveries collapse to one row per id. State is bounded
    * by the watermark (ids older than the horizon are evicted — SURVEY
    * §2.8 extension; the reference appends duplicates unconditionally). */
  def dedupedPipeline(raw: DataFrame, watermark: String = "1 day"): DataFrame =
    pipeline(raw)
      .withWatermark("start_datetime", watermark)
      .dropDuplicatesWithinWatermark("id")

  /** K1 (ref `SaveDelta.scala:157-163`): append sink with checkpoint +
    * 30 s trigger. Delta jars are absent in this environment, so the
    * default format is parquet — swap `format` for "delta" on a cluster
    * with delta-spark on the classpath; the API surface is identical. */
  def startIngest(
      raw: DataFrame,
      path: String,
      checkpoint: String,
      format: String = "parquet",
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    pipeline(raw).writeStream
      .format(format)
      .outputMode("append")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** K5 notifier port (ref `slack_notification.py:37-132`): per-batch
    * filter of commented activities, delivered to an injected (mockable)
    * callback instead of a hard-wired Slack webhook. */
  def startNotifier(
      raw: DataFrame,
      notify: Seq[Row] => Unit,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    pipeline(raw)
      .filter(col("comment").isNotNull)
      .writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val rows = batch.collect().toSeq
        if (rows.nonEmpty) notify(rows)
      }
      .start()

  /** A4 (ref `SaveDelta.scala:171-203`): streaming throughput metrics via
    * a StreamingQueryListener instead of the reference's driver-side
    * polling loop. Returns the listener for inspection/removal. */
  def attachMetricsListener(spark: SparkSession): IngestMetricsListener = {
    val l = new IngestMetricsListener
    spark.streams.addListener(l)
    l
  }
}

/** Accumulates rows/batch and rows/sec from query progress events. */
class IngestMetricsListener
    extends org.apache.spark.sql.streaming.StreamingQueryListener {
  @volatile var totalInputRows: Long = 0L
  @volatile var lastInputRowsPerSecond: Double = 0.0
  @volatile var lastProcessedRowsPerSecond: Double = 0.0
  @volatile var batches: Long = 0L

  override def onQueryStarted(
      e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryProgress(
      e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
    totalInputRows += e.progress.numInputRows
    lastInputRowsPerSecond = e.progress.inputRowsPerSecond
    lastProcessedRowsPerSecond = e.progress.processedRowsPerSecond
    batches += 1
  }
  override def onQueryTerminated(
      e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}
