package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.domain.Fixtures

class CdcIngestSpec extends SparkSpec {

  private def envelopeStrings: Seq[String] =
    Fixtures.cdcEnvelopes(spark, nEmployees = 5, days = 20)
      .collect().map(_.getString(0)).toSeq

  test("streaming ingest: MemoryStream envelopes → decoded rows in memory sink") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[String]
    val data = envelopeStrings
    source.addData(data: _*)
    val q = CdcIngest.pipeline(source.toDF().withColumnRenamed("value", "value"))
      .writeStream.format("memory").queryName("cdc_sink")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.table("cdc_sink")
    val goodCount = data.size - 3 // fixtures append 3 malformed rows
    assert(out.count() === goodCount)
    assert(out.filter(col("id").isNull).count() === 0)
  }

  test("streaming ingest: parquet sink with checkpoint, restart-safe replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc_ingest").toString
    val source = MemoryStream[String]
    source.addData(envelopeStrings: _*)
    val q = CdcIngest.startIngest(
      source.toDF(), s"$dir/data", s"$dir/chk", trigger = Trigger.AvailableNow())
    q.awaitTermination(60000)
    val n1 = spark.read.parquet(s"$dir/data").count()
    assert(n1 === envelopeStrings.size - 3)
    // restart against the same checkpoint: the replayed batch is already in
    // the file-sink commit log, so exactly-once holds — no duplicates
    val source2 = MemoryStream[String]
    source2.addData(envelopeStrings: _*)
    val q2 = CdcIngest.startIngest(
      source2.toDF(), s"$dir/data", s"$dir/chk", trigger = Trigger.AvailableNow())
    q2.awaitTermination(60000)
    val n2 = spark.read.parquet(s"$dir/data").count()
    assert(n2 === n1)
  }

  test("notifier: only commented activities delivered to the callback") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val delivered = scala.collection.mutable.ArrayBuffer.empty[Row]
    val source = MemoryStream[String]
    source.addData(envelopeStrings: _*)
    val q = CdcIngest.startNotifier(
      source.toDF(),
      rows => delivered.synchronized { delivered ++= rows },
      trigger = Trigger.AvailableNow())
    q.awaitTermination(60000)
    val expected = graft.domain.Ops.decodeCdc(
      Fixtures.cdcEnvelopes(spark, 5, 20))
      .filter(col("comment").isNotNull).count()
    assert(delivered.size.toLong === expected)
    assert(delivered.forall(r => !r.isNullAt(r.fieldIndex("comment"))))
  }

  test("deduped pipeline: duplicated envelope delivery collapses to one row per id") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val data = envelopeStrings
    val source = MemoryStream[String]
    source.addData(data ++ data: _*) // simulate at-least-once double delivery
    val q = CdcIngest.dedupedPipeline(source.toDF())
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.table("dedup_sink")
    assert(out.count() === (data.size - 3).toLong) // unique ids only
    assert(out.groupBy(col("id")).count().filter(col("count") > 1).count() === 0)
  }

  test("metrics listener accumulates progress") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val listener = CdcIngest.attachMetricsListener(spark)
    try {
      val source = MemoryStream[String]
      source.addData(envelopeStrings: _*)
      val q = CdcIngest.pipeline(source.toDF())
        .writeStream.format("noop").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      // listener events are async; allow a grace period
      val deadline = System.currentTimeMillis() + 10000
      while (listener.totalInputRows == 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(listener.totalInputRows === envelopeStrings.size.toLong)
      assert(listener.batches >= 1)
      // A5 reconciliation (ref SaveDelta.scala:208-220): source rows minus
      // the malformed drops must equal what a sink would commit
      val sinkRows = graft.domain.Ops.decodeCdc(
        graft.domain.Fixtures.cdcEnvelopes(spark, 5, 20)).count()
      assert(listener.totalInputRows - 3 === sinkRows)
    } finally spark.streams.removeListener(listener)
  }
}
