package graft.apps

import org.apache.spark.sql.SparkSession

import graft.domain.{Fixtures, Ops}
import graft.sources.IO

/** Entry-point mains mirroring the reference's three pipelines (SURVEY §3).
  * Each is a thin wiring of the library ops — the logic lives in
  * graft.domain / graft.streaming. */
object BatchJoinJob {
  /** §3.2 batch join job (`read_delta.py:234-294`): sources → aggregate →
    * joins → overwrite `final`. Args: outDir [employeesPath validationsPath
    * activitiesPath] — with no paths, runs on the deterministic fixtures. */
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_final")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (emp, vals, acts) = args.toSeq match {
      case Seq(_, e, v, a) =>
        (IO.readTable(spark, e), IO.readTable(spark, v), IO.readTable(spark, a))
      case Seq(_) | Seq() =>
        val e = Fixtures.employees(spark)
        (e, Ops.validateCommutes(e), Fixtures.activities(spark))
      case other =>
        sys.error(s"usage: BatchJoinJob [outDir [employees validations activities]]; got ${other.size} args")
    }
    val finalDf = Ops.buildFinal(emp, vals, acts)
    IO.writeTable(finalDf, s"$outDir/final")
    IO.writeTable(Ops.benefitReport(finalDf), s"$outDir/benefit_report")
    println(s"[batch-join] wrote ${finalDf.count()} rows to $outDir/final")
    spark.stop()
  }
}

/** §3.1 CDC ingest main — wire a Kafka (or fixture-file) source into the
  * checkpointed streaming pipeline. Args: sourceKind(kafka|fixture)
  * sinkPath checkpointPath [bootstrapServers]. */
object CdcIngestJob {
  def main(args: Array[String]): Unit = {
    if (args.length < 3 || (args(0) == "kafka" && args.length < 4))
      sys.error("usage: CdcIngestJob <kafka|fixture> <sinkPath> <checkpointPath> [bootstrapServers]")
    val Array(kind, sink, checkpoint) = args.take(3)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val source = kind match {
      case "kafka" =>
        graft.streaming.CdcIngest.kafkaSource(spark, args(3))
      case _ =>
        // fixture mode: re-serve the deterministic envelopes via a file
        // stream so the full checkpointed path runs without Kafka
        val dir = java.nio.file.Files.createTempDirectory("cdc_fixture").toString
        Fixtures.cdcEnvelopes(spark).write.mode("overwrite").text(dir)
        spark.readStream.schema("value STRING").text(dir)
    }
    // fixture mode drains what's there and exits; kafka mode runs forever
    val trigger =
      if (kind == "kafka") org.apache.spark.sql.streaming.Trigger.ProcessingTime("30 seconds")
      else org.apache.spark.sql.streaming.Trigger.AvailableNow()
    val q = graft.streaming.CdcIngest.startIngest(source, sink, checkpoint, trigger = trigger)
    q.awaitTermination()
    println(s"[cdc-ingest] sink rows: " + spark.read.parquet(sink).count())
    spark.stop()
  }
}
