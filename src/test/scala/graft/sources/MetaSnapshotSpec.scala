package graft.sources.delta

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.SparkSpec

/** [[DeltaLog.metaSnapshot]] — the metadata-only head APPEND-shaped
  * commits read (round 13: removes the last routine O(#files) driver
  * replay from the write path). Pinned: field-identity with the full
  * [[DeltaLog.snapshot]] on every non-file field, across plain logs,
  * checkpointed logs with tails, feature-bearing (DV) tables, and
  * cleaned histories; and the append paths actually ride it (the
  * existing write/sink suites exercise the route on every append). */
class MetaSnapshotSpec extends SparkSpec {

  import spark.implicits._

  private def metaFields(s: DeltaLog.Snapshot) = (
    s.version, s.schemaJson, s.txns, s.partitionColumns, s.metaDataId,
    s.configuration, s.minReaderVersion, s.minWriterVersion,
    s.readerFeatures, s.writerFeatures)

  private def assertParity(t: String): Unit = {
    val full = DeltaLog.snapshot(spark, t)
    val meta = DeltaLog.metaSnapshot(spark, t)
    assert(metaFields(meta) === metaFields(full))
    assert(meta.files.isEmpty && meta.tombstones.isEmpty)
  }

  test("metaSnapshot equals snapshot on every non-file field") {
    val t = java.nio.file.Files.createTempDirectory("graft_ms1").toString + "/t"
    // plain JSON log
    DeltaTable.write((0L until 100L).toDF("id")
      .withColumn("k", pmod(col("id"), lit(4L))), t, SaveMode.Append,
      partitionBy = Seq("k"))
    assertParity(t)
    // txn marks + configuration + protocol features (DV bump) + a DV
    // delete + checkpoint + tail commits
    DeltaTable.appendWithTxn((100L until 120L).toDF("id")
      .withColumn("k", pmod(col("id"), lit(4L))), t, "app-x", 3L)
    DeltaTable.setProperties(spark, t,
      Map("delta.enableDeletionVectors" -> "true",
        "delta.enableChangeDataFeed" -> "true"))
    DeltaTable.delete(spark, t, pmod(col("id"), lit(7L)) === 1)
    assertParity(t)
    DeltaLog.checkpoint(spark, t)
    assertParity(t) // checkpoint-seeded, empty tail
    DeltaTable.appendWithTxn((120L until 140L).toDF("id")
      .withColumn("k", pmod(col("id"), lit(4L))), t, "app-x", 5L)
    DeltaTable.setProperties(spark, t, Map("graft.custom" -> "v"))
    assertParity(t) // checkpoint + tail with metadata/txn overrides
    // cleaned history: reconstruct from the checkpoint alone
    DeltaLog.checkpoint(spark, t)
    DeltaLog.cleanLog(spark, t, retainMs = 0L)
    assertParity(t)
    // and appends keep working on the metadata-only route (the write
    // path reads metaSnapshot for mode=Append)
    DeltaTable.appendWithTxn((140L until 150L).toDF("id")
      .withColumn("k", pmod(col("id"), lit(4L))), t, "app-x", 7L)
    assert(DeltaLog.snapshot(spark, t).txns("app-x") === 7L)
    assertParity(t)
  }

  test("metaSnapshot refuses the same partial states snapshot refuses") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ms2").toString
    val t = s"$dir/t"
    DeltaTable.write(Seq(1L).toDF("id"), t, SaveMode.Append) // v0
    DeltaTable.write(Seq(2L).toDF("id"), t, SaveMode.Append) // v1
    DeltaTable.write(Seq(3L).toDF("id"), t, SaveMode.Append) // v2
    // simulate a partial clean: v0 gone, no covering checkpoint
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(DeltaLog.logFile(new org.apache.hadoop.fs.Path(t), 0L), false)
    val e1 = intercept[IllegalArgumentException] {
      DeltaLog.metaSnapshot(spark, t)
    }
    assert(e1.getMessage.contains("no covering checkpoint"))
    val e2 = intercept[IllegalArgumentException] { DeltaLog.snapshot(spark, t) }
    assert(e2.getMessage.contains("no covering checkpoint"))
  }
}
