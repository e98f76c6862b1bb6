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

  test("auto-checkpoint fires every Nth commit; property coarsens; conf disables") {
    val dir = java.nio.file.Files.createTempDirectory("graft_acp").toString
    val t = s"$dir/t"
    spark.conf.set("spark.graft.delta.checkpointInterval", "4")
    try {
      (0 until 4).foreach(i =>
        DeltaTable.write(Seq(i.toLong).toDF("id"), t, SaveMode.Append))
      // commits v0..v3: the 4th commit (v3) is not a multiple — no
      // checkpoint yet; v4 lands one from the WRITE path itself
      assert(DeltaLog.lastCheckpointVersion(spark, t).isEmpty)
      DeltaTable.write(Seq(4L).toDF("id"), t, SaveMode.Append) // v4
      assert(DeltaLog.lastCheckpointVersion(spark, t).contains(4L),
        "the interval commit must auto-checkpoint")
      // the table property coarsens the cadence: v8 skips (8 % 16 != 0)
      DeltaTable.setProperties(spark, t,
        Map("delta.checkpointInterval" -> "16")) // v5
      (6 to 9).foreach(i =>
        DeltaTable.write(Seq(i.toLong).toDF("id"), t, SaveMode.Append))
      assert(DeltaLog.lastCheckpointVersion(spark, t).contains(4L),
        "a coarser table interval must suppress the session cadence")
      assert(DeltaTable.read(spark, t).count() === 9L)
    } finally spark.conf.unset("spark.graft.delta.checkpointInterval")
    // conf 0 disables entirely
    val t2 = s"$dir/t2"
    spark.conf.set("spark.graft.delta.checkpointInterval", "0")
    try {
      (0 until 12).foreach(i =>
        DeltaTable.write(Seq(i.toLong).toDF("id"), t2, SaveMode.Append))
      assert(DeltaLog.lastCheckpointVersion(spark, t2).isEmpty)
    } finally spark.conf.unset("spark.graft.delta.checkpointInterval")
  }

  test("table checkpointInterval property directly governs cadence (finer and non-multiple)") {
    // upstream semantics: the table property, when present, IS the
    // cadence — not an lcm with the session default (round-14 fix; the
    // property used to be consulted only on session-interval boundaries)
    val dir = java.nio.file.Files.createTempDirectory("graft_acp2").toString
    spark.conf.set("spark.graft.delta.checkpointInterval", "4")
    try {
      // FINER than the session default: property 2 fires at v2, where
      // the session cadence alone would wait for v4
      val t = s"$dir/fine"
      DeltaTable.write(Seq(0L).toDF("id"), t, SaveMode.Append) // v0
      DeltaTable.setProperties(spark, t,
        Map("delta.checkpointInterval" -> "2")) // v1
      DeltaTable.write(Seq(1L).toDF("id"), t, SaveMode.Append) // v2
      assert(DeltaLog.lastCheckpointVersion(spark, t).contains(2L),
        "a finer table interval must fire at its own cadence")
      // NON-MULTIPLE of the session default: property 3 fires at v3
      // (the old lcm effect would have postponed to v12)
      val t2 = s"$dir/coarse"
      DeltaTable.write(Seq(0L).toDF("id"), t2, SaveMode.Append) // v0
      DeltaTable.setProperties(spark, t2,
        Map("delta.checkpointInterval" -> "3")) // v1
      DeltaTable.write(Seq(1L).toDF("id"), t2, SaveMode.Append) // v2
      assert(DeltaLog.lastCheckpointVersion(spark, t2).isEmpty)
      DeltaTable.write(Seq(2L).toDF("id"), t2, SaveMode.Append) // v3
      assert(DeltaLog.lastCheckpointVersion(spark, t2).contains(3L),
        "a non-multiple table interval must not degrade to the lcm")
      // property 0 disables the table even with the session cadence on
      val t3 = s"$dir/off"
      DeltaTable.write(Seq(0L).toDF("id"), t3, SaveMode.Append) // v0
      DeltaTable.setProperties(spark, t3,
        Map("delta.checkpointInterval" -> "0")) // v1
      (2 to 8).foreach(i =>
        DeltaTable.write(Seq(i.toLong).toDF("id"), t3, SaveMode.Append))
      assert(DeltaLog.lastCheckpointVersion(spark, t3).isEmpty,
        "property 0 must disable auto-checkpointing for the table")
    } finally spark.conf.unset("spark.graft.delta.checkpointInterval")
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
