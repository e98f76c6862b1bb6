package graft.sources.delta

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Protocol version/feature gating (PROTOCOL.md): tables using deletion
  * vectors or column mapping advertise the reader/writer versions and
  * feature lists those demand, and THIS engine's reader refuses tables
  * demanding versions or features it does not implement — the
  * cross-engine contract that makes a down-level reader fail loudly
  * instead of silently misreading (e.g. resurrecting DV-deleted rows). */
class ProtocolSpec extends SparkSpec {

  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("delta_proto").toString + "/t"

  test("fresh tables stay at (1, 2); first DV upgrades to (3, 7) + feature") {
    val t = tmp()
    DeltaTable.write((1 to 10).map(i => (i, s"s$i")).toDF("id", "s").coalesce(1),
      t, SaveMode.Append)
    val s0 = DeltaLog.snapshot(spark, t)
    assert((s0.minReaderVersion, s0.minWriterVersion) === (1, 2))
    assert(s0.readerFeatures.isEmpty)
    DeltaTable.setProperties(spark, t,
      Map("delta.enableDeletionVectors" -> "true"))
    DeltaTable.delete(spark, t, col("id") <= 3)
    val s1 = DeltaLog.snapshot(spark, t)
    assert((s1.minReaderVersion, s1.minWriterVersion) === (3, 7))
    assert(s1.readerFeatures === Set("deletionVectors"))
    // a second DV delete does not re-emit the protocol action
    DeltaTable.delete(spark, t, col("id") === 4)
    val c = DeltaLog.readCommit(spark, t, DeltaLog.snapshot(spark, t).version)
    assert(c.protocol.isEmpty, "already-upgraded table must not re-upgrade")
  }

  test("column mapping upgrades to (2, 5); DV on a mapped table lists both") {
    val t = tmp()
    DeltaTable.write((1 to 5).map(i => (i, s"s$i")).toDF("id", "s").coalesce(1),
      t, SaveMode.Append)
    DeltaTable.renameColumn(spark, t, "s", "txt")
    val s0 = DeltaLog.snapshot(spark, t)
    assert((s0.minReaderVersion, s0.minWriterVersion) === (2, 5))
    DeltaTable.setProperties(spark, t,
      Map("delta.enableDeletionVectors" -> "true"))
    DeltaTable.delete(spark, t, col("id") <= 2)
    val s1 = DeltaLog.snapshot(spark, t)
    assert((s1.minReaderVersion, s1.minWriterVersion) === (3, 7))
    assert(s1.readerFeatures === Set("deletionVectors", "columnMapping"),
      "reader 3 must list every active feature")
    assert(DeltaTable.read(spark, t).count() === 3L)
  }

  test("protocol survives checkpoints") {
    val t = tmp()
    DeltaTable.write((1 to 10).map(i => (i, s"s$i")).toDF("id", "s").coalesce(1),
      t, SaveMode.Append)
    DeltaTable.setProperties(spark, t,
      Map("delta.enableDeletionVectors" -> "true"))
    DeltaTable.delete(spark, t, col("id") <= 3)
    DeltaLog.checkpoint(spark, t)
    val s = DeltaLog.snapshot(spark, t)
    assert((s.minReaderVersion, s.minWriterVersion) === (3, 7))
    assert(s.readerFeatures === Set("deletionVectors"))
    assert(DeltaTable.read(spark, t).count() === 7L)
  }

  test("the distributed (pruned) replay gates the protocol too") {
    val t = tmp()
    DeltaTable.write((1 to 5).map(i => (i, s"s$i")).toDF("id", "s"),
      t, SaveMode.Append)
    DeltaLog.checkpoint(spark, t)
    val head = DeltaLog.snapshot(spark, t)
    assert(DeltaLog.commit(spark, t, head.version + 1, Seq(
      DeltaLog.protocolAction(4, 7, Set.empty, Set.empty))))
    val e = intercept[Exception] {
      DeltaLog.prunedSnapshot(spark, t, Map.empty)
    }
    assert(e.getMessage.contains("requires reader protocol 4"), e.getMessage)
  }

  test("tables demanding unimplemented versions or features refuse to read") {
    val t = tmp()
    DeltaTable.write(Seq((1, "a")).toDF("id", "s"), t, SaveMode.Append)
    val head = DeltaLog.snapshot(spark, t)
    // a foreign writer demands reader 4
    assert(DeltaLog.commit(spark, t, head.version + 1, Seq(
      DeltaLog.protocolAction(4, 7, Set.empty, Set.empty))))
    val e1 = intercept[Exception] { DeltaLog.snapshot(spark, t) }
    assert(e1.getMessage.contains("requires reader protocol 4"), e1.getMessage)
    // roll forward to a version-3 table with an unknown feature
    assert(DeltaLog.commit(spark, t, head.version + 2, Seq(
      DeltaLog.protocolAction(3, 7, Set("v2Checkpoint"), Set.empty))))
    val e2 = intercept[Exception] { DeltaLog.snapshot(spark, t) }
    assert(e2.getMessage.contains("v2Checkpoint"), e2.getMessage)
  }

  test("unknown writer features refuse WRITES but keep reads working") {
    val t = tmp()
    DeltaTable.write(Seq((1, "a"), (2, "b")).toDF("id", "s"), t, SaveMode.Append)
    val head = DeltaLog.snapshot(spark, t)
    // a foreign writer demands a writer feature this engine does not
    // maintain — readable (reader demands are fine), not writable
    assert(DeltaLog.commit(spark, t, head.version + 1, Seq(
      DeltaLog.protocolAction(1, 7, Set.empty, Set("rowTracking")))))
    assert(DeltaTable.read(spark, t).count() === 2L, "reads keep working")
    val e = intercept[Exception] {
      DeltaTable.write(Seq((3, "c")).toDF("id", "s"), t, SaveMode.Append)
    }
    assert(e.getMessage.contains("rowTracking"), e.getMessage)
    val e2 = intercept[Exception] {
      DeltaTable.delete(spark, t, col("id") === 1)
    }
    assert(e2.getMessage.contains("rowTracking"), e2.getMessage)
  }

  test("writer-7 upgrades list active legacy features in writerFeatures only") {
    val t = tmp()
    DeltaTable.write((1 to 10).map(i => (i, s"s$i")).toDF("id", "s").coalesce(1),
      t, SaveMode.Append)
    DeltaTable.setProperties(spark, t, Map(
      "delta.enableDeletionVectors" -> "true",
      "delta.enableChangeDataFeed" -> "true"))
    DeltaTable.addConstraint(spark, t, "pos_id", "id > 0")
    DeltaTable.delete(spark, t, col("id") <= 3)
    val s = DeltaLog.snapshot(spark, t)
    assert(s.readerFeatures === Set("deletionVectors"),
      "writer-only names must never enter readerFeatures")
    assert(Set("deletionVectors", "changeDataFeed", "checkConstraints")
      .subsetOf(s.writerFeatures), s"got ${s.writerFeatures}")
    // checkpoints round-trip BOTH lists
    DeltaLog.checkpoint(spark, t)
    val s2 = DeltaLog.snapshot(spark, t)
    assert(s2.readerFeatures === s.readerFeatures)
    assert(s2.writerFeatures === s.writerFeatures)
  }
}
