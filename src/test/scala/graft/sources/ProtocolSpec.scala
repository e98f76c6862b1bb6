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

  test("creations and property enables declare PROTOCOL.md's capability floors") {
    import org.apache.spark.sql.types._
    // identity column at CREATE -> legacy writer 6 (a (1,2) identity
    // table would let a by-the-book foreign writer skip the
    // high-water-mark invariant — round-15 review find)
    val warehouse = java.nio.file.Files.createTempDirectory("protocat").toString
    spark.conf.set("spark.sql.catalog.protog", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.protog.warehouse", warehouse)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS protog.db")
      spark.sql("""CREATE TABLE protog.db.ident (
                     id BIGINT GENERATED ALWAYS AS IDENTITY, s STRING)""")
      val hI = DeltaLog.snapshot(spark, s"$warehouse/db/ident")
      assert((hI.minReaderVersion, hI.minWriterVersion) === ((1, 6)))
      // generated column -> writer 4
      spark.sql("""CREATE TABLE protog.db.gen (
                     id BIGINT, d BIGINT GENERATED ALWAYS AS (id * 2))""")
      val hG = DeltaLog.snapshot(spark, s"$warehouse/db/gen")
      assert(hG.minWriterVersion === 4)
      // column DEFAULT -> table-features only: writer 7 + the feature
      spark.sql("""CREATE TABLE protog.db.dflt (
                     id BIGINT, s STRING DEFAULT 'x')""")
      val hD = DeltaLog.snapshot(spark, s"$warehouse/db/dflt")
      assert(hD.minWriterVersion === 7)
      assert(hD.writerFeatures.contains("allowColumnDefaults"))
      // plain tables STAY at (1, 2)
      spark.sql("CREATE TABLE protog.db.plain (id BIGINT, s STRING)")
      val hP = DeltaLog.snapshot(spark, s"$warehouse/db/plain")
      assert((hP.minReaderVersion, hP.minWriterVersion) === ((1, 2)))
    } finally {
      Seq("ident", "gen", "dflt", "plain")
        .foreach(n => spark.sql(s"DROP TABLE IF EXISTS protog.db.$n"))
      spark.conf.unset("spark.sql.catalog.protog")
      spark.conf.unset("spark.sql.catalog.protog.warehouse")
    }
    // property enables floor the writer version on existing tables
    val t = tmp()
    DeltaTable.write(Seq((1, "a")).toDF("id", "s"), t, SaveMode.Append)
    DeltaTable.setProperties(spark, t,
      Map("delta.constraints.pos" -> "id > 0"))
    assert(DeltaLog.snapshot(spark, t).minWriterVersion === 3,
      "a CHECK constraint needs writer 3")
    DeltaTable.setProperties(spark, t,
      Map("delta.enableChangeDataFeed" -> "true"))
    assert(DeltaLog.snapshot(spark, t).minWriterVersion === 4,
      "change data feed needs writer 4")
    // SET DEFAULT on an existing table lists allowColumnDefaults at 7
    DeltaTable.updateColumnDefault(spark, t, "s", Some("'y'"))
    val hAfter = DeltaLog.snapshot(spark, t)
    assert(hAfter.minWriterVersion === 7)
    assert(hAfter.writerFeatures.contains("allowColumnDefaults"))
    assert(hAfter.writerFeatures.contains("checkConstraints") &&
      hAfter.writerFeatures.contains("changeDataFeed"),
      "the 7-upgrade lists the active legacy capabilities")
    // still writable by THIS engine after every upgrade
    DeltaTable.write(Seq((2, "b")).toDF("id", "s"), t, SaveMode.Append)
    assert(DeltaTable.read(spark, t).count() === 2L)
  }

  test("a schema-changing overwrite that introduces identity floors the protocol") {
    import org.apache.spark.sql.types._
    val t = tmp()
    DeltaTable.write(Seq((1L, "a")).toDF("id", "s"), t, SaveMode.Append)
    assert(DeltaLog.snapshot(spark, t).minWriterVersion === 2)
    // overwrite with a schema whose id column carries identity metadata
    // (the shape a DF read back from an identity table carries)
    val identMeta = new MetadataBuilder()
      .putLong(GeneratedColumns.IdentityStartKey, 1L)
      .putLong(GeneratedColumns.IdentityStepKey, 1L)
      .putBoolean(GeneratedColumns.IdentityAllowExplicitKey, true)
      .build()
    // the replacing schema must actually DIFFER in names/types or the
    // overwrite keeps the old metaData (catalogString-based sameSchema)
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true, identMeta),
      StructField("s", StringType),
      StructField("extra", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(5L, "x", "y")), 1), schema)
    DeltaTable.write(df, t, SaveMode.Overwrite)
    assert(DeltaLog.snapshot(spark, t).minWriterVersion === 6,
      "the re-emitted identity schema must not outrun the protocol")
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

  test("delta.appendOnly is listed at writer 7 and ENFORCED on every remove path") {
    val t = tmp()
    DeltaTable.write((1 to 10).map(i => (i.toLong, s"s$i")).toDF("id", "s")
      .coalesce(1), t, SaveMode.Append)
    DeltaTable.setProperties(spark, t, Map("delta.appendOnly" -> "true"))
    // legacy: the bare property stays at writer 2 (implied capability)
    assert(DeltaLog.snapshot(spark, t).minWriterVersion === 2)
    // appends keep working
    DeltaTable.write(Seq((11L, "k")).toDF("id", "s"), t, SaveMode.Append)
    assert(DeltaTable.read(spark, t).count() === 11L)
    // every remove-producing path refuses with the named contract
    def refused(op: => Unit): String =
      intercept[IllegalArgumentException](op).getMessage
    assert(refused(DeltaTable.delete(spark, t, col("id") === 1L))
      .contains("append-only"))
    assert(refused(DeltaTable.update(spark, t, col("id") === 1L,
      Map("s" -> org.apache.spark.sql.functions.lit("x"))))
      .contains("append-only"))
    assert(refused(DeltaTable.write(Seq((1L, "z")).toDF("id", "s"), t,
      SaveMode.Overwrite)).contains("append-only"))
    assert(refused(DeltaTable.restore(spark, t, 0L)).contains("append-only"))
    // an upsert that REWRITES a touched file refuses; an insert-only
    // batch (no file touched) is a plain append and passes
    assert(refused(DeltaTable.merge(Seq((1L, "clash")).toDF("id", "s"),
      t, "id")).contains("append-only"))
    DeltaTable.merge(Seq((99L, "new")).toDF("id", "s"), t, "id")
    assert(DeltaTable.read(spark, t).count() === 12L)
    // nothing above committed: the table still replays clean
    assert(DeltaTable.read(spark, t).where(col("id") === 1L).count() === 1L)
    // writer-7 upgrades LIST the active capability — at 7 the list IS
    // the contract, and omitting appendOnly would tell a by-the-book
    // foreign writer it need not enforce it (round-15 advice)
    DeltaTable.setProperties(spark, t,
      Map("delta.enableInCommitTimestamps" -> "true"))
    val s7 = DeltaLog.snapshot(spark, t)
    assert(s7.minWriterVersion === 7)
    assert(s7.writerFeatures.contains("appendOnly"),
      s"writer-7 list must carry appendOnly: ${s7.writerFeatures}")
  }

  test("a no-op RESTORE passes on an append-only table; a removing one refuses (both replay paths)") {
    // round-16 advice: the RESTORE gate must fire only when the restore
    // actually PRODUCES data-changing removes — mirroring the MERGE
    // sites' touched.nonEmpty rule and upstream's dataChange-gated
    // assertRemovable — not unconditionally
    val t = tmp()
    DeltaTable.write((1 to 8).map(i => (i.toLong, s"s$i")).toDF("id", "s")
      .coalesce(1), t, SaveMode.Append)                                  // v0
    DeltaTable.setProperties(spark, t, Map("delta.appendOnly" -> "true")) // v1
    // driver path: restoring to the property commit's version changes
    // no content — zero removes, and the gate must let it through
    DeltaTable.restore(spark, t, 1L)                                      // v2
    assert(DeltaLog.snapshot(spark, t).version === 2L,
      "the no-op restore must commit (content unchanged, nothing removed)")
    assert(DeltaTable.read(spark, t).count() === 8L)
    DeltaTable.write(Seq((9L, "k")).toDF("id", "s"), t, SaveMode.Append)  // v3
    // a restore BELOW the append removes v3's file: refused, named cause
    val e = intercept[IllegalArgumentException](
      DeltaTable.restore(spark, t, 2L))
    assert(e.getMessage.contains("append-only"))
    // distributed path: same two outcomes through the streamed restore
    DeltaLog.checkpoint(spark, t)
    spark.conf.set("spark.graft.delta.distributedReplayThreshold", "0")
    try {
      DeltaTable.restore(spark, t, 3L)                                    // v4: no-op
      assert(DeltaLog.snapshot(spark, t).version === 4L,
        "the distributed no-op restore must commit")
      val e2 = intercept[IllegalArgumentException](
        DeltaTable.restore(spark, t, 2L))
      assert(e2.getMessage.contains("append-only"),
        "the distributed removing restore must refuse with the named cause")
      assert(DeltaLog.snapshot(spark, t).version === 4L,
        "the refused restore must not commit")
      assert(DeltaTable.read(spark, t).count() === 9L)
    } finally spark.conf.unset("spark.graft.delta.distributedReplayThreshold")
  }

  test("creation with defaults + appendOnly lists both; SQL row-level DML refuses") {
    val warehouse =
      java.nio.file.Files.createTempDirectory("aocat").toString
    spark.conf.set("spark.sql.catalog.graftao",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftao.warehouse", warehouse)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftao.db")
      spark.sql("""CREATE TABLE graftao.db.t
                   (id BIGINT, s STRING DEFAULT 'd')
                   TBLPROPERTIES('delta.appendOnly'='true')""")
      val t = s"$warehouse/db/t"
      val v0 = DeltaLog.snapshot(spark, t)
      assert(v0.minWriterVersion === 7)
      assert(Set("allowColumnDefaults", "appendOnly")
        .subsetOf(v0.writerFeatures), s"got ${v0.writerFeatures}")
      spark.sql("INSERT INTO graftao.db.t VALUES (1, 'a'), (2, 'b')")
      val e = intercept[Exception](
        spark.sql("DELETE FROM graftao.db.t WHERE id = 1"))
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("append-only")),
        s"SQL DELETE must hit the append-only refusal: ${messages(e)}")
      assert(spark.sql("SELECT * FROM graftao.db.t").count() === 2L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graftao.db.t")
      spark.conf.unset("spark.sql.catalog.graftao")
      spark.conf.unset("spark.sql.catalog.graftao.warehouse")
    }
  }
}
