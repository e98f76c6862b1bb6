package graft.sources.delta

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col
import org.json4s.JsonAST.{JLong, JObject, JString, JValue}

import graft.SparkSpec

/** In-commit timestamps (PROTOCOL.md "In-Commit Timestamps", writer
  * feature `inCommitTimestamp`): commit times ride IN the commit as a
  * monotonic `commitInfo.inCommitTimestamp`, so TIMESTAMP AS OF and
  * history survive log migration (mtime resets) and multi-writer clock
  * drift — the storage-lifecycle failure modes a long-lived table
  * actually hits. Enablement is a table property; the enabling commit
  * records the enablement version + timestamp and upgrades the WRITER
  * side of the protocol only (readers need no new capability). */
class InCommitTimestampSpec extends SparkSpec {

  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("ict").toString + "/t"

  private def commitOf(t: String, v: Long) =
    DeltaLog.readCommit(spark, t, v)

  private val Enable = Map("delta.enableInCommitTimestamps" -> "true")

  test("enabling lists the writer feature + enablement props; the enabling commit's ict equals them") {
    val t = tmp()
    DeltaTable.write(Seq((1L, "a")).toDF("id", "s"), t, SaveMode.Append) // v0
    DeltaTable.write(Seq((2L, "b")).toDF("id", "s"), t, SaveMode.Append) // v1
    DeltaTable.setProperties(spark, t, Enable)                           // v2
    val head = DeltaLog.snapshot(spark, t)
    assert(head.writerFeatures.contains("inCommitTimestamp"))
    assert(head.minWriterVersion === 7)
    // reader side untouched: a writer-only feature must not enter
    // readerFeatures or bump the reader version
    assert(!head.readerFeatures.contains("inCommitTimestamp"))
    val ev = head.configuration(
      "delta.inCommitTimestampEnablementVersion").toLong
    val et = head.configuration(
      "delta.inCommitTimestampEnablementTimestamp").toLong
    assert(ev === 2L)
    assert(commitOf(t, 2L).ictMs === Some(et),
      "the enabling commit's ict IS the recorded enablement timestamp")
    assert(commitOf(t, 0L).ictMs === None,
      "pre-enablement commits carry no ict")
    // post-enablement commits all carry one
    DeltaTable.write(Seq((3L, "c")).toDF("id", "s"), t, SaveMode.Append) // v3
    assert(commitOf(t, 3L).ictMs.isDefined)
  }

  test("icts are strictly monotonic; a clock-regressed wall clock cannot regress them") {
    val t = tmp()
    DeltaTable.write(Seq((1L, "a")).toDF("id", "s"), t, SaveMode.Append)
    DeltaTable.setProperties(spark, t, Enable)
    DeltaTable.write(Seq((2L, "b")).toDF("id", "s"), t, SaveMode.Append)
    DeltaTable.delete(spark, t, col("id") === 1L)
    val icts = (1L to DeltaLog.snapshot(spark, t).version)
      .map(v => commitOf(t, v).ictMs.get)
    assert(icts === icts.sorted && icts.distinct.size === icts.size,
      s"icts must be strictly increasing: $icts")
    // simulate a writer whose clock runs 10 minutes AHEAD by crafting a
    // pre-stamped commitInfo (withIct honors an existing field); the
    // next NORMAL commit's wall clock is "behind" that parent — the
    // monotonic rule must land it at parent+1, never at now
    val future = System.currentTimeMillis() + 600000L
    val head = DeltaLog.snapshot(spark, t)
    val crafted: Seq[JValue] = Seq(JObject(
      "commitInfo" -> JObject(
        "timestamp" -> (JLong(future): JValue),
        "operation" -> (JString("TEST CLOCK SKEW"): JValue),
        "inCommitTimestamp" -> (JLong(future): JValue))))
    assert(DeltaLog.commit(spark, t, head.version + 1, crafted,
      Some(head.configuration)))
    assert(commitOf(t, head.version + 1).ictMs === Some(future),
      "a pre-stamped commitInfo keeps its ict (idempotent patch)")
    DeltaTable.write(Seq((9L, "z")).toDF("id", "s"), t, SaveMode.Append)
    assert(commitOf(t, head.version + 2).ictMs === Some(future + 1L),
      "the successor of a future-stamped parent is parent+1, not now")
  }

  test("TIMESTAMP AS OF resolves by ict, independent of log-file mtimes") {
    val t = tmp()
    DeltaTable.write(Seq((1L, "a")).toDF("id", "s"), t, SaveMode.Append) // v0
    DeltaTable.setProperties(spark, t, Enable)                           // v1
    DeltaTable.write(Seq((2L, "b")).toDF("id", "s"), t, SaveMode.Append) // v2
    DeltaTable.write(Seq((3L, "c")).toDF("id", "s"), t, SaveMode.Append) // v3
    val ict2 = commitOf(t, 2L).ictMs.get
    val ict3 = commitOf(t, 3L).ictMs.get
    // migrate the log: every commit file's mtime resets (year 2000) —
    // an mtime-based resolution would now collapse the history
    new java.io.File(s"$t/_delta_log").listFiles()
      .filter(_.getName.endsWith(".json"))
      .foreach(f => assert(f.setLastModified(946684800000L)))
    assert(DeltaTable.versionAtTimestamp(spark, t, ict2) === 2L)
    assert(DeltaTable.versionAtTimestamp(spark, t, ict3) === 3L)
    assert(DeltaTable.versionAtTimestamp(spark, t, ict3 - 1) === 2L,
      "between two icts resolves to the earlier version")
    assert(DeltaTable.read(spark, t, Some(
      DeltaTable.versionAtTimestamp(spark, t, ict2)))
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    // the change feed's _commit_timestamp column carries the icts too
    val feed = DeltaTable.readChangeFeed(spark, t, 2L, Some(3L))
      .select(col("_commit_version"), col("_commit_timestamp")).distinct()
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    assert(feed(2L) === ict2 && feed(3L) === ict3)
  }

  test("CREATE TABLE ... TBLPROPERTIES(ict) enables conformantly via the enabling commit") {
    val warehouse =
      java.nio.file.Files.createTempDirectory("ictcat").toString
    spark.conf.set("spark.sql.catalog.graftict",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftict.warehouse", warehouse)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftict.db")
      spark.sql("""CREATE TABLE graftict.db.t (id BIGINT, s STRING)
                   TBLPROPERTIES('delta.enableInCommitTimestamps'='true')""")
      val t = s"$warehouse/db/t"
      val head = DeltaLog.snapshot(spark, t)
      // creation delegated enabling to its own commit (v1): the feature
      // is LISTED and the enablement props point at the enabling commit
      // — a bare v0 property would have stamped while advertising nothing
      assert(head.writerFeatures.contains("inCommitTimestamp"))
      assert(head.configuration.get(
        "delta.inCommitTimestampEnablementVersion").contains("1"))
      assert(commitOf(t, 1L).ictMs.isDefined)
      spark.sql("INSERT INTO graftict.db.t VALUES (1, 'a')")
      val icts = (1L to DeltaLog.snapshot(spark, t).version)
        .map(v => commitOf(t, v).ictMs.get)
      assert(icts === icts.sorted && icts.distinct.size === icts.size)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graftict.db.t")
      spark.conf.unset("spark.sql.catalog.graftict")
      spark.conf.unset("spark.sql.catalog.graftict.warehouse")
    }
  }

  test("the streamed commit path stamps the same way (overwrite past the threshold)") {
    val t = tmp()
    val df = (0L until 200L).toDF("id")
      .withColumn("k", org.apache.spark.sql.functions.pmod(col("id"),
        org.apache.spark.sql.functions.lit(4L)))
    DeltaTable.write(df, t, SaveMode.Append, partitionBy = Seq("k"))
    DeltaTable.setProperties(spark, t, Enable)
    DeltaLog.checkpoint(spark, t)
    val files = DeltaLog.snapshot(spark, t).files.size.toLong
    assert(DeltaLog.checkpointRows(spark, t).exists(_ > files))
    spark.conf.set("spark.graft.delta.distributedReplayThreshold",
      files.toString)
    try {
      assert(DeltaTable.chooseDistributedReplay(spark, t))
      DeltaTable.write(Seq((1L, 0L)).toDF("id", "k"), t, SaveMode.Overwrite)
    } finally
      spark.conf.unset("spark.graft.delta.distributedReplayThreshold")
    val head = DeltaLog.snapshot(spark, t)
    // v0 predates enablement; v1 (enable) came through commit(), the
    // overwrite at the head through commitStreamed — one ict line
    val icts = (1L to head.version).map(v => commitOf(t, v).ictMs.get)
    assert(icts === icts.sorted && icts.distinct.size === icts.size,
      s"streamed + byte commits share one monotonic ict line: $icts")
  }
}
