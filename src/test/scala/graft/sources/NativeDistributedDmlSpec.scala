package graft.sources.delta

import graft.SparkSpec

/** Native (extension-less) SQL DML on tables past the distributed-replay
  * threshold (round 14): the row-level operation pins a METADATA-ONLY
  * head, its scan plans AS OF that version through the distributed
  * checkpoint replay (time travel now rides [[DeltaLog.prunedSnapshot]]
  * — round 13 refused it), and the commit looks up only the TOUCHED
  * files through [[DeltaTable.selectCandidates]]'s checkpoint-frame
  * path. Round 13 refused this whole flow at the scan; decision parity
  * of the shared candidate machinery is pinned in
  * [[DistributedDmlSpec]]. */
class NativeDistributedDmlSpec extends SparkSpec {

  private def bareSession(): org.apache.spark.sql.classic.SparkSession = {
    val s = org.apache.spark.sql.graft.ColumnBridge
      .bareSession(spark.sparkContext)
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s
  }

  private def newCatalog(s: org.apache.spark.sql.SparkSession,
                         name: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_wh_$name").toString
    Seq(spark, s).foreach { ss =>
      ss.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
      ss.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    }
    s.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.db")
    wh
  }

  test("bare-session SQL DELETE/UPDATE/MERGE run distributed past the threshold") {
    val s = bareSession()
    val wh = newCatalog(s, "ndd1")
    val path = s"$wh/db/t"
    spark.sql("CREATE TABLE ndd1.db.t (id BIGINT, k BIGINT, s STRING) " +
      "PARTITIONED BY (k)")
    spark.sql("INSERT INTO ndd1.db.t " +
      "SELECT id, id % 8, concat('v', id) FROM range(0, 400)")
    DeltaLog.checkpoint(spark, path)
    // tail commit past the checkpoint: candidates must fold it in
    spark.sql("INSERT INTO ndd1.db.t VALUES (400, 0, 'v400')")
    val files = DeltaLog.snapshot(spark, path).files.size.toLong
    // checkpoint rows (adds + protocol + metaData) exceed the threshold,
    // so every statement below routes: metadata-only pin, distributed
    // as-of scan, checkpoint-frame touched lookup. Candidates <= files
    // keeps the cap out of the way.
    s.conf.set("spark.graft.delta.distributedReplayThreshold",
      files.toString)
    try {
      s.sql("DELETE FROM ndd1.db.t WHERE k = 3")
      assert(s.sql("SELECT count(*) FROM ndd1.db.t WHERE k = 3")
        .head().getLong(0) === 0L)
      assert(s.sql("SELECT count(*) FROM ndd1.db.t").head().getLong(0)
        === 401L - 50L)

      s.sql("UPDATE ndd1.db.t SET s = concat(s, '!') WHERE id % 10 = 4")
      val upd = s.sql("SELECT id, s FROM ndd1.db.t WHERE id % 10 = 4")
        .collect()
      assert(upd.nonEmpty)
      upd.foreach(r => assert(r.getString(1) === s"v${r.getLong(0)}!"))

      s.sql("""MERGE INTO ndd1.db.t t
               USING (SELECT 8L AS id, 0L AS k, 'merged8' AS s
                      UNION ALL SELECT 9999L, 1L, 'new9999') src
               ON t.id = src.id
               WHEN MATCHED THEN UPDATE SET s = src.s
               WHEN NOT MATCHED THEN INSERT (id, k, s)
                 VALUES (src.id, src.k, src.s)""")
      assert(s.sql("SELECT s FROM ndd1.db.t WHERE id = 8").head().getString(0)
        === "merged8")
      assert(s.sql("SELECT k FROM ndd1.db.t WHERE id = 9999").head().getLong(0)
        === 1L)
      assert(s.sql("SELECT count(*) FROM ndd1.db.t").head().getLong(0)
        === 401L - 50L + 1L)
      // the tail row survived every statement
      assert(s.sql("SELECT s FROM ndd1.db.t WHERE id = 400").head().getString(0)
        === "v400")
    } finally
      s.conf.unset("spark.graft.delta.distributedReplayThreshold")
    // full-history audit from the EXTENSIONS session (its own threshold
    // default is untouched): contents reconstruct exactly
    val all = spark.sql("SELECT id FROM ndd1.db.t").collect()
      .map(_.getLong(0)).toSet
    val expect = (0L until 401L).filter(_ % 8 != 3).toSet + 9999L
    assert(all === expect)
  }

  test("distributed DML on a DV table marks rows instead of rewriting, past the threshold") {
    val s = bareSession()
    val wh = newCatalog(s, "ndd2")
    val path = s"$wh/db/t"
    spark.sql("CREATE TABLE ndd2.db.t (id BIGINT, s STRING) " +
      "TBLPROPERTIES ('delta.enableDeletionVectors' = 'true')")
    spark.sql("INSERT INTO ndd2.db.t " +
      "SELECT id, concat('v', id) FROM range(0, 300)")
    DeltaLog.checkpoint(spark, path)
    spark.sql("INSERT INTO ndd2.db.t VALUES (300, 'v300')")
    val files = DeltaLog.snapshot(spark, path).files.size.toLong
    s.conf.set("spark.graft.delta.distributedReplayThreshold",
      files.toString)
    try {
      val before = DeltaLog.snapshot(spark, path).files.map(_.path).toSet
      s.sql("DELETE FROM ndd2.db.t WHERE id % 3 = 0")
      val after = DeltaLog.snapshot(spark, path)
      // straddled files mark IN PLACE (no new paths); the tail file
      // (only id=300, a multiple of 3) is FULLY covered and drops
      // wholesale — the full-cover shape, not a rewrite
      assert(after.files.map(_.path).toSet.subsetOf(before),
        "DV DELETE must mark in place, never stage replacement files")
      assert(after.files.exists(_.dv.exists(_.cardinality > 0)),
        "straddled files must carry vectors")
      assert(s.sql("SELECT count(*) FROM ndd2.db.t").head().getLong(0)
        === (0L to 300L).count(_ % 3 != 0).toLong)
    } finally
      s.conf.unset("spark.graft.delta.distributedReplayThreshold")
  }
}
