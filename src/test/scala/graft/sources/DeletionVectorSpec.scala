package graft.sources.delta

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Deletion vectors on the from-scratch Delta log: a DELETE whose
  * predicate straddles a file commits a per-file sidecar of deleted row
  * indexes instead of rewriting the file's bytes — the row-level-DML
  * cost story at 100 TB (delete 0.1% of rows without rewriting ~every
  * file). Reference anchor: the Delta feature the reference reaches
  * through its delta-core jars (PROTOCOL.md "Deletion Vectors");
  * encodings are graft-native, stated in [[DvDescriptor]]'s doc. */
class DeletionVectorSpec extends SparkSpec {

  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("delta_dv").toString + "/t"

  /** A DV-enabled table of (id, s) rows in ONE file per append. */
  private def dvTable(t: String, ranges: Range*): Unit = {
    ranges.foreach { r =>
      DeltaTable.write(r.map(i => (i, s"s$i")).toDF("id", "s").coalesce(1),
        t, SaveMode.Append)
    }
    DeltaTable.setProperties(spark, t,
      Map("delta.enableDeletionVectors" -> "true"))
  }

  private def ids(t: String): Set[Int] =
    DeltaTable.read(spark, t).select("id").collect().map(_.getInt(0)).toSet

  private def livePaths(t: String): Set[String] =
    DeltaLog.snapshot(spark, t).files.map(_.path).toSet

  // ------------------------------------------------------------ format

  test("dv wire format round-trips and unions stay sorted-distinct") {
    val a = Array(1L, 5L, 9L)
    assert(DeletionVectors.deserialize(DeletionVectors.serialize(a)).toSeq
      === a.toSeq)
    assert(DeletionVectors.union(Array(1L, 5L, 9L), Array(0L, 5L, 12L)).toSeq
      === Seq(0L, 1L, 5L, 9L, 12L))
    assert(DeletionVectors.union(Array.empty[Long], Array(3L)).toSeq === Seq(3L))
    assert(DeletionVectors.union(Array(3L), Array.empty[Long]).toSeq === Seq(3L))
  }

  // ------------------------------------------------------------ DELETE

  test("DV delete keeps the file's bytes: no rewrite, a dv add instead") {
    val t = tmp()
    dvTable(t, 1 to 10)
    val before = livePaths(t)
    DeltaTable.delete(spark, t, col("id") <= 3)
    assert(ids(t) === (4 to 10).toSet)
    // the SAME physical file survives, now carrying a deletion vector
    assert(livePaths(t) === before)
    val head = DeltaLog.snapshot(spark, t)
    val dv = head.files.head.dv
    assert(dv.exists(_.cardinality == 3L),
      s"expected a cardinality-3 deletion vector, got $dv")
    // small vector rides inline — no sidecar file for 3 indexes
    assert(dv.exists(_.storageType == "i"))
  }

  test("second delete on the same file merges vectors (probe is DV-filtered)") {
    val t = tmp()
    dvTable(t, 1 to 10)
    DeltaTable.delete(spark, t, col("id") <= 2)
    DeltaTable.delete(spark, t, col("id") <= 5)
    assert(ids(t) === (6 to 10).toSet)
    val dv = DeltaLog.snapshot(spark, t).files.head.dv
    assert(dv.exists(_.cardinality == 5L), s"merged dv, got $dv")
  }

  test("a DV covering every row removes the file instead") {
    val t = tmp()
    dvTable(t, 1 to 5, 100 to 105)
    DeltaTable.delete(spark, t, col("id") <= 3)   // DV on the low file
    DeltaTable.delete(spark, t, col("id") <= 50)  // finishes the low file
    assert(ids(t) === (100 to 105).toSet)
    val head = DeltaLog.snapshot(spark, t)
    assert(head.files.size == 1 && head.files.head.dv.isEmpty,
      "fully-deleted file must be removed outright, not carried as an all-rows DV")
  }

  test("large vectors spill to a _dv sidecar and reads stay exact") {
    val t = tmp()
    dvTable(t, 1 to 2000)
    DeltaTable.delete(spark, t, col("id") % 3 === 0) // 666 indexes > inline cap
    assert(ids(t) === (1 to 2000).filter(_ % 3 != 0).toSet)
    val dv = DeltaLog.snapshot(spark, t).files.head.dv.get
    assert(dv.storageType == "u" && dv.pathOrInlineDv.startsWith("_dv/dv-"))
    assert(dv.cardinality == (1 to 2000).count(_ % 3 == 0).toLong)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(t, dv.pathOrInlineDv)))
  }

  test("partition-predicate delete still drops whole files (no pointless DV)") {
    val t = tmp()
    (0 to 1).foreach { p =>
      DeltaTable.write((1 to 5).map(i => (i, p)).toDF("id", "p").coalesce(1),
        t, SaveMode.Append, partitionBy = Seq("p"))
    }
    DeltaTable.setProperties(spark, t,
      Map("delta.enableDeletionVectors" -> "true"))
    DeltaTable.delete(spark, t, col("p") === 1)
    val head = DeltaLog.snapshot(spark, t)
    assert(head.files.forall(_.dv.isEmpty), "metadata-only delete, no DVs")
    assert(DeltaTable.read(spark, t).count() == 5L)
  }

  test("DV delete on a partitioned table filters inside the straddled partition") {
    val t = tmp()
    (0 to 1).foreach { p =>
      DeltaTable.write((1 to 6).map(i => (i, p)).toDF("id", "p").coalesce(1),
        t, SaveMode.Append, partitionBy = Seq("p"))
    }
    DeltaTable.setProperties(spark, t,
      Map("delta.enableDeletionVectors" -> "true"))
    val before = livePaths(t)
    DeltaTable.delete(spark, t, col("p") === 1 && col("id") <= 2)
    assert(livePaths(t) === before)
    val got = DeltaTable.read(spark, t).select("id", "p").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got === ((1 to 6).map((_, 0)) ++ (3 to 6).map((_, 1))).toSet)
  }

  // ----------------------------------------------- UPDATE & maintenance

  test("UPDATE stages only post-images; old rows go behind the vector") {
    val t = tmp()
    dvTable(t, 1 to 10)
    DeltaTable.delete(spark, t, col("id") <= 2)
    val before = livePaths(t)
    DeltaTable.update(spark, t, col("id") === 9,
      Map("s" -> org.apache.spark.sql.functions.lit("updated")))
    val head = DeltaLog.snapshot(spark, t)
    // the original file survives with its vector EXTENDED (2 deleted +
    // 1 updated-away); one new file holds the single post-image row
    assert(before.subsetOf(head.files.map(_.path).toSet))
    assert(head.files.exists(_.dv.exists(_.cardinality == 3L)),
      s"expected merged dv of 3, got ${head.files.flatMap(_.dv)}")
    val newFiles = head.files.filterNot(f => before(f.path))
    assert(newFiles.size == 1 &&
      newFiles.head.stats.exists(_.numRecords == 1L),
      "UPDATE must stage exactly the post-image rows")
    val got = DeltaTable.read(spark, t).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got === (3 to 10).map(i => (i, if (i == 9) "updated" else s"s$i")).toSet)
    // a full-cover UPDATE retires the file outright
    DeltaTable.update(spark, t, col("id") >= 0,
      Map("s" -> org.apache.spark.sql.functions.lit("all")))
    val after = DeltaLog.snapshot(spark, t)
    assert(after.files.forall(_.dv.isEmpty),
      "every pre-image row updated → files replaced, no vectors left")
    assert(DeltaTable.read(spark, t).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
      === (3 to 10).map(i => (i, "all")).toSet)
  }

  test("purgeDeletionVectors rewrites only DV files, dataChange=false") {
    val t = tmp()
    dvTable(t, 1 to 10, 100 to 110)
    DeltaTable.delete(spark, t, col("id") === 5)
    val cleanBefore = DeltaLog.snapshot(spark, t).files
      .filter(_.dv.isEmpty).map(_.path).toSet
    assert(DeltaTable.purgeDeletionVectors(spark, t) == 1)
    val head = DeltaLog.snapshot(spark, t)
    assert(head.files.forall(_.dv.isEmpty))
    assert(cleanBefore.subsetOf(head.files.map(_.path).toSet),
      "clean files carry over untouched")
    assert(ids(t) === ((1 to 10).toSet - 5) ++ (100 to 110).toSet)
    val c = DeltaLog.readCommit(spark, t, head.version)
    assert(c.adds.forall(!_.dataChange) && c.dataChangingRemoves == 0,
      "purge is a maintenance commit tailers skip")
    assert(DeltaTable.purgeDeletionVectors(spark, t) == 0)
  }

  // ------------------------------------------------------- time travel

  test("time travel below the DV delete reads the full file") {
    val t = tmp()
    dvTable(t, 1 to 8)
    val v = DeltaLog.snapshot(spark, t).version
    DeltaTable.delete(spark, t, col("id") <= 4)
    assert(ids(t) === (5 to 8).toSet)
    assert(DeltaTable.read(spark, t, versionAsOf = Some(v))
      .select("id").collect().map(_.getInt(0)).toSet === (1 to 8).toSet)
  }

  // -------------------------------------------------------- change feed

  test("CDF captures exactly the newly deleted rows of a DV delete") {
    val t = tmp()
    dvTable(t, 1 to 10)
    DeltaTable.setProperties(spark, t,
      Map("delta.enableChangeDataFeed" -> "true",
        "delta.enableDeletionVectors" -> "true"))
    DeltaTable.delete(spark, t, col("id") <= 3)
    val head = DeltaLog.snapshot(spark, t)
    val feed = DeltaTable.readChangeFeed(spark, t, head.version)
      .select("id", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(feed === (1 to 3).map(i => (i, "delete")).toSet)
  }

  test("derived CDF (no cdc files) honors the remove's recorded vector") {
    val t = tmp()
    dvTable(t, 1 to 10)
    DeltaTable.delete(spark, t, col("id") <= 2)
    DeltaTable.delete(spark, t, col("id") <= 4)
    val head = DeltaLog.snapshot(spark, t)
    val feed = DeltaTable.readChangeFeed(spark, t, head.version, Some(head.version))
      .select("id", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    val del = feed.collect { case (i, "delete") => i }.toSet
    val ins = feed.collect { case (i, "insert") => i }.toSet
    // pre-image excludes the FIRST delete's rows; net change is {3, 4}
    assert(del === (3 to 10).toSet, "pre-image must be DV-filtered at removal")
    assert(ins === (5 to 10).toSet)
    assert(del -- ins === Set(3, 4))
  }

  // ------------------------------------------------ checkpoint & pruned

  test("deletion vectors survive checkpoints and the distributed replay") {
    val t = tmp()
    (0 to 1).foreach { p =>
      DeltaTable.write((1 to 6).map(i => (i, p)).toDF("id", "p").coalesce(1),
        t, SaveMode.Append, partitionBy = Seq("p"))
    }
    DeltaTable.setProperties(spark, t,
      Map("delta.enableDeletionVectors" -> "true"))
    DeltaTable.delete(spark, t, col("p") === 0 && col("id") <= 2)
    DeltaLog.checkpoint(spark, t)
    // checkpoint-seeded snapshot carries the DV
    assert(DeltaLog.snapshot(spark, t).files
      .exists(_.dv.exists(_.cardinality == 2L)))
    assert(ids(t) === (3 to 6).toSet ++ (1 to 6).toSet)
    // distributed (checkpoint-DataFrame) replay carries it too
    val pruned = DeltaLog.prunedSnapshot(spark, t, Map("p" -> "0"))
    assert(pruned.files.exists(_.dv.exists(_.cardinality == 2L)))
    assert(DeltaTable.readPartitionsDistributed(spark, t, Map("p" -> "0"))
      .select("id").collect().map(_.getInt(0)).toSet === (3 to 6).toSet)
    // a DELETE after the checkpoint still merges correctly
    DeltaTable.delete(spark, t, col("p") === 0 && col("id") === 3)
    assert(DeltaTable.readPartitions(spark, t, Map("p" -> "0"))
      .select("id").collect().map(_.getInt(0)).toSet === (4 to 6).toSet)
  }

  // -------------------------------------------------------- clone & SQL

  test("shallow clone absolutizes sidecar vectors and reads exactly") {
    val t = tmp()
    dvTable(t, 1 to 2000)
    DeltaTable.delete(spark, t, col("id") % 3 === 0) // sidecar-sized DV
    val c = tmp()
    DeltaTable.cloneShallow(spark, t, c)
    val cloned = DeltaLog.snapshot(spark, c).files.head.dv.get
    assert(cloned.storageType == "p" &&
      new org.apache.hadoop.fs.Path(cloned.pathOrInlineDv).isAbsolute)
    assert(ids(c) === (1 to 2000).filter(_ % 3 != 0).toSet)
    // clone stays independent: delete in the clone, source unchanged
    DeltaTable.delete(spark, c, col("id") === 1)
    assert(ids(t).contains(1))
  }

  test("DSv2/SQL scans filter deletion vectors (row-index routing)") {
    val t = tmp()
    dvTable(t, 1 to 2000, 5000 to 5100)
    DeltaTable.delete(spark, t, col("id") % 3 === 0) // sidecar DV on file 1,
                                                     // inline DV on file 2
    val expected = ((1 to 2000) ++ (5000 to 5100)).filterNot(_ % 3 == 0)
    val df = spark.read.format("graft-delta").load(t)
    assert(df.select("id").collect().map(_.getInt(0)).toSet === expected.toSet)
    // pushed filter + projection over the DV branch stays exact
    assert(df.filter(col("id") > 1000).count()
      === expected.count(_ > 1000).toLong)
    // the clean/dv split survives mixed snapshots: delete ONE file whole
    DeltaTable.delete(spark, t, col("id") >= 5000)
    assert(spark.read.format("graft-delta").load(t)
      .select("id").collect().map(_.getInt(0)).toSet
      === (1 to 2000).filterNot(_ % 3 == 0).toSet)
  }

  test("DSv2 scans of a partitioned DV table restore partition columns") {
    val t = tmp()
    (0 to 1).foreach { p =>
      DeltaTable.write((1 to 6).map(i => (i, p)).toDF("id", "p").coalesce(1),
        t, SaveMode.Append, partitionBy = Seq("p"))
    }
    DeltaTable.setProperties(spark, t,
      Map("delta.enableDeletionVectors" -> "true"))
    DeltaTable.delete(spark, t, col("p") === 1 && col("id") <= 2)
    val got = spark.read.format("graft-delta").load(t)
      .select("id", "p").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got === ((1 to 6).map((_, 0)) ++ (3 to 6).map((_, 1))).toSet)
    // partition pruning into the DV'd partition still filters rows
    assert(spark.read.format("graft-delta").load(t)
      .filter(col("p") === 1).select("id").collect().map(_.getInt(0)).toSet
      === (3 to 6).toSet)
  }

  test("pure-SQL DELETE on a DV-enabled catalog table commits a vector") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh_dv").toString
    spark.conf.set("spark.sql.catalog.gdv", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdv.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdv.db")
    spark.sql("""CREATE TABLE gdv.db.t (id BIGINT, s STRING)
                 TBLPROPERTIES ('delta.enableDeletionVectors' = 'true')""")
    spark.sql("INSERT INTO gdv.db.t SELECT id, CAST(id AS STRING) " +
      "FROM range(1, 11)")
    val path = s"$wh/db/t"
    val before = livePaths(path)
    spark.sql("DELETE FROM gdv.db.t WHERE id <= 3")
    // fully-matched files drop whole; straddled ones keep their bytes —
    // either way the DELETE staged no rewrites
    assert(livePaths(path).subsetOf(before), "SQL DELETE must take the DV path")
    assert(DeltaLog.snapshot(spark, path).files
      .exists(_.dv.exists(_.cardinality > 0)))
    assert(spark.sql("SELECT id FROM gdv.db.t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === (4L to 10L))
    // SQL time travel below the DV delete reads the pre-image through
    // the same DSv2 scan (no vector at that version)
    val preV = DeltaLog.snapshot(spark, path).version - 1
    assert(spark.sql(s"SELECT id FROM gdv.db.t VERSION AS OF $preV")
      .collect().map(_.getLong(0)).toSet === (1L to 10L).toSet)
  }

  test("MERGE clauses take the DV path: vectors + post-images, no rewrite") {
    import org.apache.spark.sql.functions.lit
    val t = tmp()
    dvTable(t, 1 to 10)
    val before = livePaths(t)
    // update ids 2,4; delete id 6; insert id 99
    val src = Seq((2, "u2"), (4, "u4"), (6, "del"), (99, "new"))
      .toDF("k", "v")
    DeltaTable.mergeInto(src, t, targetKey = "id", sourceKey = "k",
      matched = Seq(
        MergeClause.Delete(Some(DeltaTable.src("v") === "del")),
        MergeClause.Update(None, Map("s" -> DeltaTable.src("v")))),
      notMatched = Seq(MergeClause.Insert(None,
        Map("id" -> DeltaTable.src("k"), "s" -> DeltaTable.src("v")))))
    val head = DeltaLog.snapshot(spark, t)
    // original file survives with a 3-row vector (2 updated + 1 deleted)
    assert(before.subsetOf(head.files.map(_.path).toSet),
      "MERGE must not rewrite the straddled file")
    assert(head.files.exists(_.dv.exists(_.cardinality == 3L)),
      s"got ${head.files.flatMap(_.dv)}")
    val newRows = head.files.filterNot(f => before(f.path))
      .flatMap(_.stats.map(_.numRecords)).sum
    assert(newRows == 3L, s"post-images + insert = 3 rows, got $newRows")
    val got = DeltaTable.read(spark, t).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    val expected = (1 to 10).filterNot(_ == 6).map {
      case 2 => (2, "u2")
      case 4 => (4, "u4")
      case i => (i, s"s$i")
    }.toSet + ((99, "new"))
    assert(got === expected)
    // protocol upgraded by the merge (first DV on the table)
    assert(head.readerFeatures.contains("deletionVectors"))
    // and a rewrite-path upsert (DeltaTable.merge) touching the DV'd
    // file retires the vector cleanly: the remove carries it (CDF
    // pre-image exactness), the rewritten file is vector-free, reads
    // stay exact (id 7 still lives in the original file)
    DeltaTable.merge(Seq((7, "uu7")).toDF("id", "s"), t, "id")
    val afterUpsert = DeltaTable.read(spark, t).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(afterUpsert === expected - ((7, "s7")) + ((7, "uu7")))
    val c = DeltaLog.readCommit(spark, t, DeltaLog.snapshot(spark, t).version)
    assert(c.removes.exists(_.dv.exists(_.cardinality == 3L)),
      "rewrite-path remove must carry the pre-image vector")
    assert(DeltaLog.snapshot(spark, t).files.forall(_.dv.isEmpty),
      "the rewrite replaced the only DV'd file")
  }

  // ------------------------------------------------------------- vacuum

  test("vacuum keeps referenced sidecars, reclaims orphans and retired ones") {
    val t = tmp()
    dvTable(t, 1 to 2000)
    DeltaTable.delete(spark, t, col("id") % 3 === 0)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dvDir = new org.apache.hadoop.fs.Path(t, "_dv")
    val live = DeltaLog.snapshot(spark, t).files.head.dv.get.pathOrInlineDv
    // plant an orphan (a crashed attempt's sidecar)
    val orphan = new org.apache.hadoop.fs.Path(t, "_dv/dv-orphan.bin")
    val out = fs.create(orphan, false)
    out.write(DeletionVectors.serialize(Array(1L))); out.close()
    assert(DeltaTable.vacuumOrphans(spark, t, olderThanMs = 0L) >= 1)
    assert(!fs.exists(orphan), "orphan sidecar reclaimed")
    assert(fs.exists(new org.apache.hadoop.fs.Path(t, live)),
      "live sidecar survives vacuum")
    assert(ids(t) === (1 to 2000).filter(_ % 3 != 0).toSet)
    // purge retires the sidecar into a tombstone; retention reclaims it
    DeltaTable.purgeDeletionVectors(spark, t)
    assert(DeltaTable.vacuumRemoved(spark, t, retainMs = 0L) >= 1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(t, live)),
      "retired sidecar reclaimed on the retention clock")
    assert(ids(t) === (1 to 2000).filter(_ % 3 != 0).toSet)
  }

  test("SQL maintenance surface: detail reports DVs, purge_dvs clears them") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh_dvp").toString
    spark.conf.set("spark.sql.catalog.gdvp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdvp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdvp.db")
    spark.sql("""CREATE TABLE gdvp.db.t (id BIGINT, s STRING)
                 TBLPROPERTIES ('delta.enableDeletionVectors' = 'true')""")
    spark.sql("INSERT INTO gdvp.db.t SELECT id, CAST(id AS STRING) " +
      "FROM range(1, 9)")
    spark.sql("DELETE FROM gdvp.db.t WHERE id IN (2, 5)")
    val det = spark.sql("CALL gdvp.system.detail('db.t')").head()
    assert(det.getInt(3) >= 1 && det.getLong(4) === 2L,
      s"detail must report the vectors: $det")
    val purged = spark.sql("CALL gdvp.system.purge_dvs('db.t')").head().getInt(0)
    assert(purged >= 1)
    val det2 = spark.sql("CALL gdvp.system.detail('db.t')").head()
    assert(det2.getInt(3) === 0 && det2.getLong(4) === 0L)
    assert(spark.sql("SELECT id FROM gdvp.db.t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L, 4L, 6L, 7L, 8L))
  }

  test("nondeterministic DV delete freezes the matched set: marks, CDF and reads agree") {
    import org.apache.spark.sql.functions.rand
    val t = tmp()
    dvTable(t, 1 to 1000)
    DeltaTable.setProperties(spark, t, Map(
      "delta.enableChangeDataFeed" -> "true",
      "delta.enableDeletionVectors" -> "true"))
    DeltaTable.delete(spark, t, rand(seed = 7) < 0.5)
    val head = DeltaLog.snapshot(spark, t)
    val vectored = head.files.flatMap(_.dv).map(_.cardinality).sum
    val live = DeltaTable.read(spark, t).count()
    // every row is either readable or vectored — a diverged evaluation
    // would double-count or drop rows
    assert(live + vectored === 1000L,
      s"live=$live vectored=$vectored must partition the file")
    val feed = DeltaTable.readChangeFeed(spark, t, head.version)
      .filter(col("_change_type") === "delete").count()
    assert(feed === vectored,
      s"CDF must report exactly the vectored rows: feed=$feed dv=$vectored")
  }

  // ---------------------------------------------------------- streaming

  test("append tailing refuses a DV commit; snapshot re-read stays exact") {
    val t = tmp()
    dvTable(t, 1 to 10)
    val (_, v0) = DeltaTable.changesSince(spark, t, -1L)
    DeltaTable.delete(spark, t, col("id") <= 3)
    val e = intercept[Exception] { DeltaTable.changesSince(spark, t, v0) }
    assert(e.getMessage.contains("overwritten/merged"))
    assert(ids(t) === (4 to 10).toSet)
  }
}
