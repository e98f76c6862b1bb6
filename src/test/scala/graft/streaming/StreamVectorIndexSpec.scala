package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sources.delta.DeltaLog

class StreamVectorIndexSpec extends SparkSpec {

  import spark.implicits._

  // four well-separated centroids in the scaled-integer space (2^24 × the
  // float corners), dim 4
  private val S = 16777216.0
  private val cents: Array[Array[Double]] = Array(
    Array(S, 0, 0, 0), Array(0, S, 0, 0), Array(0, 0, S, 0), Array(0, 0, 0, S))

  private def vec(x: Float, y: Float, z: Float, w: Float) = Seq(x, y, z, w)

  test("streamed vectors index into cells; search probes only those cells") {
    val dir = java.nio.file.Files.createTempDirectory("vindex").toString
    implicit val sqlCtx = spark.sqlContext
    val s = MemoryStream[(Long, Seq[Float])]
    val q = StreamVectorIndex.start(
      s.toDF().toDF("vec_id", "embedding"), s"$dir/idx", s"$dir/chk",
      cents, trigger = Trigger.ProcessingTime(0))
    try {
      // batch 1: two vectors near corner 0, one near corner 1
      s.addData((1L, vec(1f, 0.1f, 0, 0)), (2L, vec(0.9f, 0, 0.1f, 0)),
        (3L, vec(0.1f, 1f, 0, 0)))
      q.processAllAvailable()
      // batch 2: another corner-0 vector arrives later — index stays fresh
      s.addData((4L, vec(0.95f, 0.05f, 0, 0)))
      q.processAllAvailable()
    } finally q.stop()
    // the index is Hive-partitioned by cell with txn-committed versions
    val snap = DeltaLog.snapshot(spark, s"$dir/idx")
    assert(snap.partitionColumns === Seq("cell"))
    assert(snap.files.map(_.partitionValues("cell")).toSet === Set("0", "1"))
    // search near corner 0: the probe reads ONLY cell 0's partition and
    // finds the true nearest among the streamed vectors, batch 2 included
    val got = StreamVectorIndex.search(spark, s"$dir/idx",
      Array(1f, 0f, 0f, 0f), cents, k = 3, nProbe = 1)
    val ids = got.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(ids.keySet === Set(1L, 2L, 4L), s"cell-0 members only, got $ids")
    assert(got.inputFiles.forall(_.contains("cell=0")),
      "search must not open unprobed cells")
    // restart from the checkpoint: txn marks keep the index exactly-once
    val s2 = MemoryStream[(Long, Seq[Float])]
    val q2 = StreamVectorIndex.start(
      s2.toDF().toDF("vec_id", "embedding"), s"$dir/idx", s"$dir/chk",
      cents, trigger = Trigger.ProcessingTime(0))
    try q2.processAllAvailable() finally q2.stop()
    assert(graft.sources.delta.DeltaTable.read(spark, s"$dir/idx").count() === 4L)
  }

  test("malformed vectors quarantine in the invalid cell, never searched, never lost") {
    val dir = java.nio.file.Files.createTempDirectory("vindex3").toString
    implicit val sqlCtx = spark.sqlContext
    val s = MemoryStream[(Long, Seq[Float])]
    val q = StreamVectorIndex.start(
      s.toDF().toDF("vec_id", "embedding"), s"$dir/idx", s"$dir/chk",
      cents, trigger = Trigger.ProcessingTime(0))
    try {
      // a wrong-dimension vector (3 elems in a 4-dim index) + a good one
      s.addData((1L, Seq(1f, 0f, 0f)), (2L, vec(1f, 0, 0, 0)))
      q.processAllAvailable()
    } finally q.stop()
    val cells = graft.sources.delta.DeltaLog.snapshot(spark, s"$dir/idx")
      .files.map(_.partitionValues("cell")).toSet
    assert(cells === Set("0", StreamVectorIndex.InvalidCell))
    // still counted in the table (auditable), never returned by a search
    assert(graft.sources.delta.DeltaTable.read(spark, s"$dir/idx").count() === 2L)
    val got = StreamVectorIndex.search(spark, s"$dir/idx",
      Array(1f, 0f, 0f, 0f), cents, k = 5, nProbe = 4)
    assert(got.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("negative vec_ids are searchable (no sentinel-id exclusion)") {
    val dir = java.nio.file.Files.createTempDirectory("vindex4").toString
    implicit val sqlCtx = spark.sqlContext
    val s = MemoryStream[(Long, Seq[Float])]
    val q = StreamVectorIndex.start(
      s.toDF().toDF("vec_id", "embedding"), s"$dir/idx", s"$dir/chk",
      cents, trigger = Trigger.ProcessingTime(0))
    try {
      s.addData((-1L, vec(1f, 0, 0, 0)), (7L, vec(0.8f, 0.2f, 0, 0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = StreamVectorIndex.search(spark, s"$dir/idx",
      Array(1f, 0f, 0f, 0f), cents, k = 1, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1))).head
    assert(got === ((-1L, 1)), s"the true nearest (-1) must be returned: $got")
  }

  test("search on an index with no commits yet is empty, not an error") {
    val dir = java.nio.file.Files.createTempDirectory("vindex_empty").toString
    val got = StreamVectorIndex.search(spark, s"$dir/idx",
      Array(1f, 0f, 0f, 0f), cents, k = 3, nProbe = 2)
    assert(got.collect().isEmpty)
    assert(got.columns.toSeq === Seq("nid", "rnk", "cosine"))
  }

  test("search freshness under concurrent ingest: monotone growth, no torn reads") {
    val dir = java.nio.file.Files.createTempDirectory("vindex5").toString
    implicit val sqlCtx = spark.sqlContext
    val s = MemoryStream[(Long, Seq[Float])]
    val q = StreamVectorIndex.start(
      s.toDF().toDF("vec_id", "embedding"), s"$dir/idx", s"$dir/chk",
      cents, trigger = Trigger.ProcessingTime(0))
    try {
      s.addData((1L, vec(1f, 0.1f, 0, 0)), (2L, vec(0.9f, 0, 0.1f, 0)))
      q.processAllAvailable()
      // a search PLANNED against the 2-vector index pins one log snapshot
      val search1 = StreamVectorIndex.search(spark, s"$dir/idx",
        Array(1f, 0f, 0f, 0f), cents, k = 10, nProbe = 1)
      val r1 = search1.collect().map(_.getLong(0)).toSet
      assert(r1 === Set(1L, 2L))
      // a batch commits BETWEEN two searches
      s.addData((4L, vec(0.95f, 0.05f, 0, 0)), (5L, vec(0.85f, 0.15f, 0, 0)))
      q.processAllAvailable()
      // no torn read: the pre-commit snapshot re-collects to exactly its
      // own rows (data files are immutable; the pinned file list cannot
      // see half a commit)
      assert(search1.collect().map(_.getLong(0)).toSet === r1,
        "a pinned snapshot must not shift under a concurrent commit")
      // a fresh search sees strictly more: monotone result growth
      val r2 = StreamVectorIndex.search(spark, s"$dir/idx",
        Array(1f, 0f, 0f, 0f), cents, k = 10, nProbe = 1)
        .collect().map(_.getLong(0)).toSet
      assert(r1.subsetOf(r2), s"results went backwards: $r1 -> $r2")
      assert(r2 === Set(1L, 2L, 4L, 5L))
    } finally q.stop()
  }

  test("probing more cells widens the candidate set to other corners") {
    val dir = java.nio.file.Files.createTempDirectory("vindex2").toString
    implicit val sqlCtx = spark.sqlContext
    val s = MemoryStream[(Long, Seq[Float])]
    val q = StreamVectorIndex.start(
      s.toDF().toDF("vec_id", "embedding"), s"$dir/idx", s"$dir/chk",
      cents, trigger = Trigger.ProcessingTime(0))
    try {
      s.addData((1L, vec(1f, 0, 0, 0)), (2L, vec(0, 1f, 0, 0)),
        (3L, vec(0, 0, 1f, 0)))
      q.processAllAvailable()
    } finally q.stop()
    val narrow = StreamVectorIndex.search(spark, s"$dir/idx",
      Array(0.7f, 0.7f, 0f, 0f), cents, k = 3, nProbe = 1)
    val wide = StreamVectorIndex.search(spark, s"$dir/idx",
      Array(0.7f, 0.7f, 0f, 0f), cents, k = 3, nProbe = 2)
    assert(narrow.count() === 1L)
    assert(wide.collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }
}
