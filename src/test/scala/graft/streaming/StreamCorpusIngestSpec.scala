package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StreamCorpusIngestSpec extends SparkSpec {

  import spark.implicits._

  private val bench = "held out benchmark question alpha beta gamma delta epsilon"
  private def uniq(id: Long, words: Int): (Long, String) =
    (id, (0 until words).map(w => s"u${id}_$w").mkString(" "))

  test("composed ingest: leak dropped, dups dropped, survivors shard-packed across batches") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("ing_out").toString
    val sigs = java.nio.file.Files.createTempDirectory("ing_sigs").toString
    val st = java.nio.file.Files.createTempDirectory("ing_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ing_ckpt").toString
    val eval = Seq((900L, bench)).toDF("doc_id", "text")

    val u1 = uniq(1, 50)
    val u4 = uniq(4, 50)
    // batch 1: one clean unique doc, one benchmark leak, one dup-of-1
    val b0 = Seq(u1, (2L, bench + " zeta"), (3L, u1._2 + " extra"))
    // batch 2: cross-batch dup of doc 1, one clean unique doc
    val b1 = Seq((5L, u1._2 + " other"), u4)

    val stream = MemoryStream[(Long, String)]
    val q = StreamCorpusIngest.start(
      stream.toDF().toDF("doc_id", "text"), eval,
      out, sigs, st, ckpt,
      minOverlap = 5, minJaccard = 0.5, budget = 60L,
      trigger = Trigger.ProcessingTime(0))
    try {
      stream.addData(b0: _*); q.processAllAvailable()
      stream.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()

    val packed = spark.read.parquet(out)
      .select(col("doc_id"), col("shard").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // survivors: 1 (clean, first), 4 (clean) — 2 leaked, 3/5 near-dups
    assert(packed.keySet === Set(1L, 4L))
    // carried state: only the ACCEPTED docs' tokens count (50 + 50), and
    // doc 4's shard follows the carried cumulative — floor(50/60) = 0
    assert(StreamShard.readCum(spark, st, beforeBatch = 99) === 100L)
    assert(packed(1L) === 0L && packed(4L) === 0L)
    // the store holds DEDUP survivors (pre-decontamination): doc 2 was
    // deduped-in then decontaminated-out, so its signature REMAINS — a
    // later near-dup of the leak must still find its match (q56 order)
    val stored = spark.read.parquet(sigs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(stored === Set(1L, 2L, 4L))
  }

  test("stage order matches q56: a near-dup of a leaked doc is dropped too") {
    // doc 2 = benchmark leak + filler F; doc 3 = F + own words, so
    // jaccard(2,3) >= 0.5 but doc 3 shares nothing with the benchmark.
    // q56 order (dedup -> decon): dedup drops 3 (non-canonical of {2,3}),
    // decon drops 2 -> NEITHER survives. Decon-first would let 3 slip
    // through (partner already gone, no eval overlap of its own).
    val out = java.nio.file.Files.createTempDirectory("ord_out").toString
    val sigs = java.nio.file.Files.createTempDirectory("ord_sigs").toString
    val st = java.nio.file.Files.createTempDirectory("ord_state").toString
    val eval = Seq((900L, bench)).toDF("doc_id", "text")
    val evalSh = graft.operators.TextDedup.shingles(eval, 3)
    val filler = (0 until 30).map(w => s"f$w").mkString(" ")
    val b = Seq(
      uniq(1, 40),
      (2L, s"$bench $filler"),
      (3L, s"$filler own3a own3b")).toDF("doc_id", "text")
    StreamCorpusIngest.processBatch(b, 0L, evalSh, out, sigs, st,
      minOverlap = 5, minJaccard = 0.5, budget = 60L)
    val packed = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(packed === Set(1L), s"got $packed")
  }

  test("composed ingest batch replay is fully idempotent across all three outputs") {
    val out = java.nio.file.Files.createTempDirectory("ring_out").toString
    val sigs = java.nio.file.Files.createTempDirectory("ring_sigs").toString
    val st = java.nio.file.Files.createTempDirectory("ring_state").toString
    val eval = Seq((900L, bench)).toDF("doc_id", "text")
    val evalSh = graft.operators.TextDedup.shingles(eval, 3)
    val b0 = Seq(uniq(1, 70)).toDF("doc_id", "text")
    val b1 = Seq(uniq(2, 70), (3L, bench + " eta")).toDF("doc_id", "text")
    StreamCorpusIngest.processBatch(b0, 0L, evalSh, out, sigs, st,
      minOverlap = 5, budget = 60L)
    StreamCorpusIngest.processBatch(b1, 1L, evalSh, out, sigs, st,
      minOverlap = 5, budget = 60L)
    def snapshot() = (
      spark.read.parquet(out).select(col("doc_id"), col("shard").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      spark.read.parquet(sigs).select("doc_id").collect().map(_.getLong(0)).toSet,
      StreamShard.readCum(spark, st, beforeBatch = 99))
    val first = snapshot()
    StreamCorpusIngest.processBatch(b1, 1L, evalSh, out, sigs, st,
      minOverlap = 5, budget = 60L) // replay
    assert(snapshot() === first)
    assert(first._1 === Set((1L, 0L), (2L, 1L))) // 70 tok → doc2 starts shard 1
    assert(first._2 === Set(1L, 2L, 3L)) // store keeps the leaked doc's sig
    assert(first._3 === 140L)
  }
}
