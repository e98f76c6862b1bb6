package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StreamDedupSpec extends SparkSpec {

  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val other = "one two three four five six seven eight nine ten"
  private val third = "red orange yellow green blue indigo violet black white gray"

  test("streaming dedup: cross-batch dups dropped via store, intra-batch canonicalized") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("dedup_out").toString
    val sigs = java.nio.file.Files.createTempDirectory("dedup_sigs").toString
    val ckpt = java.nio.file.Files.createTempDirectory("dedup_ckpt").toString
    val stream = MemoryStream[(Long, String)]
    val q = StreamDedup.start(
      stream.toDF().toDF("doc_id", "text"), out, sigs, ckpt,
      minJaccard = 0.5, trigger = Trigger.ProcessingTime(0))
    try {
      // batch 1: 10 = content A; 11 = near-dup of A (intra-batch, keep
      // min id 10); 12 = unique B
      stream.addData((10L, base), (11L, s"$base lambda"), (12L, other))
      q.processAllAvailable()
      // batch 2: 20 = near-dup of A again (must be dropped via the STORE
      // — its intra-batch has no copy); 21 = unique C; 22 = dup of 21
      // (intra-batch, keep 21)
      stream.addData(
        (20L, s"$base mu"),
        (21L, third),
        (22L, s"$third silver"))
      q.processAllAvailable()
    } finally q.stop()
    val accepted = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(accepted === Set(10L, 12L, 21L))
    // the signature store holds exactly the accepted docs, batch-layered
    val stored = spark.read.parquet(sigs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(stored === accepted)
    val batchDirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(batchDirs === Set("batch=0", "batch=1"))
  }

  test("cleanBatch replay is idempotent: same inputs + same store => same output") {
    val b2 = Seq((20L, s"$base mu"), (21L, third),
      (22L, s"$third silver")).toDF("doc_id", "text")
    val store = TextDedupStoreFixture.storeFor(
      Seq((10L, base), (12L, other)).toDF("doc_id", "text"))
    val r1 = StreamDedup.cleanBatch(b2, Some(store))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val r2 = StreamDedup.cleanBatch(b2, Some(store))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(r1 === r2)
    assert(r1 === Set(21L))
  }

  test("replayed batch must not see its own failed-attempt signatures") {
    // crash-then-replay: batch 1's sigs landed but the checkpoint didn't
    // commit, so the same (batch, id) is processed again. Without the
    // own-layer exclusion every doc matches itself in the store and the
    // replay overwrites the batch output with an EMPTY set.
    val out = java.nio.file.Files.createTempDirectory("replay_out").toString
    val sigs = java.nio.file.Files.createTempDirectory("replay_sigs").toString
    val b0 = Seq((10L, base), (12L, other)).toDF("doc_id", "text")
    val b1 = Seq((20L, s"$base mu"), (21L, third)).toDF("doc_id", "text")
    StreamDedup.processBatch(b0, 0L, out, sigs)
    StreamDedup.processBatch(b1, 1L, out, sigs) // first attempt (sigs land)
    StreamDedup.processBatch(b1, 1L, out, sigs) // replay of the same batch
    val accepted = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(accepted === Set(10L, 12L, 21L))
    val stored = spark.read.parquet(sigs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(stored === accepted)
  }

  test("cleanBatch with no store reduces to batch dedup-apply semantics") {
    val b = Seq((1L, base), (2L, s"$base lambda"), (3L, other))
      .toDF("doc_id", "text")
    val got = StreamDedup.cleanBatch(b, None)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L))
  }
}

/** Builds a signature-store relation the way the stream does. */
object TextDedupStoreFixture {
  def storeFor(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    graft.operators.TextDedup.minhashSignaturesSketch(
      graft.operators.TextDedup.shingles(docs, 3), 64)
}
