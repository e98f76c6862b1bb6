package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StreamShardSpec extends SparkSpec {

  import spark.implicits._

  private def doc(id: Long, words: Int): (Long, String) =
    (id, (0 until words).map(w => s"w${id}_$w").mkString(" "))

  /** Driver-side simulation: per-batch hash order, carried cumulative. */
  private def simulate(batches: Seq[Seq[(Long, String)]], budget: Long): Map[Long, Long] = {
    var cum = 0L
    batches.flatMap { b =>
      b.map { case (id, text) => (id, text.split(" ").length.toLong) }
        .sortBy { case (id, _) =>
          (math.floorMod(id * 2654435761L, 1000000007L), id)
        }
        .map { case (id, w) =>
          val shard = cum / budget; cum += w; id -> shard
        }
    }.toMap
  }

  test("incremental packing continues the token count across batches") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("shard_out").toString
    val st = java.nio.file.Files.createTempDirectory("shard_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("shard_ckpt").toString
    val b0 = Seq(doc(1, 40), doc(2, 40), doc(3, 40))
    val b1 = Seq(doc(4, 40), doc(5, 40), doc(6, 40))
    val stream = MemoryStream[(Long, String)]
    val q = StreamShard.start(stream.toDF().toDF("doc_id", "text"),
      out, st, ckpt, budget = 100L, trigger = Trigger.ProcessingTime(0))
    try {
      stream.addData(b0: _*); q.processAllAvailable()
      stream.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
      .select(col("doc_id"), col("shard").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = simulate(Seq(b0, b1), 100L)
    assert(got === want)
    // 240 tokens at budget 100 → shards 0..2, and batch 1 CONTINUED shard
    // 1 rather than restarting from 0 (the carried-state point)
    assert(got.values.toSet === Set(0L, 1L, 2L))
    assert(b1.map(_._1).map(got).min >= 1L, "batch 1 restarted shard numbering")
    assert(StreamShard.readCum(spark, st, beforeBatch = 99) === 240L)
  }

  test("replayed batch ignores its own state layer and recomputes identically") {
    val out = java.nio.file.Files.createTempDirectory("rshard_out").toString
    val st = java.nio.file.Files.createTempDirectory("rshard_state").toString
    val b0 = Seq(doc(1, 60), doc(2, 60)).toDF("doc_id", "text")
    val b1 = Seq(doc(3, 60), doc(4, 60)).toDF("doc_id", "text")
    StreamShard.processBatch(b0, 0L, out, st, budget = 100L)
    StreamShard.processBatch(b1, 1L, out, st, budget = 100L)
    val first = spark.read.parquet(out)
      .select(col("doc_id"), col("shard").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    StreamShard.processBatch(b1, 1L, out, st, budget = 100L) // replay
    val second = spark.read.parquet(out)
      .select(col("doc_id"), col("shard").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(first === second)
    assert(StreamShard.readCum(spark, st, beforeBatch = 99) === 240L)
  }
}
