package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Length-bucketed batching ([[LengthBucket]]): hand-checked bucket
  * assignment and padding math, dense full batches from the two-phase
  * prefix-sum positions, overflow truncation, and the plan shape (no
  * global window, offsets broadcast). */
class LengthBucketSpec extends SparkSpec {

  import spark.implicits._

  test("hand-checked buckets, truncation, and padding economics") {
    val docs = Seq(
      (1L, 10), (2L, 16),          // -> bucket 16
      (3L, 17),                    // -> bucket 32
      (4L, 33),                    // -> bucket 64
      (5L, 600)                    // overflow -> bucket 512, truncated
    ).toDF("doc_id", "ntok")
    val rep = LengthBucket.report(
      LengthBucket.assign(docs, col("doc_id"), col("ntok"), batchSize = 2))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(rep === Map(
      16 -> ((2L, 1L, 26L, 6L)),    // 2 seqs, 1 batch, 2*16-26 = 6 pad
      32 -> ((1L, 1L, 17L, 15L)),
      64 -> ((1L, 1L, 33L, 31L)),
      512 -> ((1L, 1L, 512L, 0L))), // truncated to capacity: zero pad
      s"got $rep")
  }

  test("positions are dense per bucket: batch ids contiguous, all but last full") {
    val rnd = new scala.util.Random(7)
    val docs = (0 until 500).map(i => (i.toLong, 1 + rnd.nextInt(300)))
      .toDF("doc_id", "ntok")
    val a = LengthBucket.assign(docs, col("doc_id"), col("ntok"),
      batchSize = 32).cache()
    val perBatch = a.groupBy(col("bucket_len"), col("batch_idx"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val perBucket = a.groupBy(col("bucket_len"))
      .agg(count(lit(1)).as("n"), max(col("batch_idx")).as("mx")).collect()
    perBucket.foreach { r =>
      val (bl, n, mx) = (r.getInt(0), r.getLong(1), r.getLong(2))
      assert(mx === (n - 1) / 32, s"bucket $bl: max batch id vs ceil")
      (0L to mx).foreach { b =>
        val sz = perBatch((bl, b))
        if (b < mx) assert(sz === 32L, s"bucket $bl batch $b not full: $sz")
        else assert(sz === n - 32L * mx, s"bucket $bl last batch: $sz")
      }
    }
    // determinism across partitioning
    val b = LengthBucket.assign(docs.repartition(11), col("doc_id"),
      col("ntok"), batchSize = 32)
    assert(a.select("doc_id", "bucket_len", "batch_idx").collect().toSet ===
      b.select("doc_id", "bucket_len", "batch_idx").collect().toSet)
  }

  test("plan shape: no single-task window — every window partitions by a ring cell") {
    val docs = (0 until 100).map(i => (i.toLong, 5 + i % 60))
      .toDF("doc_id", "ntok")
    val plan = LengthBucket.assign(docs, col("doc_id"), col("ntok"))
      .queryExecution.executedPlan.toString
    // the row-level window must key on (bucket_len, __rb) — a bare
    // PARTITION BY bucket_len over rows would funnel a bucket's whole
    // corpus share through one task at scale. The offsets window keys
    // on bucket_len alone but runs over CELL TOTALS (tiny by
    // construction); it reaches the plan only via the broadcast side.
    assert(plan.contains("__rb"), s"expected ring-cell windows:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"cell offsets must broadcast:\n$plan")
  }
}
