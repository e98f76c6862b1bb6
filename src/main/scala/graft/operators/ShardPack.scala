package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shard packing: lay the corpus out in a deterministic pseudo-random order
  * and cut it into contiguous shards of ~`budget` weight (token count) each
  * — the final step of a pretraining pipeline, where the cleaned corpus
  * becomes numbered training shards whose composition must be re-derivable
  * (same data in, same shard assignment out, on any cluster shape).
  *
  * Order = ([[Sampling.portableHash]](key), key): a hash-shuffled
  * permutation, so every shard is an unbiased sample of the corpus (no
  * source/time clumping), yet fully deterministic — no RNG, no
  * partitioning dependence.
  *
  * Scale shape (100 TB): shard assignment needs a GLOBAL running sum of
  * weights in hash order, and the naive form — one `Window.orderBy` over
  * everything — is a single-partition sort of the corpus (the round-2
  * anti-pattern). This is the standard two-phase distributed prefix sum
  * instead:
  *
  *   1. bucket rows by the high bits of the hash (`h div 2^24` → ≤ 60
  *      contiguous hash ranges; at cluster scale raise to thousands), so
  *      bucket order is a prefix of the global order;
  *   2. a per-bucket running sum — `Window.partitionBy(bucket)`, fully
  *      parallel;
  *   3. per-bucket totals (one tiny aggregate) prefix-summed across
  *      buckets — the only single-partition window, over ≤ #buckets rows —
  *      and broadcast-joined back as each bucket's offset.
  *
  * global running sum = bucket offset + local running sum, exactly. The
  * corpus is scanned twice (once column-pruned to (bucket, weight) for the
  * offsets, once for the main pass); at 100 TB persist the projected input
  * or fold the totals into a file-statistics pass.
  */
object ShardPack {

  /** Adds (`cum_before`, `shard`) to `df`: `cum_before` = total weight of
    * all rows strictly before this one in (hash(key), key) order, `shard`
    * = `cum_before div budget`. A shard's total weight therefore exceeds
    * `budget` by at most one document's weight (a doc is never split).
    *
    * @param key    unique non-negative integral id (hash input + tiebreak)
    * @param weight non-negative integral cost of the row (e.g. tokens)
    */
  def pack(df: DataFrame, key: Column, weight: Column, budget: Long,
      bucketWidth: Long = 1L << 24): DataFrame = {
    require(budget > 0, s"budget=$budget must be > 0")
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth must be > 0")
    val reserved = Seq("cum_before", "shard", "__h", "__w", "__bucket", "__off")
    require(!reserved.exists(df.columns.contains),
      s"input already has one of ${reserved.mkString("/")} — rename it first")
    // default: hash ring [0, 1e9+7) → ≤ 60 buckets; on a large cluster
    // lower the width so buckets ≫ executors (offsets stay ≤ #buckets
    // rows — thousands of buckets are still a trivial broadcast)
    val d = df
      .withColumn("__h", Sampling.portableHash(key))
      .withColumn("__w", weight.cast("long"))
      .withColumn("__bucket", expr(s"__h div ${bucketWidth}L"))
    val perBucket = Window.partitionBy(col("__bucket"))
      .orderBy(col("__h").asc, key.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // bucket offsets: tiny (≤ #buckets rows) — the one intentionally
    // single-partition window, over bucket TOTALS, not rows
    val offsets = d.groupBy(col("__bucket")).agg(sum(col("__w")).as("__t"))
      .withColumn("__off", coalesce(
        sum(col("__t")).over(Window.orderBy(col("__bucket").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bucket"), col("__off"))
    d.join(broadcast(offsets), "__bucket")
      .withColumn("cum_before",
        col("__off") + coalesce(sum(col("__w")).over(perBucket), lit(0L)))
      .withColumn("shard", expr(s"cum_before div ${budget}L"))
      .drop("__h", "__w", "__bucket", "__off")
  }
}
