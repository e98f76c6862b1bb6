package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LENGTH-BUCKETED BATCHING — the padded-training counterpart of
  * [[SequencePack]]: concat-and-cut packing suits GPT-style
  * pre-training, but SFT / seq2seq loaders pad each batch to its
  * longest sequence, and batching by length bucket is the standard way
  * to keep that padding waste bounded (HF `group_by_length`, the
  * classic seq2seq bucketing). Each document goes to the smallest
  * bucket whose capacity covers its token count (overflow truncates to
  * the last bucket — the usual max-length rule), batches form WITHIN a
  * bucket, and the report prices the padding: `n_seqs × bucket_len −
  * sum_tokens` is exactly the pad-token budget a training run burns.
  *
  * Batch COMPOSITION is deterministic pseudo-random: position within a
  * bucket follows the portable-hash ring ([[Sampling.portableHash]],
  * tie-broken by key), which both randomizes batch membership — what
  * bucketed batching wants, length-sorted batches bias gradients — and
  * replays identically on every engine and run.
  *
  * 100 TB shape: bucket assignment is a map-side CASE; positions come
  * from [[ShardPack.pack]]'s two-phase distributed prefix sum applied
  * PER (bucket × hash-ring cell) — per-cell windows plus a broadcast
  * of cell offsets (≤ #buckets × #cells rows) — so there is no global
  * window and no per-bucket single-task window (a naive
  * `row_number() OVER (PARTITION BY bucket)` funnels a bucket's entire
  * 100 TB share through one task; this shape never does). The report
  * is one small aggregation over the assignment. */
object LengthBucket {

  /** Power-of-two capacities, the common bucketing ladder. */
  val DefaultEdges: Seq[Int] = Seq(16, 32, 64, 128, 256, 512)

  /** Smallest edge ≥ `tokens`; overflow clamps to the last edge. */
  private def bucketLen(tokens: Column, edges: Seq[Int]): Column =
    edges.init.foldRight(lit(edges.last): Column)((e, acc) =>
      when(tokens <= e, lit(e)).otherwise(acc))

  /** Assign every row a `bucket_len`, its truncated `tok_in`
    * (= min(tokens, bucket capacity)), and its `batch_idx` within the
    * bucket (batches of `batchSize`, hash-ring order). Input columns
    * are kept. Positions are dense 0..n−1 per bucket, so batch ids are
    * dense and every batch except possibly the last is full —
    * spec-pinned. */
  def assign(df: DataFrame, key: Column, tokens: Column,
             edges: Seq[Int] = DefaultEdges, batchSize: Int = 32,
             bucketWidth: Long = 1L << 24): DataFrame = {
    require(batchSize > 0, s"batchSize=$batchSize must be > 0")
    require(edges.nonEmpty && edges == edges.sorted && edges.head > 0 &&
        edges.distinct == edges,
      s"edges must be positive, strictly increasing: $edges")
    val reserved = Seq("bucket_len", "tok_in", "batch_idx",
      "__h", "__rb", "__pos", "__t", "__off", "__bl", "__rb2")
    require(!reserved.exists(df.columns.contains),
      s"input already has one of ${reserved.mkString("/")} — rename it first")
    val d = df
      .withColumn("bucket_len", bucketLen(tokens.cast("int"), edges))
      .withColumn("tok_in",
        least(tokens.cast("long"), col("bucket_len").cast("long")))
      .withColumn("__h", Sampling.portableHash(key))
      .withColumn("__rb", expr(s"__h div ${bucketWidth}L"))
    // per-(bucket, ring-cell) windows: each cell's rows sort locally;
    // cell offsets are a tiny broadcast — ShardPack's two-phase shape
    val perCell = Window.partitionBy(col("bucket_len"), col("__rb"))
      .orderBy(col("__h").asc, key.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = d.groupBy(col("bucket_len"), col("__rb"))
      .agg(count(lit(1)).as("__t"))
      .withColumn("__off", coalesce(
        sum(col("__t")).over(Window.partitionBy(col("bucket_len"))
          .orderBy(col("__rb").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket_len").as("__bl"), col("__rb").as("__rb2"),
        col("__off"))
    d.join(broadcast(offsets),
        col("bucket_len") === col("__bl") && col("__rb") === col("__rb2"))
      // 0-based dense position within the bucket; `div`, NOT `/` —
      // Column./ on longs is DOUBLE division
      .withColumn("__pos",
        col("__off") + coalesce(count(lit(1)).over(perCell), lit(0L)))
      .withColumn("batch_idx", expr(s"__pos div ${batchSize}L"))
      .drop("__h", "__rb", "__bl", "__rb2", "__off", "__pos")
  }

  /** Per-bucket padding-economics report: sequence count, batch count
    * (from the ACTUAL assignment, which must equal ⌈n/B⌉ — the gate
    * checks it against an independent replay), kept tokens, and the
    * pad-token budget the bucket burns. */
  def report(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("bucket_len"))
      .agg(count(lit(1)).as("n_seqs"),
        (max(col("batch_idx")) + 1).as("n_batches"),
        sum(col("tok_in")).as("sum_tokens"),
        (count(lit(1)) * col("bucket_len") - sum(col("tok_in")))
          .as("padding"))
}
