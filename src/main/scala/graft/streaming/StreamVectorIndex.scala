package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge => CB}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.VectorSearch
import graft.sources.delta.DeltaTable

/** Incrementally-maintained ANN index over an embedding STREAM — the
  * ingest-time form of [[graft.operators.IvfSearch]]: each micro-batch
  * assigns its vectors to their nearest IVF cell map-side (the codegen
  * [[graft.functions.NearestCentroids]] kernel, centroid model a plan
  * constant) and appends them to a Delta table HIVE-PARTITIONED BY CELL
  * in one atomic `txn` commit — so at-least-once replays are refused by
  * the log and a crash never tears the index.
  *
  * Search never scans the corpus: the query's `nProbe` nearest cells are
  * computed on the driver (k × dim flops), ONLY those cell partitions
  * are read — the Delta log is the partition index, pruned cells are
  * never listed — and candidates re-rank by exact integer-cosine. At
  * 100 TB of vectors a search touches nProbe/k of the data; freshness
  * is one micro-batch behind the stream, with no index rebuild ever.
  *
  * The centroid model is fixed at index-build time (train on a bootstrap
  * sample via [[graft.operators.IvfSearch]]; FAISS's contract) — retrain
  * = write a new index table alongside and swap readers.
  */
object StreamVectorIndex {

  private def cellOf(cents: Array[Array[Double]]) = (v: org.apache.spark.sql.Column) =>
    element_at(CB.column(graft.functions.NearestCentroids(
      CB.expression(v), cents, 1)), 1)

  /** Start indexing `vectors` (streaming, `vec_id` + `embedding`). */
  def start(
      vectors: DataFrame,
      indexPath: String,
      checkpoint: String,
      centroids: Array[Array[Double]],
      appId: String = "graft-vector-index",
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        // NearestCentroids accepts the long-quantized vector directly;
        // `centroids` live in the same scaled-integer space (IvfSearch's
        // training convention)
        val assigned = VectorSearch.quantized(batch.toDF())
          .withColumn("cell", cellOf(centroids)(col("v")).cast("string"))
          .select(col("cell"), col("vec_id"), col("embedding"))
        DeltaTable.appendWithTxn(assigned, indexPath, appId, batchId,
          partitionBy = Seq("cell"))
        ()
      }
      .start()

  /** Top-k exact-cosine neighbors of `query` among the vectors indexed
    * so far, reading only the `nProbe` nearest cell partitions. */
  def search(
      spark: SparkSession,
      indexPath: String,
      query: Array[Float],
      centroids: Array[Array[Double]],
      k: Int,
      nProbe: Int = 4): DataFrame = {
    import spark.implicits._
    // nProbe nearest cells: k × dim driver-side flops on the tiny model
    val qd = query.map(x => math.floor(x.toDouble * 16777216.0))
    val cells = centroids.zipWithIndex.map { case (c, i) =>
      var s = 0.0
      var j = 0
      while (j < c.length) { val d = qd(j) - c(j); s += d * d; j += 1 }
      (s, i)
    }.sortBy { case (d, i) => (d, i) }.take(nProbe).map(_._2)
    // only the probed cell partitions are opened (log-indexed pruning)
    val candidates = cells.map(c =>
      DeltaTable.readPartitions(spark, indexPath, Map("cell" -> c.toString)))
      .reduce(_ unionByName _)
      .select(col("vec_id"), col("embedding"))
    val queries = Seq((-1L, query.toSeq)).toDF("vec_id", "embedding")
    VectorSearch.bruteForceTopK(queries, candidates, k)
      .select(col("nid"), col("rnk"), col("cosine"))
  }
}
