package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared mechanics of the `batch=<id>` layer stores ([[IncrementalAgg]],
  * [[StreamFreq]]): each micro-batch overwrites its own layer directory
  * (idempotent under at-least-once replay, no transaction log), readers
  * fold layers, and compaction bounds the fold width.
  */
object LayerStore {

  /** Fold all layers STRICTLY BELOW the newest into one by summing
    * `sumCols` per `groupCol` — additive summaries (grouped deltas, MG
    * counters) compose by exactly this fold, so compaction is invisible
    * to readers. The newest layer stays untouched: it is the only one
    * the streaming checkpoint can replay (an uncommitted batch re-fires,
    * committed ones never do), and folding it would let a replay
    * overwrite merged history. */
  def compact(
      spark: SparkSession,
      path: String,
      groupCol: String,
      sumCols: Seq[String]): Unit = {
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(target)) return
    val layers = fs.listStatus(target).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toLong).sorted
    if (layers.length <= 2) return
    val folded = layers.init
    val combined = spark.read.parquet(folded.map(b => s"$path/batch=$b"): _*)
      .groupBy(col(groupCol))
      .agg(sum(col(sumCols.head)).as(sumCols.head),
        sumCols.tail.map(c => sum(col(c)).as(c)): _*)
    val staged = new Path(path + ".compact.staged")
    fs.delete(staged, true)
    combined.write.mode("overwrite").parquet(staged.toString)
    folded.foreach(b => fs.delete(new Path(target, s"batch=$b"), true))
    fs.rename(staged, new Path(target, s"batch=${folded.max}"))
  }
}
