package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share n-gram
  * content with an evaluation/benchmark set.
  *
  * The canonical pretraining-hygiene operator: before training on a crawled
  * corpus, any document overlapping an eval benchmark must be flagged (else
  * the benchmark leaks into the training set and scores are inflated). The
  * reference pipeline has no equivalent — this extends the dedup suite
  * (SURVEY §7.1) with the asymmetric, cross-corpus form of the same
  * shingle-join shape as [[TextDedup.exactJaccardPairs]].
  *
  * Scale shape (100 TB): unlike all-pairs dedup, this join is ASYMMETRIC —
  * the eval side is a fixed-size benchmark (thousands of docs, independent
  * of corpus scale), so the shingle join degenerates to a broadcast hash
  * join against the training corpus stream: one linear scan of train, zero
  * shuffle of the big side. Pass `broadcastEval = true` in production; the
  * default lets AQE decide because THIS harness derives eval as a modulo
  * split of the corpus (it grows with SF, and forcing broadcasts of
  * SF-growing relations is exactly what round 2 removed from q17/q35).
  */
object Decontaminate {

  /** (train_id, eval_id, overlap) for train docs sharing ≥ minOverlap
    * distinct word n-grams with an eval doc. Reuses [[TextDedup.shingles]]
    * (in-row array_distinct dedup, codegen, no UDFs) on both sides.
    */
  def overlaps(
      train: DataFrame,
      eval: DataFrame,
      n: Int = 3,
      minOverlap: Long = 10,
      broadcastEval: Boolean = false): DataFrame = {
    val trainSh = TextDedup.shingles(train, n)
      .select(col("doc_id").as("train_id"), col("shingle"))
    val evalSh0 = TextDedup.shingles(eval, n)
      .select(col("doc_id").as("eval_id"), col("shingle"))
    val evalSh = if (broadcastEval) broadcast(evalSh0) else evalSh0
    trainSh
      .join(evalSh, "shingle")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }
}
