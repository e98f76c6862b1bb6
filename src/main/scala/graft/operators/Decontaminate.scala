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
    *
    * `maxShingleDf` (default off — the oracle SQL has no cap) drops
    * shingles whose document frequency across train ∪ eval exceeds the
    * cap, exactly like [[TextDedup.minhashPairs]]'s knob: shared
    * boilerplate (license headers, templates) is the skew key of this
    * join — one universal shingle pairs every train doc with every eval
    * doc — and carries no contamination signal.
    */
  def overlaps(
      train: DataFrame,
      eval: DataFrame,
      n: Int = 3,
      minOverlap: Long = 10,
      broadcastEval: Boolean = false,
      maxShingleDf: Option[Long] = None): DataFrame =
    overlapsAgainst(TextDedup.shingles(train, n), TextDedup.shingles(eval, n),
      minOverlap, broadcastEval, maxShingleDf)

  /** [[overlaps]] against pre-computed (doc_id, shingle) relations — the
    * form a streaming ingest uses: the benchmark's shingle relation is
    * computed and persisted ONCE, then reused by every micro-batch
    * ([[graft.streaming.StreamClean]]), instead of re-shingling the eval
    * corpus per batch.
    */
  def overlapsAgainst(
      trainSh0: DataFrame,
      evalSh0: DataFrame,
      minOverlap: Long = 10,
      broadcastEval: Boolean = false,
      maxShingleDf: Option[Long] = None): DataFrame = {
    val (trainSh1, evalSh1) = maxShingleDf match {
      case None => (trainSh0, evalSh0)
      case Some(cap) =>
        // each side feeds the stop-set union AND its anti-join: persist,
        // or the tokenize+explode pipeline runs twice per side (the q19
        // round-3 lesson — ReuseExchange can't collapse the consumers)
        val t = trainSh0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val ev = evalSh0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // document frequency over BOTH corpora: boilerplate concentrated
        // in one split must still be dropped from the join
        val stop = t.union(ev)
          .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap)
          .select(col("shingle"))
        (t.join(stop, Seq("shingle"), "left_anti"),
          ev.join(stop, Seq("shingle"), "left_anti"))
    }
    val trainSh = trainSh1.select(col("doc_id").as("train_id"), col("shingle"))
    val evalSh2 = evalSh1.select(col("doc_id").as("eval_id"), col("shingle"))
    val evalSh = if (broadcastEval) broadcast(evalSh2) else evalSh2
    trainSh
      .join(evalSh, "shingle")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }
}
