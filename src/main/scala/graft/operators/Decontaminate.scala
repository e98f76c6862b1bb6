package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge => CB}
import org.apache.spark.storage.StorageLevel

import graft.functions.{BloomFilterAgg, ShingleBloomHits}

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

  /** Per-EVAL-document contamination SEVERITY — of the eval doc's
    * distinct n-gram shingles, how many appear ANYWHERE in the training
    * corpus: (eval_id, n_sh, n_hit). [[overlaps]] answers "which train
    * docs leak which eval doc"; this answers the release question —
    * "how much of each benchmark item does the corpus contain" — whose
    * n_hit/n_sh ratio drives the drop / keep / flag-the-score decision.
    *
    * 100 TB shape: the EVAL side is small (benchmarks), so its distinct
    * shingle set BROADCASTS and the training corpus streams ONCE
    * through a map-side semi join — no corpus-keyed shuffle at all; the
    * surviving hit set is ≤ |eval shingles| and broadcasts back onto
    * the per-doc counts. */
  def severity(train: DataFrame, eval: DataFrame, n: Int = 3): DataFrame = {
    val evalSh = TextDedup.shingles(eval, n)
    val evalSet = evalSh.select(col("shingle")).distinct()
    val hitSet = TextDedup.shingles(train, n).select(col("shingle"))
      .join(broadcast(evalSet), Seq("shingle"), "left_semi").distinct()
    val hits = evalSh.join(broadcast(hitSet), Seq("shingle"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    TextDedup.shingleSizes(evalSh)
      .select(col("doc_id").as("eval_id"), col("n").as("n_sh"))
      .join(hits.select(col("doc_id").as("eval_id"), col("n_hit")),
        Seq("eval_id"), "left")
      .select(col("eval_id"), col("n_sh"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
  }

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

  /** [[overlaps]] with a Bloom prefilter gating the training-side scan —
    * result is EXACTLY equal, by the filter's no-false-negative property:
    * a train doc's overlap with any single eval doc is bounded by its
    * shingle hit count against the whole eval set's Bloom filter
    * (shared shingles ⊆ eval shingles ⊆ Bloom positives, and the fused
    * kernel's with-multiplicity count ≥ the distinct count), so every doc
    * the gate drops had < minOverlap overlap with EVERY eval doc. False
    * positives only widen the candidate set; the exact shingle-join verify
    * then reproduces [[overlaps]] on the survivors.
    *
    * Scale shape (100 TB): the eval set is fixed-size, so its filter is a
    * compile-once plan constant (numBits/8 bytes — 128 KB at the default
    * 2^20 bits, ~0.2% fp at 100k eval shingles with 4 hashes) evaluated
    * map-side inside whole-stage codegen: the corpus scan shuffles NOTHING
    * — not even doc ids — until a doc actually clears the gate. The
    * shingle-join verify, the only shuffle-bearing stage, then runs over
    * the contaminated fraction (~0 of the corpus) instead of all of it.
    * This is the standard web-scale decontamination structure (Bloom
    * prefilter + exact verify).
    *
    * Cap-free by design: `maxShingleDf`'s stop set is a function of the
    * full train∪eval corpus, which a gated scan no longer sees — compose
    * the cap via [[overlapsAgainst]] on the ungated relation instead.
    */
  def bloomOverlaps(
      train: DataFrame,
      eval: DataFrame,
      n: Int = 3,
      minOverlap: Long = 10,
      numBits: Int = 1 << 20,
      numHashes: Int = 4,
      broadcastEval: Boolean = false): DataFrame = {
    // eval shingles feed the filter build AND the verify join — persist,
    // or the tokenize+explode pipeline runs twice (the q19 lesson)
    val evalSh = TextDedup.shingles(eval, n).persist(StorageLevel.MEMORY_AND_DISK)
    val bloom: Array[Long] = evalSh
      .agg(CB.column(
        BloomFilterAgg(CB.expression(xxhash64(col("shingle"))), numBits, numHashes)
          .toAggregateExpression()).as("bloom"))
      .head().getSeq[Long](0).toArray
    // Fused gate kernel (round-19 optimization): one compiled loop hashes
    // each n-gram out of a reused byte buffer — no shingle-array
    // materialization, no interpreted HOF chain. It counts WITH
    // multiplicity (the unfused BloomHits counted distinct shingles),
    // which only LOOSENS the gate: true overlap ≤ distinct hits ≤ hits
    // with multiplicity, so no contaminated doc is ever dropped and the
    // exact verify join below reproduces the identical result.
    val gated = train
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= n)
      .filter(CB.column(ShingleBloomHits(
        CB.expression(col("w")), n, bloom, numHashes)) >= minOverlap)
      .drop("w")
    overlapsAgainst(TextDedup.shingles(gated, n), evalSh, minOverlap, broadcastEval)
  }
}
