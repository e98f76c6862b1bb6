package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Concat-and-cut sequence packing — the GPT-style pre-training shape:
  * the corpus is one logical token stream in a deterministic global
  * order, cut every `seqLen` tokens into fixed-length training
  * sequences; documents STRADDLE cuts (unlike [[ShardPack]], whose
  * shards never split a document). The output is the pack MANIFEST:
  * one row per (document × sequence it touches) with the document's
  * token span and its offset inside the sequence — exactly what a
  * loader needs to materialize sequence tensors without ever holding
  * more than one document.
  *
  * Scale shape: the global order and cumulative offsets come from
  * [[ShardPack.pack]]'s two-phase distributed prefix sum (bucket
  * totals broadcast, per-bucket windows — no global sort, no global
  * window over rows). Span explosion is `sequence()` + `explode` on
  * each row: O(spans) output rows, each document touching
  * `1 + ntok/seqLen` sequences. Nothing is collected driver-side.
  *
  * Reference anchor: the reference stores raw documents
  * (`init-db.sql` corpus tables); packing them into fixed context
  * windows is the step between its corpus and a training run.
  */
object SequencePack {

  /** Pack manifest for cutting the corpus into `seqLen`-token
    * sequences. Output columns (input columns are kept):
    *   - `seq`      — sequence index the span belongs to;
    *   - `doc_lo`   — first token of the document inside this span
    *                  (inclusive, document-relative);
    *   - `doc_hi`   — end token (exclusive, document-relative);
    *   - `seq_off`  — where the span starts inside the sequence.
    * Invariants (gate-checked by q102): per document the spans cover
    * exactly `[0, ntok)` in order; per sequence the spans tile exactly
    * `[0, seqLen)` (the final sequence may be shorter).
    *
    * @param key    unique non-negative integral id (global-order input)
    * @param tokens per-document token count (rows with 0 tokens emit
    *               no spans)
    */
  def spans(df: DataFrame, key: Column, tokens: Column, seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen=$seqLen must be > 0")
    val reserved = Seq("seq", "doc_lo", "doc_hi", "seq_off", "__ntok")
    require(!reserved.exists(df.columns.contains),
      s"input already has one of ${reserved.mkString("/")} — rename it first")
    // cum_before/shard from the distributed prefix sum; shard is ShardPack's
    // no-split assignment, not ours — drop it
    val cum = ShardPack.pack(df.withColumn("__ntok", tokens.cast("long")),
      key, col("__ntok"), budget = seqLen).drop("shard")
    cum.filter(col("__ntok") > 0L)
      .withColumn("seq", explode(expr(
        s"sequence(cum_before div ${seqLen}L, " +
          s"(cum_before + __ntok - 1L) div ${seqLen}L)")))
      .withColumn("doc_lo",
        greatest(lit(0L), col("seq") * seqLen - col("cum_before")))
      .withColumn("doc_hi",
        least(col("__ntok"), (col("seq") + 1L) * seqLen - col("cum_before")))
      .withColumn("seq_off",
        greatest(lit(0L), col("cum_before") - col("seq") * seqLen))
      .drop("__ntok", "cum_before")
  }
}
