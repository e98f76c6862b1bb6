package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding MERGE LEARNING — the tokenizer
  * TRAINING run the [[NgramModel.vocabulary]] stats pass leads into
  * (Sennrich et al.'s subword-units algorithm, the shape behind BPE/
  * WordPiece tokenizers): start from characters, repeatedly merge the
  * globally most frequent adjacent symbol pair, emit the ordered merge
  * table that a tokenizer replays at encode time.
  *
  * The iteration is inherently SEQUENTIAL (merge k+1's counts depend on
  * merge k having been applied), so the distributed form puts the
  * parallelism INSIDE each round: one global pair-count shuffle over
  * the word-frequency relation, a top-1 selection with DETERMINISTIC
  * ties (count DESC, pair ASC — two engines and two runs learn the
  * identical table), a single-row collect, and a map-side merge
  * application. Nothing else ever reaches the driver.
  *
  * 100 TB shape: the CORPUS is touched exactly once — [[wordCounts]]
  * is one word-keyed shuffle with map-side combine, after which every
  * round operates on the VOCABULARY relation (distinct words × counts;
  * millions of rows, not terabytes — the standard trainer shape:
  * corpora dedupe to word counts before BPE ever runs). Each of the K
  * rounds costs one vocab-sized pair shuffle; the top-1 is
  * TakeOrderedAndProject (per-partition top-1, one row to the driver,
  * never a full sort); applying a merge is one codegen'd `replace`
  * projection. The learned state chain stays lazy over the cached
  * initial relation — K is small (a real tokenizer's 30k merges would
  * checkpoint the state every few hundred rounds; the knob is
  * `checkpointEvery`).
  *
  * Symbols are stored SELF-DELIMITED — each symbol as `|sym|`, so a
  * word's state is `|c||a||t|` — because the obvious space-joined form
  * breaks merge application: replacing ` a b ` in ` b a b a b ` eats
  * the shared boundary space and misses the second `(b, a)`
  * occurrence, silently diverging from the greedy leftmost
  * non-overlapping application every reference BPE uses. With each
  * symbol carrying its own delimiters, `replace(state, "|a||b|",
  * "|ab|")` IS exact greedy leftmost merge — adjacent matches share no
  * characters — and the same `replace` semantics hold in every engine
  * (non-overlapping, original-string scan), which is what makes the
  * merge table cross-engine hash-exact.
  *
  * Pre-tokenization rule, stated: only `[a-z]+` words train the model
  * (BPE corpora are pre-normalized; the filter also keeps the symbol
  * alphabet disjoint from the `|` delimiter by construction). */
object Bpe {

  /** One learned merge: at `step` (1-based), the pair (`lhs`, `rhs`)
    * had the globally highest weighted count `cnt`. */
  final case class Merge(step: Int, lhs: String, rhs: String, cnt: Long)

  /** The corpus's word-frequency relation — the ONLY corpus-scale pass
    * (one shuffle, map-side combined). Replays dedupe with
    * [[NgramModel]]'s deterministic min-text survivor convention. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.groupBy(col("doc_id")).agg(min(col("text")).as("text"))
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** `word` → its initial self-delimited character state:
    * "cat" → "|c||a||t|". */
  private def initState(wc: DataFrame): DataFrame =
    wc.select(col("word"), col("freq"),
      array_join(transform(split(col("word"), ""),
        c => concat(lit("|"), c, lit("|"))), "").as("syms"))

  /** Per-round global pair counts over a state relation: one shuffle,
    * map-side combined; the pair is displayed `lhs rhs`. */
  private def pairCounts(state: DataFrame): DataFrame =
    state.select(col("freq"),
        split(trim(col("syms"), "|"), "\\|\\|").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(0, size(t) - 2), " +
          "i -> concat(t[i], ' ', t[i + 1]))")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))

  /** Learn up to `k` merges over `wordCounts`; returns the ordered
    * merge table and the final per-word symbol state (word, freq,
    * syms). Input contract: words must not contain the `|` delimiter
    * or whitespace ([[wordCounts]] enforces the `[a-z]+` rule; a
    * caller supplying its own relation owns that invariant — a `|` in
    * a word would corrupt the self-delimited state).
    * Stops early if the corpus runs out of adjacent pairs.
    * Round cost: one vocab-sized shuffle + a one-row collect; the
    * lazy state chain is cut by `localCheckpoint` every
    * `checkpointEvery` rounds so a large K cannot grow the plan
    * unboundedly. */
  def learn(spark: SparkSession, wordCounts: DataFrame, k: Int,
            checkpointEvery: Int = 50): (Seq[Merge], DataFrame) = {
    var state = initState(wordCounts).cache()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    var dry = false
    while (step <= k && !dry) {
      val best = pairCounts(state)
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1)
        .collect()
      best.headOption match {
        case None => dry = true
        case Some(row) =>
          val Array(lhs, rhs) = row.getString(0).split(' ')
          merges += Merge(step, lhs, rhs, row.getLong(1))
          state = state.withColumn("syms", call_function("replace",
            col("syms"), lit(s"|$lhs||$rhs|"), lit(s"|$lhs$rhs|")))
          if (step % checkpointEvery == 0)
            state = state.localCheckpoint(true)
          step += 1
      }
    }
    (merges.toSeq, state)
  }

  /** The learned merge table as a DataFrame — the q122 gate shape. */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("step", "lhs", "rhs", "cnt")
  }

  /** ENCODE a word relation with an already-learned merge table — the
    * production reuse path (train once, tokenize forever): K chained
    * map-side `replace` projections, no shuffle at all until the
    * caller aggregates. Returns (word, freq, syms). */
  def encode(wordCounts: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(initState(wordCounts)) { (st, m) =>
      st.withColumn("syms", call_function("replace",
        col("syms"), lit(s"|${m.lhs}||${m.rhs}|"), lit(s"|${m.lhs}${m.rhs}|")))
    }

  /** Token frequencies of a (word, freq, syms) state — the tokenized-
    * corpus report (q123 gate shape): top-`topK` subword tokens by
    * total occurrence, ties by token ascending so the cut is
    * engine-identical. One vocab-sized shuffle; top-k is
    * TakeOrderedAndProject. */
  def tokenFrequencies(state: DataFrame, topK: Int): DataFrame =
    state.select(col("freq"),
        explode(split(trim(col("syms"), "|"), "\\|\\|")).as("token"))
      .groupBy(col("token")).agg(sum(col("freq")).as("tf"))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(topK)

  /** Per-DOCUMENT token counts under a learned merge table — the
    * tokenizer-eval metric (tokens per word / per char is THE
    * compression number a tokenizer is judged by, and the budget
    * number a training-data pipeline sizes its shards with): for each
    * document, the `[a-z]+` word count, the total BPE token count
    * after applying `merges`, and the total character count. Integer
    * columns only; the consumer forms whatever ratio it wants.
    *
    * 100 TB shape: the per-word token table is VOCAB-sized and
    * BROADCASTS; the corpus pass is one map-side explode + broadcast
    * join + doc-keyed aggregation — tokenizing never shuffles anything
    * but the final per-doc rows. */
  def docTokenCounts(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val enc = encode(wordCounts(docs), merges)
      .select(col("word"),
        size(split(trim(col("syms"), "|"), "\\|\\|")).as("n_tok"))
    docs.groupBy(col("doc_id")).agg(min(col("text")).as("text"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .join(broadcast(enc), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_tok")).cast("long").as("n_tokens"),
        sum(length(col("word"))).cast("long").as("n_chars"))
  }
}
