package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25-family ranked retrieval over a (doc_id, text) corpus for a fixed
  * bag of query terms — the scoring side of the inverted index (q73):
  * "which documents should a training-data curator look at for these
  * keywords".
  *
  * Scoring: per term, the classic BM25 term-frequency saturation
  * `tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))` with k1 = 1.2, b = 0.75,
  * multiplied by an inverse-document-frequency weight, summed over the
  * query terms. The IDF here is the RATIONAL odds form
  * `(N − df + ½)/(df + ½)` — i.e. exp(idf_BM25) — rather than the
  * logarithm: every input is an exact integer, so each per-term score is
  * ONE integer-ratio division and one multiply, and the final score is a
  * fixed-order sum — a sequence of correctly-rounded IEEE-754 ops that
  * DuckDB reproduces bit-for-bit (ln carries no such guarantee across
  * libm implementations, and a hash-compared gate cannot tolerate 1-ulp
  * drift). The log form compresses the same ordering per term; swapping
  * it in is a one-line change where cross-engine bit-equality is not a
  * requirement.
  *
  * Scale shape: term frequencies and document length are map-side
  * higher-order functions over the split text (no shuffle); corpus
  * statistics (N, total tokens, per-term document frequencies) are ONE
  * single-row aggregate broadcast back; scoring is a map-side projection
  * and the top-k is TakeOrderedAndProject — one scan end to end, no
  * data-sized shuffle at any size.
  */
object Bm25 {

  // k1 = K1N/K1D = 1.2, b = BN/BD = 0.75, kept rational so the saturation
  // denominator clears to one exact integer ratio (see scaladoc)
  private val K1N = 6L; private val K1D = 5L
  private val BN = 3L; private val BD = 4L

  /** Top-k docs by summed rational-IDF BM25 score for `terms`.
    * Output: (doc_id, score, rnk), rnk 1-based by (score desc, doc_id). */
  def topK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25: need at least one query term")
    require(terms.distinct.size == terms.size, "bm25: duplicate query terms")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(col("w"), x => x === lit(t))).cast("long").as(s"tf$i")
    }
    val d = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id") +: size(col("w")).cast("long").as("dl") +: tfCols: _*)
    val statCols = count(lit(1)).as("n") +: sum(col("dl")).as("t") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = d.agg(statCols.head, statCols.tail: _*)
    val scored0 = d.crossJoin(broadcast(stats))
    // per-term: idf = (2(N-df)+1)/(2df+1); satTF cleared to the exact
    // integer ratio  (K1N+K1D)·BD·T·tf / (K1D·BD·T·tf + K1N·(BD−BN)·T + K1N·BN·dl·N).
    // The cleared products are computed in DECIMAL(38,0) (oracle:
    // HUGEINT): 44·T·tf wraps a 64-bit long once T·tf exceeds ~2·10^17 —
    // a 100 TB corpus with a term-stuffed doc gets there — and a wrapped
    // long would corrupt the ranking silently. Decimal keeps the integer
    // exact; the final cast to double is the same correctly-rounded
    // conversion in both engines.
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val termScores: Seq[Column] = terms.indices.map { i =>
      val tf = col(s"tf$i"); val df = col(s"df$i")
      val t38 = col("t").cast(dec)
      val idf = (lit(2L) * (col("n") - df) + lit(1L)).cast("double") /
        (lit(2L) * df + lit(1L)).cast("double")
      val num = (lit((K1N + K1D) * BD) * t38 * tf).cast("double")
      val den = (lit(K1D * BD) * t38 * tf + lit(K1N * (BD - BN)) * t38 +
        lit(K1N * BN) * col("dl").cast(dec) * col("n")).cast("double")
      idf * (num / den)
    }
    // fixed left-fold addition order — the one float-sum order both
    // engines share
    val score = termScores.reduceLeft(_ + _)
    val top = scored0.withColumn("score", score)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
    top.withColumn("rnk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("score"), col("rnk"))
  }

  /** Multi-query top-k: the retrieval shape a curation pipeline actually
    * runs — a `(query_id, terms array<string>)` RELATION of queries,
    * scored against the corpus in ONE pass, per-query top-k out.
    *
    * Shape: query terms explode to a tiny (query_id, pos, term) relation
    * that BROADCAST-joins the exploded corpus tokens (map-side — no
    * data-sized shuffle to get per-query term frequencies), then one
    * (query_id, doc_id) aggregate pivots the matched positions into
    * fixed tf-slots. Candidates are docs sharing ≥ 1 term with the query
    * (the inverted-index retrieval contract — a doc matching no term
    * scores 0 and is not a result), so the aggregate and the per-query
    * top-k window run over |matching (query, doc) pairs|, not
    * |queries| × |corpus|.
    *
    * Exactness: per-term scores live in FIXED position slots
    * (0 until maxTerms) and sum by a left fold in slot order — the same
    * deterministic float-addition sequence as [[topK]]'s column fold, so
    * the scores hash bit-for-bit against an oracle replay. Slots past a
    * query's term count contribute exactly +0.0 (tf = 0 zeroes the
    * saturation numerator).
    *
    * @param queries  (query_id, terms) — terms must be per-query
    *                 distinct, at most `maxTerms` of them
    * @param maxTerms slot count; compile-time-fixed score expression
    *                 width, NOT a corpus-side cost (empty slots are +0.0)
    * @return (query_id, doc_id, score, rnk), rnk 1-based per query by
    *         (score desc, doc_id)
    */
  /** @param broadcastQueries hint the query-terms relation (and the
    *        per-query df aggregates) for broadcast — right while a pass
    *        carries up to a few thousand terms (SCALE.md's batching
    *        knob). `false` drops the hint so the planner may shuffle
    *        both sides instead — the fallback once a single pass carries
    *        enough terms that replicating them to every task costs more
    *        than hash-partitioning the token stream; results are
    *        identical either way (spec-pinned). */
  def topKMulti(docs: DataFrame, queries: DataFrame, k: Int,
                maxTerms: Int = 8, broadcastQueries: Boolean = true): DataFrame = {
    // tiny, consumed twice (validation + the broadcast join), and bounded
    // by the documented queries-per-pass knob: collected ONCE to the
    // driver and re-localized, so the upstream plan runs a single time
    // and nothing stays persisted after the call (a persist here leaked
    // one cached relation per invocation in long-lived sessions)
    val qtPlan = queries.select(col("query_id"),
      posexplode(col("terms")).as(Seq("pos", "term")))
    val qtRows = qtPlan.collect()
    // driver checks over the tiny query relation: slot bound + per-query
    // term uniqueness (a duplicated term would double-count its tf slots
    // — same contract as topK's distinct require)
    require(qtRows.nonEmpty, "bm25: empty query relation")
    val maxPos = qtRows.iterator.map(_.getInt(1)).max
    require(maxPos < maxTerms,
      s"bm25: a query has ${maxPos + 1} terms, maxTerms=$maxTerms")
    require(qtRows.iterator.map(r => (r.get(0), r.get(2))).toSet.size == qtRows.length,
      "bm25: duplicate terms within a query")
    val spark = queries.sparkSession
    val qt = spark.createDataFrame(
      spark.sparkContext.parallelize(qtRows.toSeq, 1), qtPlan.schema)

    val d = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"), col("w"))
    val stats = d.agg(count(lit(1)).as("n"), sum(col("dl")).as("t"))
    val toks = d.select(col("doc_id"), col("dl"), explode(col("w")).as("term"))

    def hinted(df: DataFrame) = if (broadcastQueries) broadcast(df) else df
    val tfCols = (0 until maxTerms).map(i =>
      sum(when(col("pos") === i, 1L).otherwise(0L)).as(s"tf$i"))
    val tf = toks.join(hinted(qt), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      // min, not first: constant per doc, deterministic in every engine
      .agg(min(col("dl")).as("dl"), tfCols: _*)
    val dfCols = (0 until maxTerms).map(i =>
      sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val dfs = tf.groupBy(col("query_id")).agg(dfCols.head, dfCols.tail: _*)

    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val scored0 = tf.join(hinted(dfs), Seq("query_id"))
      .crossJoin(broadcast(stats)) // single-row stats: always broadcast
    // identical per-term arithmetic to topK (see its scaladoc for the
    // cleared-ratio derivation and the DECIMAL(38,0) overflow guard)
    val termScores: Seq[Column] = (0 until maxTerms).map { i =>
      val tfc = col(s"tf$i"); val dfc = col(s"df$i")
      val t38 = col("t").cast(dec)
      val idf = (lit(2L) * (col("n") - dfc) + lit(1L)).cast("double") /
        (lit(2L) * dfc + lit(1L)).cast("double")
      val num = (lit((K1N + K1D) * BD) * t38 * tfc).cast("double")
      val den = (lit(K1D * BD) * t38 * tfc + lit(K1N * (BD - BN)) * t38 +
        lit(K1N * BN) * col("dl").cast(dec) * col("n")).cast("double")
      idf * (num / den)
    }
    val score = termScores.reduceLeft(_ + _)
    scored0.withColumn("score", score)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"), col("score"), col("rnk"))
  }
}
