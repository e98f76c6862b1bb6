package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of independently
  * produced rankings — the standard way a retrieval pipeline combines
  * lexical (BM25) and dense (embedding-cosine) top-k lists without
  * score calibration (Cormack/Clarke/Buettcher's RRF: each list
  * contributes 1/(c + rank); missing from a list contributes 0).
  *
  * Scale shape: the inputs are TOP-K lists (bounded by k·#lists rows,
  * model-sized, not corpus-sized) — the corpus-sized work already
  * happened inside the rankers ([[Bm25]] one-pass scoring, the
  * LSH/IVF/PQ ANN paths). The fusion itself is a k-row full-outer
  * join chain plus one bounded sort, so the deliberately unpartitioned
  * final window is over ≤ Σk rows, never data (the [[Bm25]] top-k
  * convention). Double determinism: every contribution is 1.0/(c+r)
  * for small integers r, summed in FIXED list order — both engines
  * produce bit-identical IEEE doubles. */
object HybridRetrieval {

  /** Fuse `rankings` — each a (id, rnk) relation, rank 1-based, at most
    * one row per id — into the RRF top-`k`: (id, rrf, rnk). */
  def rrf(rankings: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    val contribs = rankings.zipWithIndex.map { case (df, i) =>
      df.select(col("id"),
        (lit(1.0) / (lit(c.toDouble) + col("rnk").cast("double"))).as(s"__c$i"))
    }
    val joined = contribs.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    // fixed fold order over the list index — cross-engine-exact doubles
    val score = contribs.indices
      .map(i => coalesce(col(s"__c$i"), lit(0.0)))
      .reduce(_ + _)
    val w = Window.orderBy(col("rrf").desc, col("id"))
    joined.withColumn("rrf", score)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("id"), col("rrf"), col("rnk"))
  }
}
