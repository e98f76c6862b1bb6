package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.operators.{Bm25, PqSearch}

/** Retrieval extension queries: BM25 ranked search over the documents
  * corpus (the scoring side of q73's inverted index) and
  * product-quantization ANN over the embeddings table (the compression
  * tier between q21's brute force and q36's IVF cells).
  */
object RetrievalQueries {

  /** BM25 (rational-IDF form, [[graft.operators.Bm25]]) top-10 for a fixed
    * 3-term query. The oracle replays the identical exact-integer-ratio
    * arithmetic in DuckDB, so the double scores hash bit-for-bit. */
  val q76Bm25: Q = Q(
    "q76_bm25_topk",
    Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      f AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
                   CAST(len(list_filter(w, x -> x = 'merge')) AS BIGINT) AS tf0,
                   CAST(len(list_filter(w, x -> x = 'window')) AS BIGINT) AS tf1,
                   CAST(len(list_filter(w, x -> x = 'scan')) AS BIGINT) AS tf2
            FROM d),
      s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS t,
                   CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
                   CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
                   CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
            FROM f),
      sc AS (SELECT f.doc_id,
                    (((CAST(2*(s.n - s.df0) + 1 AS DOUBLE) / CAST(2*s.df0 + 1 AS DOUBLE))
                       * (CAST(44*CAST(s.t AS HUGEINT)*f.tf0 AS DOUBLE)
                          / CAST(20*CAST(s.t AS HUGEINT)*f.tf0 + 6*CAST(s.t AS HUGEINT) + 18*CAST(f.dl AS HUGEINT)*s.n AS DOUBLE))
                     + (CAST(2*(s.n - s.df1) + 1 AS DOUBLE) / CAST(2*s.df1 + 1 AS DOUBLE))
                       * (CAST(44*CAST(s.t AS HUGEINT)*f.tf1 AS DOUBLE)
                          / CAST(20*CAST(s.t AS HUGEINT)*f.tf1 + 6*CAST(s.t AS HUGEINT) + 18*CAST(f.dl AS HUGEINT)*s.n AS DOUBLE)))
                     + (CAST(2*(s.n - s.df2) + 1 AS DOUBLE) / CAST(2*s.df2 + 1 AS DOUBLE))
                       * (CAST(44*CAST(s.t AS HUGEINT)*f.tf2 AS DOUBLE)
                          / CAST(20*CAST(s.t AS HUGEINT)*f.tf2 + 6*CAST(s.t AS HUGEINT) + 18*CAST(f.dl AS HUGEINT)*s.n AS DOUBLE))) AS score
             FROM f, s),
      r AS (SELECT doc_id, score,
                   CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
            FROM sc)
      SELECT doc_id, score, rnk FROM r WHERE rnk <= 10"""),
    headline = true) { (spark, dir) =>
    // spread (guide §2.5): tokenize + tf explode fuse into the scan
    Bm25.topK(graft.Tables.tableSpread(spark, dir, "documents", col("doc_id")),
      Seq("merge", "window", "scan"), k = 10)
  }

  /** PQ asymmetric-distance ANN ([[graft.operators.PqSearch]]): queries
    * vec_id < 10, top-5 by exact-integer approximate squared distance.
    * The oracle rebuilds codebook, codes, and ADC tables in SQL — all
    * integer arithmetic, so the gate is exact (and proves the Spark
    * side's argmin tie-breaking and table lookups, not just row counts). */
  val q77PqAnn: Q = Q(
    "q77_pq_ann",
    Some("""
      WITH e AS (
        SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(FLOOR(CAST(x AS DOUBLE) * 16777216.0) AS BIGINT)) AS v
        FROM embeddings),
      c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
      js AS (SELECT UNNEST(range(0, 8)) AS j),
      ix AS (SELECT UNNEST(range(1, 9)) AS i),
      d2 AS (SELECT e.vec_id AS nid, js.j, c.cid,
                    CAST(SUM((e.v[js.j*8 + ix.i] - c.cv[js.j*8 + ix.i])
                             * (e.v[js.j*8 + ix.i] - c.cv[js.j*8 + ix.i])) AS BIGINT) AS d2
             FROM e, js, c, ix
             GROUP BY 1, 2, 3),
      codes AS (SELECT nid, j, cid AS code
                FROM (SELECT nid, j, cid,
                             row_number() OVER (PARTITION BY nid, j ORDER BY d2, cid) AS rn
                      FROM d2)
                WHERE rn = 1),
      qd AS (SELECT nid AS qid, j, cid, d2 FROM d2 WHERE nid < 10),
      ad AS (SELECT qd.qid, codes.nid, CAST(SUM(qd.d2) AS BIGINT) AS ad2
             FROM codes JOIN qd ON codes.j = qd.j AND codes.code = qd.cid
             WHERE qd.qid <> codes.nid
             GROUP BY 1, 2),
      r AS (SELECT qid, nid, ad2,
                   CAST(row_number() OVER (PARTITION BY qid ORDER BY ad2, nid) AS INTEGER) AS rnk
            FROM ad)
      SELECT qid, nid, rnk, ad2 FROM r WHERE rnk <= 5"""),
    headline = true) { (spark, dir) =>
    // NO spread (measured, round 19; in-JVM alternating A/B: 0.70 plain
    // vs 0.84-0.95 spread warm): codebook training re-scans emb per
    // k-means batch through driver collects — each repays the exchange
    val emb = table(spark, dir, "embeddings")
    PqSearch.pqTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
  }

  /** Multi-query BM25 ([[graft.operators.Bm25.topKMulti]]): three query
    * term-bags scored against the corpus in one pass, top-10 each. The
    * oracle replays the slot-pivoted arithmetic — same rational-IDF
    * integer ratios as q76, candidates restricted to docs sharing ≥ 1
    * term (the inverted-index contract), per-term scores summed in slot
    * order — so all three queries' double scores hash bit-for-bit. */
  val q84Bm25Multi: Q = Q(
    "q84_bm25_multi",
    Some("""
      WITH q AS (
        SELECT CAST(query_id AS BIGINT) AS query_id, terms
        FROM (VALUES (0, ['merge', 'window', 'scan']),
                     (1, ['filter', 'join']),
                     (2, ['vector'])) AS t(query_id, terms)),
      qt AS (SELECT query_id, CAST(i AS INTEGER) - 1 AS pos,
                    terms[CAST(i AS INTEGER)] AS term
             FROM q, (SELECT UNNEST(range(1, 4)) AS i) ix
             WHERE i <= len(terms)),
      d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      f AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, w FROM d),
      tok AS (SELECT doc_id, dl, UNNEST(w) AS term FROM f),
      tf AS (SELECT qt.query_id, tok.doc_id, MIN(tok.dl) AS dl,
                    CAST(SUM(CASE WHEN qt.pos = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tf0,
                    CAST(SUM(CASE WHEN qt.pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tf1,
                    CAST(SUM(CASE WHEN qt.pos = 2 THEN 1 ELSE 0 END) AS BIGINT) AS tf2
             FROM tok JOIN qt ON tok.term = qt.term
             GROUP BY 1, 2),
      dfs AS (SELECT query_id,
                     CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
                     CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
                     CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
              FROM tf GROUP BY 1),
      s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS t FROM f),
      sc AS (SELECT tf.query_id, tf.doc_id,
                ((
                  (CAST(2*(s.n - dfs.df0) + 1 AS DOUBLE) / CAST(2*dfs.df0 + 1 AS DOUBLE))
                    * (CAST(44*CAST(s.t AS HUGEINT)*tf.tf0 AS DOUBLE)
                       / CAST(20*CAST(s.t AS HUGEINT)*tf.tf0 + 6*CAST(s.t AS HUGEINT) + 18*CAST(tf.dl AS HUGEINT)*s.n AS DOUBLE))
                 ) + (
                  (CAST(2*(s.n - dfs.df1) + 1 AS DOUBLE) / CAST(2*dfs.df1 + 1 AS DOUBLE))
                    * (CAST(44*CAST(s.t AS HUGEINT)*tf.tf1 AS DOUBLE)
                       / CAST(20*CAST(s.t AS HUGEINT)*tf.tf1 + 6*CAST(s.t AS HUGEINT) + 18*CAST(tf.dl AS HUGEINT)*s.n AS DOUBLE))
                 )) + (
                  (CAST(2*(s.n - dfs.df2) + 1 AS DOUBLE) / CAST(2*dfs.df2 + 1 AS DOUBLE))
                    * (CAST(44*CAST(s.t AS HUGEINT)*tf.tf2 AS DOUBLE)
                       / CAST(20*CAST(s.t AS HUGEINT)*tf.tf2 + 6*CAST(s.t AS HUGEINT) + 18*CAST(tf.dl AS HUGEINT)*s.n AS DOUBLE))
                 ) AS score
             FROM tf JOIN dfs USING (query_id), s),
      r AS (SELECT query_id, doc_id, score,
                   CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
            FROM sc)
      SELECT query_id, doc_id, score, rnk FROM r WHERE rnk <= 10"""),
    headline = true) { (spark, dir) =>
    import spark.implicits._
    val qs = Seq(
      (0L, Seq("merge", "window", "scan")),
      (1L, Seq("filter", "join")),
      (2L, Seq("vector"))).toDF("query_id", "terms")
    Bm25.topKMulti(table(spark, dir, "documents"), qs, k = 10, maxTerms = 3)
  }

  /** Hybrid retrieval (q95): BM25 top-50 for a fixed lexical query
    * fused with embedding-cosine top-50 for a fixed dense query via
    * reciprocal-rank fusion ([[graft.operators.HybridRetrieval.rrf]]).
    * The oracle replays BOTH rankers exactly (q76's rational-IDF BM25,
    * q21's scaled-integer cosine) and then the same fixed-order
    * 1/(60+rank) double fold, so the fused scores hash bit-for-bit —
    * the gate proves rank computation, list alignment (full-outer id
    * join, absent-list contribution 0), and fusion-order determinism
    * all at once. */
  val q95HybridRrf: Q = Q(
    "q95_hybrid_rrf",
    Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      f AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
                   CAST(len(list_filter(w, x -> x = 'merge')) AS BIGINT) AS tf0,
                   CAST(len(list_filter(w, x -> x = 'window')) AS BIGINT) AS tf1,
                   CAST(len(list_filter(w, x -> x = 'scan')) AS BIGINT) AS tf2
            FROM d),
      s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS t,
                   CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
                   CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
                   CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
            FROM f),
      sc AS (SELECT f.doc_id,
                    (((CAST(2*(s.n - s.df0) + 1 AS DOUBLE) / CAST(2*s.df0 + 1 AS DOUBLE))
                       * (CAST(44*CAST(s.t AS HUGEINT)*f.tf0 AS DOUBLE)
                          / CAST(20*CAST(s.t AS HUGEINT)*f.tf0 + 6*CAST(s.t AS HUGEINT) + 18*CAST(f.dl AS HUGEINT)*s.n AS DOUBLE))
                     + (CAST(2*(s.n - s.df1) + 1 AS DOUBLE) / CAST(2*s.df1 + 1 AS DOUBLE))
                       * (CAST(44*CAST(s.t AS HUGEINT)*f.tf1 AS DOUBLE)
                          / CAST(20*CAST(s.t AS HUGEINT)*f.tf1 + 6*CAST(s.t AS HUGEINT) + 18*CAST(f.dl AS HUGEINT)*s.n AS DOUBLE)))
                     + (CAST(2*(s.n - s.df2) + 1 AS DOUBLE) / CAST(2*s.df2 + 1 AS DOUBLE))
                       * (CAST(44*CAST(s.t AS HUGEINT)*f.tf2 AS DOUBLE)
                          / CAST(20*CAST(s.t AS HUGEINT)*f.tf2 + 6*CAST(s.t AS HUGEINT) + 18*CAST(f.dl AS HUGEINT)*s.n AS DOUBLE))) AS score
             FROM f, s),
      rb AS (SELECT doc_id AS id,
                    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
             FROM sc),
      rb50 AS (SELECT * FROM rb WHERE rnk <= 50),
      e AS (SELECT vec_id,
                   list_transform(embedding,
                     x -> CAST(FLOOR(CAST(x AS DOUBLE) * 16777216.0) AS BIGINT)) AS v
            FROM embeddings),
      q AS (SELECT * FROM e WHERE vec_id = 0),
      idx AS (SELECT UNNEST(range(1, 65)) AS i),
      pr AS (SELECT e.vec_id AS nid, CAST(SUM(q.v[i] * e.v[i]) AS BIGINT) AS dot
             FROM q, e, idx WHERE q.vec_id <> e.vec_id GROUP BY 1),
      nn AS (SELECT vec_id, CAST(SUM(v[i] * v[i]) AS BIGINT) AS n2
             FROM e, idx GROUP BY 1),
      c AS (SELECT pr.nid,
                   CAST(dot AS DOUBLE) / (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(nv.n2 AS DOUBLE))) AS cosine
            FROM pr, (SELECT n2 FROM nn WHERE vec_id = 0) qn
            JOIN nn nv ON pr.nid = nv.vec_id),
      rv AS (SELECT nid AS id,
                    CAST(row_number() OVER (ORDER BY cosine DESC, nid) AS INTEGER) AS rnk
             FROM c),
      rv50 AS (SELECT * FROM rv WHERE rnk <= 50),
      fused AS (
        SELECT COALESCE(b.id, v.id) AS id,
               COALESCE(1.0/(60 + b.rnk), 0.0) + COALESCE(1.0/(60 + v.rnk), 0.0) AS rrf
        FROM rb50 b FULL OUTER JOIN rv50 v ON b.id = v.id),
      r AS (SELECT id, rrf,
                   CAST(row_number() OVER (ORDER BY rrf DESC, id) AS INTEGER) AS rnk
            FROM fused)
      SELECT id, rrf, rnk FROM r WHERE rnk <= 10""")) { (spark, dir) =>
    import graft.operators.{HybridRetrieval, VectorSearch}
    val lexical = Bm25.topK(table(spark, dir, "documents"),
      Seq("merge", "window", "scan"), k = 50)
      .select(col("doc_id").as("id"), col("rnk"))
    val emb = table(spark, dir, "embeddings")
    val dense = VectorSearch.bruteForceTopK(
      emb.filter(col("vec_id") === 0), emb, k = 50)
      .select(col("nid").as("id"), col("rnk"))
    HybridRetrieval.rrf(Seq(lexical, dense), k = 10)
  }

  val all: Seq[Q] = Seq(q76Bm25, q77PqAnn, q84Bm25Multi, q95HybridRrf)
}
