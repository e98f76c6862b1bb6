package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.RollingHash
import graft.operators.{Multimodal, TextDedup, VectorSearch}

/** Dedup + similarity-search extension queries (SURVEY §7.1). The exact
  * n-gram-Jaccard SQL doubles as the oracle for the MinHash-LSH path, whose
  * candidate-verify design makes it result-identical on corpora whose
  * near-dup pairs sit far above the threshold (this one: j≈0.98 vs <0.1).
  */
object DedupSimQueries {

  private def exactJaccardSqlAt(minJaccard: String): String = s"""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      pos AS (SELECT doc_id, w, UNNEST(range(1, len(w) - 1)) AS i
              FROM tok WHERE len(w) >= 3),
      sh AS (SELECT DISTINCT doc_id,
                    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
             FROM pos),
      sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT it.a_id, it.b_id,
             it.i / (sa.n + sb.n - it.i) AS jaccard
      FROM inter it
      JOIN sz sa ON it.a_id = sa.doc_id
      JOIN sz sb ON it.b_id = sb.doc_id
      WHERE it.i / (sa.n + sb.n - it.i) >= $minJaccard"""

  private val exactJaccardSql = exactJaccardSqlAt("0.5")

  /** Exact all-pairs word-3-gram Jaccard ≥ 0.5 (small-scale/oracle path). */
  val q18NgramJaccard: Q = Q(
    "q18_ngram_jaccard",
    Some(exactJaccardSql)) { (spark, dir) =>
    // not a bench headline: quadratic-by-design oracle baseline — it would
    // dominate the bench total while saying nothing about the production
    // (q19 LSH) path, which IS headlined
    TextDedup.exactJaccardPairs(table(spark, dir, "documents"), n = 3, minJaccard = 0.5)
  }

  /** MinHash-LSH near-dup detection (scale path): 64 perms, 16 bands × 4.
    * Oracle = the exact-Jaccard SQL — candidates are verified exactly, so
    * output matches exact all-pairs when recall holds (j≈0.98 here). */
  val q19MinhashLsh: Q = Q(
    "q19_minhash_lsh",
    Some(exactJaccardSql),
    headline = true) { (spark, dir) =>
    // NO spread (measured, round 19): ABA-ordered bench A/B (old-new-old,
    // drift-bracketed) reads plain 1.07-1.11 vs spread 1.56 — the
    // probe run that favored the spread was itself order-biased
    // (spread always ran second, warmed)
    TextDedup.minhashPairs(table(spark, dir, "documents"), n = 3, minJaccard = 0.5)
  }

  /** SimHash (shingle features) near-dup pairs, Hamming ≤ 12. The oracle
    * rebuilds the ENTIRE signature in DuckDB SQL: the shingle hash is
    * [[TextDedup.md5Hash60]] (first 15 hex chars of md5 → 60-bit int —
    * md5 is the one wide hash both engines compute byte-identically), the
    * per-bit votes and sign assembly are plain aggregates, and the
    * all-pairs Hamming join is affordable at oracle SF. The engine side
    * runs the banded production path (15 bands × 4 bits, exact for
    * Hamming ≤ 14 by pigeonhole), so the oracle ALSO proves the banding
    * loses no pairs. xxhash64 remains the engine default elsewhere. */
  val q20Simhash: Q = Q(
    "q20_simhash",
    Some("""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      pos AS (SELECT doc_id, w, UNNEST(range(1, len(w) - 1)) AS i
              FROM tok WHERE len(w) >= 3),
      sh AS (SELECT DISTINCT doc_id,
                    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
             FROM pos),
      hs AS (SELECT doc_id,
                    list_reduce(
                      list_prepend(CAST(0 AS BIGINT),
                        list_transform(
                          string_split(substring(md5(shingle), 1, 15), ''),
                          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
                      (a, d) -> a * 16 + d) AS h
             FROM sh),
      bits AS (SELECT UNNEST(range(0, 60)) AS b),
      votes AS (SELECT doc_id, b,
                       SUM(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS v
                FROM hs, bits GROUP BY 1, 2),
      sig AS (SELECT doc_id,
                     CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b)
                              ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS s
              FROM votes GROUP BY 1)
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.s, b.s)) <= 12""")) { (spark, dir) =>
    TextDedup.simhashPairs(table(spark, dir, "documents"), maxHamming = 12,
      bands = 15, hash = TextDedup.md5Hash60, widthBits = 60)
  }

  /** Verbatim-span overlap (q79): doc pairs sharing 20-token windows
    * word-for-word — span-level exact-substring dedup, the modality
    * Jaccard misses ([[graft.operators.TextDedup.verbatimSpans]]). */
  val q79VerbatimSpans: Q = Q(
    "q79_verbatim_spans",
    Some("""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      pos AS (SELECT doc_id, w, UNNEST(range(1, len(w) - 18)) AS i
              FROM tok WHERE len(w) >= 20),
      sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+19], ' ') AS shingle
             FROM pos),
      p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   CAST(COUNT(*) AS BIGINT) AS shared_spans
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
      SELECT a_id, b_id, shared_spans FROM p WHERE shared_spans >= 1""")) {
    (spark, dir) =>
      TextDedup.verbatimSpans(table(spark, dir, "documents"), n = 20, minSpans = 1)
  }

  /** Brute-force cosine top-5 for query vectors vec_id < 20 — the exact ANN
    * baseline, decimal-exact so it oracle-matches DuckDB bit-for-bit. */
  val q21KnnCosine: Q = Q(
    "q21_knn_cosine",
    Some("""
      WITH e AS (
        SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(FLOOR(CAST(x AS DOUBLE) * 16777216.0) AS BIGINT)) AS v
        FROM embeddings),
      q AS (SELECT * FROM e WHERE vec_id < 20),
      idx AS (SELECT UNNEST(range(1, 65)) AS i),
      pr AS (
        SELECT q.vec_id AS qid, e.vec_id AS nid,
               CAST(SUM(q.v[i] * e.v[i]) AS BIGINT) AS dot
        FROM q, e, idx
        WHERE q.vec_id <> e.vec_id
        GROUP BY 1, 2),
      n AS (
        SELECT vec_id, CAST(SUM(v[i] * v[i]) AS BIGINT) AS n2
        FROM e, idx GROUP BY 1),
      c AS (
        SELECT qid, nid,
               CAST(dot AS DOUBLE) / (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(nn.n2 AS DOUBLE))) AS cosine
        FROM pr JOIN n qn ON pr.qid = qn.vec_id JOIN n nn ON pr.nid = nn.vec_id),
      r AS (
        SELECT qid, nid, cosine,
               CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS INTEGER) AS rnk
        FROM c)
      SELECT qid, nid, rnk, cosine FROM r WHERE rnk <= 5""")) { (spark, dir) =>
    // not a bench headline (round-4 swap): brute-force-by-design exact
    // baseline — the production-shape ANN paths q28/q36 are headlined
    val emb = table(spark, dir, "embeddings")
    VectorSearch.bruteForceTopK(emb.filter(col("vec_id") < 20), emb, k = 5)
  }

  /** Deterministic recall gate for an ANN path (q31's approx_ok pattern):
    * evaluate top-1-in-top-5 recall for queries vec_id < 100 against the
    * exact brute-force truth, emit ONE row (n_eval, recall_ok). n_eval is
    * SQL-exact; recall_ok is TRUE iff recall ≥ minRecall — the whole
    * pipeline is deterministic (seeded hyperplanes / strided k-means init),
    * so the oracle gate is stable, with measured margin (LSH 0.82, IVF
    * 0.83–0.90 at the gate SFs vs the 0.5 floor).
    *
    * Bench note: when q28/q36 are timed, the number includes this gate's
    * 100-query exact-truth computation (itself the dot-kernel), so it is
    * an upper bound on the ANN path; q38 headlines the pure LSH path
    * unmasked. */
  private def annRecallGate(
      ann: org.apache.spark.sql.DataFrame,
      emb: org.apache.spark.sql.DataFrame,
      minRecall: Double): org.apache.spark.sql.DataFrame = {
    // ONE pass over the truth relation: left-join ann candidates and count
    // evaluated queries + hits in the same aggregate (computing them as
    // two separate aggregates re-ran the exact 100-query × corpus scoring)
    val truth = VectorSearch
      .bruteForceTopK(emb.filter(col("vec_id") < 100), emb, k = 1)
      .select(col("qid"), col("nid").as("true_nid"))
    truth.join(ann.select(col("qid"), col("nid")), Seq("qid"), "left")
      .agg(
        countDistinct(col("qid")).as("n_eval"),
        countDistinct(when(col("nid") === col("true_nid"), col("qid"))).as("n_hits"))
      .select(
        col("n_eval"),
        (col("n_hits") >= col("n_eval") * minRecall).as("recall_ok"))
  }

  private val annRecallOracle = """
      SELECT CAST(COUNT(*) AS BIGINT) AS n_eval, TRUE AS recall_ok
      FROM embeddings WHERE vec_id < 100"""

  /** Sign-LSH-bucketed ANN (scale path), oracle-gated via the recall row. */
  val q28AnnLsh: Q = Q("q28_ann_lsh", Some(annRecallOracle),
    headline = true) { (spark, dir) =>
    // NO spread (measured, round 19): ABA-ordered bench A/B reads plain
    // 1.06-1.27 vs spread 1.36 — the model build's repeated passes over
    // the small emb table repay the exchange
    val emb = table(spark, dir, "embeddings")
    annRecallGate(VectorSearch.annLsh(emb, k = 5), emb, minRecall = 0.5)
  }

  /** IVF-bucketed ANN (scale path #2), oracle-gated via the recall row.
    * nProbe=8 of 16 cells: measured recall 0.83+ at the gate SFs. */
  val q36IvfAnn: Q = Q("q36_ivf_ann", Some(annRecallOracle),
    headline = true) { (spark, dir) =>
    // NO spread (measured, round 19): ABA-ordered bench A/B is a wash
    // (1.071/1.084 plain vs 1.085 spread) — not shipped without a win
    val emb = table(spark, dir, "embeddings")
    annRecallGate(
      graft.operators.IvfSearch.ivfTopK(emb, k = 5, nProbe = 8), emb, minRecall = 0.5)
  }

  /** IVF with distributed Lloyd refinement (q67): the sample-bootstrapped
    * model from q36 refined by full-corpus passes (map-side assignment
    * kernel + mergeable vector-sum aggregate — k×(dim+1) doubles shuffled
    * per partition per pass). Same deterministic recall gate; refinement
    * can only improve cell quality, and the measured recall at the gate
    * SFs sits at/above q36's 0.83. */
  val q67IvfRefined: Q = Q("q67_ivf_refined", Some(annRecallOracle),
    headline = true) { (spark, dir) =>
    // NO spread (measured, round 19): ABA-ordered bench A/B reads plain
    // 1.30-1.58 vs spread 1.72 — the refine/gate passes repay the
    // exchange like q28's
    val emb = table(spark, dir, "embeddings")
    annRecallGate(
      graft.operators.IvfSearch.ivfTopK(emb, k = 5, nProbe = 8, refineIters = 3),
      emb, minRecall = 0.5)
  }

  /** Multimodal decode plumbing (stubbed codec; deterministic features).
    * Even the STUB is oracle-checked: its pseudo-features derive from the
    * Java 32-bit array-hash of the UTF-8 bytes (`h = 31h + b` with int
    * wraparound), which DuckDB replicates with list_reduce + explicit
    * mod-2^32 arithmetic — so the whole mapPartitions plumbing (typed
    * Dataset, per-partition decode, schema) is verified end-to-end, and a
    * real codec drops into `extractFeatures` without touching the query. */
  val q29MediaFeatures: Q = Q(
    "q29_media_features",
    Some("""
      WITH m AS (
        SELECT doc_id,
               (['image','audio','video'])[(length(source) % 3) + 1] AS modality,
               CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
               list_reduce(
                 list_prepend(CAST(1 AS BIGINT),
                   list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
                 (h, b) -> ((((h * 31 + b + 2147483648) % 4294967296) + 4294967296) % 4294967296) - 2147483648) AS h
        FROM documents)
      SELECT doc_id, modality, n_bytes,
             CAST(16 + ((h % 1024) + 1024) % 1024 AS INTEGER) AS width,
             -- Java >> floors; DuckDB integer // truncates toward zero, so
             -- shift via exact double floor-division (powers of two ≤ 2^31
             -- are exact in doubles)
             CAST(16 + ((CAST(floor(h / 1024.0) AS BIGINT) % 1024) + 1024) % 1024 AS INTEGER) AS height,
             CAST(1 + ((CAST(floor(h / 1048576.0) AS BIGINT) % 4) + 4) % 4 AS INTEGER) AS channels
      FROM m""")) { (spark, dir) =>
    Multimodal.extractFeatures(Multimodal.toMedia(table(spark, dir, "documents"))).toDF()
  }

  /** Rolling-hash fingerprint via the custom codegen Expression, registered
    * as a temp SQL function so it composes with the declarative plan (and
    * whole-stage codegen). Oracle: DuckDB list_reduce over the polynomial —
    * per code point, which equals the Expression's per-UTF-8-byte hash on
    * this all-ASCII corpus (verified: octet_length(encode(text)) ==
    * length(text) for every row). */
  val q30RollingFingerprint: Q = Q(
    "q30_rolling_fingerprint",
    Some("""
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
               (h, b) -> (h * 31 + b) % 2147483647) AS rhash
      FROM documents""")) { (spark, dir) =>
    graft.functions.GraftFunctions.register(spark)
    table(spark, dir, "documents")
      .select(col("doc_id"), expr("rolling_hash(text)").as("rhash"))
  }

  /** Embedding-cosine near-dup pairs ≥ 0.4 — exact integer-cosine, so the
    * DuckDB oracle matches bit-for-bit (dedup family's embedding variant). */
  val q32EmbeddingDedup: Q = Q(
    "q32_embedding_dedup",
    Some("""
      WITH e AS (
        SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(FLOOR(CAST(x AS DOUBLE) * 16777216.0) AS BIGINT)) AS v
        FROM embeddings),
      idx AS (SELECT UNNEST(range(1, 65)) AS i),
      n AS (
        SELECT vec_id, CAST(SUM(v[i] * v[i]) AS BIGINT) AS n2
        FROM e, idx GROUP BY 1),
      pr AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               CAST(SUM(a.v[i] * b.v[i]) AS BIGINT) AS dot
        FROM e a, e b, idx
        WHERE a.vec_id < b.vec_id
        GROUP BY 1, 2)
      SELECT a_id, b_id,
             CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
      FROM pr JOIN n na ON pr.a_id = na.vec_id JOIN n nb ON pr.b_id = nb.vec_id
      WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.4""")) {
    (spark, dir) =>
      VectorSearch.cosineNearDups(table(spark, dir, "embeddings"), minCosine = 0.4)
  }

  /** Composed embedding-dedup SCALE path (q32's production form): sign-LSH
    * bucket candidates → exact integer-cosine verify at the near-dup
    * threshold 0.9. The raw corpus has no pairs ≥ 0.9, so the query plants
    * doubled copies of vec_id < 10 (x + x is IEEE-exact in float AND
    * double, so both engines quantize identically); the DuckDB oracle runs
    * the quadratic exact join over the same union — equality proves the
    * bucket path loses nothing in the regime it exists for. */
  val q38EmbeddingDedupLsh: Q = Q(
    "q38_embedding_dedup_lsh",
    headline = true,
    oracle = Some("""
      WITH src AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT -(vec_id + 1) AS vec_id, list_transform(embedding, x -> x + x) AS embedding
        FROM embeddings WHERE vec_id < 10),
      e AS (
        SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(FLOOR(CAST(x AS DOUBLE) * 16777216.0) AS BIGINT)) AS v
        FROM src),
      idx AS (SELECT UNNEST(range(1, 65)) AS i),
      n AS (
        SELECT vec_id, CAST(SUM(v[i] * v[i]) AS BIGINT) AS n2
        FROM e, idx GROUP BY 1),
      pr AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               CAST(SUM(a.v[i] * b.v[i]) AS BIGINT) AS dot
        FROM e a, e b, idx
        WHERE a.vec_id < b.vec_id
        GROUP BY 1, 2)
      SELECT a_id, b_id,
             CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
      FROM pr JOIN n na ON pr.a_id = na.vec_id JOIN n nb ON pr.b_id = nb.vec_id
      WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.9""")) {
    (spark, dir) =>
      val emb = table(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
      // planted ids are NEGATIVE (-(id+1)) so they can never collide with
      // real vec_ids at ANY scale factor — `vec_id + 1000` collided with
      // genuine rows once the table passed 1000 ids (sf0.1), silently
      // merging two different vectors under one key on both engines
      val planted = emb.filter(col("vec_id") < 10).select(
        (-(col("vec_id") + 1)).as("vec_id"),
        expr("transform(embedding, x -> x + x)").as("embedding"))
      // 10-bit codes: 1024 buckets/table bounds candidate pairs as the
      // corpus grows (bits is the bucket-width knob — scale it with
      // log2(n)); duplicate-level pairs (cos ≈ 1) have identical sign
      // codes, so recall stays ≈ 1 at any width
      VectorSearch.cosineNearDupsLsh(emb.union(planted), minCosine = 0.9,
        nBits = 10, nTables = 16)
  }

  /** SimHash as a PRODUCTION dedup pipeline (candidate-generate +
    * exact-verify, like q19's MinHash shape): banded simhash pairs at
    * Hamming ≤ 12 are the candidates, exact Jaccard ≥ 0.9 the verdict.
    * Oracle = exact all-pairs Jaccard at 0.9 — equality holds because
    * banded simhash recall of j ≥ 0.9 pairs is pinned by the
    * `exact ⊆ sim` OperatorsSpec on this corpus, and verification removes
    * every false candidate. (q20 remains the raw simhash surface,
    * rows-only by design.) */
  val q39SimhashVerified: Q = Q(
    "q39_simhash_verified",
    Some(exactJaccardSqlAt("0.9"))) { (spark, dir) =>
    val docs = table(spark, dir, "documents")
    // ONE corpus shingle pass feeds both the simhash signatures and the
    // Jaccard verify (the q56 shared-pass pattern — unshared, the
    // tokenize+shingle scan ran twice per execution). localCheckpoint,
    // NOT persist: a persist with no unpersist leaked one cached relation
    // per invocation in long-lived sessions; checkpoint blocks are
    // released by the ContextCleaner once the result is dereferenced
    val sh = TextDedup.shingles(docs).localCheckpoint()
    val cands = TextDedup.simhashPairsFromShingles(sh, maxHamming = 12)
      .select(col("a_id"), col("b_id"))
    TextDedup.jaccardFor(cands, sh)
      .filter(col("jaccard") >= 0.9)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  val all: Seq[Q] = Seq(
    q18NgramJaccard, q19MinhashLsh, q20Simhash, q21KnnCosine,
    q28AnnLsh, q29MediaFeatures, q30RollingFingerprint, q32EmbeddingDedup,
    q36IvfAnn, q38EmbeddingDedupLsh, q39SimhashVerified, q67IvfRefined,
    q79VerbatimSpans)
}
