package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{DotProductF64, DotProductI64}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Spark-first: dot products and norms run through graft's codegen'd
  * Catalyst kernels ([[graft.functions.DotProductI64]] /
  * [[graft.functions.DotProductF64]]) — the equivalent `aggregate(
  * zip_with(...))` higher-order functions are INTERPRETED per element,
  * which dominates O(pairs × dim) scoring stages. The brute-force path is
  * the exact baseline; [[annLsh]] is the scale path — random-hyperplane
  * LSH buckets shrink the candidate set so the join is keyed on the
  * bucket code instead of a full cross join.
  *
  * Determinism: the oracle-checked exact path quantizes each float to a
  * scaled integer (`floor(x * 2^24)` — float→double is exact, the double
  * multiply and floor are single IEEE ops, identical in Spark and DuckDB),
  * then dot products / norms are exact 64-bit integer arithmetic
  * (|x|<2^23 ⇒ 64-elem sums < 2^52, no overflow) and the final cosine is a
  * fixed sequence of IEEE double ops — bit-identical across engines.
  */
object VectorSearch {

  private val Scale = "16777216.0" // 2^24

  /** Materialize a relation consumed by several downstream plans (bucket
    * coding + both sides of the verify re-join). MEMORY_AND_DISK: spills
    * instead of OOM, LRU-evicted under pressure. */
  private def materialize(df: DataFrame): DataFrame =
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Scaled-integer embedding only — for consumers that never use the
    * norm (PQ encodes against a codebook): the per-row `dotExact` would
    * be dim multiplies of dead work on an O(corpus) scan. */
  def quantized(emb: DataFrame, vecCol: String = "embedding"): DataFrame =
    emb.withColumn("v", expr(
      s"transform($vecCol, x -> cast(floor(cast(x as double) * $Scale) as bigint))"))

  /** Scaled-integer embedding plus exact integer squared-norm. */
  def withNorm(emb: DataFrame, vecCol: String = "embedding"): DataFrame =
    quantized(emb, vecCol).withColumn("n2", dotExact("v", "v"))

  /** Exact integer dot product of two scaled-integer array columns —
    * the codegen'd [[graft.functions.DotProductI64]] kernel (same result
    * as the interpreted `aggregate(zip_with(...))` form, minus the
    * per-element lambda interpretation that dominates O(pairs × dim)
    * verify stages). */
  def dotExact(a: String, b: String): Column =
    ExpressionUtils.column(DotProductI64(
      ExpressionUtils.expression(col(a)), ExpressionUtils.expression(col(b))))

  /** Double-accumulated dot product (approximate re-rank path) — codegen'd
    * [[graft.functions.DotProductF64]]. */
  def dotDouble(a: String, b: String): Column =
    ExpressionUtils.column(DotProductF64(
      ExpressionUtils.expression(col(a)), ExpressionUtils.expression(col(b))))

  /** Brute-force cosine top-k: every query row against the whole corpus.
    * Exact and deterministic; O(|Q|·|C|·dim) — the correctness baseline and
    * the per-bucket kernel for the ANN paths. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = withNorm(queries).select(
      col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2"))
    val c = withNorm(corpus).select(
      col("vec_id").as("nid"), col("v").as("nv"), col("n2").as("nn2"))
    val scored = q.crossJoin(c)
      .filter(col("qid") =!= col("nid"))
      .withColumn("dot", dotExact("qv", "nv"))
      .withColumn("cosine",
        col("dot").cast("double")
          / (sqrt(col("qn2").cast("double")) * sqrt(col("nn2").cast("double"))))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("rnk"), col("cosine"))
  }

  /** HARD-NEGATIVE MINING for contrastive training: per anchor, the
    * top-k most-similar corpus vectors whose `label` DIFFERS from the
    * anchor's — same-label rows are the anchor's positive set, and the
    * near-miss negatives just outside it are what contrastive losses
    * (retrievers, rerankers, embedding models) learn the most from.
    * Exact and deterministic via the scaled-integer conventions above —
    * the correctness baseline and the oracle path;
    * [[hardNegativesLsh]] is the scale path. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
                    labelCol: String = "label"): DataFrame = {
    val q = withNorm(queries).select(col("vec_id").as("qid"),
      col(labelCol).as("qlabel"), col("v").as("qv"), col("n2").as("qn2"))
    val c = withNorm(corpus).select(col("vec_id").as("nid"),
      col(labelCol).as("nlabel"), col("v").as("nv"), col("n2").as("nn2"))
    val scored = q.crossJoin(c)
      .filter(col("qid") =!= col("nid") && col("qlabel") =!= col("nlabel"))
      .withColumn("dot", dotExact("qv", "nv"))
      .withColumn("cosine",
        col("dot").cast("double")
          / (sqrt(col("qn2").cast("double")) * sqrt(col("nn2").cast("double"))))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("rnk"), col("cosine"))
  }

  /** Scale path for [[hardNegatives]]: sign-LSH bucket candidates (the
    * [[annLsh]] multi-table join replaces the cross join), the label
    * exclusion applied on candidates, then the SAME exact scoring — any
    * pair the buckets recall scores bit-identically to the exact path.
    * Top-k is approximate exactly like [[annLsh]] (a negative missed by
    * every bucket table cannot rank); for mining that is the standard
    * trade — recall of the HIGH-cosine negatives, the ones that matter,
    * approaches 1 by the same 1-(1-p^bits)^L bound that makes near-dup
    * recall work. */
  def hardNegativesLsh(
      emb: DataFrame, k: Int, nBits: Int = 5, nTables: Int = 16,
      dim: Int = 64, labelCol: String = "label"): DataFrame = {
    val base = materialize(withNorm(emb).select(
      col("vec_id"), col(labelCol).as("lbl"), col("v"), col("n2")))
    val buckets = base.select(col("vec_id"),
      posexplode(lshCodes("v", nTables, nBits, dim)).as(Seq("tbl", "code")))
    // id-only candidates (the q38 lesson), vectors re-join once
    val cands = buckets.select(col("tbl"), col("code"), col("vec_id").as("qid"))
      .join(buckets.select(col("tbl"), col("code"), col("vec_id").as("nid")),
        Seq("tbl", "code"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid")).distinct()
    val qv = base.select(col("vec_id").as("qid"), col("lbl").as("qlabel"),
      col("v").as("qv"), col("n2").as("qn2"))
    val nv = base.select(col("vec_id").as("nid"), col("lbl").as("nlabel"),
      col("v").as("nv"), col("n2").as("nn2"))
    val scored = cands.join(qv, "qid").join(nv, "nid")
      .filter(col("qlabel") =!= col("nlabel"))
      .withColumn("cosine",
        dotExact("qv", "nv").cast("double")
          / (sqrt(col("qn2").cast("double")) * sqrt(col("nn2").cast("double"))))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("rnk"), col("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs (dedup family): all a<b pairs
    * with cosine ≥ minCosine, exact/deterministic via the scaled-integer
    * dot product. Quadratic — the oracle/small-scale path; at scale run
    * [[annLsh]] candidates through the same exact verification. */
  def cosineNearDups(emb: DataFrame, minCosine: Double): DataFrame = {
    val a = withNorm(emb).select(
      col("vec_id").as("a_id"), col("v").as("av"), col("n2").as("an2"))
    val b = withNorm(emb).select(
      col("vec_id").as("b_id"), col("v").as("bv"), col("n2").as("bn2"))
    a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .withColumn("cosine",
        dotExact("av", "bv").cast("double")
          / (sqrt(col("an2").cast("double")) * sqrt(col("bn2").cast("double"))))
      .filter(col("cosine") >= minCosine)
      .select(col("a_id"), col("b_id"), col("cosine"))
  }

  /** Scale path for [[cosineNearDups]]: sign-LSH bucket candidates → the
    * SAME exact scaled-integer cosine verification as the quadratic path,
    * so any pair the buckets recall scores bit-identically. The (table,
    * code) bucket join replaces the cross join; recall of pairs ≥ minCosine
    * is 1-(1-p^nBits)^nTables with p = 1-θ/π, so tune nTables up (or nBits
    * down) for the similarity floor you must not miss — near-dup thresholds
    * (cos ≥ 0.9) are recalled at ≈1 with the defaults. */
  def cosineNearDupsLsh(
      emb: DataFrame, minCosine: Double,
      nBits: Int = 5, nTables: Int = 16, dim: Int = 64): DataFrame = {
    // base feeds the bucket codes AND both sides of the verify re-join —
    // materialize once so the scan + quantize runs a single time.
    val base = materialize(withNorm(emb).select(col("vec_id"), col("v"), col("n2")))
    // Candidates travel as bare (a_id, b_id): the bucket join and the
    // dedup shuffle carry 16 bytes/pair instead of two dim-element vectors
    // (~1 KB/pair at dim=64) — at 100 TB the dedup shuffle volume is
    // |candidates| × id-width, and vectors are joined back exactly once
    // for the verify stage.
    val buckets = base.select(col("vec_id"),
      posexplode(lshCodes("v", nTables, nBits, dim)).as(Seq("tbl", "code")))
    val cands = buckets.select(col("tbl"), col("code"), col("vec_id").as("a_id"))
      .join(buckets.select(col("tbl"), col("code"), col("vec_id").as("b_id")),
        Seq("tbl", "code"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .dropDuplicates("a_id", "b_id")
    cands
      .join(base.select(col("vec_id").as("a_id"), col("v").as("av"), col("n2").as("an2")), "a_id")
      .join(base.select(col("vec_id").as("b_id"), col("v").as("bv"), col("n2").as("bn2")), "b_id")
      .withColumn("cosine",
        dotExact("av", "bv").cast("double")
          / (sqrt(col("an2").cast("double")) * sqrt(col("bn2").cast("double"))))
      .filter(col("cosine") >= minCosine)
      .select(col("a_id"), col("b_id"), col("cosine"))
  }

  /** Deterministic ±1 hyperplane components, seeded — no RNG at plan time. */
  private def hyperplane(seed: Int, dim: Int): Seq[Double] = {
    val rnd = new scala.util.Random(seed * 1000003L + 7)
    Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** All nTables sign-LSH codes at once via the codegen'd
    * [[graft.functions.SignLshCodes]] kernel — one plan-constant hyperplane
    * matrix instead of nTables × nBits literal-array expressions, so the
    * analyzed plan stays O(1) in the table count. Plane (t, b) keeps the
    * seed `t * 1024 + b`, so codes are bit-identical to the per-bit
    * composition this replaces (the recall-gate oracles depend on that). */
  private def lshCodes(vCol: String, nTables: Int, nBits: Int, dim: Int): Column =
    ExpressionUtils.column(graft.functions.SignLshCodes(
      ExpressionUtils.expression(col(vCol)),
      Array.tabulate(nTables * nBits)(i =>
        hyperplane((i / nBits) * 1024 + (i % nBits), dim).toArray),
      nBits))

  /** ANN via multi-table sign-LSH: L independent code tables, candidates =
    * union of same-bucket pairs over tables (P(candidate) =
    * 1-(1-p^bits)^L with p = 1-θ/π), exact cosine re-rank of candidates
    * only. At 100 TB the (table, code) bucket join replaces the quadratic
    * cross join; tune bits up for bucket size, tables up for recall. */
  def annLsh(
      emb: DataFrame, k: Int, nBits: Int = 5, nTables: Int = 16,
      dim: Int = 64): DataFrame = {
    // Same id-only candidate shape as [[cosineNearDupsLsh]]: dedup bare
    // (qid, nid), re-join vectors once for the re-rank.
    val base = materialize(withNorm(emb).select(col("vec_id"), col("v"), col("n2")))
    val buckets = base.select(col("vec_id"),
      posexplode(lshCodes("v", nTables, nBits, dim)).as(Seq("tbl", "code")))
    val cands = buckets.select(col("tbl"), col("code"), col("vec_id").as("qid"))
      .join(buckets.select(col("tbl"), col("code"), col("vec_id").as("nid")),
        Seq("tbl", "code"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"))
      .dropDuplicates("qid", "nid")
    val scored = cands
      .join(base.select(col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2")), "qid")
      .join(base.select(col("vec_id").as("nid"), col("v").as("nv"), col("n2").as("nn2")), "nid")
      .withColumn("cosine",
        dotDouble("qv", "nv")
          / (sqrt(col("qn2").cast("double")) * sqrt(col("nn2").cast("double"))))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("rnk"), col("cosine"))
  }
}
