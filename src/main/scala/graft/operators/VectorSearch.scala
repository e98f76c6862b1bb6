package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Spark-first: dot products and norms are `zip_with`/`aggregate` higher-
  * order functions (codegen'd, no UDFs). The brute-force path is the exact
  * baseline; [[annLsh]] is the scale path — random-hyperplane LSH buckets
  * shrink the candidate set so the join is keyed on the bucket code instead
  * of a full cross join.
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

  /** Scaled-integer embedding plus exact integer squared-norm. */
  def withNorm(emb: DataFrame, vecCol: String = "embedding"): DataFrame =
    emb
      .withColumn("v", expr(
        s"transform($vecCol, x -> cast(floor(cast(x as double) * $Scale) as bigint))"))
      .withColumn("n2", expr(
        "aggregate(zip_with(v, v, (x, y) -> x * y), cast(0 as bigint), (acc, x) -> acc + x)"))

  /** Exact integer dot product of two scaled-integer array columns. */
  def dotExact(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), cast(0 as bigint), (acc, x) -> acc + x)")

  /** Plain double dot product (fast path, not oracle-exact). */
  def dotDouble(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)")

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

  /** Deterministic ±1 hyperplane components, seeded — no RNG at plan time. */
  private def hyperplane(seed: Int, dim: Int): Seq[Double] = {
    val rnd = new scala.util.Random(seed * 1000003L + 7)
    Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Random-hyperplane LSH code: bit p = sign(v · h_p). */
  def lshCode(vCol: String, nBits: Int, dim: Int): Column =
    (0 until nBits).map { p =>
      val h = typedLit(hyperplane(p, dim))
      val proj = expr(
        s"aggregate(zip_with($vCol, h_$p, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)")
      when(proj > 0, shiftleft(lit(1), p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** ANN via sign-LSH bucketing: code vectors, self-join per bucket, exact
    * re-rank inside buckets. Recall < 1 by construction; probe multiple
    * buckets (here: exact code match) — at 100 TB the bucket join replaces
    * the quadratic cross join. */
  def annLsh(emb: DataFrame, k: Int, nBits: Int = 8, dim: Int = 64): DataFrame = {
    val base = withNorm(emb)
    // Materialize hyperplanes as literal array columns h_0..h_{nBits-1}.
    val withPlanes = (0 until nBits).foldLeft(base) { (df, p) =>
      df.withColumn(s"h_$p", typedLit(hyperplane(p, dim)))
    }
    val coded = withPlanes
      .withColumn("code", lshCode("v", nBits, dim))
      .select(col("vec_id"), col("v"), col("n2"), col("code"))
    val q = coded.select(
      col("code"), col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2"))
    val c = coded.select(
      col("code"), col("vec_id").as("nid"), col("v").as("nv"), col("n2").as("nn2"))
    val scored = q.join(c, "code")
      .filter(col("qid") =!= col("nid"))
      .withColumn("cosine",
        dotDouble("qv", "nv")
          / (sqrt(col("qn2").cast("double")) * sqrt(col("nn2").cast("double"))))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("rnk"), col("cosine"))
  }
}
