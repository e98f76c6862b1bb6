package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization (PQ) approximate nearest-neighbor search — the
  * memory-compression tier between brute force ([[VectorSearch
  * .bruteForceTopK]]) and cell pruning ([[IvfSearch]]): every corpus
  * vector is encoded as `m` small centroid ids (here 8 bytes total vs
  * 256 bytes of floats), and query–vector distance is approximated as
  * the sum of per-subspace distances to the ENCODED centroids (the
  * asymmetric distance computation of Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * Scale shape: the codebook (m × kc × dsub values from a bounded,
  * deterministic seed read) rides as a PLAN CONSTANT; encoding is a
  * map-side projection over the corpus (one scan, no shuffle); each
  * query's distance table (m × kc longs) broadcasts, and scoring every
  * corpus code against every query is the PQ contract — a linear scan
  * per query over 8-byte codes, which is exactly what makes PQ usable
  * when the raw vectors no longer fit: at 100 TB of vectors the codes
  * are ~3% of the bytes. Top-k per query is a bounded window over the
  * scored scan.
  *
  * Determinism (oracle-exactness): vectors quantize to scaled integers
  * ([[VectorSearch.withNorm]]'s contract), all distances are exact
  * 64-bit integer arithmetic (|x| < 2^24 ⇒ per-subspace squares < 2^51,
  * m-subspace sums < 2^55), argmin ties break toward the LOWER centroid
  * id, and the codebook "training" is a deterministic seed pick (the kc
  * lowest-id vectors) rather than sampled k-means — the standard
  * codebook quality knob is orthogonal to the search plumbing being
  * exercised, and a deterministic build is what lets DuckDB replay the
  * whole pipeline bit-for-bit.
  */
object PqSearch {

  /** Top-k neighbors per query by PQ asymmetric distance.
    *
    * @param queries vectors to search for (subset of the corpus id space;
    *                self-matches are excluded by id)
    * @param corpus  vectors to search in; the kc lowest `vec_id`s double
    *                as the codebook seeds
    * @param k       neighbors per query
    * @param m       subspaces (must divide the dimension)
    * @param kc      centroids per subspace
    * @return (qid, nid, rnk, ad2) — ad2 the exact integer approximate
    *         squared distance, rnk 1-based by (ad2 asc, nid asc)
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             m: Int = 8, kc: Int = 16): DataFrame = {
    import org.apache.spark.sql.graft.{ColumnBridge => CB}
    val base = VectorSearch.quantized(corpus).select(col("vec_id"), col("v"))
    val q = VectorSearch.quantized(queries).select(col("vec_id"), col("v"))

    // bounded deterministic codebook read: kc rows × dim longs
    val seeds = base.orderBy(col("vec_id")).limit(kc)
      .select(col("v")).collect().map(_.getSeq[Long](0).toArray)
    require(seeds.length == kc, s"pqTopK: corpus smaller than kc=$kc")
    val dim = seeds.head.length
    require(dim % m == 0, s"pqTopK: m=$m must divide dim=$dim")
    val dsub = dim / m
    // cents(j)(c)(i): subspace j, centroid c, component i — rides as ONE
    // plan-constant reference object inside the codegen kernels
    // ([[graft.functions.PqEncode]]/[[graft.functions.PqAdcLut]]/
    // [[graft.functions.PqAdcScore]]): the interpreted higher-order-
    // function forms cost m × kc × dsub lambda evals per vector on the
    // O(corpus) encode scan and m per pair on the O(queries × corpus)
    // scoring scan — the kernels are flat primitive loops with identical
    // exact-integer, first-min semantics (the oracle contract)
    val cents = Array.tabulate(m, kc, dsub)((j, c, i) => seeds(c)(j * dsub + i))

    val codes = base.select(col("vec_id").as("nid"),
      CB.column(graft.functions.PqEncode(CB.expression(col("v")), cents)).as("codes"))

    // per-query ADC lookup tables: m × kc longs, broadcast to the scan
    val luts = q.select(col("vec_id").as("qid"),
      CB.column(graft.functions.PqAdcLut(CB.expression(col("v")), cents)).as("luts"))

    val scored = codes
      .join(broadcast(luts), col("qid") =!= col("nid"))
      .withColumn("ad2", CB.column(graft.functions.PqAdcScore(
        CB.expression(col("codes")), CB.expression(col("luts")))))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("ad2").asc, col("nid").asc)))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("rnk"), col("ad2"))
  }
}
