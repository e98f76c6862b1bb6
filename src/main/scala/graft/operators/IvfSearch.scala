package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor search — the
  * cluster-pruning alternative to [[VectorSearch.annLsh]].
  *
  * Build: k-means centroids trained on a bounded deterministic SAMPLE
  * collected to the driver (the standard IVF build path — FAISS trains on
  * a sample too; centroid count k is small and the sample is capped, so
  * this is a broadcast-sized model, not a driver-side data loop), then a
  * distributed assignment pass tags every corpus vector with its nearest
  * centroid (cell).
  *
  * Search: each query probes its `nProbe` nearest cells; candidates are
  * the corpus vectors in those cells (a join keyed on cell id — the
  * 1/k-ish pruning that replaces the quadratic cross join at scale);
  * candidates are exactly re-ranked by cosine.
  */
object IvfSearch {

  /** Deterministic Lloyd k-means on a driver-side sample ([[Kmeans]]
    * carries the shared tie/empty-cell contract; init is evenly strided
    * sample points). */
  private[operators] def trainCentroids(
      sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] =
    Kmeans.lloyd(sample,
      Array.tabulate(k)(i => sample((i * sample.length / k) % sample.length).clone()),
      iters)

  /** Distributed Lloyd refinement over the FULL corpus: each iteration is
    * one aggregate job — map-side nearest-centroid assignment (the
    * codegen [[graft.functions.NearestCentroids]] kernel, current model a
    * plan constant) feeding per-cell elementwise vector sums via
    * [[graft.functions.VectorSumAgg]] (ONE buffer of dim doubles per
    * cell; map-side combine makes the shuffle k × (dim+1) doubles per
    * partition, independent of corpus size). New centroid = sum/count,
    * computed on the driver from the k collected rows; empty cells keep
    * their centroid (FAISS behavior). This is the standard scale path
    * when the sample-trained model should see every vector: the sample
    * bootstraps, the corpus refines.
    *
    * Determinism: assignment ties break toward the lower cell id (kernel
    * contract), and on integer-valued embeddings (this corpus — the
    * exact-cosine path relies on the same property) the double sums are
    * order-exact, so refined centroids are bit-identical across
    * partitionings and retries. */
  def refineCentroids(
      base: DataFrame,
      init: Array[Array[Double]],
      iters: Int): Array[Array[Double]] = {
    import org.apache.spark.sql.graft.{ColumnBridge => CB}
    var cents = init
    val dim = init.head.length
    (0 until iters).foreach { _ =>
      val assigned = base.select(
        col("vd"),
        element_at(CB.column(graft.functions.NearestCentroids(
          CB.expression(col("vd")), cents, 1)), 1).as("cid"))
        .filter(col("cid").isNotNull) // malformed vectors refine nothing
      val stats = assigned.groupBy(col("cid"))
        .agg(
          CB.column(graft.functions.VectorSumAgg(CB.expression(col("vd")), dim)
            .toAggregateExpression()).as("s"),
          count(lit(1)).as("c"))
        .collect()
      val next = cents.map(_.clone())
      stats.foreach { r =>
        val cid = r.getInt(0)
        val s = r.getSeq[Double](1)
        val c = r.getLong(2)
        next(cid) = Array.tabulate(dim)(i => s(i) / c)
      }
      cents = next
    }
    cents
  }

  /** Top-k cosine neighbors via IVF cells. `refineIters > 0` runs that
    * many distributed Lloyd passes over the full corpus after the
    * sample bootstrap ([[refineCentroids]]). */
  def ivfTopK(
      emb: DataFrame,
      k: Int,
      nClusters: Int = 16,
      nProbe: Int = 4,
      trainIters: Int = 5,
      sampleCap: Int = 4096,
      refineIters: Int = 0): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graft.{ColumnBridge => CB}

    // base feeds the training sample, both map-side model passes, and both
    // sides of the verify re-join — one scan + quantize, persisted
    val base = VectorSearch.withNorm(emb)
      .select(col("vec_id"), expr("transform(v, x -> cast(x as double))").as("vd"), col("n2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // bounded, deterministic training sample (ordered by id, capped).
    // Malformed vectors — null elements (would NPE the Seq[Double]
    // unboxing) or stray dimensions (would over-run the distance
    // kernels) — are filtered like [[PqSearch.trainCodebook]] does;
    // downstream they assign to a NULL cell (kernel contract) and drop
    // out of the candidate join, matching the other ANN tiers
    val sample: Array[Array[Double]] = Kmeans.modalDim(base
      .filter(col("vd").isNotNull && !exists(col("vd"), _.isNull))
      .orderBy(col("vec_id")).limit(sampleCap)
      .select(col("vd")).as[Seq[Double]].collect().map(_.toArray))
    if (sample.isEmpty) {
      // empty corpus → empty result with the output schema (no crash)
      return base.select(col("vec_id").as("qid"), col("vec_id").as("nid"),
        lit(1).as("rnk"), lit(0.0).as("cosine")).limit(0)
    }
    val centroids0 = trainCentroids(sample, nClusters, trainIters)
    val centroids =
      if (refineIters > 0) refineCentroids(base.select(col("vd")), centroids0, refineIters)
      else centroids0

    // The trained model is tiny (nClusters × dim doubles) and rides as ONE
    // plan-constant inside the codegen'd nearest_centroids kernel —
    // assignment and probing are pure map-side projections: no crossJoin,
    // no per-vector window shuffle, O(1) plan size in the cluster count.
    def nearestCells(p: Int) = CB.column(graft.functions.NearestCentroids(
      CB.expression(col("vd")), centroids, p))

    // distributed assignment: nearest centroid per vector (kernel ties
    // break toward the lower cid, as the array_position form did);
    // malformed vectors assign NULL and are excluded from the index
    val assigned = base
      .select(col("vec_id"), element_at(nearestCells(1), 1).as("cid"))
      .filter(col("cid").isNotNull)

    // query probes: nProbe nearest cells per query vector
    val probes = base
      .select(col("vec_id").as("qid"), explode(nearestCells(nProbe)).as("cid"))

    // candidates travel as bare (qid, nid) through the cell join and the
    // dedup shuffle (16 bytes/pair, not two dim-element vectors); vectors
    // re-join once for the exact rerank
    val cands = probes
      .join(assigned.select(col("cid"), col("vec_id").as("nid")), "cid")
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"))
      .dropDuplicates("qid", "nid")
    val scored = cands
      .join(base.select(col("vec_id").as("qid"), col("vd").as("qv"), col("n2").as("qn2")), "qid")
      .join(base.select(col("vec_id").as("nid"), col("vd").as("nv"), col("n2").as("nn2")), "nid")
      .withColumn("cosine",
        VectorSearch.dotDouble("qv", "nv")
          / (sqrt(col("qn2").cast("double")) * sqrt(col("nn2").cast("double"))))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("rnk"), col("cosine"))
  }
}
