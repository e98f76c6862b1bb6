package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SEMANTIC deduplication, SemDeDup-shaped (Abbas et al. 2023: cluster
  * the embedding space, prune near-duplicate pairs WITHIN clusters
  * only) — the scale path of [[VectorSearch.cosineNearDups]]'s exact
  * all-pairs relation, completing the near-dup family's third modality
  * trio (exact text / fuzzy text / embedding): q21's brute force is the
  * correctness baseline, [[VectorSearch.cosineNearDupsLsh]] buckets by
  * sign-LSH, and this buckets by LEARNED cluster structure, which is
  * what the published pipeline stage actually does.
  *
  * 100 TB shape: the all-pairs comparison SemDeDup exists to avoid is
  * O(N²·dim); clustering cuts it to Σ|cell|² — with N/k-balanced cells
  * a k-fold reduction, and the cells are the unit of parallelism (the
  * pair join shuffles on `cid`, so each cell's quadratic work lands on
  * one task, never on the driver). The k-means model itself follows
  * [[IvfSearch]]'s bootstrap: a bounded deterministic sample (ordered
  * by id, capped) trains driver-side Lloyd with strided init, the
  * model rides as a plan constant inside the codegen'd
  * [[graft.functions.NearestCentroids]] kernel, and assignment is a
  * pure map-side projection. Pair similarity uses the SAME
  * scaled-integer exact cosine as every other vector operator
  * ([[VectorSearch.dotExact]]), so any pair this path recalls scores
  * BIT-IDENTICALLY to the brute-force truth — the q125 gate leans on
  * exactly that (in-cluster pairs are a verifiable subset of the
  * exact ≥ τ relation).
  *
  * Keep/drop policy, stated: within a cluster, a vector DROPS iff some
  * SMALLER-id vector in the same cluster is ≥ `minCosine`-similar —
  * the deterministic keep-min-id convention the repo's text near-dup
  * paths use, and the same one-survivor-per-neighborhood effect as the
  * paper's keep-lowest-centroid-distance variant (the choice of
  * representative is a policy knob; determinism is the contract).
  * Vectors with malformed embeddings assign a NULL cell and are
  * excluded, matching the ANN tiers. */
object SemDedup {

  /** Cluster + prune. Returns `(assignments, pairs)`:
    * `assignments` = (vec_id, cid, kept) — every valid vector, its
    * PRIMARY cell, and the keep/drop verdict; `pairs` = (a_id, b_id,
    * cid, cosine) — the co-clustered near-duplicate evidence
    * (a_id < b_id, cosine ≥ `minCosine`, cid = the smallest shared
    * probed cell), each row the reason its b_id drops.
    *
    * `nProbe` is the recall knob, exactly IVF's: each vector joins the
    * pair comparison in its `nProbe` nearest cells, so a near-dup pair
    * split across a cell boundary is still co-compared when the cells
    * overlap in either's probe set. Cost scales linearly in `nProbe`
    * (each vector appears in that many cells); pairs found through
    * several shared cells dedupe to one row. */
  def prune(
      emb: DataFrame,
      minCosine: Double,
      nClusters: Int = 16,
      nProbe: Int = 2,
      trainIters: Int = 5,
      sampleCap: Int = 4096): (DataFrame, DataFrame) = {
    val spark = emb.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graft.{ColumnBridge => CB}

    // one scan + quantize feeds the training sample, the assignment
    // pass, and both sides of the pair join
    val base = VectorSearch.withNorm(emb)
      .select(col("vec_id"), col("v"), col("n2"),
        expr("transform(v, x -> cast(x as double))").as("vd"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val sample: Array[Array[Double]] = Kmeans.modalDim(base
      .filter(col("vd").isNotNull && !exists(col("vd"), _.isNull))
      .orderBy(col("vec_id")).limit(sampleCap)
      .select(col("vd")).as[Seq[Double]].collect().map(_.toArray))
    if (sample.isEmpty) {
      val empty = base.select(col("vec_id"), lit(0).as("cid"),
        lit(true).as("kept")).limit(0)
      return (empty, base.select(col("vec_id").as("a_id"),
        col("vec_id").as("b_id"), lit(0).as("cid"),
        lit(0.0).as("cosine")).limit(0))
    }
    val centroids = IvfSearch.trainCentroids(sample, nClusters, trainIters)

    // the model is a plan constant in the codegen'd kernel; assignment
    // is map-side. cids = the nProbe nearest cells, primary first.
    val assigned = base
      .select(col("vec_id"), col("v"), col("n2"),
        CB.column(graft.functions.NearestCentroids(
          CB.expression(col("vd")), centroids, nProbe)).as("cids"))
      .filter(col("cids").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // the co-cell pair join: explodes each side into its probed cells
    // and shuffles on cid only — each cell's quadratic comparison is
    // task-local, the SemDeDup scale win; duplicate discoveries
    // through several shared cells collapse to the smallest cid
    val aSide = assigned.select(explode(col("cids")).as("cid"),
      col("vec_id").as("a_id"), col("v").as("av"), col("n2").as("an2"))
    val bSide = assigned.select(explode(col("cids")).as("cid"),
      col("vec_id").as("b_id"), col("v").as("bv"), col("n2").as("bn2"))
    val pairs = aSide.join(bSide, Seq("cid"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cosine",
        VectorSearch.dotExact("av", "bv").cast("double")
          / (sqrt(col("an2").cast("double")) * sqrt(col("bn2").cast("double"))))
      .filter(col("cosine") >= minCosine)
      .groupBy(col("a_id"), col("b_id"))
      .agg(min(col("cid")).as("cid"), max(col("cosine")).as("cosine"))

    val dropped = pairs.select(col("b_id").as("vec_id")).distinct()
      .withColumn("drop", lit(true))
    val assignments = assigned
      .select(col("vec_id"), element_at(col("cids"), 1).as("cid"))
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        coalesce(!col("drop"), lit(true)).as("kept"))
    (assignments, pairs)
  }
}
