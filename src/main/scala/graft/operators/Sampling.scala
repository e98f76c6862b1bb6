package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: the selected set changes
  * with partitioning, retries, and executor counts — useless for a
  * pretraining mix that must be re-derivable (and auditable) months later.
  * Hash-gating on a stable key makes the sample a pure function of the
  * data: filter pushes to the scan, no shuffle, any subset of files can be
  * sampled independently, and re-runs (or a second engine) select the
  * SAME rows.
  *
  * Hash choice: [[portableHash]] is a multiplicative hash any engine with
  * 64-bit integers reproduces exactly — the oracle-gated form. At 100 TB
  * prefer `xxhash64(key)` (better mixing, still deterministic inside
  * Spark) — every operator takes the hash as a Column, so it's a drop-in.
  */
object Sampling {

  /** Portable multiplicative hash (Knuth's 2654435761 into a Mersenne-ish
    * prime modulus): bit-identical in Spark and DuckDB for the FULL
    * non-negative 64-bit key range. The product is computed in
    * DECIMAL(38,0) (oracle: HUGEINT — the q76 convention): a bare
    * long multiply wraps once keys pass ~3.5e9 — well inside a
    * 100 TB corpus's id space — and a wrapped product either throws
    * under ANSI mode or silently selects DIFFERENT rows than the
    * oracle, breaking the reproducibility contract this function
    * exists for. */
  def portableHash(key: Column): Column = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    pmod(key.cast(dec) * lit(2654435761L).cast(dec),
      lit(1000000007L).cast(dec)).cast("long")
  }

  /** Keep rows whose hash lands in the first `permille`/1000 of the hash
    * ring — a deterministic, reproducible `permille`/1000 sample. */
  def deterministicSample(df: DataFrame, hash: Column, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000, s"permille=$permille out of [0,1000]")
    df.filter(pmod(hash, lit(1000L)) < permille)
  }

  /** Per-stratum sampling rates (a pretraining mix: upsample rare
    * languages/sources, downsample boilerplate-heavy ones). `rates` maps
    * stratum value → permille; unlisted strata use `defaultPermille`.
    * Same hash-gate semantics as [[deterministicSample]] — deterministic,
    * shuffle-free, pushdown-friendly. */
  def stratifiedSample(
      df: DataFrame,
      hash: Column,
      stratum: Column,
      rates: Map[String, Int],
      defaultPermille: Int): DataFrame = {
    (rates.values.toSeq :+ defaultPermille).foreach(p =>
      require(p >= 0 && p <= 1000, s"permille=$p out of [0,1000]"))
    val rate = rates.foldLeft(lit(defaultPermille)) { case (acc, (k, v)) =>
      when(stratum === k, lit(v)).otherwise(acc)
    }
    df.filter(pmod(hash, lit(1000L)) < rate)
  }

  /** EXACTLY `quota` rows per stratum (an eval-set builder: "50 documents
    * per source, the same 50 forever"): rank by (hash, tiebreak) inside
    * each stratum and keep the first `quota`. Unlike the permille gates
    * this shuffles once — on the stratum key — because an exact count is
    * a per-group property; memory stays bounded per group (one window
    * pass, no global sort). The (hash, tiebreak) order makes the pick a
    * pure function of the data, and adding rows to a stratum only
    * displaces the highest-hash members — the rest of the quota is
    * stable. */
  def quotaSample(
      df: DataFrame,
      hash: Column,
      stratum: Column,
      quota: Int,
      tiebreak: Column): DataFrame = {
    require(quota >= 0, s"quota=$quota must be >= 0")
    // working-column name chosen fresh so a caller's own __rk* survives
    val rk = Iterator.from(0).map(i => s"__rk$i")
      .find(n => !df.columns.contains(n)).get
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(hash.asc, tiebreak.asc)
    df.withColumn(rk, row_number().over(w))
      .filter(col(rk) <= quota)
      .drop(rk)
  }

  /** Temperature-τ source rebalancing at τ = ½: keep source s with
    * probability ∝ sqrt(1/w_s), i.e. the effective mix ∝ sqrt(w_s) —
    * the standard pretraining knob for flattening over-represented
    * sources (multilingual/multi-corpus mixing à la the T5/mBERT
    * exponent-smoothing recipes), with the rarest source kept whole.
    * τ is FIXED at ½ because sqrt is a correctly-rounded IEEE-754 op in
    * every engine: the per-source threshold (sqrt of a ratio of exact
    * integer weights, one multiply, one floor) is bit-identical in Spark
    * and DuckDB, which a pow-based general τ cannot promise — and a
    * reproducible mix is the whole point of hash-gated sampling.
    *
    * `weight` is summed per source (use token counts, not doc counts —
    * the budget a mix is actually specified in). Shape: one |sources|-row
    * aggregate broadcast back; the gate itself is map-side `hash < thr`,
    * so nothing data-sized shuffles. `hash` must be uniform on
    * [0, 1000000007) — [[portableHash]]'s range. */
  def temperatureMixSqrt(
      df: DataFrame, hash: Column, source: Column, weight: Column): DataFrame = {
    val totals = df.groupBy(source.as("__src")).agg(sum(weight).as("__w"))
    val minW = totals.agg(min(col("__w")).as("__wmin"))
    val thr = totals.crossJoin(broadcast(minW))
      .withColumn("__thr",
        floor(sqrt(col("__wmin").cast("double") / col("__w").cast("double"))
          * lit(1000000007.0)).cast("long"))
      .select(col("__src"), col("__thr"))
    // null-safe equality: a NULL source is a stratum like any other (it
    // got its own __w total above) — a plain === would never match it
    // and silently drop the whole stratum from the mix
    df.join(broadcast(thr), source <=> col("__src"))
      .filter(hash < col("__thr"))
      .drop("__src", "__thr")
  }

  /** Leakage-free train/val/test split: hash-gate on the near-dup CLUSTER
    * canonical id, not the doc id, so near-duplicates always land in the
    * SAME split — the eval-contamination failure mode of naive per-doc
    * splitting (a train doc's near-twin in the test set) is impossible by
    * construction. Docs in no cluster are their own canonical. Same
    * determinism properties as [[deterministicSample]]: the assignment is
    * a pure function of the data, stable under repartitioning, retries,
    * and corpus growth outside the cluster.
    *
    * Scale shape: `components` is |clustered docs| (orders of magnitude
    * below |docs|) — the left join broadcasts in practice; the gate
    * itself is map-side arithmetic. One line per split boundary:
    * bucket < testPermille → test, < test+val → val, else train.
    */
  def leakFreeSplit(
      docs: DataFrame,
      components: DataFrame,
      valPermille: Int,
      testPermille: Int,
      docId: String = "doc_id"): DataFrame = {
    require(valPermille >= 0 && testPermille >= 0 &&
      valPermille + testPermille <= 1000,
      s"val=$valPermille test=$testPermille must be >= 0 and sum <= 1000")
    val canon = docs
      .join(components.select(col(docId), col("component_id")), Seq(docId), "left")
      .withColumn("canon", coalesce(col("component_id"), col(docId)))
      .drop("component_id")
    val bucket = pmod(portableHash(col("canon")), lit(1000L))
    canon.withColumn("split",
      when(bucket < testPermille, "test")
        .when(bucket < testPermille + valPermille, "val")
        .otherwise("train"))
  }
}
