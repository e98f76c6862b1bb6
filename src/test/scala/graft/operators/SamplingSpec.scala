package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables.table

/** Hash-gated sampling must be a pure function of the DATA — independent
  * of partitioning, execution order, and reruns — with nested thresholds
  * (a bigger sample contains every smaller one) and per-stratum rates that
  * act exactly like the flat gate restricted to the stratum. */
class SamplingSpec extends SparkSpec {

  private lazy val docs = table(spark, sfDir, "documents").cache()
  private def h = Sampling.portableHash(col("doc_id"))
  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(col("doc_id")).collect().map(_.getLong(0)).toSet

  test("deterministic: identical sample across partitionings and reruns") {
    val s1 = ids(Sampling.deterministicSample(docs, h, 100))
    val s2 = ids(Sampling.deterministicSample(docs.repartition(7), h, 100))
    val s3 = ids(Sampling.deterministicSample(docs.repartition(1), h, 100))
    assert(s1.nonEmpty)
    assert(s1 === s2)
    assert(s1 === s3)
    // rate lands near the target (hash-uniformity sanity, wide tolerance)
    val n = docs.count().toDouble
    assert(s1.size > n * 0.03 && s1.size < n * 0.25, s"10% sample got ${s1.size} of $n")
  }

  test("portableHash is exact for the full key range (no silent 64-bit wrap)") {
    import spark.implicits._
    // keys past ~3.5e9 overflow a bare long multiply; the decimal form
    // must match exact big-integer arithmetic (what the DuckDB oracle's
    // HUGEINT computes) everywhere
    val keys = Seq(0L, 1L, 4000000000L, 123456789012345L, Long.MaxValue / 3)
    val got = keys.toDF("k")
      .select(Sampling.portableHash(col("k")))
      .collect().map(_.getLong(0))
    val want = keys.map(k =>
      ((BigInt(k) * BigInt(2654435761L)) mod BigInt(1000000007L)).toLong)
    assert(got.toSeq === want)
  }

  test("temperature mix: a NULL source is a stratum, not silently dropped") {
    import spark.implicits._
    val docs = Seq(
      (1L, Option("a"), 10L), (2L, Option("a"), 10L),
      (3L, Option.empty[String], 10L)).toDF("doc_id", "source", "ntok")
    val got = Sampling.temperatureMixSqrt(
      docs, Sampling.portableHash(col("doc_id")), col("source"), col("ntok"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the NULL stratum is the RAREST (10 tokens vs 20) → kept whole
    assert(got.contains(3L), "the NULL-source stratum vanished from the mix")
  }

  test("nested thresholds and stratified rates compose from the same gate") {
    val p100 = ids(Sampling.deterministicSample(docs, h, 100))
    val p300 = ids(Sampling.deterministicSample(docs, h, 300))
    assert(p100.subsetOf(p300), "a 30% sample must contain the 10% sample")
    val strat = Sampling.stratifiedSample(
      docs, h, col("lang"), Map("en" -> 100), defaultPermille = 300)
    // per stratum, the stratified gate IS the flat gate on that stratum
    val stratEn = ids(strat.filter(col("lang") === "en"))
    val flatEn = ids(Sampling.deterministicSample(docs.filter(col("lang") === "en"), h, 100))
    assert(stratEn === flatEn)
    val stratRest = ids(strat.filter(col("lang") =!= "en"))
    val flatRest = ids(Sampling.deterministicSample(docs.filter(col("lang") =!= "en"), h, 300))
    assert(stratRest === flatRest)
  }

  test("quota sample: exactly N per stratum, deterministic, stable under growth") {
    val q = Sampling.quotaSample(
      docs.select(col("doc_id"), col("source")), h, col("source"),
      quota = 5, tiebreak = col("doc_id"))
    val perSource = q.groupBy(col("source")).count().collect()
    assert(perSource.nonEmpty)
    assert(perSource.forall(_.getLong(1) === 5L), "every stratum must fill its quota")
    // partitioning-independent
    val q2 = Sampling.quotaSample(
      docs.repartition(7).select(col("doc_id"), col("source")), h, col("source"),
      quota = 5, tiebreak = col("doc_id"))
    assert(ids(q) === ids(q2))
    // growing a stratum only displaces members at the hash boundary: the
    // quota picked from a SUBSET of the corpus contains the full-corpus
    // picks that survive into the subset
    val subset = docs.filter(col("doc_id") % 2 === 0)
    val qSub = ids(Sampling.quotaSample(
      subset.select(col("doc_id"), col("source")), h, col("source"),
      quota = 5, tiebreak = col("doc_id")))
    val fullPicksInSubset = ids(q).filter(_ % 2 == 0)
    assert(fullPicksInSubset.subsetOf(qSub),
      "full-corpus quota members present in the subset must stay picked")
  }
}
