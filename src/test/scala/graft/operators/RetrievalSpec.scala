package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables.table

class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  // --- BM25 -----------------------------------------------------------------

  test("bm25: a doc stuffed with the query terms outranks one without them") {
    val docs = Seq(
      (1L, "merge window scan merge window scan merge"),
      (2L, "filter join group sort table batch stream"),
      (3L, "merge filter join group sort table batch")).toDF("doc_id", "text")
    val got = Bm25.topK(docs, Seq("merge", "window", "scan"), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    assert(got(1L) === 1, "term-dense doc must rank first")
    assert(got(3L) === 2, "single-hit doc must beat zero-hit doc")
    assert(got(2L) === 3)
  }

  test("bm25: rarer terms weigh more at equal tf (IDF monotonicity)") {
    // 'rare' appears in 1 doc, 'common' in all 4; docs 1 and 2 have equal
    // length and one hit each — the rare-term doc must score higher
    val docs = Seq(
      (1L, "rare aaa bbb ccc"),
      (2L, "common aaa bbb ccc"),
      (3L, "common xxx yyy zzz"),
      (4L, "common ppp qqq rrr")).toDF("doc_id", "text")
    val score = Bm25.topK(docs, Seq("rare", "common"), k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(score(1L) > score(2L),
      s"rare-term doc ${score(1L)} must outscore common-term doc ${score(2L)}")
  }

  test("bm25: tf saturates — 10x the tf is far less than 10x the score") {
    val docs = Seq(
      (1L, ("term " * 10).trim + " " + ("pad " * 10).trim),
      (2L, "term " + ("pad " * 19).trim)).toDF("doc_id", "text")
    val score = Bm25.topK(docs, Seq("term"), k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(score(1L) > score(2L))
    assert(score(1L) < 4 * score(2L),
      s"saturation: ${score(1L)} should be < 4x ${score(2L)}")
  }

  test("bm25: plan is one scan — no data-sized shuffle, top-k via TakeOrdered") {
    val df = Bm25.topK(table(spark, sfDir, "documents"),
      Seq("merge", "window", "scan"), k = 10)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k operator:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"stats must broadcast, not cartesian:\n$plan")
  }

  // --- PQ ANN ---------------------------------------------------------------

  test("pq: self-distance through own codes is the subspace-quantization floor") {
    // a codebook seed vector encodes to itself in every subspace, so its
    // ADC distance to itself is 0 — probe via a query that IS seed 3
    val emb = table(spark, sfDir, "embeddings")
    val got = PqSearch.pqTopK(emb.filter(col("vec_id") === 3), emb, k = 1000)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toMap
    // every other codebook seed c < 16 sits exactly on its own centroids,
    // so its ADC distance equals the true subspace distance sum — in
    // particular all ad2 values are >= 0 and the nearest seed is found
    assert(got.values.forall(_ >= 0L))
    assert(got.nonEmpty)
  }

  test("pq: ADC top-1 recalls the true nearest neighbor on planted twins") {
    // plant a near-identical twin of vector 42: PQ encodes both to the
    // same codes, so the twin's ADC distance equals vector 42's own
    // quantization distance — rank 1 by construction
    val emb = table(spark, sfDir, "embeddings")
    val twin = emb.filter(col("vec_id") === 42)
      .select(lit(9999L).as("vec_id"), col("embedding"))
    val corpus = emb.select(col("vec_id"), col("embedding")).union(twin)
    val got = PqSearch.pqTopK(corpus.filter(col("vec_id") === 9999L), corpus, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).head
    assert(got === ((9999L, 42L, 1)), s"twin must be rank 1, got $got")
  }

  test("pq: codes compress to m small ids (the 100TB reason PQ exists)") {
    val emb = table(spark, sfDir, "embeddings")
    val rows = PqSearch.pqTopK(emb.filter(col("vec_id") < 2), emb, k = 3)
      .collect()
    assert(rows.length === 2 * 3)
    // ad2 is a sum of 8 per-subspace lookups, deterministic across runs
    val again = PqSearch.pqTopK(emb.filter(col("vec_id") < 2), emb, k = 3)
      .collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  // --- temperature mix ------------------------------------------------------

  test("temperature mix: rarest source kept whole, heavier sources thinned to ~sqrt") {
    // sources with 4x the tokens should keep ~1/2 the rate (sqrt(1/4))
    val docs = (0 until 400).map { i =>
      val src = if (i < 80) "small" else "big"
      (i.toLong, src, 10L)
    }.toDF("doc_id", "source", "ntok")
    val got = Sampling.temperatureMixSqrt(
      docs, Sampling.portableHash(col("doc_id")), col("source"), col("ntok"))
      .groupBy(col("source")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got("small") === 80L, "rarest source must be kept whole")
    // big: 320 docs at keep-rate 1/2 → ~160; hash-gate variance is real
    // but bounded — accept a generous band
    assert(got("big") > 120L && got("big") < 200L, s"got ${got("big")}")
  }

  test("temperature mix: deterministic — same rows under repartitioning") {
    val docs = (0 until 300).map(i =>
      (i.toLong, s"src${i % 3}", (i % 7 + 1).toLong)).toDF("doc_id", "source", "ntok")
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.temperatureMixSqrt(df,
        Sampling.portableHash(col("doc_id")), col("source"), col("ntok"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(docs) === ids(docs.repartition(13)))
  }
}
