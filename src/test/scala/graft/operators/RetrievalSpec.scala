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

  // --- multi-query BM25 -----------------------------------------------------

  test("bm25 multi: a single-query relation reproduces topK exactly") {
    val docs = table(spark, sfDir, "documents")
    val terms = Seq("merge", "window", "scan")
    val single = Bm25.topK(docs, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    val multi = Bm25.topKMulti(docs,
        Seq((7L, terms)).toDF("query_id", "terms"), k = 10, maxTerms = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // identical (doc, score, rnk) triples — bit-equal doubles included
    assert(multi === single)
  }

  test("bm25 multi: per-query top-k, no cross-query bleed, zero-match query absent") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha alpha delta"),
      (3L, "epsilon zeta eta")).toDF("doc_id", "text")
    val qs = Seq(
      (0L, Seq("alpha")),
      (1L, Seq("epsilon", "zeta")),
      (2L, Seq("nosuchterm"))).toDF("query_id", "terms")
    val got = Bm25.topKMulti(docs, qs, k = 2, maxTerms = 2).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq
      }
    // query 0: both alpha docs, tf-heavier doc 2 first; doc 3 never appears
    assert(got(0L) === Seq(2L, 1L))
    // query 1: only doc 3 matches
    assert(got(1L) === Seq(3L))
    // query 2 matches nothing → contributes no rows (candidate contract)
    assert(!got.contains(2L))
  }

  test("bm25 multi: duplicate terms within a query are refused") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val qs = Seq((0L, Seq("a", "a"))).toDF("query_id", "terms")
    intercept[IllegalArgumentException] {
      Bm25.topKMulti(docs, qs, k = 1, maxTerms = 4)
    }
  }

  test("bm25 multi: one corpus pass — query terms broadcast, no cartesian") {
    val qs = Seq((0L, Seq("merge")), (1L, Seq("scan", "filter")))
      .toDF("query_id", "terms")
    val df = Bm25.topKMulti(table(spark, sfDir, "documents"), qs, k = 5,
      maxTerms = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"query terms must broadcast to the token scan:\n$plan")
  }

  test("bm25 multi: shuffled fallback (broadcastQueries=false) is bit-identical") {
    // the SCALE.md batching knob's other side: thousands of terms per
    // pass would want a shuffled join — same results either way
    val docs = table(spark, sfDir, "documents")
    val qs = Seq((0L, Seq("merge", "window")), (1L, Seq("scan", "filter")),
      (2L, Seq("delta"))).toDF("query_id", "terms")
    def run(bc: Boolean) = {
      val df = Bm25.topKMulti(docs, qs, k = 10, maxTerms = 2,
        broadcastQueries = bc)
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    }
    val viaBroadcast = run(bc = true)
    // forbid the planner from broadcasting on its own so the fallback
    // path genuinely exercises a shuffled join
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "-1"))
    val viaShuffle = try run(bc = false)
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    assert(viaShuffle === viaBroadcast) // bit-equal doubles included
    assert(viaBroadcast.nonEmpty)
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

  test("pq trained codebook: deterministic, and recall vs exact L2 is usable") {
    val emb = table(spark, sfDir, "embeddings")
    // exact L2 nearest per query on the same quantized integer space the
    // ADC approximates — the ground truth PQ is judged against
    val q = VectorSearch.quantized(emb.filter(col("vec_id") < 20))
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val c = VectorSearch.quantized(emb)
      .select(col("vec_id").as("nid"), col("v").as("nv"))
    val exact = q.crossJoin(c).filter(col("qid") =!= col("nid"))
      .withColumn("d2", expr(
        "aggregate(zip_with(qv, nv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("d2").asc, col("nid").asc)))
      .filter(col("rnk") === 1)
      .select(col("qid"), col("nid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // m=16/kc=32 (16-byte codes): random synthetic embeddings are VQ's
    // worst case, so the 8-byte default sits near 0.3 recall for seed AND
    // trained codebooks alike (measured) — the spec gates a budget where
    // training visibly pays (0.8 measured vs 0.45 at kc=64, m=8)
    val trained = PqSearch.pqTopKTrained(
      emb.filter(col("vec_id") < 20), emb, k = 10, m = 16, kc = 32)
    val top10 = trained.collect().groupBy(_.getLong(0))
      .map { case (qid, rs) => qid -> rs.map(_.getLong(1)).toSet }
    val hits = exact.count { case (qid, nid) => top10.get(qid).exists(_(nid)) }
    val recall = hits.toDouble / exact.size
    assert(recall >= 0.6, s"trained-codebook recall@10 $recall too low")
    // seeded training: bit-identical codebook and results across runs
    val again = PqSearch.pqTopKTrained(
      emb.filter(col("vec_id") < 20), emb, k = 10, m = 16, kc = 32)
    assert(trained.collect().map(_.toSeq).toSeq ===
      again.collect().map(_.toSeq).toSeq)
    val cb1 = PqSearch.trainCodebook(emb)
    val cb2 = PqSearch.trainCodebook(emb)
    assert(cb1.flatten.flatten.toSeq === cb2.flatten.flatten.toSeq)
  }

  test("pq: a malformed corpus vector never outranks real neighbors") {
    // wrong-dimension embedding → NULL codes; it must be excluded, not
    // ranked first on a NULL distance (the other ANN tiers' contract)
    val emb = table(spark, sfDir, "embeddings")
    val bad = Seq((7777L, Seq(1f, 2f, 3f))).toDF("vec_id", "embedding")
    val corpus = emb.select(col("vec_id"), col("embedding")).union(bad)
    val got = PqSearch.pqTopK(corpus.filter(col("vec_id") < 2), corpus, k = 5)
      .collect()
    assert(got.forall(!_.isNullAt(3)), "NULL ad2 leaked into the ranking")
    assert(!got.exists(_.getLong(1) == 7777L), "malformed vector in top-k")
    // a malformed QUERY drops out entirely (NULL luts) instead of
    // emitting k NULL-distance rows; well-formed queries are unaffected
    val got2 = PqSearch.pqTopK(
      corpus.filter(col("vec_id") < 2 || col("vec_id") === 7777L), corpus, k = 5)
      .collect()
    assert(got2.map(_.getLong(0)).toSet === Set(0L, 1L),
      "malformed query must vanish, not rank NULLs")
    assert(got2.forall(!_.isNullAt(3)))
    // and the trained path tolerates the same corpus (the malformed
    // vector is filtered out of the training sample, not crashed on)
    val trained = PqSearch.pqTopKTrained(
      corpus.filter(col("vec_id") < 2), corpus, k = 3)
    assert(trained.collect().length === 6)
  }

  test("runtime filter sizing: power-of-two, floored, overflow-guarded") {
    import graft.operators.RuntimeFilter.numBitsFor
    assert(numBitsFor(1) === 1 << 10)          // floor
    assert(numBitsFor(65536) === 1 << 20)      // exact power of two
    assert(numBitsFor(65537) === 1 << 21)      // rounds UP, never down
    intercept[IllegalArgumentException](numBitsFor(0))
    // a Long-overflowing product must raise, not wrap into a tiny filter
    intercept[IllegalArgumentException](numBitsFor(Long.MaxValue / 2))
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
