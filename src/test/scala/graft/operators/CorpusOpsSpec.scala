package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables.table

class CorpusOpsSpec extends SparkSpec {

  import spark.implicits._

  lazy val docs = table(spark, sfDir, "documents").cache()

  // --- connected components -------------------------------------------------

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents
      .components(edges.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("components: chain needs multi-round propagation, closes transitively") {
    // 7-5-3-1 chain written so the min label (1) must travel 3 hops —
    // exercises the fixpoint loop beyond a single round — plus a separate
    // pair and the labels must not bleed across components.
    val got = cc(Seq((5L, 7L), (3L, 5L), (1L, 3L), (10L, 12L)))
    assert(got === Map(1L -> 1L, 3L -> 1L, 5L -> 1L, 7L -> 1L,
      10L -> 10L, 12L -> 10L))
  }

  test("components: duplicate + reversed edges don't change the result") {
    val got = cc(Seq((2L, 1L), (1L, 2L), (2L, 3L), (2L, 3L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("components == driver-side union-find on a random graph") {
    // deterministic pseudo-random edges (hash-derived, no RNG)
    val n = 200
    val edges = (0 until 300).map { i =>
      val h = scala.util.hashing.MurmurHash3.productHash((i, "edge"))
      val a = math.floorMod(h, n).toLong
      val b = math.floorMod(h >> 8, n).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2)

    // reference: union-find
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> find(v.toInt).toLong).toMap
    // union-find roots are path-dependent; normalize to min-id per root
    val byRoot = want.groupBy(_._2).map { case (_, m) => m.keys.min -> m.keys.toSet }
    val wantNorm = byRoot.flatMap { case (minId, vs) => vs.map(_ -> minId) }.toMap

    assert(cc(edges) === wantNorm)
  }

  test("components: driver union-find and distributed propagation agree (gate parity)") {
    // round 13: small integer-id graphs close driver-side (the default
    // gate); threshold 0 forces the distributed min-label loop — both
    // must produce identical labels, and the distributed path must
    // still handle multi-round chains
    val edges = (0 until 400).map { i =>
      val h = scala.util.hashing.MurmurHash3.productHash((i, "gate"))
      val a = math.floorMod(h, 250).toLong
      val b = math.floorMod(h >> 7, 250).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2) ++ Seq((500L, 501L), (501L, 502L), (502L, 503L))
    val driver = cc(edges)
    val dist =
      try {
        spark.conf.set("spark.graft.cc.driverEdgeThreshold", "0")
        cc(edges)
      } finally spark.conf.unset("spark.graft.cc.driverEdgeThreshold")
    assert(driver === dist)
    assert(driver(503L) === 500L, "chain must close transitively on both paths")
    // int-typed ids keep their type through the gate's long cast
    import org.apache.spark.sql.functions.col
    val intDf = ConnectedComponents.components(
      Seq((1, 2), (2, 3)).toDF("a_id", "b_id"))
    assert(intDf.schema.fields.forall(_.dataType ===
      org.apache.spark.sql.types.IntegerType))
    assert(intDf.collect().map(r => (r.getInt(0), r.getInt(1))).toSet ===
      Set((1, 1), (2, 1), (3, 1)))
  }

  test("components: null-endpoint edges drop identically on both paths") {
    // a null id cannot name a node: edges with a null endpoint filter at
    // the shared source, so crossing the driver/distributed gate must not
    // change the output (round-14 parity fix)
    val edges = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (2L, 3L), (7L, null), (null, 8L), (null, null), (10L, 11L))
      .toDF("a_id", "b_id")
    def run(): Map[Long, Long] = ConnectedComponents.components(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driver = run()
    val dist =
      try {
        spark.conf.set("spark.graft.cc.driverEdgeThreshold", "0")
        run()
      } finally spark.conf.unset("spark.graft.cc.driverEdgeThreshold")
    assert(driver === dist,
      "crossing the gate must not change output on null-endpoint inputs")
    assert(driver === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // the non-integer path drops them the same way
    val strOut = ConnectedComponents.components(
      Seq[(String, String)](("a", "b"), ("c", null), (null, null))
        .toDF("a_id", "b_id"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(strOut === Map("a" -> "a", "b" -> "a"))
  }

  test("dedupClusters: sizes are per-component and canonical id is the min") {
    val out = ConnectedComponents
      .dedupClusters(Seq((4L, 9L), (9L, 2L), (30L, 40L)).toDF("a_id", "b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((2L, 2L, 3L), (4L, 2L, 3L), (9L, 2L, 3L),
      (30L, 30L, 2L), (40L, 30L, 2L)))
  }

  test("dedupClusters: driver-pass sizes equal the distributed groupBy+join") {
    // r19 optimization: the driver union-find path counts csize in the
    // same sweep instead of a groupBy + self-join over a local relation —
    // crossing the gate must not change rows, schema, or types
    val edges = Seq((4L, 9L), (9L, 2L), (30L, 40L), (5L, 5L), (1L, 2L))
      .toDF("a_id", "b_id")
    def run(): Set[(Long, Long, Long)] = {
      val df = ConnectedComponents.dedupClusters(edges)
      assert(df.schema.fieldNames.toSeq === Seq("doc_id", "component_id", "csize"))
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val driver = run()
    val dist =
      try {
        spark.conf.set("spark.graft.cc.driverEdgeThreshold", "0")
        run()
      } finally spark.conf.unset("spark.graft.cc.driverEdgeThreshold")
    assert(driver === dist)
  }

  // --- decontamination ------------------------------------------------------

  test("decontamination finds planted cross-split near-dups with wide margin") {
    val eval = docs.filter(col("doc_id") % 10 === 7)
    val train = docs.filter(col("doc_id") % 10 =!= 7)
    val ov = Decontaminate.overlaps(train, eval, n = 3, minOverlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ov.nonEmpty)
    // the q51 threshold (10) must sit in a corpus margin: planted dups far
    // above, background far below — a regenerated corpus fails HERE loudly
    // instead of flaking the hash gate (same pattern as q19/q39 guards)
    val hits = ov.filter(_._3 >= 10)
    assert(hits.nonEmpty, "corpus must contain cross-split planted dups")
    assert(hits.forall(_._3 >= 20), s"hit too close to threshold: ${hits.minBy(_._3)}")
    assert(ov.filter(_._3 < 10).forall(_._3 <= 5),
      "background overlap crept toward the q51 threshold")
  }

  test("decontamination broadcastEval hints the eval side") {
    val eval = docs.filter(col("doc_id") % 10 === 7)
    val train = docs.filter(col("doc_id") % 10 =!= 7)
    val plan = Decontaminate
      .overlaps(train, eval, broadcastEval = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  // --- shard packing --------------------------------------------------------

  test("shardPack == driver-side global prefix sum, and spans >1 bucket") {
    val d = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ntok"))
    val got = ShardPack.pack(d, col("doc_id"), col("ntok"), budget = 2000L)
      .select(col("doc_id"), col("cum_before"), col("shard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // reference: one global in-memory pass in (portableHash, id) order
    val rows = d.collect().map(r => (r.getLong(0), r.getLong(1)))
    val ordered = rows.sortBy { case (id, _) =>
      (math.floorMod(id * 2654435761L, 1000000007L), id)
    }
    var cum = 0L
    val want = ordered.map { case (id, w) =>
      val before = cum; cum += w; (id, before, before / 2000L)
    }.toSet
    assert(got === want)

    // the decomposition must actually have been exercised: >1 hash bucket
    val nBuckets = d.select((graft.operators.Sampling.portableHash(col("doc_id"))
      .divide(lit(1L << 24))).cast("long")).distinct().count()
    assert(nBuckets > 1, s"corpus landed in $nBuckets bucket(s) — two-phase path untested")
  }

  test("shardPack: shards are contiguous, budget-bounded, and never split a doc") {
    val d = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ntok"))
    val out = ShardPack.pack(d, col("doc_id"), col("ntok"), budget = 2000L)
      .select(col("shard"), col("ntok"))
      .groupBy("shard").agg(
        sum(col("ntok")).as("tot"), max(col("ntok")).as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val shards = out.map(_._1).sorted
    assert(shards.length > 2, "budget too large to test packing")
    assert(shards === (shards.min to shards.max), "shard ids must be contiguous")
    // every shard but the last is filled past nothing less than budget
    // minus its largest doc (docs are atomic), and none exceeds budget
    // by more than one doc
    out.filter(_._1 != shards.max).foreach { case (s, tot, mx) =>
      assert(tot + mx > 2000L, s"shard $s underfilled: tot=$tot mx=$mx")
      assert(tot < 2000L + mx, s"shard $s overfilled: tot=$tot mx=$mx")
    }
  }

  test("shardPack plan: per-row window is bucket-partitioned; offsets broadcast-joined") {
    val d = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ntok"))
    val plan = ShardPack.pack(d, col("doc_id"), col("ntok"), budget = 2000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    // the doc-level running sum must be keyed by __bucket (parallel), not
    // a bare global Window (single-partition sort of the corpus)
    assert(plan.contains("windowspecdefinition(__bucket"), plan.take(3000))
  }

  // --- global index ---------------------------------------------------------

  test("globalIndex == driver-side sort; dense 0-based; no global row window") {
    val d = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ntok"))
    val out = GlobalIndex.rank(d, col("ntok").desc, col("doc_id").asc)
    out.collect() // finalize AQE before reading the plan
    val got = out.select("doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = d.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, n) => (-n, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> i.toLong }.toMap
    assert(got === want)
    // the per-row window must be keyed by __pid (parallel), and the
    // offsets must arrive via broadcast — never a global row_number
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(__pid"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("globalIndex on empty input returns empty, and requires an order") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "ntok")
    assert(GlobalIndex.rank(empty, col("ntok").asc).count() === 0L)
    intercept[IllegalArgumentException](GlobalIndex.rank(empty))
  }

  test("shardPack and globalIndex reject reserved output-column collisions") {
    import spark.implicits._
    val clash1 = Seq((1L, 2L)).toDF("doc_id", "shard")
    intercept[IllegalArgumentException](
      ShardPack.pack(clash1, col("doc_id"), col("shard"), 10L))
    val clash2 = Seq((1L, 2L)).toDF("doc_id", "rank")
    intercept[IllegalArgumentException](
      GlobalIndex.rank(clash2, col("doc_id").asc))
  }

  // --- dedup apply ----------------------------------------------------------

  test("dedupApply: survivors = all docs minus non-canonical cluster members") {
    val edges = TextDedup.minhashPairs(docs, n = 3, minJaccard = 0.5)
      .select(col("a_id"), col("b_id"))
    val comp = ConnectedComponents.components(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val redundant = comp.filter { case (id, c) => id != c }.map(_._1).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val survivors = graft.queries.CorpusQueries.q54DedupApply
      .run(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(redundant.nonEmpty, "corpus must contain near-dup clusters")
    assert(survivors === all -- redundant)
    // every cluster keeps exactly its canonical (min-id) member
    comp.groupBy(_._2).foreach { case (c, members) =>
      assert(members.map(_._1).toSet.intersect(survivors) === Set(c))
    }
  }

  test("decontamination DF cap drops cross-corpus boilerplate, keeps real hits") {
    import spark.implicits._
    // every train doc shares a 12-word template with every eval doc —
    // uncapped, the join pairs all of them; the one real contamination is
    // train doc 100 containing eval doc 207's exact content
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ")
    val train = ((0L until 20L).map(i => (i, s"$boiler t${i}a t${i}b")) :+
      (100L, s"leaked benchmark question alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val eval = ((200L until 207L).map(i => (i, s"$boiler e${i}a e${i}b")) :+
      (207L, s"leaked benchmark question alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val uncapped = Decontaminate.overlaps(train, eval, minOverlap = 5)
    assert(uncapped.count() > 20, "boilerplate should blow up the uncapped join")
    val capped = Decontaminate
      .overlaps(train, eval, minOverlap = 5, maxShingleDf = Some(10L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((100L, 207L)), s"capped hits: $capped")
  }

  test("streaming decontamination across micro-batches == batch operator") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamClean
    val evalDocs = Seq(
      (900L, "benchmark question alpha beta gamma delta epsilon zeta eta theta"),
      (901L, "another held out prompt one two three four five six"))
      .toDF("doc_id", "text")
    // batch 1: one clean doc + one leak of eval 900; batch 2: a second
    // leak (eval 901) + a clean doc — per-batch filtering must drop both
    // leaks and keep both clean docs, independent of batch boundaries
    val b1 = Seq(
      (1L, "ordinary training words aa bb cc dd ee ff gg hh"),
      (2L, "benchmark question alpha beta gamma delta epsilon zeta eta theta"))
    val b2 = Seq(
      (3L, "another held out prompt one two three four five six"),
      (4L, "more ordinary training words ii jj kk ll mm nn oo pp"))
    val out = java.nio.file.Files.createTempDirectory("clean_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("clean_ckpt").toString
    val stream = MemoryStream[(Long, String)]
    val q = StreamClean.start(
      stream.toDF().toDF("doc_id", "text"), evalDocs, out, ckpt,
      minOverlap = 5,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val batchTruth = Decontaminate
      .overlaps((b1 ++ b2).toDF("doc_id", "text"), evalDocs, minOverlap = 5)
      .select("train_id").collect().map(_.getLong(0)).toSet
    assert(batchTruth === Set(2L, 3L), s"planted leaks not detected: $batchTruth")
    assert(got === Set(1L, 4L))
    assert(got === (b1 ++ b2).map(_._1).toSet -- batchTruth)
  }

  test("CorpusCleanJob writes the q56 corpus as shard-partitioned parquet") {
    val out = java.nio.file.Files.createTempDirectory("corpus_out").toString
    val n = graft.apps.CorpusCleanJob.run(spark, sfDir, out, budget = 2000L)
    val q56 = graft.queries.CorpusQueries.q56CorpusPipeline.run(spark, sfDir)
      .withColumn("shard", expr("cum_before div 2000"))
      .select(col("doc_id"), col("shard"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(n == q56.size)
    // partition-column values are type-inferred on read → cast back
    val written = spark.read.parquet(out)
      .select(col("doc_id"), col("shard").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(written === q56)
    // the on-disk layout is one directory per shard (what a loader mounts)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).toSet
    assert(dirs === q56.map(_._2).map(s => s"shard=$s"))
  }

  // --- leakage-free split ---------------------------------------------------

  test("leakFreeSplit: near-dup clusters never straddle splits; gate is canonical-hashed") {
    import graft.operators.Sampling
    val edges = TextDedup.minhashPairs(docs, minJaccard = 0.5)
      .select(col("a_id"), col("b_id"))
    val comp = ConnectedComponents.components(edges)
      .select(col("id").as("doc_id"), col("component_id"))
    val out = Sampling.leakFreeSplit(docs.select(col("doc_id")), comp,
      valPermille = 100, testPermille = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length === docs.count())
    // the leakage invariant: one split per cluster
    val byCanon = out.groupBy(_._2)
    byCanon.foreach { case (canon, members) =>
      assert(members.map(_._3).toSet.size === 1,
        s"cluster $canon straddles splits: ${members.toSeq}")
    }
    assert(byCanon.exists(_._2.length > 1), "corpus must contain real clusters")
    // all three splits occupied, and assignment matches the hash formula
    assert(out.map(_._3).toSet === Set("train", "val", "test"))
    out.foreach { case (_, canon, split) =>
      val b = math.floorMod(canon * 2654435761L, 1000000007L) % 1000
      val want = if (b < 100) "test" else if (b < 200) "val" else "train"
      assert(split === want)
    }
  }

  test("leakFreeSplit rejects out-of-range fractions") {
    import graft.operators.Sampling
    import spark.implicits._
    val d = Seq(1L).toDF("doc_id")
    val c = Seq.empty[(Long, Long)].toDF("doc_id", "component_id")
    intercept[IllegalArgumentException](Sampling.leakFreeSplit(d, c, 600, 600))
  }

  test("curriculum bins are equal-depth, monotone in the order, and plan-parallel") {
    val out = graft.queries.CorpusQueries.q69CurriculumBins.run(spark, sfDir)
    out.collect() // finalize AQE before reading the plan
    val rows = out.select("rank", "bin", "ntok")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = rows.length
    assert(n > 100)
    // equal depth within 1 (floor-rounding) and 4 occupied bins
    val sizes = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet === Set(0L, 1L, 2L, 3L))
    assert(sizes.values.max - sizes.values.min <= 1, s"depths: $sizes")
    // bin is monotone in rank, and rank order respects the difficulty proxy
    rows.sortBy(_._1).foldLeft((-1L, -1L)) { case ((pb, pt), (_, b, t)) =>
      assert(b >= pb && t >= pt); (b, t)
    }
    // the rank must come from the parallel GlobalIndex shape, not a
    // single-partition ntile window
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(__pid"), plan.take(3000))
  }

  // --- cross-corpus fuzzy join ----------------------------------------------

  test("minhashJoin == exact cross-split all-pairs (q65's oracle shape)") {
    val left = docs.filter(col("doc_id") % 10 === 7)
    val right = docs.filter(col("doc_id") % 10 =!= 7)
    val got = TextDedup.minhashJoin(left, right, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // truth from the independent single-corpus exact path, restricted to
    // cross-split pairs (both orientations — minhashJoin keys sides, not a<b)
    val want = TextDedup.exactJaccardPairs(docs, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, j) => Seq((a, b, j), (b, a, j)) }
      .filter { case (l, r, _) => l % 10 == 7 && r % 10 != 7 }.toSet
    assert(want.nonEmpty, "corpus must contain cross-split near-dups")
    assert(got === want)
  }

  test("minhashJoin on disjoint-content tables is empty; identical doc pairs at 1.0") {
    import spark.implicits._
    val a = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val b = Seq((2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    assert(TextDedup.minhashJoin(a, b, minJaccard = 0.1).count() === 0L)
    val dup = Seq((9L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val hit = TextDedup.minhashJoin(a, dup, minJaccard = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hit.toSeq === Seq((1L, 9L, 1.0)))
  }

  test("decontamination result matches unfiltered-jaccard cross-split slice") {
    // cross-check: the (train,eval) overlap counts must equal the
    // intersection counts the exact-Jaccard machinery computes for the
    // same pairs (shared shingle-join shape, independent composition)
    val eval = docs.filter(col("doc_id") % 10 === 7)
    val train = docs.filter(col("doc_id") % 10 =!= 7)
    val got = Decontaminate.overlaps(train, eval, minOverlap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaJaccard = TextDedup.exactJaccardPairs(docs, minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (t, e) => t % 10 != 7 && e % 10 == 7 }.toSet
    assert(got === viaJaccard)
  }
}
