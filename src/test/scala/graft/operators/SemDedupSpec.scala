package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic dedup ([[SemDedup]]): hand-checkable cluster-then-prune on
  * two tight vector groups plus an outlier, the keep-min-id policy, the
  * nProbe ≥ nClusters degeneracy (co-probing becomes exhaustive), and
  * malformed-vector exclusion. */
class SemDedupSpec extends SparkSpec {

  import spark.implicits._

  // two tight groups on orthogonal axes + one diagonal outlier
  // (cos(v4, anything) ≈ 0.71 < 0.9): v1 and v3 are the droppable dups
  private val emb = Seq(
    (0L, Seq(1.0, 0.0)),
    (1L, Seq(1.0, 0.01)),
    (2L, Seq(0.0, 1.0)),
    (3L, Seq(0.01, 1.0)),
    (4L, Seq(0.7, 0.7))
  ).toDF("vec_id", "embedding")

  test("hand-checked prune: groups co-cluster, min id survives, outlier untouched") {
    val (assign, pairs) = SemDedup.prune(emb, minCosine = 0.9,
      nClusters = 2, nProbe = 1)
    val kept = assign.filter(col("kept")).collect().map(_.getLong(0)).toSet
    val droppedSet = assign.filter(!col("kept")).collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 2L, 4L), s"kept $kept dropped $droppedSet")
    assert(droppedSet === Set(1L, 3L))
    val p = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p === Set((0L, 1L), (2L, 3L)), s"pairs $p")
    // every vector carries its primary cell; the two groups separate
    val cells = assign.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells(0L) === cells(1L) && cells(2L) === cells(3L),
      s"each tight group must share its primary cell: $cells")
  }

  test("nProbe >= nClusters degenerates to exhaustive comparison (exact parity)") {
    // with every vector probing every cell, the cluster path must find
    // EXACTLY the brute-force pair relation — and score it identically
    val (_, pairs) = SemDedup.prune(emb, minCosine = 0.5,
      nClusters = 2, nProbe = 2)
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    val exact = VectorSearch.cosineNearDups(emb, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === exact,
      s"exhaustive probing must equal brute force: $got vs $exact")
  }

  test("malformed vectors are excluded, not crashed on") {
    val withBad = emb.union(spark.range(1).select(lit(9L).as("vec_id"),
      expr("array(cast(null as double), cast(1.0 as double))").as("embedding")))
    val (assign, _) = SemDedup.prune(withBad, minCosine = 0.9,
      nClusters = 2, nProbe = 1)
    assert(!assign.collect().map(_.getLong(0)).contains(9L),
      "a vector with a null element must drop out of the index")
    assert(assign.count() === 5L)
  }

  test("determinism: partitioning never changes the verdicts") {
    val shuffled = emb.repartition(5)
    val (a1, p1) = SemDedup.prune(emb, 0.9, nClusters = 2, nProbe = 1)
    val (a2, p2) = SemDedup.prune(shuffled, 0.9, nClusters = 2, nProbe = 1)
    assert(a1.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getBoolean(2))).toSet ===
      a2.collect().map(r => (r.getLong(0), r.getInt(1),
        r.getBoolean(2))).toSet)
    assert(p1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      p2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}
