package graft.operators

import graft.SparkSpec

/** RRF fusion semantics: per-list reciprocal contributions, zero for
  * absent ids, fixed fold order, deterministic tie-break by id. */
class HybridRetrievalSpec extends SparkSpec {

  import spark.implicits._

  test("rrf fuses lists; ids absent from a list contribute zero") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rnk")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rnk")
    val got = HybridRetrieval.rrf(Seq(a, b), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def c(r: Int) = 1.0 / (60 + r)
    val expect = Seq(
      (20L, c(2) + c(1)), // in both lists: sum of contributions, top
      (10L, c(1)),        // only list a
      (40L, c(2)),        // only list b
      (30L, c(3)))
    assert(got.map(x => (x._1, x._2)).toSeq === expect)
    assert(got.map(_._3).toSeq === Seq(1, 2, 3, 4), "dense 1-based ranks")
  }

  test("rrf ties break by id; k truncates") {
    val a = Seq((5L, 1), (3L, 1)).toDF("id", "rnk") // same contribution
    val got = HybridRetrieval.rrf(Seq(a), k = 1)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(got.toSeq === Seq((3L, 1)), "equal scores order by id ascending")
  }
}
