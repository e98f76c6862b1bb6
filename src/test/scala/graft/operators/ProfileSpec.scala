package graft.operators

import graft.SparkSpec
import graft.Tables.table

class ProfileSpec extends SparkSpec {

  import spark.implicits._

  lazy val docs = table(spark, sfDir, "documents")

  private def exchanges(plan: String): Int =
    // the AQE string repeats the tree under "== Initial Plan ==" — count
    // only the final plan's exchanges
    "Exchange hashpartitioning".r.findAllIn(plan.split("== Initial Plan ==")(0)).size

  test("sketch default: one column-keyed shuffle, no value-keyed distinct shuffle") {
    // the scale contract: partial HLL sketches shuffle (|cols| × partitions
    // fixed-size buffers), never the values — exact distinct would add a
    // second Exchange keyed on (column, value), i.e. the full text bytes
    val df = Profile.profile(docs, Seq("lang", "source", "text"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("approx_count_distinct"), s"no sketch distinct in:\n$plan")
    assert(exchanges(plan) == 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("exact opt-in: two-phase distinct adds the (column, value)-keyed exchange") {
    val df = Profile.profile(docs, Seq("lang", "source"), exactDistinct = true)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("approx_count_distinct"), s"sketch leaked into exact mode:\n$plan")
    assert(exchanges(plan) == 2, s"expected 2 exchanges (distinct + final), plan:\n$plan")
  }

  test("sketch agrees with exact on every non-distinct stat; distinct within 10%") {
    def byCol(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    val sketch = byCol(Profile.profile(docs, Seq("lang", "source", "doc_id")))
    val exact = byCol(Profile.profile(docs, Seq("lang", "source", "doc_id"),
      exactDistinct = true))
    assert(sketch.keySet === exact.keySet)
    exact.foreach { case (c, (n, nn, nd, mn, mx)) =>
      val (sn, snn, snd, smn, smx) = sketch(c)
      assert((sn, snn, smn, smx) === ((n, nn, mn, mx)), s"non-distinct stats differ for $c")
      assert(math.abs(snd - nd) <= math.max(1L, (nd * 0.10).toLong),
        s"column $c: sketch distinct $snd vs exact $nd")
    }
  }

  test("hostile column names (backticks, quotes, dots) profile correctly") {
    // ADVICE r4: the old stack()-splice broke on quotes/backticks; the
    // Column-API unpivot must treat the name as data, not syntax
    val df = Seq((1, "a", "x"), (2, "b", "x"), (3, null, "y"))
      .toDF("we`ird", "o'brien", "dot.ted")
    val got = Profile.profile(df, Seq("we`ird", "o'brien", "dot.ted"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got("we`ird") === ((3L, 3L, 3L)))
    assert(got("o'brien") === ((3L, 2L, 2L)))
    assert(got("dot.ted") === ((3L, 3L, 2L)))
  }
}
