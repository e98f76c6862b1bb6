package graft.operators

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {

  import spark.implicits._
  import Expectations._

  private def report(df: org.apache.spark.sql.DataFrame, suite: Seq[Expectation]) =
    validate(df, suite).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap

  test("suite semantics: missing-ignored, mostly permille, unique extras, regex") {
    val df = Seq(
      (Some(1), Some("a@x.io"), "ok"),
      (Some(1), Some("b@y.io"), "ok"),
      (Some(-2), None, "bad"),
      (None, Some("not-an-email"), "ok"))
      .toDF("id", "email", "status")
    val got = report(df, Seq(
      NotNull("id"),
      Between("id", min = Some(0.0)),            // NULL ignored: 3 evaluated
      Unique("id"),                              // two 1s -> 1 extra copy
      MatchesRegex("email", "^[^@]+@[^@]+$"),    // NULL ignored: 3 evaluated
      InSet("status", Seq("ok"), mostlyPermille = 700))) // 1/4 bad: passes at 70%
    assert(got(("not_null", "id")) === ((4L, 1L, false)))
    assert(got(("between", "id")) === ((3L, 1L, false)))
    assert(got(("unique", "id")) === ((3L, 1L, false)))
    assert(got(("matches_regex", "email")) === ((3L, 1L, false)))
    assert(got(("in_set", "status")) === ((4L, 1L, true)))
    // tighten mostly and the same data fails
    val strict = report(df, Seq(InSet("status", Seq("ok"), mostlyPermille = 800)))
    assert(strict(("in_set", "status")) === ((4L, 1L, false)))
  }

  test("foreign key: orphans counted, broadcastable dim, clean table passes") {
    val facts = Seq((1, 10), (2, 20), (3, 99)).toDF("id", "ref_id")
    val dim = Seq(10, 20, 30).toDF("k")
    val got = report(facts, Seq(ForeignKey("ref_id", dim, "k")))
    assert(got(("foreign_key", "ref_id")) === ((3L, 1L, false)))
    val clean = report(facts.filter($"ref_id" =!= 99), Seq(ForeignKey("ref_id", dim, "k")))
    assert(clean(("foreign_key", "ref_id")) === ((2L, 0L, true)))
  }

  test("report rows come back in suite order, FK interleaved included") {
    val facts = Seq((1, 10)).toDF("id", "ref_id")
    val dim = Seq(10).toDF("k")
    val labels = validate(facts, Seq(
      NotNull("id"), ForeignKey("ref_id", dim, "k"), Unique("id")))
      .collect().map(_.getString(0)).toSeq
    assert(labels === Seq("not_null", "foreign_key", "unique"))
  }

  test("empty table: everything passes with zero counts, no NULL poisoning") {
    val df = Seq.empty[(Option[Int], String)].toDF("id", "s")
    val got = report(df, Seq(NotNull("id"), Between("id", min = Some(0.0)),
      Unique("id"), ForeignKey("id", Seq(1).toDF("k"), "k")))
    assert(got.values.toSet === Set((0L, 0L, true)))
  }

  test("row-predicate suite is ONE aggregate pass (single scan, no per-check jobs)") {
    val df = graft.Tables.table(spark, sfDir, "orders")
    val rep = validate(df, Seq(NotNull("o_custkey"),
      Between("o_totalprice", min = Some(0.0)), Unique("o_orderkey")))
    rep.collect()
    val plan = rep.queryExecution.executedPlan.toString
    // one FileScan of orders feeds every check
    val scans = "FileScan parquet".r.findAllIn(
      plan.split("== Initial Plan ==")(0)).size
    assert(scans == 1, s"expected a single scan, plan:\n$plan")
  }
}
