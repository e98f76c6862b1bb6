package graft.operators

import graft.SparkSpec

class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private val M = 1000000L // micros per second

  private def run(events: Seq[(Long, String, Long)]) =
    Funnel.funnel(
      events.map { case (u, tp, t) => (u, tp, t * M) }.toDF("user_id", "event_type", "t"),
      "user_id", "event_type", "t",
      Seq(("a", 0L), ("b", 100 * M), ("c", 100 * M)))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap

  test("strict ordering: a stage event AT or BEFORE the previous one doesn't convert") {
    val got = run(Seq(
      (1L, "a", 10), (1L, "b", 10),   // simultaneous: t > prev fails
      (2L, "a", 10), (2L, "b", 5),    // b before a
      (3L, "a", 10), (3L, "b", 11), (3L, "c", 12)))
    assert(got(1L)._2.isEmpty && got(2L)._2.isEmpty)
    assert(got(3L) === ((Some(10 * M), Some(11 * M), Some(12 * M))))
  }

  test("windows bound each stage from the PREVIOUS stage's first occurrence") {
    val got = run(Seq(
      // b lands outside the 100s window after first a (even though a
      // recurs closer — the funnel anchors on the FIRST a)
      (1L, "a", 0), (1L, "a", 150), (1L, "b", 180),
      // b within window; c within window of b
      (2L, "a", 0), (2L, "b", 99), (2L, "c", 150)))
    assert(got(1L)._2.isEmpty, "window anchors on first occurrence")
    assert(got(2L) === ((Some(0L), Some(99 * M), Some(150 * M))))
  }

  test("first occurrence per stage; later stages never resurrect droppers") {
    val got = run(Seq(
      (1L, "a", 0), (1L, "b", 10), (1L, "b", 20), (1L, "c", 15),
      // user 2 has c but never b: must not reach stage 3
      (2L, "a", 0), (2L, "c", 5)))
    // first b at 10; first c after b at 15
    assert(got(1L) === ((Some(0L), Some(10 * M), Some(15 * M))))
    assert(got(2L) === ((Some(0L), None, None)))
  }

  test("users without the anchor stage don't appear at all") {
    val got = run(Seq((1L, "b", 0), (1L, "c", 1), (2L, "a", 0)))
    assert(got.keySet === Set(2L))
  }

  test("plan: every shuffle is user-keyed — no cartesian, no global window") {
    val e = graft.Tables.table(spark, sfDir, "events")
      .selectExpr("user_id", "event_type", "ts div 1000 as t")
    val df = Funnel.funnel(e, "user_id", "event_type", "t",
      Seq(("view", 0L), ("click", 172800L * 1000000), ("purchase", 604800L * 1000000)))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"funnel fell back to a quadratic join:\n$plan")
    assert(!plan.contains("windowspecdefinition"), s"no window needed:\n$plan")
  }
}
