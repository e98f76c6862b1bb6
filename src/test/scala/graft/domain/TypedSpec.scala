package graft.domain

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TypedSpec extends SparkSpec {

  test("typed Aggregator matches untyped aggregateActivities") {
    val acts = Fixtures.activities(spark, 20, 120)
    val typed = Typed.aggregateActivities(Typed.activities(acts))
      .collect().map { case (id, s) => id -> s }.toMap
    val untyped = Ops.aggregateActivities(acts).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(typed.keySet === untyped.keySet)
    typed.foreach { case (id, s) =>
      val (cnt, mean) = untyped(id)
      assert(s.count_activity === cnt)
      assert(math.abs(s.mean_duration - mean) < 1e-9)
    }
  }

  test("typed decode round-trip: CDC envelopes → Dataset[SportActivity]") {
    val decoded = Typed.activities(Ops.decodeCdc(Fixtures.cdcEnvelopes(spark, 5, 20)))
    val n = decoded.count()
    assert(n === Fixtures.activities(spark, 5, 20).count())
    val withDist = decoded.filter(_.distance.isDefined).count()
    val withoutDist = decoded.filter(_.distance.isEmpty).count()
    assert(withDist + withoutDist === n)
    assert(withDist > 0 && withoutDist > 0)
  }
}
