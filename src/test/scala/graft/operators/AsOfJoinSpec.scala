package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables.table

class AsOfJoinSpec extends SparkSpec {

  test("asofJoin matches the brute-force range-join + row_number definition") {
    val ev = table(spark, sfDir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("t_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), expr("ts div 1000").as("t_us"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    val c = clicks.select(col("user_id").as("c_uid"), col("t_us").as("c_t"),
      col("click_id"), col("click_value"))

    val got = AsOfJoin.asofJoin(p, clicks, "user_id", "t_us", Seq("click_id", "click_value"))

    // oracle: range join, keep latest click per purchase
    val w = Window.partitionBy(col("event_id")).orderBy(col("c_t").desc, col("click_id").desc)
    val brute = p.join(c, col("user_id") === col("c_uid") && col("c_t") <= col("t_us"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("t_us"),
        col("click_id").as("asof_click_id"), col("click_value").as("asof_click_value"))

    assert(got.count() === p.count())
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }

  test("asofJoin: NULL times match nothing — not everything") {
    import spark.implicits._
    // a NULL right time would sort NULLS-FIRST ahead of every real row
    // and be carried as the as-of match for all of them; DuckDB's ASOF
    // (l.t >= NULL never true) matches nothing
    val left = Seq((1L, 5L, "p1"), (1L, 2L, "p2")).toDF("k", "t", "pl")
    val right = Seq(
      (1L, Option.empty[Long], "ghost"),
      (1L, Some(4L), "real")).toDF("k", "t", "v")
    val got = AsOfJoin.asofJoin(left, right, "k", "t", Seq("v"))
      .collect().map(r => (r.getString(2), Option(r.getString(3)))).toMap
    assert(got("p1") === Some("real"), "t=5 must match the real t=4 row")
    assert(got("p2") === None,
      "t=2 precedes every real right row — the NULL-time ghost must not match")
    // and a NULL LEFT time gets a NULL payload, not the ghost
    val left2 = Seq((1L, Option.empty[Long], "pn")).toDF("k", "t", "pl")
    val got2 = AsOfJoin.asofJoin(left2, right, "k", "t", Seq("v")).collect()
    assert(got2.length === 1 && got2.head.isNullAt(3))
  }

  test("asofJoin: purchases before any click get NULLs; inclusive tie matches") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 101L, 20L), (2L, 200L, 5L))
      .toDF("user_id", "event_id", "t_us")
    val right = Seq((1L, 10L, 900L, 1.5), (1L, 15L, 901L, 2.5))
      .toDF("user_id", "t_us", "click_id", "click_value")
    val out = AsOfJoin.asofJoin(left, right, "user_id", "t_us", Seq("click_id", "click_value"))
      .collect().map(r => r.getLong(1) -> Option(r.get(3))).toMap
    assert(out(100L) === Some(900L)) // t=10 matches the click AT t=10 (inclusive)
    assert(out(101L) === Some(901L)) // t=20 matches latest prior (t=15)
    assert(out(200L) === None)       // user 2 has no clicks
  }
}
