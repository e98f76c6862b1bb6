package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge => CB}

import graft.SparkSpec

class FreqItemsSpec extends SparkSpec {

  import spark.implicits._

  private def sketch(df: DataFrame, capacity: Int): Seq[(String, Long)] =
    df.agg(CB.column(FreqItemsSketch(CB.expression(col("s")), capacity)
        .toAggregateExpression()).as("f"))
      .select(explode(col("f")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Deterministic skewed stream: item i appears with Zipf-ish frequency. */
  private def zipfish(n: Int): Seq[String] =
    (0 until n).map { i =>
      val h = math.floorMod(scala.util.hashing.MurmurHash3.productHash((i, "mg")), 1000)
      // ~50% item0, ~25% item1, ... tail spread over 40 rare items
      if (h < 500) "item0"
      else if (h < 750) "item1"
      else if (h < 875) "item2"
      else if (h < 940) "item3"
      else s"rare${h % 40}"
    }

  test("capacity >= distinct: counts exact across partitions (merge path)") {
    val data = zipfish(20000)
    val got = sketch(data.toDF("s").repartition(8), capacity = 100).toMap
    val want = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got === want)
  }

  test("under-capacity regime: MG bound holds, heavy hitters survive") {
    val data = zipfish(20000)
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = data.size.toLong
    val k = 8
    val got = sketch(data.toDF("s").repartition(8), capacity = k).toMap
    assert(got.size <= k)
    got.foreach { case (item, cnt) =>
      val t = truth.getOrElse(item, 0L)
      assert(cnt <= t, s"$item overestimated: $cnt > $t")
      assert(cnt >= t - n / (k + 1), s"$item undershot the MG bound: $cnt vs $t")
    }
    // every item with true frequency > N/(k+1) must be present
    truth.filter(_._2 > n / (k + 1)).keys.foreach { hh =>
      assert(got.contains(hh), s"heavy hitter $hh evicted")
    }
  }

  test("eval order is (cnt desc, item asc) and SQL registration works") {
    Seq("b", "a", "b", "c", "c", "c").toDF("s").createOrReplaceTempView("fi_in")
    val rows = spark.sql(
      "SELECT inline(freq_items(s, 10)) FROM fi_in")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("c", 3L), ("b", 2L), ("a", 1L)))
  }

  test("nulls are skipped; empty input yields an empty summary") {
    val rows = Seq(Some("x"), None, Some("x")).toDF("s")
    assert(sketch(rows, 4) === Seq(("x", 2L)))
    assert(sketch(Seq.empty[String].toDF("s"), 4) === Seq.empty)
  }
}
