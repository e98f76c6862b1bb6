package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge => CB}

import graft.SparkSpec
import graft.Tables.table
import graft.operators.Decontaminate

class BloomFilterSpec extends SparkSpec {

  import spark.implicits._

  private def buildBloom(keys: Seq[String], numBits: Int, numHashes: Int): Array[Long] =
    keys.toDF("s")
      .agg(CB.column(
        BloomFilterAgg(CB.expression(xxhash64(col("s"))), numBits, numHashes)
          .toAggregateExpression()).as("b"))
      .head().getSeq[Long](0).toArray

  private def hits(arr: Seq[String], bloom: Array[Long], numHashes: Int): Int =
    Seq(Tuple1(arr)).toDF("a")
      .select(CB.column(BloomHits(CB.expression(col("a")), bloom, numHashes)).as("h"))
      .head().getInt(0)

  test("bloom has no false negatives: every inserted key probes positive") {
    // the property bloomOverlaps' exactness rests on — build distributed
    // (map-side partial buffers OR-merged), probe through the codegen path
    val keys = (0 until 2000).map(i => s"key number $i with some text")
    val bloom = buildBloom(keys, numBits = 1 << 14, numHashes = 4)
    assert(hits(keys, bloom, 4) === keys.length)
  }

  test("bloom false-positive rate is near theory, not saturated") {
    val keys = (0 until 1000).map(i => s"inserted $i")
    val bloom = buildBloom(keys, numBits = 1 << 14, numHashes = 4)
    val probes = (0 until 5000).map(i => s"absent $i")
    val fp = hits(probes, bloom, 4)
    // n=1000, m=16384, k=4 → fp ≈ (1 - e^(-kn/m))^4 ≈ 0.24% ; allow 5×
    assert(fp < 5000 * 0.012, s"false-positive rate too high: $fp/5000")
  }

  test("bloom_agg is SQL-registered and matches the Column-API build") {
    val keys = (0 until 100).map(i => s"sqlkey $i")
    keys.toDF("s").createOrReplaceTempView("bloom_in")
    val viaSql = spark.sql(
      "SELECT bloom_agg(xxhash64(s), 1024, 3) AS b FROM bloom_in")
      .head().getSeq[Long](0).toArray
    assert(viaSql.toSeq === buildBloom(keys, 1024, 3).toSeq)
  }

  test("null array -> null; null elements and empty arrays count as misses") {
    val bloom = buildBloom(Seq("present"), 64, 2)
    val rows = Seq(Tuple1(Seq("present", "absent xyz"))).toDF("a")
      .select(CB.column(BloomHits(CB.expression(col("a")), bloom, 2)).as("h"))
    assert(rows.head().getInt(0) === 1)
    val withNulls = spark.sql("SELECT CAST(NULL AS ARRAY<STRING>) AS a")
      .union(spark.sql("SELECT array(CAST(NULL AS STRING)) AS a"))
      .select(CB.column(BloomHits(CB.expression(col("a")), bloom, 2)).as("h"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(withNulls.toSeq === Seq(None, Some(0)))
  }

  // --- bloom-gated decontamination -------------------------------------------

  lazy val docs = table(spark, sfDir, "documents").cache()
  private def evalSide = docs.filter(col("doc_id") % 10 === 7)
  private def trainSide = docs.filter(col("doc_id") % 10 =!= 7)

  test("bloomOverlaps == overlaps on the corpus (q63 == q51)") {
    val want = Decontaminate.overlaps(trainSide, evalSide, minOverlap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Decontaminate.bloomOverlaps(trainSide, evalSide, minOverlap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "corpus must contain cross-split contamination")
    assert(got === want)
  }

  test("bloomOverlaps stays exact under heavy false positives (tiny filter)") {
    // a 64-bit filter over the whole eval shingle set saturates — the gate
    // passes nearly everything, and the exact verify must still equal the
    // ungated operator (false positives only widen the candidate set)
    val want = Decontaminate.overlaps(trainSide, evalSide, minOverlap = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Decontaminate.bloomOverlaps(
      trainSide, evalSide, minOverlap = 5, numBits = 64, numHashes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("bloom gate is a scan-level filter ahead of any join") {
    val df = Decontaminate.bloomOverlaps(trainSide, evalSide, minOverlap = 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_hits"), plan.take(3000))
    // the gate must sit strictly below (after, in top-down print) every
    // join: the train-side scan is filtered before anything shuffles
    val gateAt = plan.indexOf("bloom_hits")
    val lastJoin = Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
      .map(plan.lastIndexOf).max
    assert(lastJoin >= 0 && gateAt > lastJoin,
      s"bloom gate not below the joins (gate@$gateAt lastJoin@$lastJoin)")
  }

  test("bloomOverlaps on an empty eval set is empty") {
    val got = Decontaminate.bloomOverlaps(
      trainSide, evalSide.filter(lit(false)), minOverlap = 1)
    assert(got.count() === 0L)
  }

  // --- runtime-filter semi-join reduction ------------------------------------

  test("bloomSemiReduce keeps every matching row and actually prunes") {
    import graft.operators.RuntimeFilter
    val orders = table(spark, sfDir, "orders")
    val lineitem = table(spark, sfDir, "lineitem")
    val dim = orders.filter(col("o_orderkey") % 50 === 0)
    val reduced = RuntimeFilter.bloomSemiReduce(
      lineitem, col("l_orderkey"), dim, col("o_orderkey"))
    // no false negatives: the reduced join equals the unreduced join
    val want = lineitem.join(dim, lineitem("l_orderkey") === dim("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber")).collect().toSet
    val got = reduced.join(dim, reduced("l_orderkey") === dim("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber")).collect().toSet
    assert(want.nonEmpty && got === want)
    // and the gate genuinely prunes the fact side (~2% survives + fp)
    val full = lineitem.count()
    val kept = reduced.count()
    assert(kept < full / 10, s"gate barely pruned: $kept of $full")
  }

  test("q68 (runtime-filtered) == q17 row-for-row; empty dim rejects all") {
    import graft.operators.RuntimeFilter
    val a = graft.queries.Catalog.byName("q17_revenue_top").run(spark, sfDir).collect().toSeq
    val b = graft.queries.Catalog.byName("q68_runtime_filtered").run(spark, sfDir).collect().toSeq
    assert(a.nonEmpty && a === b)
    val none = RuntimeFilter.bloomSemiReduce(
      table(spark, sfDir, "lineitem"), col("l_orderkey"),
      table(spark, sfDir, "orders").filter(lit(false)), col("o_orderkey"))
    assert(none.count() === 0L)
  }
}
