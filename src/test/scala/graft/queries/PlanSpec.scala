package graft.queries

import graft.SparkSpec

/** Physical-plan assertions (SURVEY §4: "assert via
  * df.queryExecution.executedPlan in tests"): pushdown, pruning, broadcast,
  * and top-k strategy must survive refactors. */
class PlanSpec extends SparkSpec {

  private def executedPlan(name: String): String = {
    val df = Catalog.byName(name).run(spark, sfDir)
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan.toString
  }

  test("q01: shipdate filter pushed to the parquet scan; unused columns pruned") {
    val plan = Catalog.byName("q01_pricing_summary").run(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the filter must reach the scan THROUGH the row-group spread's
    // repartition (Tables.tableSpread) — a filter stuck above the
    // exchange would shuffle the unfiltered table
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushdown in:\n$plan")
    // l_orderkey is the spread's hash key (read on purpose when the
    // one-row-group layout starves the cores); l_comment must stay pruned
    assert(!plan.contains("l_comment"), "unpruned column in scan")
  }

  test("q17: top-k is TakeOrderedAndProject; no forced broadcast of SF-growing customer") {
    val df = Catalog.byName("q17_revenue_top").run(spark, sfDir)
    // strategy must come from AQE/stats, not a hint that OOMs at 100×
    assert(!df.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "q17 carries a broadcast hint on an SF-growing table")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k operator in:\n$plan")
    // at this (small) SF, AQE should still pick broadcast from stats
    assert(plan.contains("BroadcastHashJoin"), s"AQE chose no broadcast join at test SF:\n$plan")
  }

  test("q35: only fixed-size nation is hinted; part/supplier left to AQE") {
    val analyzed = Catalog.byName("q35_part_supplier").run(spark, sfDir)
      .queryExecution.analyzed.toString
    val hints = "ResolvedHint".r.findAllIn(analyzed).size
    assert(hints == 1, s"expected exactly 1 hint (nation), got $hints:\n$analyzed")
  }

  test("q04: aggregation is partial+final (map-side combine before shuffle)") {
    val plan = executedPlan("q04_cust_order_stats")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"no partial aggregation in:\n$plan")
  }

  test("q13/q14: semi/anti joins use the dedicated join types") {
    assert(executedPlan("q13_semi_join").contains("LeftSemi"))
    assert(executedPlan("q14_anti_join").contains("LeftAnti"))
  }

  test("q45/q47/q48/q49: sampling, repetition, chunking, scrubbing are map-side (zero shuffle)") {
    // hash-gated sampling is a scan-level filter; repetition/chunking
    // stay inside the row (transform/slice/explode, no groupBy); the
    // regex scrub is a projection: at 100 TB none of them moves a single
    // byte between executors
    Seq("q45_stratified_sample", "q47_repetition",
      "q48_chunking", "q49_pii_scrub").foreach { q =>
      val plan = executedPlan(q)
      assert(!plan.contains("Exchange"), s"$q shuffles:\n$plan")
    }
  }

  test("q46: pipeline composition joins without cartesian/nested-loop plans") {
    val plan = executedPlan("q46_pretraining_mix")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q46 fell back to a quadratic join:\n$plan")
  }

  test("q51/q53: document scans pruned to (doc_id, text); joins never quadratic") {
    // suites share the session: a cached documents table from another
    // spec would hide the FileScan this test inspects
    spark.catalog.clearCache()
    Seq("q51_decontamination", "q53_distinctive_terms").foreach { q =>
      val plan = executedPlan(q)
      // documents carries (lang, source, n_chars) these queries never
      // touch — at 100 TB unpruned text-table columns are the whole bill
      assert(!plan.contains("lang:string") && !plan.contains("n_chars"),
        s"$q scan reads unused columns:\n$plan")
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$q fell back to a quadratic join:\n$plan")
    }
  }

  test("q52/q56: clustering and the composed pipeline never go quadratic") {
    Seq("q52_dedup_clusters", "q56_corpus_pipeline").foreach { q =>
      val plan = executedPlan(q)
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$q fell back to a quadratic join:\n$plan")
    }
  }

  test("q59: both grains are served from the persisted distinct-pairs relation") {
    spark.catalog.clearCache()
    // the plan TEXT repeats the cached relation's build subtree per
    // reference; the property to pin is that every consumer reads the
    // cache (InMemoryTableScan), i.e. the fact scan materializes once
    val plan = executedPlan("q59_sketch_rollup")
    val cacheReads = "InMemoryTableScan".r.findAllIn(plan).size
    assert(cacheReads >= 2, s"grains bypass the persisted pairs relation:\n$plan")
  }

  test("q60: rolling spend is a customer-partitioned RANGE-frame window") {
    val plan = executedPlan("q60_rolling_window")
    assert(plan.contains("windowspecdefinition(o_custkey"), s"window not keyed:\n$plan")
    assert(plan.contains("specifiedwindowframe(RangeFrame"), s"not a RANGE frame:\n$plan")
  }

  test("q54: dedup applies as a LeftAnti join, no quadratic fallback") {
    val plan = executedPlan("q54_dedup_apply")
    assert(plan.contains("LeftAnti"), s"no anti join in:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q54 fell back to a quadratic join:\n$plan")
  }

  test("q64: the sketch aggregates partially map-side (ObjectHashAggregate)") {
    // a TypedImperativeAggregate without partial combine would ship every
    // bigram occurrence to one reducer — the exact thing the sketch exists
    // to avoid
    val plan = executedPlan("q64_heavy_hitters")
    assert(plan.contains("ObjectHashAggregate"), s"no object agg in:\n$plan")
    assert(plan.contains("partial_freq_items"), s"no map-side partial in:\n$plan")
  }

  test("q65: cross-corpus join is band-bucketed, never quadratic") {
    val plan = executedPlan("q65_fuzzy_join")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q65 fell back to a quadratic join:\n$plan")
  }

  test("q68: bloom gates sit in the fact scans' stages, below every join") {
    val plan = executedPlan("q68_runtime_filtered")
    val gates = "bloom_contains".r.findAllIn(plan).size
    assert(gates >= 2, s"expected cascaded bloom gates, found $gates:\n$plan")
    val lastJoin = Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
      .map(plan.lastIndexOf).max
    assert(plan.lastIndexOf("bloom_contains") > lastJoin,
      s"bloom gate not below the joins:\n$plan")
  }

  test("q69: rank comes from range partition + per-partition window, not a global sort") {
    // the regression to guard: ntile/row_number over an empty window spec
    // = every row through ONE partition. The GlobalIndex shape leaves
    // range partitioning + a __pid-keyed window + broadcast offsets in
    // the plan; a global-sort rewrite has none of them.
    val plan = executedPlan("q69_curriculum_bins")
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"),
      s"no range partitioning in:\n$plan")
    assert(plan.contains("windowspecdefinition(__pid"),
      s"window not keyed by partition id:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"offsets join not broadcast:\n$plan")
  }

  test("q75: the token-budget cumsum window is keyed by source, not global") {
    val plan = executedPlan("q75_token_budget_mix")
    assert(plan.contains("windowspecdefinition(source"),
      s"window not partitioned by source:\n$plan")
  }

  test("q82/q83: journey analytics stay user-keyed — no global window, no quadratic join") {
    val funnel = executedPlan("q82_funnel")
    assert(!funnel.contains("CartesianProduct") && !funnel.contains("BroadcastNestedLoopJoin"),
      s"q82 fell back to a quadratic join:\n$funnel")
    val trans = executedPlan("q83_transitions")
    assert(trans.contains("windowspecdefinition(user_id"),
      s"q83 window not keyed by user:\n$trans")
  }

  test("q86: join runs on (key, __salt); the skewed big side is never the broadcast build") {
    val df = Catalog.byName("q86_skew_join").run(spark, sfDir)
    df.collect() // materialize so AQE finalizes the plan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(root.toString.contains("__salt"),
      s"join not salted — __salt missing from:\n$root")
    // a broadcast of the replicated SMALL side is the intended shape; a
    // broadcast build of the fact side would OOM at 100 TB
    root.collect { case b: BroadcastExchangeLike => b }.foreach { b =>
      assert(!b.toString.contains("lineitem"),
        s"big side under a BroadcastExchange:\n$b")
    }
  }

  test("q66: the components relation joins broadcast-side; split gate is arithmetic") {
    val plan = executedPlan("q66_leakfree_split")
    assert(plan.contains("BroadcastHashJoin"), s"components join not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q66 fell back to a quadratic join:\n$plan")
  }
}
