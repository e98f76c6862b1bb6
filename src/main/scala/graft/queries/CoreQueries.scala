package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Num._
import graft.Tables.table

/** Relational operator inventory (SURVEY.md §2.3–§2.6) re-expressed over the
  * driver testdata. Each query maps one or more reference operators
  * (cited `/root/reference/file:line`) onto idiomatic Spark, designed so the
  * physical plan scales: filters/projections reach the parquet scan, small
  * dimensions broadcast, aggregates run partial+final, and all float
  * aggregates use the engine-portable decimal patterns in [[graft.Num]].
  */
object CoreQueries {

  /** A1 hash aggregate (ref `airflow/config/read_delta.py:114-127`) as a
    * TPC-H-Q1-shaped pricing summary: group-by two low-cardinality keys,
    * partial aggregation map-side, one shuffle on the group keys. */
  val q01PricingSummary: Q = Q(
    "q01_pricing_summary",
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM((CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
             CAST(COUNT(*) AS BIGINT) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus"""),
    headline = true) { (spark, dir) =>
    // Row-group-aware spread (guide §2.5): the 11 decimal aggregates fuse
    // into the scan stage, and a one-row-group file would run them all on
    // one core — redistribute by the natural key when the layout is
    // starved (identity on well-laid-out tables). Decimal sums are exact
    // and associative, so the result is partitioning-independent.
    val l = graft.Tables.tableSpread(spark, dir, "lineitem", col("l_orderkey"))
    // Decimal math on the RAW 2-dec columns only: double→decimal casts of
    // *computed* products can round differently across engines (true values
    // land on midpoints); raw scale-2 inputs cast exactly, and decimal
    // multiplication/summation is then exact in both engines.
    val eD = col("l_extendedprice").cast(DecimalType(18, 2))
    val dD = col("l_discount").cast(DecimalType(4, 2))
    val tD = col("l_tax").cast(DecimalType(4, 2))
    val disc = eD * (lit(1) - dD)
    val charge = disc * (lit(1) + tD)
    l.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(disc).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** A2 group-by + top-k (ref `spark/SaveDelta.scala:233-242`): sort+limit →
    * TakeOrderedAndProject (no full sort at scale). Count ties broken by the
    * group key so the LIMIT edge is deterministic across engines. */
  val q02TopkSource: Q = Q(
    "q02_topk_source",
    Some("""
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents
      GROUP BY source
      ORDER BY n_docs DESC, source
      LIMIT 5""")) { (spark, dir) =>
    table(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("source"))
      .limit(5)
  }

  /** P2/P3/F1 CDC-style JSON envelope decode + invalid-row filter (ref
    * `spark/SaveDelta.scala:138-149`). One `from_json` parse (the reference
    * re-parses per field with 7× get_json_object) then a null-id drop. */
  val q03JsonDecode: Q = Q(
    "q03_json_decode",
    Some("""
      SELECT event_id, event_type,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
      FROM events
      WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50""")) { (spark, dir) =>
    table(spark, dir, "events")
      .select(
        col("event_id"), col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("prop_k"))
      .filter(col("prop_k") >= 50)
  }

  /** q03's decode through Spark 4's native VARIANT type (q104):
    * `parse_json` once into a variant column, then typed path
    * extraction with `variant_get` / `try_variant_get` — the
    * semi-structured path a modern lakehouse takes when the payload
    * schema is open-ended (every Debezium envelope field the reference
    * pulls with 7× get_json_object becomes one parse + cheap typed
    * gets). `try_variant_get` of an absent path is NULL, not an error —
    * pinned by the n_missing count staying zero. Oracle = DuckDB's
    * JSON extraction over the same rows. */
  val q104VariantJson: Q = Q(
    "q104_variant_json",
    Some("""
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
               AS BIGINT) AS sum_k,
             CAST(COUNT(CAST(json_extract_string(props, '$.missing')
               AS INTEGER)) AS BIGINT) AS n_missing
      FROM events
      GROUP BY event_type""")) { (spark, dir) =>
    table(spark, dir, "events")
      .select(col("event_type"), parse_json(col("props")).as("v"))
      .select(col("event_type"),
        variant_get(col("v"), "$.k", "int").as("k"),
        try_variant_get(col("v"), "$.missing", "int").as("missing"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).cast("long").as("sum_k"),
        count(col("missing")).as("n_missing"))
  }

  /** A1+J2: pre-aggregate the big (fact) side to one row per key *before*
    * the join (ref `read_delta.py:270,285`), then LEFT join so key-less
    * customers keep NULL stats (ref left-join null semantics §1.2). */
  val q04CustOrderStats: Q = Q(
    "q04_cust_order_stats",
    Some("""
      SELECT c.c_custkey, c.c_name, o.count_orders, o.sum_spent
      FROM customer c
      LEFT JOIN (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS count_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_spent
        FROM orders GROUP BY o_custkey
      ) o ON c.c_custkey = o.o_custkey"""),
    headline = true) { (spark, dir) =>
    val c = table(spark, dir, "customer")
    // NO spread (round-20 ABA re-measure of the r19 watch list): the
    // r19 keep replaced the agg's exchange with a pre-agg repartition
    // on the group key; two drift-bracketed boards read 0.437 vs 0.539
    // then 0.561 vs 0.434 — a wash, so the site reverts per the
    // ">=5% or revert" rule (q65/q68 re-confirmed their keeps in the
    // same windows)
    val agg = graft.Tables.table(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("count_orders"), dsum(col("o_totalprice")).as("sum_spent"))
    c.join(agg, c("c_custkey") === agg("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("count_orders"), col("sum_spent"))
  }

  /** J1 inner equi-joins through two broadcast dimensions + ROLLUP subtotal
    * aggregation (extension beyond the reference's flat group-by). */
  val q05RegionRollup: Q = Q(
    "q05_region_rollup",
    Some("""
      SELECT r.r_name, n.n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
             CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY ROLLUP(r.r_name, n.n_name)""")) { (spark, dir) =>
    val c = table(spark, dir, "customer")
    val n = broadcast(table(spark, dir, "nation"))
    val r = broadcast(table(spark, dir, "region"))
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_acctbal"))
  }

  /** J3/F4-F7 flagship "prime" benefit report (ref `README.md:141-164`)
    * re-keyed to customer/orders: CASE prime, >=15-activity rule with
    * NULL→false, total = base + prime. Single-pass withColumn — the
    * reference's self-join CTE is unnecessary (SURVEY §2.4 J3). */
  val q06BenefitReport: Q = Q(
    "q06_benefit_report",
    Some("""
      WITH stats AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS count_orders
        FROM orders GROUP BY o_custkey
      )
      SELECT c.c_custkey, c.c_name, c.c_mktsegment, c.c_acctbal,
             CASE WHEN c.c_acctbal > 0
                  THEN CAST(ROUND(CAST(c.c_acctbal AS DECIMAL(18,2)) * CAST(0.04 AS DECIMAL(3,2)), 2) AS DOUBLE)
                  ELSE CAST(0 AS DOUBLE) END AS prime,
             CASE WHEN s.count_orders >= 15 THEN TRUE ELSE FALSE END AS is_active,
             c.c_acctbal + (CASE WHEN c.c_acctbal > 0
                  THEN CAST(ROUND(CAST(c.c_acctbal AS DECIMAL(18,2)) * CAST(0.04 AS DECIMAL(3,2)), 2) AS DOUBLE)
                  ELSE CAST(0 AS DOUBLE) END) AS total_balance
      FROM customer c
      LEFT JOIN stats s ON c.c_custkey = s.o_custkey""")) { (spark, dir) =>
    val c = table(spark, dir, "customer")
    val stats = orderStats(spark, dir)
    val prime = primeDec.cast("double")
    c.join(stats, c("c_custkey") === stats("o_custkey"), "left")
      .select(
        col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"),
        prime.as("prime"),
        when(col("count_orders") >= 15, lit(true)).otherwise(lit(false)).as("is_active"),
        (col("c_acctbal") + prime).as("total_balance"))
  }

  /** Per-customer order counts — the pre-aggregate q06's report and
    * q72's tile rollup both ride; one definition keeps the rollup
    * consistent with the per-row report it summarizes. */
  private def orderStats(spark: org.apache.spark.sql.SparkSession,
                         dir: String): DataFrame =
    table(spark, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("count_orders"))

  /** The prime-benefit DECIMAL expression shared by q06 and q72. Rate
    * 0.04 (not the reference's 0.05): cents*4 never ends in ...50, so
    * the ROUND-to-cents never hits a half-up(Spark)/half-even(DuckDB)
    * midpoint — the CASE/ROUND operator semantics are what's under
    * test. */
  private def primeDec: org.apache.spark.sql.Column =
    when(col("c_acctbal") > 0,
      (col("c_acctbal").cast(DecimalType(18, 2)) * lit(BigDecimal("0.04")))
        .cast(DecimalType(18, 2)))
      .otherwise(lit(BigDecimal(0)).cast(DecimalType(18, 2)))

  /** P5 column-level masking projection (ref `init-scripts/init-db.sql:74-89`)
    * — data-driven condition stands in for `current_user`. */
  val q07Masking: Q = Q(
    "q07_masking",
    Some("""
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_name END AS c_name_masked,
             c_mktsegment
      FROM customer""")) { (spark, dir) =>
    table(spark, dir, "customer").select(
      col("c_custkey"),
      when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_name")).as("c_name_masked"),
      col("c_mktsegment"))
  }

  /** P7/P8/F8/F11 commute-validity predicate + formatted error message (ref
    * `commute_validation/commute_validation.py:84-112`): per-mode limit via a
    * CASE map, `is_valid = value <= limit`, string-interpolated reason. */
  val q08Validity: Q = Q(
    "q08_validity",
    Some("""
      SELECT l_orderkey, l_linenumber, l_returnflag,
             CASE WHEN l_quantity <= (CASE WHEN l_returnflag = 'R' THEN 25 ELSE 15 END)
                  THEN TRUE ELSE FALSE END AS is_valid,
             CASE WHEN l_quantity <= (CASE WHEN l_returnflag = 'R' THEN 25 ELSE 15 END)
                  THEN NULL
                  ELSE 'Quantity (' || CAST(CAST(FLOOR(l_quantity) AS INTEGER) AS VARCHAR)
                       || ') > limit ('
                       || CAST(CASE WHEN l_returnflag = 'R' THEN 25 ELSE 15 END AS VARCHAR) || ')'
                  END AS error_message
      FROM lineitem"""))  { (spark, dir) =>
    val limit = when(col("l_returnflag") === "R", lit(25)).otherwise(lit(15))
    val valid = col("l_quantity") <= limit
    table(spark, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
      when(valid, lit(true)).otherwise(lit(false)).as("is_valid"),
      when(valid, lit(null)).otherwise(
        concat(lit("Quantity ("),
          floor(col("l_quantity")).cast("int").cast("string"),
          lit(") > limit ("), limit.cast("string"), lit(")"))).as("error_message"))
  }

  /** §2.9 data-quality gate (ref `airflow/dags/data_validation_dag.py:306-320`)
    * as one single-row aggregate: null counts + range violations. */
  val q09QualityChecks: Q = Q(
    "q09_quality_checks",
    Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_shipdate,
             CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_returnflag,
             CAST(SUM(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_quantity,
             CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_price
      FROM lineitem""")) { (spark, dir) =>
    table(spark, dir, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("l_shipdate").isNull, 1).otherwise(0)).as("null_shipdate"),
      sum(when(col("l_returnflag").isNull, 1).otherwise(0)).as("null_returnflag"),
      sum(when(col("l_quantity") < 0, 1).otherwise(0)).as("neg_quantity"),
      sum(when(col("l_extendedprice") < 0, 1).otherwise(0)).as("neg_price"))
  }

  /** §2.6 extension: ranking window — top-3 orders per customer by price,
    * ties broken by orderkey so the rank edge is deterministic. */
  val q10TopkPerGroup: Q = Q(
    "q10_topk_per_group",
    Some("""
      SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
             o_totalprice, CAST(rnk AS INTEGER) AS rnk
      FROM (
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders)
      WHERE rnk <= 3"""),
    headline = true) { (spark, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    table(spark, dir, "orders")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_totalprice"), col("rnk"))
  }

  /** §2.5 extension: distinct aggregate (exact COUNT DISTINCT → expand +
    * two-phase aggregate in Spark). */
  val q11DistinctAgg: Q = Q(
    "q11_distinct_agg",
    Some("""
      SELECT l_returnflag,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY l_returnflag""")) { (spark, dir) =>
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
  }

  /** §2.6 set operations (UNION dedup / EXCEPT): big-spender ∪ BUILDING
    * customers minus negative balances. */
  val q12SetOps: Q = Q(
    "q12_set_ops",
    Some("""
      SELECT custkey FROM (
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
      )
      EXCEPT
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0""")) { (spark, dir) =>
    val c = table(spark, dir, "customer")
    val o = table(spark, dir, "orders")
    val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("custkey"))
    val big = o.filter(col("o_totalprice") > 200000).select(col("o_custkey").as("custkey"))
    val neg = c.filter(col("c_acctbal") < 0).select(col("c_custkey").as("custkey"))
    building.union(big).distinct().except(neg)
  }

  /** Left-semi join (EXISTS): customers having a >300k order. */
  val q13SemiJoin: Q = Q(
    "q13_semi_join",
    Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""")) { (spark, dir) =>
    val c = table(spark, dir, "customer")
    val o = table(spark, dir, "orders").filter(col("o_totalprice") > 300000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  /** Left-anti join (NOT EXISTS) — the FK-integrity pattern from SURVEY §2.4:
    * customers with no order above 400k (every customer has *some* order in
    * this data, so the unfiltered anti-join would be trivially empty). */
  val q14AntiJoin: Q = Q(
    "q14_anti_join",
    Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""")) { (spark, dir) =>
    val c = table(spark, dir, "customer")
    val o = table(spark, dir, "orders").filter(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  /** §2.8 batch form of the streaming tumbling-window aggregate: events per
    * (hour, type) with deterministic avg. Hour emitted as epoch seconds so
    * both engines hash identically regardless of timestamp physical type. */
  val q15HourlyEvents: Q = Q(
    "q15_hourly_events",
    Some("""
      SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600 AS hour_epoch,
             event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS avg_value
      FROM events
      GROUP BY 1, 2"""),
    headline = true) { (spark, dir) =>
    table(spark, dir, "events")
      .groupBy(
        (expr("ts div 3600000000000") * 3600).as("hour_epoch"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"),
        davg(col("value")).as("avg_value"))
  }

  /** Sessionization via LAG window (extension §2.6/§2.8): new session when
    * >30 min gap; per-user session/event counts. Second-granularity epochs
    * (floor) keep both engines identical. */
  val q16Sessionize: Q = Q(
    "q16_sessionize",
    Some("""
      WITH x AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec
        FROM events
      ), y AS (
        SELECT user_id,
               CASE WHEN lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) IS NULL
                         OR sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) > 1800
                    THEN 1 ELSE 0 END AS new_sess
        FROM x
      )
      SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM y GROUP BY user_id"""),
    headline = true) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    table(spark, dir, "events")
      .select(col("user_id"), col("event_id"), expr("ts div 1000000000").as("sec"))
      .withColumn("prev", lag(col("sec"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull || col("sec") - col("prev") > 1800, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** TPC-H-Q3-shaped headline join: filter → 3-way join → hash aggregate →
    * top-10. Revenue summed in decimal for cross-engine determinism. */
  val q17RevenueTop: Q = Q(
    "q17_revenue_top",
    Some("""
      SELECT l.l_orderkey,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
             strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
      GROUP BY l.l_orderkey, o.o_orderdate
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10"""),
    headline = true) { (spark, dir) =>
    val c = table(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = table(spark, dir, "orders")
    // Spread the FACT side (guide §2.5): the broadcast join + decimal agg
    // fuse into lineitem's scan stage, and a one-row-group layout runs
    // them on one core; identity on well-laid-out tables.
    val l = graft.Tables.tableSpread(spark, dir, "lineitem", col("l_orderkey"))
    // No broadcast hint on customer: it grows with SF (forced broadcast =
    // OOM at 100×). AQE picks broadcast from runtime stats when the
    // filtered side is actually small.
    revenueTop10(c, o, l)
  }

  /** The q17/q68 shared pipeline — the two queries are row-identical BY
    * CONSTRUCTION (q68 wraps the inputs in Bloom gates, which have no
    * false negatives) and share one oracle; one body keeps an edit to
    * either from silently breaking that invariant. */
  private def revenueTop10(c: DataFrame, o: DataFrame,
                           l: DataFrame): DataFrame = {
    val disc = col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1) - col("l_discount").cast(DecimalType(4, 2)))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(disc).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
  }

  /** q17 with CASCADED runtime-filter semi-join reduction (q68): a Bloom
    * filter over the BUILDING customers' keys gates the orders scan, and
    * a second Bloom over the surviving orderkeys gates the lineitem scan
    * — fact rows that cannot match never enter either join's shuffle
    * (the classic TPC-H Q3 reduction; at 100 TB the lineitem exchange
    * shrinks by the segment's selectivity). Row-identical to q17 by the
    * no-false-negative property — the two queries share one oracle. */
  val q68RuntimeFiltered: Q = Q(
    "q68_runtime_filtered",
    q17RevenueTop.oracle,
    headline = true) { (spark, dir) =>
    import graft.operators.RuntimeFilter
    val c = table(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val custBloom = RuntimeFilter.forKeys(c, col("c_custkey"))
    val o = table(spark, dir, "orders")
      .filter(custBloom.gate(col("o_custkey")))
    val orderBloom = RuntimeFilter.forKeys(o, col("o_orderkey"))
    // Spread before the gate (guide §2.5, same rationale as q17): the
    // deterministic Bloom predicate pushes through the repartition to the
    // scan, so gated rows — not the whole table — cross the exchange.
    // Round-20 ABA re-confirm (r19 watch list): spread 0.763/0.901 vs
    // plain 1.166/0.983 in two drift-bracketed boards — keep holds.
    val l = graft.Tables.tableSpread(spark, dir, "lineitem", col("l_orderkey"))
      .filter(orderBloom.gate(col("l_orderkey")))
    revenueTop10(c, o, l)
  }

  /** Cohort retention (q70): users grouped by first-seen day, activity
    * bucketed by days-since-cohort — the classic retention triangle. Two
    * shuffles: the per-user min-day aggregate (whose user_id partitioning
    * the join then reuses) and the (cohort, offset) cell aggregate.
    * Day arithmetic stays in integer nanos-epoch space on both engines —
    * no timezone/rounding hazards. */
  val q70CohortRetention: Q = Q(
    "q70_cohort_retention",
    Some("""
      WITH e AS (SELECT user_id,
                        epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
                 FROM events),
      f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY 1)
      SELECT f.cohort_day, e.day - f.cohort_day AS days_since,
             CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM e JOIN f ON e.user_id = f.user_id
      GROUP BY 1, 2"""),
    headline = false) { (spark, dir) =>
    // e feeds the cohort min-aggregate AND the join's left side — two
    // consumers with different exchanges ReuseExchange can't collapse;
    // persisted, the events scan + projection runs once
    val e = table(spark, dir, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val f = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    e.join(f, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("days_since"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
  }

  /** Dashboard tiles (q72): the reference's Superset charts (slices 1-5,
    * `superset/superset_data/superset.db` — total salary with prime,
    * current salary, annual prime, share of valid/active members) as ONE
    * single-row rollup over the q06 relation. All money sums run in
    * DECIMAL and cast to double only at the edge (the q15 dsum pattern),
    * so the tiles are bit-identical cross-engine; the distribution tiles
    * (pie by validity, treemap by type) are q08/q02. One pass: the
    * orders pre-aggregate plus one customer scan. */
  val q72DashboardTiles: Q = Q(
    "q72_dashboard_tiles",
    Some("""
      WITH stats AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS count_orders
        FROM orders GROUP BY o_custkey
      ),
      b AS (
        SELECT c.c_acctbal,
               CASE WHEN c.c_acctbal > 0
                    THEN ROUND(CAST(c.c_acctbal AS DECIMAL(18,2)) * CAST(0.04 AS DECIMAL(3,2)), 2)
                    ELSE CAST(0 AS DECIMAL(18,2)) END AS prime_dec,
               CASE WHEN s.count_orders >= 15 THEN 1 ELSE 0 END AS active
        FROM customer c
        LEFT JOIN stats s ON c.c_custkey = s.o_custkey)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(active) AS BIGINT) AS n_active,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_balance,
             CAST(SUM(prime_dec) AS DOUBLE) AS sum_prime,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) + SUM(prime_dec) AS DOUBLE) AS sum_total
      FROM b""")) { (spark, dir) =>
    val c = table(spark, dir, "customer")
    val stats = orderStats(spark, dir)
    c.join(stats, c("c_custkey") === stats("o_custkey"), "left")
      .select(col("c_acctbal"), primeDec.as("prime_dec"),
        when(col("count_orders") >= 15, 1).otherwise(0).as("active"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("active")).cast("long").as("n_active"),
        sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double").as("sum_balance"),
        sum(col("prime_dec")).cast("double").as("sum_prime"),
        (sum(col("c_acctbal").cast(DecimalType(18, 2))) + sum(col("prime_dec")))
          .cast("double").as("sum_total"))
  }

  val all: Seq[Q] = Seq(
    q01PricingSummary, q02TopkSource, q03JsonDecode, q04CustOrderStats,
    q05RegionRollup, q06BenefitReport, q07Masking, q08Validity,
    q09QualityChecks, q10TopkPerGroup, q11DistinctAgg, q12SetOps,
    q13SemiJoin, q14AntiJoin, q15HourlyEvents, q16Sessionize, q17RevenueTop,
    q68RuntimeFiltered, q70CohortRetention, q72DashboardTiles,
    q104VariantJson)
}
