package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables.table

/** The full query catalog exposed through SparkEntry. */
object Catalog {

  /** Approximate distinct (HyperSpark HLL++) sanity-gated against the exact
    * count so the oracle stays deterministic: output = exact count + a
    * boolean that the approximation is within 5%. */
  val q31ApproxDistinct: Q = Q(
    "q31_approx_distinct",
    Some("""
      SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact,
             TRUE AS approx_ok
      FROM lineitem""")) { (spark, dir) =>
    table(spark, dir, "lineitem")
      .agg(
        countDistinct(col("l_partkey")).as("n_exact"),
        approx_count_distinct(col("l_partkey"), 0.01).as("n_approx"))
      .select(col("n_exact"),
        (abs(col("n_approx") - col("n_exact")) <= col("n_exact") * 0.05).as("approx_ok"))
  }

  val all: Seq[Q] =
    CoreQueries.all ++ TextQueries.all ++ DedupSimQueries.all ++ Seq(q31ApproxDistinct)

  val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  val headlines: Seq[Q] = all.filter(_.headline)
}
