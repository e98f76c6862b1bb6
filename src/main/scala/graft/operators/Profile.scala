package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass per-column data profile — the "what is in this table" report
  * a pipeline runs before trusting a new drop: row count, non-null count,
  * exact distinct count, lexicographic min/max of the string form, per
  * column, in long format (one output row per column).
  *
  * Shape: `stack` unpivots the projected columns in-row (codegen, no
  * UDFs, no shuffle), then ONE grouped aggregate keyed by column name.
  * Partial aggregation reduces the count/min/max shuffle to |columns| ×
  * partitions rows; the exact distinct adds Spark's standard two-phase
  * expand keyed on (column, value) — linear, and the price of exactness
  * (swap `countDistinct` for `approx_count_distinct` at 100 TB when ±2%
  * is acceptable; q59's HLL rollup is the mergeable form).
  *
  * Values profile as strings deliberately: one output schema for every
  * column type, and min/max are lexicographic on the string form (both
  * engines order VARCHAR identically — numeric-order min/max belongs to
  * typed queries like q09/q42).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"profile: no column `$c`"))
    val pairs = cols
      .flatMap(c => Seq(s"'$c'", s"cast(`$c` as string)"))
      .mkString(", ")
    df.select(expr(s"stack(${cols.size}, $pairs) as (column, value)"))
      .groupBy(col("column"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("value")).as("n_non_null"),
        countDistinct(col("value")).as("n_distinct"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
  }
}
