package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass per-column data profile — the "what is in this table" report
  * a pipeline runs before trusting a new drop: row count, non-null count,
  * distinct count, lexicographic min/max of the string form, per column,
  * in long format (one output row per column).
  *
  * Shape: an in-row unpivot (explode over an array of (name, value)
  * structs — Column API, so hostile column names can't break out of a
  * spliced SQL string) followed by ONE grouped aggregate keyed on column
  * name. Partial aggregation reduces the count/min/max shuffle to
  * |columns| × partitions rows.
  *
  * Distinct counting defaults to the SKETCH form
  * (`approx_count_distinct`, HLL++): partial sketches are built map-side
  * and only |columns| × partitions fixed-size sketch buffers shuffle —
  * never the values themselves. The exact form (`exactDistinct = true`)
  * is Spark's two-phase distinct keyed on (column, value); over a raw
  * text column at 100 TB that shuffle is corpus-sized, which is why
  * exact is the opt-in, not the default. q71/q74's oracles exercise the
  * exact path (DuckDB COUNT(DISTINCT) is exact); the sketch path is
  * plan-pinned in PlanSpec instead.
  *
  * Values profile as strings deliberately: one output schema for every
  * column type, and min/max are lexicographic on the string form (both
  * engines order VARCHAR identically — numeric-order min/max belongs to
  * typed queries like q09/q42).
  */
object Profile {

  /** Quote a column name for resolution, escaping embedded backticks, so
    * names containing dots, quotes, or backticks resolve as one column. */
  private def quoted(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"profile: no column `$c`"))
    val kvs = cols.map { c =>
      struct(lit(c).as("column"), quoted(c).cast("string").as("value"))
    }
    val long = df
      .select(explode(array(kvs: _*)).as("kv"))
      .select(col("kv.column").as("column"), col("kv.value").as("value"))
    val nDistinct =
      if (exactDistinct) countDistinct(col("value"))
      else approx_count_distinct(col("value"))
    long
      .groupBy(col("column"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("value")).as("n_non_null"),
        nDistinct.as("n_distinct"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
  }
}
