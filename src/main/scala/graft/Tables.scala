package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects as a
      // timestamp; read it as BIGINT nanoseconds (exact) and derive
      // seconds/hours with integer division. Spark `div` truncates toward
      // zero while DuckDB `//` floors — equivalent ONLY for non-negative
      // epochs (this corpus is 2024+; pre-1970 data would need a floor-div
      // expression on the Spark side). nanosAsLong has no per-read option
      // and the session is DRIVER-owned (the contract hands us a built
      // SparkSession), so the conf must be ensured here; the guard keeps
      // the side effect one-time and idempotent.
      if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view (for spark.sql parity paths). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}

/** Engine-portable numeric aggregation patterns.
  *
  * The driver hash-compares our parquet output against a DuckDB oracle, so
  * float aggregates must be bit-identical across engines. Plain SUM/AVG over
  * doubles is summation-order-dependent; instead we cast each row to a
  * decimal (round-to-nearest, identical in Spark and DuckDB), sum exactly in
  * decimal (associative), and cast the final value to double (again exactly
  * rounded the same way). Division of two identical doubles/longs is a single
  * IEEE-754 op and therefore also identical.
  */
object Num {
  /** SUM(double) with deterministic result: oracle form
    * `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** AVG(double) with deterministic result: oracle form
    * `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(x)`. */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast("double") / count(c)

  /** Per-row money rounding: `CAST(CAST(x AS DECIMAL(18,2)) AS DOUBLE)`. */
  def money(c: Column): Column = c.cast(DecimalType(18, 2)).cast("double")
}
