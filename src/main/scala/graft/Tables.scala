package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet. Every consumer in the engine
      // expects BIGINT epoch-nanoseconds and derives seconds/hours with
      // integer division (`ts div 1000…`). Two runtime behaviors exist:
      //   * older Spark 4 honors spark.sql.legacy.parquet.nanosAsLong and
      //     resolves the column as BIGINT nanos directly (exact);
      //   * newer runtimes ignore the conf and resolve TIMESTAMP_NTZ with
      //     sub-µs truncated — the same truncation DuckDB applies on
      //     CAST(ts AS TIMESTAMP), and invisible to consumers because all
      //     of them divide by ≥1000 (nanos → µs or coarser).
      // Attempt the conf (no per-read option; session is driver-owned, so
      // the guarded set keeps the side effect one-time and idempotent)…
      if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(spark, df) else df
  }

  /** …then adapt to whatever schema the runtime actually produced: if `ts`
    * resolved as a timestamp type, rebuild BIGINT nanos from its µs value.
    * NTZ→LTZ interpretation uses the session time zone, so UTC is ensured
    * first (every engine entrypoint already pins it; this guards sessions
    * we don't build). Spark `div` truncates toward zero vs DuckDB's floor
    * `//` — equivalent for the non-negative epochs in this corpus. */
  private def normalizeEventTs(spark: SparkSession, df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) | Some(TimestampType) =>
        if (!spark.conf.getOption("spark.sql.session.timeZone").contains("UTC"))
          spark.conf.set("spark.sql.session.timeZone", "UTC")
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case _ => df
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
