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

  /** [[table]] with a row-group-aware scan SPREAD (optimization guide
    * §2.5, "input skew: one huge unsplittable file"): a parquet ROW
    * GROUP is Spark's minimum split unit, so a table whose files carry
    * fewer row groups than the session has cores runs its scan stage —
    * and everything Catalyst fuses into it: filters, projections,
    * partial aggregates, shingle kernels — on that few threads no
    * matter how small `spark.sql.files.maxPartitionBytes` is set. When
    * the file layout offers LESS than half the session's default
    * parallelism in row groups, redistribute right after the read by a
    * deterministic hash of `keys` (hash partitioning is a pure function
    * of the row — reproducible under retries, unlike round-robin, and
    * it skips round-robin's sortBeforeRepartition local sort) so the
    * per-row work downstream engages every core. Deterministic filters
    * and column pruning push through a RepartitionByExpression, so
    * PushedFilters/ReadSchema at the scan are unchanged.
    *
    * On a properly-laid-out table (row groups >= cores/2 — any real
    * cluster dataset, where files are split-sized to begin with) this
    * is the IDENTITY: no extra exchange is inserted. The gate reads
    * only footer metadata (O(files) driver work, bounded by the same
    * listing the scan itself performs); a layout it cannot inspect
    * falls back to the plain read. Callers opt in per query where the
    * scan stage's fused work is the measured bottleneck — for
    * shuffle-bound queries whose first stage is already cheap, the
    * extra exchange would only add cost, so [[table]] stays the
    * default. */
  def tableSpread(spark: SparkSession, dir: String, name: String,
                  keys: Column*): DataFrame = {
    require(keys.nonEmpty, "tableSpread needs at least one hash key column")
    val df = table(spark, dir, name)
    val p = spark.sparkContext.defaultParallelism
    val groups = rowGroupCount(spark, s"$dir/$name.parquet")
    if (groups.exists(_ * 2 >= p)) df
    else df.repartition(p, keys: _*)
  }

  /** Total parquet row groups under `path` (file or directory of
    * `*.parquet`), from footer metadata only; None when the layout
    * cannot be inspected (callers treat that as "well laid out" and
    * skip the spread — never fail a read over an optimization). */
  private def rowGroupCount(spark: SparkSession, path: String): Option[Int] =
    try {
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val files = {
        val st = fs.getFileStatus(p)
        if (st.isDirectory)
          fs.listStatus(p).toSeq.filter(s => s.isFile &&
            s.getPath.getName.endsWith(".parquet"))
        else Seq(st)
      }
      var n = 0
      files.foreach { st =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
        try n += r.getRowGroups.size finally r.close()
      }
      Some(n)
    } catch { case scala.util.control.NonFatal(_) => None }
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
