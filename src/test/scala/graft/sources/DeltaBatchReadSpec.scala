package graft.sources.delta

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The DSv2 BATCH half of the graft-delta connector: pushed filters
  * become log-level file skipping, pruned columns reach the parquet
  * projection, and the result matches [[DeltaTable.read]] row-for-row. */
class DeltaBatchReadSpec extends SparkSpec {

  import spark.implicits._

  test("DSv2 BATCH read: spark.read.format(graft-delta) matches DeltaTable.read; filters skip files") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("dbatch").toString
    val t = s"$root/t"
    DeltaTable.write(
      Seq((1, "fr", 1.5), (2, "fr", 2.5), (10, "de", 10.5), (20, "es", 20.5))
        .toDF("id", "lang", "v"),
      t, SaveMode.Append, partitionBy = Seq("lang"))
    val df = spark.read.format("graft-delta").load(t)
    // full read equality, partition column restored + typed
    assert(df.collect().map(r => (r.getAs[Int]("id"), r.getAs[String]("lang"),
        r.getAs[Double]("v"))).toSet ===
      Set((1, "fr", 1.5), (2, "fr", 2.5), (10, "de", 10.5), (20, "es", 20.5)))
    // filtered read: rows exactly right (residual re-applied row-level)
    assert(df.filter(col("lang") === "de" && col("id") > 5)
      .collect().map(_.getAs[Int]("id")).toSet === Set(10))
    // column pruning end-to-end
    assert(df.select("v").collect().map(_.getDouble(0)).toSet ===
      Set(1.5, 2.5, 10.5, 20.5))
    assert(df.select("lang").distinct().collect().map(_.getString(0)).toSet ===
      Set("fr", "de", "es"))
    assert(df.count() === 4L) // all-pruned projection still counts rows
    // the pushed-filter plan prunes FILES from the log, not just rows:
    // drive the builder exactly as Spark does and count planned splits
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import org.apache.spark.sql.connector.read.{Batch => B}
    import org.apache.spark.sql.execution.datasources.FilePartition
    // count planned FILES (splits bin-pack into fewer FilePartitions)
    def planned(fs: org.apache.spark.sql.sources.Filter*): Int = {
      val opts = new CaseInsensitiveStringMap(
        java.util.Map.of("path", t))
      val sb = new DeltaScanBuilder(df.schema, opts)
      sb.pushFilters(fs.toArray)
      val b: B = sb.build().toBatch
      b.planInputPartitions()
        .map(_.asInstanceOf[FilePartition].files.length).sum
    }
    val files = DeltaLog.snapshot(spark, t).files
    val all = planned()
    assert(all === files.size, s"no filter → every live file plans: $all")
    assert(planned(org.apache.spark.sql.sources.EqualTo("lang", "de")) ===
      files.count(_.partitionValues.get("lang").contains("de")),
      "partition filter must prune to that partition's files")
    assert(planned(org.apache.spark.sql.sources.GreaterThan("id", 15)) === 1,
      "stats filter must prune on id bounds")
    assert(planned(org.apache.spark.sql.sources.EqualTo("lang", "nope")) === 0)
  }

  test("versionAsOf option: batch time travel through the connector") {
    val root = java.nio.file.Files.createTempDirectory("dbatch3").toString
    val t = s"$root/t"
    DeltaTable.write(Seq((1, "a")).toDF("id", "s"), t, SaveMode.Append)    // v0
    DeltaTable.write(Seq((2, "b")).toDF("id", "s"), t, SaveMode.Append)    // v1
    DeltaTable.write(Seq((9, "z")).toDF("id", "s"), t, SaveMode.Overwrite) // v2
    assert(spark.read.format("graft-delta").load(t)
      .collect().map(_.getInt(0)).toSet === Set(9))
    assert(spark.read.format("graft-delta").option("versionAsOf", "1").load(t)
      .collect().map(_.getInt(0)).toSet === Set(1, 2))
    assert(spark.read.format("graft-delta").option("versionAsOf", "0").load(t)
      .collect().map(_.getInt(0)).toSet === Set(1))
    // streams refuse the batch-only option (on the stream thread)
    val q = spark.readStream.format("graft-delta").option("versionAsOf", "0")
      .load(t)
      .writeStream.format("noop")
      .option("checkpointLocation", s"$root/chk").start()
    val e = intercept[Exception] {
      try q.processAllAvailable() finally q.stop()
    }
    def chain(x: Throwable): String =
      if (x == null) "" else Option(x.getMessage).getOrElse("") + chain(x.getCause)
    assert(chain(e).contains("startingVersion"), chain(e))
  }

  test("RESTORE resets content via one metadata commit; timestampAsOf resolves versions") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("dbatch4").toString
    val t = s"$root/t"
    DeltaTable.write(Seq((1, "a"), (2, "b")).toDF("id", "s"), t, SaveMode.Append) // v0
    DeltaTable.delete(spark, t, col("id") === 1)                                  // v1
    DeltaTable.write(Seq((3, "c")).toDF("id", "s"), t, SaveMode.Append)           // v2
    def ids() = DeltaTable.read(spark, t).collect().map(_.getInt(0)).toSet
    assert(ids() === Set(2, 3))
    DeltaTable.restore(spark, t, 0L)                                              // v3
    assert(ids() === Set(1, 2), s"restore must reproduce v0 exactly: ${ids()}")
    // the restore is itself versioned history — time travel still works
    assert(DeltaTable.read(spark, t, versionAsOf = Some(2L))
      .collect().map(_.getInt(0)).toSet === Set(2, 3))
    val c = DeltaLog.readCommit(spark, t, 3L)
    assert(c.operation.contains("RESTORE"))
    // timestampAsOf: the head commit's time resolves to the head version
    val headTs = DeltaLog.commitTimestamp(spark, t, 3L,
      DeltaLog.readCommit(spark, t, 3L))
    assert(DeltaTable.versionAtTimestamp(spark, t, headTs) === 3L)
    assert(spark.read.format("graft-delta")
      .option("timestampAsOf", headTs.toString).load(t)
      .collect().map(_.getInt(0)).toSet === Set(1, 2))
    // before the earliest commit: loud refusal
    intercept[IllegalArgumentException] {
      DeltaTable.versionAtTimestamp(spark, t, 0L)
    }
  }

  test("DSv2 BATCH scan is VECTORIZED and splits large files; output identical to DeltaTable.read") {
    import org.apache.spark.sql.functions.{col, expr}
    val root = java.nio.file.Files.createTempDirectory("dvec").toString
    val t = s"$root/t"
    // one sizeable file (~200k rows) + a partitioned layout with an
    // escapable partition value, nulls, and mixed types
    val big = spark.range(0, 200000).toDF("id")
      .withColumn("lang", expr("CASE WHEN id % 3 = 0 THEN 'a:b' WHEN id % 3 = 1 THEN 'fr' ELSE 'de' END"))
      .withColumn("v", expr("CAST(id AS DOUBLE) / 7"))
      .withColumn("s", expr("CASE WHEN id % 11 = 0 THEN NULL ELSE concat('s', id) END"))
      .coalesce(1)
    DeltaTable.write(big, t, SaveMode.Append, partitionBy = Seq("lang"))
    val df = spark.read.format("graft-delta").load(t)
    // the executed plan goes through the columnar path (ColumnarToRow
    // proves ParquetPartitionReaderFactory returned batches)
    df.filter(col("id") > 100).count() // force planning
    val plan = df.filter(col("id") > 100).queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), s"expected vectorized scan:\n$plan")
    // result identity vs the parquet batch path, full schema incl.
    // partition col — column ORDER also identical at the API surface
    val viaApi = DeltaTable.read(spark, t)
    assert(df.columns.toSeq === viaApi.columns.toSeq)
    assert(df.count() === 200000L)
    assert(df.selectExpr("sum(id)", "count(s)", "sum(v)").collect().head.toSeq ===
      viaApi.selectExpr("sum(id)", "count(s)", "sum(v)").collect().head.toSeq)
    assert(df.filter(col("lang") === "a:b").count() ===
      viaApi.filter(col("lang") === "a:b").count())
    // large-file SPLITTING: shrink maxPartitionBytes and the same scan
    // plans multiple splits per file, rows still exact
    val before = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      val dfSmall = spark.read.format("graft-delta").load(t)
      assert(dfSmall.rdd.getNumPartitions > 3,
        s"expected >3 split partitions, got ${dfSmall.rdd.getNumPartitions}")
      assert(dfSmall.count() === 200000L)
      assert(dfSmall.filter(col("id") % 20000 === 0).collect()
        .map(_.getAs[Long]("id")).toSet === (0L until 200000L by 20000L).toSet)
    } finally {
      before match {
        case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
        case None => spark.conf.unset("spark.sql.files.maxPartitionBytes")
      }
    }
  }

  test("DSv2 planning past the distributed-replay threshold plans from the checkpoint") {
    val root = java.nio.file.Files.createTempDirectory("dguard").toString
    val t = s"$root/t"
    DeltaTable.write((1 to 10).map(i => (i, s"r$i", s"p${i % 3}"))
      .toDF("id", "s", "part"),
      t, SaveMode.Append, partitionBy = Seq("part"))
    DeltaLog.checkpoint(spark, t)
    // tail commit past the checkpoint: distributed planning must fold it in
    DeltaTable.write(Seq((11, "r11", "p1")).toDF("id", "s", "part"),
      t, SaveMode.Append, partitionBy = Seq("part"))
    try {
      spark.conf.set("spark.graft.delta.distributedReplayThreshold", "0")
      // past-threshold SQL reads now SUCCEED via distributed planning
      // (r9 verdict ask #3): full read, and a partition-equality filter
      // prunes on the checkpoint DataFrame before the driver collects
      val df = spark.read.format("graft-delta").load(t)
      assert(df.count() === 11L)
      assert(df.filter(col("part") === "p1")
        .select("id").collect().map(_.getInt(0)).toSet
        === Set(1, 4, 7, 10, 11))
      // a DATA-column equality must not zero out the pruning
      assert(spark.read.format("graft-delta").load(t)
        .filter(col("s") === "r4").select("id").head().getInt(0) === 4)
      // time travel rides the distributed replay too (round 14): an
      // asOf AT/ABOVE the newest checkpoint (here v0) replays
      // checkpoint + bounded tail
      assert(spark.read.format("graft-delta").option("versionAsOf", "1")
        .load(t).count() === 11L, "asOf above the checkpoint")
      assert(spark.read.format("graft-delta").option("versionAsOf", "0")
        .load(t).count() === 10L, "asOf AT the checkpoint")
      // an asOf BELOW the newest checkpoint degrades to the (correct)
      // full driver replay — the only form that can reconstruct it
      DeltaLog.checkpoint(spark, t) // newest checkpoint now v1
      assert(spark.read.format("graft-delta").option("versionAsOf", "0")
        .load(t).count() === 10L, "asOf < newest checkpoint: driver fallback")
      // a nonexistent version still refuses — never a silent older read
      val e = intercept[Exception] {
        spark.read.format("graft-delta").option("versionAsOf", "99")
          .load(t).collect()
      }
      def chain(x: Throwable): String =
        if (x == null) "" else Option(x.getMessage).getOrElse("") + chain(x.getCause)
      assert(chain(e).contains("does not exist"), chain(e))
      // a NEGATIVE version hits the same named refusal (round-15 ADVICE:
      // the old `a < 0 ||` escape surfaced it downstream as an empty
      // snapshot / "has no commits" instead)
      val eNeg = intercept[Exception] {
        spark.read.format("graft-delta").option("versionAsOf", "-1")
          .load(t).collect()
      }
      assert(chain(eNeg).contains("does not exist"), chain(eNeg))
      // DeltaTable.read agrees (it routes through the same replay)
      assert(DeltaTable.read(spark, t).count() === 11L)
    } finally spark.conf.unset("spark.graft.delta.distributedReplayThreshold")
  }

  test("DSv2 BATCH read in CDF mode is refused with a usable message") {
    // batch CDF reads go through DeltaTable.readChangeFeed — the DSv2
    // batch path would silently mis-stamp versions; make sure we did
    // not wire it half-way
    val root = java.nio.file.Files.createTempDirectory("dbatch2").toString
    val t = s"$root/t"
    DeltaTable.write(Seq((1, "a")).toDF("id", "s"), t, SaveMode.Append)
    val e = intercept[Exception] {
      spark.read.format("graft-delta").option("readChangeFeed", "true")
        .load(t).collect()
    }
    def chain(x: Throwable): String =
      if (x == null) "" else Option(x.getMessage).getOrElse("") + chain(x.getCause)
    assert(chain(e).contains("readChangeFeed"),
      s"must point at the batch API: ${chain(e)}")
  }

  test("log statistics drive broadcast planning; DV rows excluded from the count") {
    val root = java.nio.file.Files.createTempDirectory("dstats").toString
    val dim = s"$root/dim"
    DeltaTable.write((1 to 50).map(i => (i, s"name$i")).toDF("k", "name"),
      dim, SaveMode.Append)
    // a KB-sized graft-delta dimension joined to a larger fact must
    // BROADCAST (without stats, DSv2 reports defaultSizeInBytes = huge
    // and Spark shuffle-joins); no hint anywhere
    val fact = spark.range(0, 200000)
      .selectExpr("CAST(id % 50 + 1 AS INT) AS k", "id AS v")
    val joined = fact.join(spark.read.format("graft-delta").load(dim), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast join from log stats, got:\n$plan")
    assert(joined.count() === 200000L)
    // the reported row count subtracts deletion vectors
    DeltaTable.setProperties(spark, dim,
      Map("delta.enableDeletionVectors" -> "true"))
    DeltaTable.delete(spark, dim, col("k") <= 10)
    val scan = new DeltaBatchScan(dim,
      DeltaStreamDataSource.logSchema(dim),
      DeltaStreamDataSource.logSchema(dim), Array.empty)
    val (bytes, rows) = scan.estimate
    assert(bytes > 0L)
    assert(rows.contains(40L), s"50 - 10 DV'd rows, got $rows")
  }

  test("runtime V2 filters re-prune partitions (the DPP seam)") {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val root = java.nio.file.Files.createTempDirectory("drt").toString
    val t = s"$root/t"
    (0 to 3).foreach { p =>
      DeltaTable.write((1 to 10).map(i => (i, p)).toDF("id", "p").coalesce(1),
        t, SaveMode.Append, partitionBy = Seq("p"))
    }
    val scan = new DeltaScanBuilder(
      DeltaStreamDataSource.logSchema(t),
      new CaseInsensitiveStringMap(java.util.Map.of("path", t))).build()
    val batch0 = scan.toBatch.planInputPartitions().length
    assert(batch0 >= 4, s"one partition per Hive dir at least, got $batch0")
    // Spark hands the build side's keys at execution: p = 2
    scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]
      .filter(Array(new Predicate("=",
        Array(Expressions.column("p"),
          org.apache.spark.sql.connector.expressions.Expressions.literal(2)))))
    val batch1 = scan.toBatch.planInputPartitions().length
    assert(batch1 < batch0 && batch1 >= 1,
      s"runtime filter must shrink the plan: $batch0 -> $batch1")
  }
}
