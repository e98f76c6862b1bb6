package graft.sources.delta

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Pure-SQL access to graft-delta tables through the [[GraftCatalog]]
  * DSv2 catalog: CREATE/INSERT/SELECT/DELETE/OVERWRITE/ALTER/DROP all
  * route into the from-scratch log — the reference's Trino
  * `register_table` + SQL hop (`README.md:114-122`) as a native Spark
  * catalog. */
class GraftCatalogSpec extends SparkSpec {

  import spark.implicits._

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_wh_cat").toString

  private def initCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", warehouse)
  }

  test("SQL lifecycle: CREATE, INSERT, SELECT, DELETE, OVERWRITE, DROP") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("""CREATE TABLE graft.db.ev (id BIGINT, lang STRING)
                 PARTITIONED BY (lang)""")
    // the creation is a real log commit other readers see
    assert(DeltaLog.snapshot(spark, s"$warehouse/db/ev").version === 0L)
    assert(spark.sql("SELECT * FROM graft.db.ev").count() === 0L)

    spark.sql("""INSERT INTO graft.db.ev VALUES
                 (1, 'fr'), (2, 'de'), (3, 'fr'), (4, 'es')""")
    assert(spark.sql("SELECT * FROM graft.db.ev").count() === 4L)
    // filtered SELECT prunes partitions at the log (and still answers right)
    assert(spark.sql("SELECT id FROM graft.db.ev WHERE lang = 'fr' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))

    // DELETE FROM routes into the row-level DML: partition predicate →
    // metadata-only drop (remove actions, no rewrites)
    spark.sql("DELETE FROM graft.db.ev WHERE lang = 'fr'")
    assert(spark.sql("SELECT id FROM graft.db.ev ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(2L, 4L))
    val t = s"$warehouse/db/ev"
    val delCommit = DeltaLog.readCommit(spark, t,
      DeltaLog.snapshot(spark, t).version)
    assert(delCommit.operation.contains("DELETE"))
    assert(delCommit.adds.isEmpty, "partition delete must stage no rewrites")

    // row-level (non-partition) DELETE still exact
    spark.sql("DELETE FROM graft.db.ev WHERE id = 2")
    assert(spark.sql("SELECT id FROM graft.db.ev").collect()
      .map(_.getLong(0)).toSeq === Seq(4L))

    // INSERT OVERWRITE = one atomic REPLACE commit
    spark.sql("INSERT OVERWRITE graft.db.ev VALUES (9, 'it')")
    assert(spark.sql("SELECT id, lang FROM graft.db.ev").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((9L, "it")))

    // SHOW TABLES sees it; DROP removes it
    assert(spark.sql("SHOW TABLES IN graft.db").collect()
      .map(_.getString(1)).contains("ev"))
    spark.sql("DROP TABLE graft.db.ev")
    assert(!spark.sql("SHOW TABLES IN graft.db").collect()
      .map(_.getString(1)).contains("ev"))
  }

  test("ALTER TABLE SET TBLPROPERTIES persists through the log (CDF property)") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db2")
    spark.sql("CREATE TABLE graft.db2.t (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.db2.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("""ALTER TABLE graft.db2.t
                 SET TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true')""")
    val t = s"$warehouse/db2/t"
    assert(DeltaLog.snapshot(spark, t).configuration
      .get("delta.enableChangeDataFeed").contains("true"))
    // SHOW TBLPROPERTIES surfaces what the log committed
    val shown = spark.sql("SHOW TBLPROPERTIES graft.db2.t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("delta.enableChangeDataFeed").contains("true"), s"$shown")
    // the property turns on precise CDF capture for a SQL DELETE
    spark.sql("DELETE FROM graft.db2.t WHERE id = 1")
    val v = DeltaLog.snapshot(spark, t).version
    assert(DeltaLog.readCommit(spark, t, v).cdcFiles.nonEmpty,
      "SQL DELETE under the table property must stage precise change files")
    val feed = DeltaTable.readChangeFeed(spark, t, v, Some(v))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type")))
    assert(feed.toSeq === Seq((1L, "delete")))
  }

  test("SQL UPDATE routes through the engine's row-level DML (extension rule)") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db4")
    spark.sql("CREATE TABLE graft.db4.t (id BIGINT, s STRING, n BIGINT)")
    spark.sql("INSERT INTO graft.db4.t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    // assignments may reference table columns; WHERE prunes candidates
    spark.sql("UPDATE graft.db4.t SET s = concat(s, '!'), n = n + 1 WHERE id >= 2")
    val got = spark.sql("SELECT id, s, n FROM graft.db4.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, "a", 10L), (2L, "b!", 21L), (3L, "c!", 31L)))
    val t = s"$warehouse/db4/t"
    assert(DeltaLog.readCommit(spark, t, DeltaLog.snapshot(spark, t).version)
      .operation.contains("UPDATE"))
    // unconditional UPDATE (no WHERE) touches every row
    spark.sql("UPDATE graft.db4.t SET n = 0")
    assert(spark.sql("SELECT SUM(n) FROM graft.db4.t").head().getLong(0) === 0L)
  }

  test("SQL MERGE INTO: canonical upsert (UPDATE SET * / INSERT *) routes to the engine merge") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db5")
    spark.sql("CREATE TABLE graft.db5.t (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.db5.t VALUES (1, 'old1'), (2, 'old2')")
    Seq((2L, "new2"), (3L, "new3")).toDF("id", "s")
      .createOrReplaceTempView("merge_src")
    spark.sql("""MERGE INTO graft.db5.t AS t USING merge_src AS s
                 ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    val got = spark.sql("SELECT id, s FROM graft.db5.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "old1"), (2L, "new2"), (3L, "new3")))
    val t = s"$warehouse/db5/t"
    assert(DeltaLog.readCommit(spark, t, DeltaLog.snapshot(spark, t).version)
      .operation.contains("MERGE"))
  }

  test("SQL MERGE INTO: multi-clause (conditional UPDATE, DELETE, gated INSERT)") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db7")
    spark.sql("""CREATE TABLE graft.db7.t (id BIGINT, lang STRING, n BIGINT)
                 PARTITIONED BY (lang)""")
    spark.sql("""ALTER TABLE graft.db7.t
                 SET TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true')""")
    spark.sql("""INSERT INTO graft.db7.t VALUES
                 (1, 'fr', 10), (2, 'fr', 20), (3, 'de', 30), (4, 'de', 40)""")
    Seq((1L, "fr", 100L), (3L, "xx", 300L), (9L, "es", 90L), (10L, "es", 5L))
      .toDF("id", "lang", "n").createOrReplaceTempView("mc_src")
    // delete when the source says the row is hot; update (moving the row's
    // partition) otherwise; insert only the rows passing the gate
    spark.sql("""MERGE INTO graft.db7.t AS t USING mc_src AS s
                 ON t.id = s.id
                 WHEN MATCHED AND s.n >= 300 THEN DELETE
                 WHEN MATCHED THEN UPDATE SET lang = s.lang, n = t.n + s.n
                 WHEN NOT MATCHED AND s.n >= 50 THEN INSERT (id, lang, n)
                   VALUES (s.id, s.lang, s.n)""")
    val got = spark.sql("SELECT id, lang, n FROM graft.db7.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq(
      (1L, "fr", 110L),  // updated (stays fr; n = 10 + 100)
      (2L, "fr", 20L),   // untouched carry-over
      // 3 deleted by the first clause
      (4L, "de", 40L),
      (9L, "es", 90L)))  // inserted; 10 failed the insert gate
    val t = s"$warehouse/db7/t"
    val v = DeltaLog.snapshot(spark, t).version
    assert(DeltaLog.readCommit(spark, t, v).operation.contains("MERGE"))
    // precise CDF for the whole clause mix
    val feed = DeltaTable.readChangeFeed(spark, t, v, Some(v))
      .select(col("id"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(feed === Set((3L, "delete"), (1L, "update_preimage"),
      (1L, "update_postimage"), (9L, "insert")))
    // WHEN NOT MATCHED BY SOURCE: target rows with no source match run
    // their own update/delete clauses (conditions over target columns)
    spark.sql("""MERGE INTO graft.db7.t AS t USING mc_src AS s
                 ON t.id = s.id
                 WHEN NOT MATCHED BY SOURCE AND t.n < 30 THEN DELETE
                 WHEN NOT MATCHED BY SOURCE THEN UPDATE SET n = t.n * 10""")
    val got2 = spark.sql("SELECT id, n FROM graft.db7.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got2 === Seq(
      (1L, 110L),   // matched by source (id=1 in mc_src): untouched
      // 2 had no source match and n=20 < 30 → deleted
      (4L, 400L),   // no source match, n=40 → updated ×10
      (9L, 90L)))   // matched by source (id=9): untouched
  }

  test("CALL graft.system.* : maintenance procedures run against the log") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db6")
    spark.sql("CREATE TABLE graft.db6.t (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.db6.t VALUES (1, 'a')")
    spark.sql("INSERT INTO graft.db6.t VALUES (2, 'b')")
    spark.sql("INSERT INTO graft.db6.t VALUES (3, 'c')")
    val t = s"$warehouse/db6/t"
    assert(DeltaLog.snapshot(spark, t).files.size === 3)
    // compact: three small files fold into one atomic maintenance commit
    spark.sql(s"CALL graft.system.compact('db6.t', ${Long.MaxValue}L, 1)")
    assert(DeltaLog.snapshot(spark, t).files.size === 1)
    assert(spark.sql("SELECT * FROM graft.db6.t").count() === 3L)
    // checkpoint: pointer written, snapshot seeds from it
    spark.sql("CALL graft.system.checkpoint('db6.t')")
    assert(DeltaLog.lastCheckpointVersion(spark, t).nonEmpty)
    // restore: back to the two-row state (CREATE is v0, so v2), one commit
    spark.sql("CALL graft.system.restore('db6.t', 2L)")
    assert(spark.sql("SELECT id FROM graft.db6.t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
    // set_cdf: the property lands in metaData configuration
    spark.sql("CALL graft.system.set_cdf('db6.t', true)")
    assert(DeltaLog.snapshot(spark, t).configuration
      .get("delta.enableChangeDataFeed").contains("true"))
    // procedures can RETURN rows: history is DESCRIBE HISTORY as SQL
    val hist = spark.sql("CALL graft.system.history('db6.t')")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(hist.length >= 5, s"got ${hist.toSeq}")
    assert(hist.head._1 > hist.last._1, "newest first")
    assert(hist.map(_._2).contains("RESTORE"))
    assert(hist.map(_._2).contains("CREATE TABLE"))
    // vacuum returns its reclaim counts as a result row
    val vac = spark.sql(s"CALL graft.system.vacuum('db6.t', ${7L*24*3600*1000}L)")
      .collect()
    assert(vac.length === 1 && vac.head.getInt(0) >= 0)
    // DESCRIBE DETAIL as a procedure: one row of table-level facts
    val det = spark.sql("CALL graft.system.detail('db6.t')").head()
    assert(det.getLong(0) === DeltaLog.snapshot(spark, t).version)
    // post-restore state: v1's and v2's append files are live again
    assert(det.getInt(1) === 2 && det.getLong(2) > 0L)
    assert(det.getInt(3) === 0 && det.getLong(4) === 0L, "no DVs here")
    assert(det.getString(7).contains("delta.enableChangeDataFeed=true"))
    // unknown procedure refuses with the available list
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.frobnicate('db6.t')")
    }
    assert(Option(e.getMessage).getOrElse("").contains("frobnicate") ||
      Option(e.getCause).exists(c => c.getMessage.contains("frobnicate")))
  }

  test("ALTER TABLE ADD COLUMNS + MERGE WITH SCHEMA EVOLUTION widen the schema") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db9")
    spark.sql("CREATE TABLE graft.db9.t (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.db9.t VALUES (1, 'a'), (2, 'b')")
    // explicit ADD COLUMNS: one metaData commit, old rows read NULL
    spark.sql("ALTER TABLE graft.db9.t ADD COLUMNS (n BIGINT)")
    val afterAdd = spark.sql("SELECT id, s, n FROM graft.db9.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(afterAdd === Seq((1L, "a", -1L), (2L, "b", -1L)))
    // MERGE WITH SCHEMA EVOLUTION: the source's extra column evolves the
    // table through the catalog's AddColumn seam, then merges normally
    // (SET * requires the source to carry every target column — Spark's
    // star expansion resolves target names against the source)
    Seq((2L, "b2", 20L, "x2"), (3L, "c", 30L, "x3"))
      .toDF("id", "s", "n", "extra").createOrReplaceTempView("evo_src")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO graft.db9.t AS t
                 USING evo_src AS s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    val got = spark.sql("SELECT id, s, n, extra FROM graft.db9.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) "-" else r.getString(3))).toSeq
    assert(got === Seq(
      (1L, "a", -1L, "-"),    // untouched, evolved column NULL
      (2L, "b2", 20L, "x2"),  // updated under the evolved schema
      (3L, "c", 30L, "x3")))  // inserted under the evolved schema
    // a NOT NULL add refuses loudly: existing rows have no value, and
    // silently downgrading to nullable would drop a declared invariant
    val eNN = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db9.t ADD COLUMNS (m BIGINT NOT NULL)")
    }
    assert((Option(eNN.getMessage).getOrElse("") +
      Option(eNN.getCause).flatMap(c => Option(c.getMessage)).getOrElse(""))
      .contains("NOT NULL"))
  }

  test("concurrent SQL writers: racing INSERTs and DELETEs converge exactly") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db8")
    spark.sql("CREATE TABLE graft.db8.t (id BIGINT, s STRING)")
    // seed rows 0-9; one thread inserts 100-109, the other deletes the
    // even seeds — disjoint key sets, so the converged state is exact
    // regardless of interleaving, and every lost commit race must retry
    spark.sql("INSERT INTO graft.db8.t VALUES " +
      (0L until 10L).map(i => s"($i, 'seed')").mkString(", "))
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def submit(body: => Unit) = pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        try body catch { case t: Throwable => errs.add(t) }
      }
    })
    submit((0 until 10).foreach(i =>
      spark.sql(s"INSERT INTO graft.db8.t VALUES (${100 + i}, 'ins')")))
    submit((0 until 10 by 2).foreach(i =>
      spark.sql(s"DELETE FROM graft.db8.t WHERE id = $i")))
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "writers hung")
    assert(errs.isEmpty, s"writer failed: ${Option(errs.peek()).map(_.toString)}")
    val got = spark.sql("SELECT id FROM graft.db8.t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(got === (1L until 10L by 2) ++ (100L until 110L))
    // every write landed as its own log version (CREATE v0, seed v1,
    // then 10 inserts + 5 deletes), i.e. no commit was silently dropped
    // by the race
    val t = s"$warehouse/db8/t"
    assert(DeltaLog.snapshot(spark, t).version === 16L)
  }

  test("CTAS and CREATE OR REPLACE TABLE AS SELECT through the catalog") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db12")
    Seq((1L, "fr"), (2L, "de"), (3L, "fr")).toDF("id", "lang")
      .createOrReplaceTempView("ctas_src")
    spark.sql("""CREATE TABLE graft.db12.t PARTITIONED BY (lang) AS
                 SELECT id, lang FROM ctas_src""")
    assert(spark.sql("SELECT id FROM graft.db12.t WHERE lang = 'fr' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(DeltaLog.snapshot(spark, s"$warehouse/db12/t").partitionColumns
      === Seq("lang"))
    spark.sql("""CREATE OR REPLACE TABLE graft.db12.t AS
                 SELECT id * 10 AS id FROM ctas_src""")
    assert(spark.sql("SELECT id FROM graft.db12.t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(10L, 20L, 30L))
  }

  test("native SQL ADD/DROP CONSTRAINT ... CHECK routes through the log") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db13")
    spark.sql("CREATE TABLE graft.db13.t (id BIGINT, n BIGINT)")
    spark.sql("INSERT INTO graft.db13.t VALUES (1, 10), (2, 20)")
    // the ANSI grammar, not the CALL procedure
    spark.sql("ALTER TABLE graft.db13.t ADD CONSTRAINT pos_n CHECK (n > 0)")
    val t = s"$warehouse/db13/t"
    assert(DeltaLog.snapshot(spark, t).configuration
      .get("delta.constraints.pos_n").exists(_.contains("n > 0")))
    // enforced on writes
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.db13.t VALUES (3, -1)")
    }
    def chain(x: Throwable): String =
      if (x == null) "" else Option(x.getMessage).getOrElse("") + chain(x.getCause)
    assert(chain(e).contains("pos_n"), chain(e))
    // adding a constraint existing rows violate refuses — Spark's own
    // ANSI-grammar validation scan raises before alterTable is reached
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db13.t ADD CONSTRAINT big_n CHECK (n > 15)")
    }
    assert(chain(e2).contains("n > 15"), chain(e2))
    // DROP CONSTRAINT lifts enforcement; unknown name refuses w/o IF EXISTS
    spark.sql("ALTER TABLE graft.db13.t DROP CONSTRAINT pos_n")
    spark.sql("INSERT INTO graft.db13.t VALUES (3, -1)")
    assert(spark.sql("SELECT COUNT(*) FROM graft.db13.t").head().getLong(0) === 3L)
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db13.t DROP CONSTRAINT nope")
    }
    assert(chain(e3).toLowerCase.contains("nope"), chain(e3))
  }

  test("column DEFAULT values: CREATE, INSERT fill, SET/DROP DEFAULT") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db14")
    spark.sql("""CREATE TABLE graft.db14.t
                 (id BIGINT, n BIGINT DEFAULT 7, s STRING DEFAULT 'x')""")
    spark.sql("INSERT INTO graft.db14.t (id) VALUES (1)")
    spark.sql("INSERT INTO graft.db14.t VALUES (2, 20, 'y')")
    spark.sql("INSERT INTO graft.db14.t (id, n, s) VALUES (3, DEFAULT, DEFAULT)")
    def rows() = spark.sql("SELECT id, n, s FROM graft.db14.t ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2))).toSeq
    assert(rows() === Seq((1L, 7L, "x"), (2L, 20L, "y"), (3L, 7L, "x")))
    // SET DEFAULT changes FUTURE inserts only
    spark.sql("ALTER TABLE graft.db14.t ALTER COLUMN n SET DEFAULT 100")
    spark.sql("INSERT INTO graft.db14.t (id) VALUES (4)")
    assert(rows().contains((4L, 100L, "x")))
    assert(rows().take(3) === Seq((1L, 7L, "x"), (2L, 20L, "y"), (3L, 7L, "x")),
      "existing rows untouched by SET DEFAULT")
    // DROP DEFAULT: subsequent fills are NULL again
    spark.sql("ALTER TABLE graft.db14.t ALTER COLUMN n DROP DEFAULT")
    spark.sql("INSERT INTO graft.db14.t (id) VALUES (5)")
    assert(rows().contains((5L, -1L, "x")))
    // ADD COLUMN with a DEFAULT refuses: readers NULL-fill old files
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db14.t ADD COLUMNS (m BIGINT DEFAULT 3)")
    }
    assert((Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse(""))
      .contains("DEFAULT"))
  }

  test("shallow clone: zero-copy table, independent life, vacuum-safe") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db11")
    spark.sql("""CREATE TABLE graft.db11.src (id BIGINT, lang STRING)
                 PARTITIONED BY (lang)""")
    spark.sql("""INSERT INTO graft.db11.src VALUES
                 (1, 'fr'), (2, 'de'), (3, 'fr')""")
    spark.sql("CALL graft.system.clone('db11.src', 'db11.dst')")
    // clone reads identically, through SQL and the engine path
    assert(spark.sql("SELECT id FROM graft.db11.dst ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    // the clone's v0 references the SOURCE's files absolutely — no copy
    val dst = s"$warehouse/db11/dst"
    val src = s"$warehouse/db11/src"
    val cloneAdds = DeltaLog.snapshot(spark, dst).files
    assert(cloneAdds.forall(f =>
      new org.apache.hadoop.fs.Path(f.path).isAbsolute))
    // DML on the clone stages under ITS root; the source is untouched
    spark.sql("DELETE FROM graft.db11.dst WHERE lang = 'fr'")
    assert(spark.sql("SELECT COUNT(*) FROM graft.db11.dst").head().getLong(0) === 1L)
    assert(spark.sql("SELECT COUNT(*) FROM graft.db11.src").head().getLong(0) === 3L)
    // vacuum on the clone must NOT reclaim the source's files
    spark.sql("CALL graft.system.vacuum('db11.dst', 0L)")
    assert(spark.sql("SELECT COUNT(*) FROM graft.db11.src").head().getLong(0) === 3L,
      "clone vacuum deleted source data")
    // partition pruning on the clone works off the cloned actions
    assert(spark.sql("SELECT id FROM graft.db11.dst WHERE lang = 'de'")
      .head().getLong(0) === 2L)
    // MIXED manifest: an INSERT lands RELATIVE files next to the
    // remaining absolute reference; the read unions the basePath scan
    // (relative files) with the join-attached scan (absolute files)
    spark.sql("INSERT INTO graft.db11.dst VALUES (4, 'de'), (5, 'it')")
    assert(spark.sql("SELECT id FROM graft.db11.dst ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(2L, 4L, 5L))
    assert(spark.sql("SELECT id FROM graft.db11.dst WHERE lang = 'de' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(2L, 4L))
  }

  test("clone read plans ONE scan over absolute files, not one per partition") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db12")
    spark.sql("""CREATE TABLE graft.db12.src (id BIGINT, p STRING)
                 PARTITIONED BY (p)""")
    // 30 distinct partition tuples: the per-tuple-union shape this pins
    // against would plan 30 separate scans (driver blowup at clone scale)
    val vals = (0 until 30).map(i => s"($i, 'p$i')").mkString(", ")
    spark.sql(s"INSERT INTO graft.db12.src VALUES $vals")
    spark.sql("CALL graft.system.clone('db12.src', 'db12.dst')")
    val df = DeltaTable.read(spark, s"$warehouse/db12/dst")
    assert(df.select("id").collect().map(_.getLong(0)).toSet
      === (0L until 30L).toSet)
    // typed partition values survive the join attach
    assert(df.filter(org.apache.spark.sql.functions.col("p") === "p7")
      .select("id").head().getLong(0) === 7L)
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.size <= 2,
      s"expected one data scan (+ broadcast side), got ${scans.size}")
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF bind snapshots") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db10")
    spark.sql("CREATE TABLE graft.db10.t (id BIGINT, s STRING)")     // v0
    spark.sql("INSERT INTO graft.db10.t VALUES (1, 'a')")            // v1
    spark.sql("INSERT INTO graft.db10.t VALUES (2, 'b'), (3, 'c')")  // v2
    assert(spark.sql("SELECT COUNT(*) FROM graft.db10.t").head().getLong(0) === 3L)
    assert(spark.sql("SELECT COUNT(*) FROM graft.db10.t VERSION AS OF 1")
      .head().getLong(0) === 1L)
    assert(spark.sql("SELECT COUNT(*) FROM graft.db10.t VERSION AS OF 0")
      .head().getLong(0) === 0L)
    // TIMESTAMP AS OF: v1's commit instant (UTC session zone, millis
    // precision) resolves to exactly v1
    val t = s"$warehouse/db10/t"
    val v1ts = DeltaTable.describeHistory(spark, t)
      .find(_.version == 1L).get.timestampMs
    val lit = java.time.Instant.ofEpochMilli(v1ts)
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.db10.t TIMESTAMP AS OF '$lit'")
      .head().getLong(0) === 1L)
    // schema binds AS OF the version: evolve, then read the past
    spark.sql("ALTER TABLE graft.db10.t ADD COLUMNS (n BIGINT)")     // v3
    assert(spark.sql("SELECT * FROM graft.db10.t VERSION AS OF 2").columns.toSeq
      === Seq("id", "s"))
    // writing to a time-travel binding refuses
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.db10.t VERSION AS OF 1 VALUES (9, 'x', 0)")
    }
    assert(e != null)
  }

  test("TRUNCATE TABLE empties via deleteWhere; table and schema survive") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db3")
    spark.sql("CREATE TABLE graft.db3.t (id BIGINT)")
    spark.sql("INSERT INTO graft.db3.t VALUES (1), (2)")
    spark.sql("TRUNCATE TABLE graft.db3.t")
    assert(spark.sql("SELECT * FROM graft.db3.t").count() === 0L)
    spark.sql("INSERT INTO graft.db3.t VALUES (3)")
    assert(spark.sql("SELECT id FROM graft.db3.t").head().getLong(0) === 3L)
  }
}
