package graft.sources.delta

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec
import graft.sources.delta.DeltaTable.src

/** CHECK constraints over the from-scratch log (delta-spark's
  * `ALTER TABLE ADD CONSTRAINT` parity): stored as
  * `delta.constraints.<name>` table properties, validated against
  * existing rows on ADD, enforced on every write path — append,
  * overwrite, UPDATE, MERGE, the DSv2 sink — with the SQL CHECK
  * null-pass rule (only definite FALSE violates). */
class DeltaConstraintSpec extends SparkSpec {

  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("delta_chk").toString + "/t"

  private def chain(x: Throwable): String =
    if (x == null) "" else Option(x.getMessage).getOrElse("") + chain(x.getCause)

  test("ADD CONSTRAINT validates existing rows; violating data refuses") {
    val t = tmp()
    DeltaTable.write(Seq((1L, 10L), (2L, -5L)).toDF("id", "n"), t, SaveMode.Append)
    val e = intercept[IllegalArgumentException] {
      DeltaTable.addConstraint(spark, t, "positive_n", "n > 0")
    }
    assert(e.getMessage.contains("positive_n"))
    // fix the data, then the constraint lands as a table property
    DeltaTable.delete(spark, t, col("n") < 0)
    DeltaTable.addConstraint(spark, t, "positive_n", "n > 0")
    assert(DeltaLog.snapshot(spark, t).configuration
      .get("delta.constraints.positive_n").contains("n > 0"))
  }

  test("append enforces; NULL passes (SQL CHECK truth); drop lifts enforcement") {
    val t = tmp()
    DeltaTable.write(Seq((1L, Some(10L))).toDF("id", "n"), t, SaveMode.Append)
    DeltaTable.addConstraint(spark, t, "positive_n", "n > 0")
    val e = intercept[Exception] {
      DeltaTable.write(Seq((2L, Some(-1L))).toDF("id", "n"), t, SaveMode.Append)
    }
    assert(chain(e).contains("positive_n"), chain(e))
    // NULL n: constraint evaluates NULL -> satisfied, like SQL CHECK
    DeltaTable.write(Seq((3L, None: Option[Long])).toDF("id", "n"),
      t, SaveMode.Append)
    assert(DeltaTable.read(spark, t).count() === 2)
    DeltaTable.dropConstraint(spark, t, "positive_n")
    DeltaTable.write(Seq((4L, Some(-9L))).toDF("id", "n"), t, SaveMode.Append)
    assert(DeltaTable.read(spark, t).count() === 3)
  }

  test("UPDATE and MERGE enforce on the rewritten/inserted rows") {
    val t = tmp()
    DeltaTable.write(Seq((1L, 10L), (2L, 20L)).toDF("id", "n"), t, SaveMode.Append)
    DeltaTable.addConstraint(spark, t, "positive_n", "n > 0")
    val eU = intercept[Exception] {
      DeltaTable.update(spark, t, col("id") === 1L, Map("n" -> lit(-1L)))
    }
    assert(chain(eU).contains("positive_n"), chain(eU))
    val eM = intercept[Exception] {
      DeltaTable.mergeInto(Seq((9L, -3L)).toDF("id", "n"), t, "id", "id",
        matched = Seq.empty,
        notMatched = Seq(MergeClause.Insert(None,
          Map("id" -> src("id"), "n" -> src("n")))))
    }
    assert(chain(eM).contains("positive_n"), chain(eM))
    // the failed DML left no partial state behind
    assert(DeltaTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 10L), (2L, 20L)))
    // valid MERGE still lands
    DeltaTable.mergeInto(Seq((9L, 3L)).toDF("id", "n"), t, "id", "id",
      matched = Seq.empty,
      notMatched = Seq(MergeClause.Insert(None,
        Map("id" -> src("id"), "n" -> src("n")))))
    assert(DeltaTable.read(spark, t).count() === 3)
  }

  test("DSv2 sink enforces per row: batch write and streaming epoch") {
    val t = tmp()
    DeltaTable.write(Seq((1L, 10L)).toDF("id", "n"), t, SaveMode.Append)
    DeltaTable.addConstraint(spark, t, "positive_n", "n > 0")
    val eB = intercept[Exception] {
      Seq((2L, -7L)).toDF("id", "n")
        .write.format("graft-delta").mode(SaveMode.Append).save(t)
    }
    assert(chain(eB).contains("positive_n"), chain(eB))
    Seq((2L, 7L)).toDF("id", "n")
      .write.format("graft-delta").mode(SaveMode.Append).save(t)
    assert(DeltaTable.read(spark, t).count() === 2)

    // streaming epoch with a violating row fails the query loudly
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val r = java.nio.file.Files.createTempDirectory("delta_chk_s").toString
    val mem = MemoryStream[(Long, Long)]
    mem.addData((3L, -1L))
    val q = mem.toDF().toDF("id", "n")
      .writeStream.format("graft-delta")
      .option("path", t).option("checkpointLocation", s"$r/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    val eS = intercept[Exception] { q.awaitTermination(60000) }
    assert(chain(eS).contains("positive_n"), chain(eS))
    assert(DeltaTable.read(spark, t).count() === 2, "failed epoch committed nothing")
  }

  test("NOT NULL column invariant: engine append and DSv2 sink both refuse nulls") {
    val t = tmp()
    // Scala primitive columns → id is NOT NULL in the committed schema
    DeltaTable.write(Seq((1L, "a")).toDF("id", "s"), t, SaveMode.Append)
    val e = intercept[Exception] {
      DeltaTable.write(Seq((Option.empty[Long], "b")).toDF("id", "s"),
        t, SaveMode.Append)
    }
    assert(chain(e).contains("NOT NULL"), chain(e))
    val eS = intercept[Exception] {
      Seq((Option.empty[Long], "c")).toDF("id", "s")
        .write.format("graft-delta").mode(SaveMode.Append).save(t)
    }
    assert(chain(eS).contains("NOT NULL"), chain(eS))
    // nullable column s still takes NULLs; table unchanged by the failures
    DeltaTable.write(Seq((Some(2L), null: String)).toDF("id", "s"),
      t, SaveMode.Append)
    assert(DeltaTable.read(spark, t).count() === 2)
  }

  test("pure SQL: constraint via TBLPROPERTIES + CALL, enforced on INSERT") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft_wh_chk").toString
    val cat = s"gchk_${java.lang.Long.toHexString(warehouse.hashCode & 0xffffffffL)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, n BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 5)")
    spark.sql(s"CALL $cat.system.add_constraint('db.t', 'pos', 'n > 0')")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.db.t VALUES (2, -4)")
    }
    assert(chain(e).contains("pos"), chain(e))
    // the TBLPROPERTIES route validates too: a bad constraint refuses
    val e2 = intercept[Exception] {
      spark.sql(s"""ALTER TABLE $cat.db.t
                    SET TBLPROPERTIES ('delta.constraints.big' = 'n > 100')""")
    }
    assert(chain(e2).contains("big"), chain(e2))
    spark.sql(s"CALL $cat.system.drop_constraint('db.t', 'pos')")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (2, -4)")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.db.t").head().getLong(0) === 2L)
  }
}
