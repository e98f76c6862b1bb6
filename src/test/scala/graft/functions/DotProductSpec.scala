package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables.table

/** The codegen dot/sqdist kernels must be drop-in replacements for the
  * interpreted `aggregate(zip_with(...))` forms: identical values
  * (bit-identical doubles — same op sequence), identical null semantics. */
class DotProductSpec extends SparkSpec {

  private lazy val emb = table(spark, sfDir, "embeddings")
    .withColumn("v", expr(
      "transform(embedding, x -> cast(floor(cast(x as double) * 16777216.0) as bigint))"))
    .withColumn("vd", expr("transform(embedding, x -> cast(x as double))"))
    .cache()

  test("dot_i64 == interpreted HOF form on every corpus vector pair sample") {
    graft.functions.GraftFunctions.register(spark)
    val rows = emb.limit(100)
      .select(
        expr("dot_i64(v, v)").as("kernel"),
        expr("aggregate(zip_with(v, v, (x, y) -> x * y), cast(0 as bigint), (acc, x) -> acc + x)")
          .as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("dot_f64 / sqdist_f64 == interpreted forms bit-for-bit (same op order)") {
    graft.functions.GraftFunctions.register(spark)
    val rows = emb.limit(100)
      .select(
        expr("dot_f64(vd, vd)").as("dk"),
        expr("aggregate(zip_with(vd, vd, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)")
          .as("dh"),
        expr("sqdist_f64(vd, reverse(vd))").as("sk"),
        expr("aggregate(zip_with(vd, reverse(vd), (x, y) -> (x - y) * (x - y)), cast(0 as double), (acc, x) -> acc + x)")
          .as("sh"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("null semantics match zip_with padding: length mismatch or null element → null") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  dot_i64(array(1L, 2L), array(1L, 2L, 3L)) AS mismatch,
        |  dot_i64(array(1L, CAST(NULL AS BIGINT)), array(1L, 2L)) AS nullelem,
        |  dot_i64(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS nullarr,
        |  dot_f64(array(1L, 2L), array(0.5D, 0.25D)) AS mixed
        |""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getDouble(3) === 1.0)
  }

  test("type checking rejects non-array arguments at analysis") {
    graft.functions.GraftFunctions.register(spark)
    intercept[Exception] { spark.sql("SELECT dot_i64('a', 'b')").collect() }
    intercept[Exception] { spark.sql("SELECT sqdist_f64(1, 2)").collect() }
  }
}
