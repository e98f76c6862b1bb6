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

  test("sign_lsh_codes == independent per-plane projection, codegen == interpreted") {
    import org.apache.spark.sql.graft.{ColumnBridge => CB}
    val nBits = 5
    val nTables = 4
    val dim = 64
    // the SAME seeded planes VectorSearch uses (seed = table * 1024 + bit)
    def plane(seed: Int): Array[Double] = {
      val rnd = new scala.util.Random(seed * 1000003L + 7)
      Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
    }
    val planes = Array.tabulate(nTables * nBits)(i =>
      plane((i / nBits) * 1024 + (i % nBits)))
    val rows = emb.limit(50)
      .select(col("v"),
        CB.column(SignLshCodes(CB.expression(col("v")), planes, nBits)).as("codes"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Long](0).toArray
      val codes = r.getSeq[Int](1)
      assert(codes.length === nTables)
      // reference: independent left-to-right double projection per plane
      val expected = (0 until nTables).map { t =>
        (0 until nBits).foldLeft(0) { (code, b) =>
          var acc = 0.0
          val p = planes(t * nBits + b)
          var j = 0
          while (j < dim) { acc += v(j).toDouble * p(j); j += 1 }
          if (acc > 0) code | (1 << b) else code
        }
      }
      assert(codes === expected)
    }
    // interpreted eval path (outside codegen) agrees with itself and the
    // null/mismatch contract: null array → null; wrong length → zero codes
    val e = SignLshCodes(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1L, 2L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false)),
      planes, nBits)
    val out = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(out.toIntArray().toSeq === Seq.fill(nTables)(0))
  }

  test("nearest_centroids == independent (distance, index) sort; ties to lower index") {
    import org.apache.spark.sql.graft.{ColumnBridge => CB}
    val dim = 64
    val k = 8
    val nProbe = 3
    // deterministic centroids spread over the embedding space
    val cents = Array.tabulate(k)(c =>
      Array.tabulate(dim)(j => math.sin(c * 131 + j * 17).abs))
    val rows = emb.limit(50)
      .select(col("vd"),
        CB.column(NearestCentroids(CB.expression(col("vd")), cents, nProbe)).as("cells"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Double](0).toArray
      val cells = r.getSeq[Int](1)
      val expected = (0 until k).map { c =>
        var acc = 0.0
        var j = 0
        while (j < dim) { val d = v(j) - cents(c)(j); acc += d * d; j += 1 }
        (acc, c)
      }.sorted.take(nProbe).map(_._2)
      assert(cells === expected)
    }
    // a centroid grid with exact ties must break toward the lower index
    val tieCents = Array(Array.fill(dim)(0.5), Array.fill(dim)(0.5), Array.fill(dim)(9.0))
    val e = NearestCentroids(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array.fill(dim)(0.25), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false)),
      tieCents, 2)
    val out = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(out.toIntArray().toSeq === Seq(0, 1))
    // a NaN vector element makes every distance NaN → NULL, not a crash
    val nan = NearestCentroids(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array.fill(dim)(0.25).updated(0, Double.NaN),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false)),
      tieCents, 2)
    assert(nan.eval(null) == null)
  }
}
