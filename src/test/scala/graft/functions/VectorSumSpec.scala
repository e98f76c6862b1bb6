package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge => CB}

import graft.SparkSpec
import graft.Tables.table
import graft.operators.IvfSearch

class VectorSumSpec extends SparkSpec {

  import spark.implicits._

  private def vsum(rows: Seq[Seq[Double]], dim: Int, parts: Int = 4): Seq[Double] =
    rows.map(Tuple1(_)).toDF("v").repartition(parts)
      .agg(CB.column(VectorSumAgg(CB.expression(col("v")), dim)
        .toAggregateExpression()).as("s"))
      .head().getSeq[Double](0)

  test("vector_sum == elementwise driver sum across partitions") {
    val rows = (0 until 500).map(i => Seq((i % 7).toDouble, (i % 3).toDouble, i.toDouble))
    val want = (0 until 3).map(d => rows.map(_(d)).sum)
    assert(vsum(rows, 3, parts = 8) === want)
  }

  test("vector_sum is SQL-registered via the session extension") {
    Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)).map(Tuple1(_)).toDF("v")
      .createOrReplaceTempView("vs_in")
    val got = spark.sql("SELECT vector_sum(v, 2) AS s FROM vs_in")
      .head().getSeq[Double](0)
    assert(got === Seq(4.0, 6.0))
  }

  test("null rows are skipped; wrong-length vectors fail loudly") {
    val withNull = Seq(Some(Seq(1.0, 2.0)), None, Some(Seq(3.0, 4.0))).toDF("v")
      .agg(CB.column(VectorSumAgg(CB.expression(col("v")), 2)
        .toAggregateExpression()).as("s"))
      .head().getSeq[Double](0)
    assert(withNull === Seq(4.0, 6.0))
    val bad = intercept[Exception] {
      Seq(Seq(1.0), Seq(1.0, 2.0)).map(Tuple1(_)).toDF("v")
        .agg(CB.column(VectorSumAgg(CB.expression(col("v")), 2)
          .toAggregateExpression()).as("s"))
        .collect()
    }
    assert(bad.getMessage.contains("vector_sum") ||
      bad.getCause != null && bad.getCause.getMessage.contains("vector_sum"))
  }

  // --- distributed Lloyd refinement ------------------------------------------

  lazy val base = {
    val emb = table(spark, sfDir, "embeddings")
    graft.operators.VectorSearch.withNorm(emb)
      .select(expr("transform(v, x -> cast(x as double))").as("vd"))
  }

  test("distributed refineCentroids == driver-side Lloyd from the same init") {
    val vecs = base.collect().map(_.getSeq[Double](0).toArray)
    assert(vecs.nonEmpty)
    val dim = vecs.head.length
    val k = 8
    val init = Array.tabulate(k)(i => vecs((i * vecs.length / k) % vecs.length).clone())

    // driver reference: literal Lloyd, empty cells keep their centroid,
    // ties toward the lower cell — the kernel's contract
    def driverIter(cents: Array[Array[Double]]): Array[Array[Double]] = {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      vecs.foreach { v =>
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < k) {
          var s = 0.0; var i = 0
          while (i < dim) { val d = v(i) - cents(c)(i); s += d * d; i += 1 }
          if (s < bd) { bd = s; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      Array.tabulate(k)(c => if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c)))
    }
    val want = driverIter(driverIter(init.map(_.clone())))
    val got = IvfSearch.refineCentroids(base, init.map(_.clone()), iters = 2)
    // integer-valued embeddings → order-exact double sums → bit equality
    assert(got.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
  }

  test("refinement does not increase the k-means objective") {
    val vecs = base.collect().map(_.getSeq[Double](0).toArray)
    val k = 8
    val init = Array.tabulate(k)(i => vecs((i * vecs.length / k) % vecs.length).clone())
    def objective(cents: Array[Array[Double]]): Double =
      vecs.map { v =>
        cents.map { c =>
          var s = 0.0; var i = 0
          while (i < v.length) { val d = v(i) - c(i); s += d * d; i += 1 }
          s
        }.min
      }.sum
    val refined = IvfSearch.refineCentroids(base, init.map(_.clone()), iters = 3)
    assert(objective(refined) <= objective(init) + 1e-9,
      s"objective rose: ${objective(init)} -> ${objective(refined)}")
  }
}
