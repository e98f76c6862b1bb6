package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  /** Reference Morton interleave, bit by bit. */
  private def morton(a: Long, b: Long): Long =
    (0 until 32).foldLeft(0L) { (z, i) =>
      z | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
    }

  test("zvalue == bitwise reference on corners and seeded random pairs") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (Int.MaxValue.toLong, 0L), (0L, Int.MaxValue.toLong)) ++
      (1 to 200).map(_ => (rnd.nextInt(Int.MaxValue).toLong,
        rnd.nextInt(Int.MaxValue).toLong))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zvalue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) === morton(a, b), s"($a,$b)")
    }
  }

  test("z-order layout bounds per-file min/max in BOTH dims; linear sort does not") {
    // uniform 64×64 grid: the quantized two-dimensional key space
    val grid = (for (a <- 0 until 64; b <- 0 until 64)
      yield (a.toLong, b.toLong, a.toLong * 64 + b)).toSeq
      .toDF("a", "b", "payload")

    def fileWidths(dir: String): (Double, Double) = {
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name()).agg(
          (max("a") - min("a")).as("wa"), (max("b") - min("b")).as("wb"))
        .collect()
      (stats.map(_.getLong(1)).sum.toDouble / stats.length,
        stats.map(_.getLong(2)).sum.toDouble / stats.length)
    }

    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrder.layout(grid, col("a"), col("b"), nFiles = 16)
      .write.mode("overwrite").parquet(zDir)
    val linDir = java.nio.file.Files.createTempDirectory("linear").toString
    grid.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(linDir)

    val (za, zb) = fileWidths(zDir)
    val (la, lb) = fileWidths(linDir)
    // linear: tight on the leading dim, but every file spans ~the whole
    // b domain; z-order: BOTH dims bounded well below the domain width
    assert(lb > 55, s"linear files should span b: avg width $lb")
    assert(za < 32 && zb < 32, s"z-order files too wide: a=$za b=$zb")
    assert(zb < lb / 2, s"z-order b width $zb not better than linear $lb")
    assert(la < 8, s"sanity: linear leading-dim width $la")
  }

  /** Reference k-dim Morton: dim j's bit b lands at b·k + j. */
  private def mortonN(vs: Seq[Long], bitsPerDim: Int): Long = {
    val k = vs.length
    vs.zipWithIndex.foldLeft(0L) { case (z, (v, j)) =>
      (0 until bitsPerDim).foldLeft(z) { (acc, b) =>
        acc | ((v >> b) & 1L) << (b * k + j)
      }
    }
  }

  test("zvalueN matches the k-dim reference, and agrees with zvalue at k=2") {
    val rnd = new scala.util.Random(11)
    val triples = (1 to 150).map(_ => (rnd.nextInt(1 << 20).toLong,
      rnd.nextInt(1 << 20).toLong, rnd.nextInt(1 << 20).toLong))
    val got3 = triples.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        ZOrder.zvalueN(Seq(col("a"), col("b"), col("c"))).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    triples.foreach { case (a, b, c) =>
      assert(got3((a, b, c)) === mortonN(Seq(a, b, c), 62 / 3), s"($a,$b,$c)")
    }
    // k=2 bit layout is identical to the 2-D fast path on in-range values
    val pairs = (1 to 100).map(_ => (rnd.nextInt(1 << 30).toLong,
      rnd.nextInt(1 << 30).toLong))
    val agree = pairs.toDF("a", "b")
      .select((ZOrder.zvalueN(Seq(col("a"), col("b")))
        === ZOrder.zvalue(col("a"), col("b"))).as("ok"))
      .collect().forall(_.getBoolean(0))
    assert(agree)
  }

  test("out-of-contract inputs can degrade locality but never go negative") {
    // bit 31 set (documented domain is < 2^31): the code must stay
    // non-negative — a negative Morton code would range-sort FIRST and
    // silently scatter the curve
    val vals = Seq((1L << 31, 0L), (0L, 1L << 31), ((1L << 32) - 1, (1L << 32) - 1))
    val zs = vals.toDF("a", "b")
      .select(ZOrder.zvalue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    assert(zs.forall(_ >= 0L), zs.mkString(","))
  }

  test("layout rejects a pre-existing __z column instead of destroying it") {
    val df = Seq((1L, 2L, 3L)).toDF("a", "b", "__z")
    intercept[IllegalArgumentException](
      ZOrder.layout(df, col("a"), col("b"), nFiles = 2))
  }

  test("layout preserves rows exactly") {
    val df = (0 until 500).map(i => (i.toLong % 37, i.toLong % 23, i.toLong))
      .toDF("a", "b", "payload")
    val out = ZOrder.layout(df, col("a"), col("b"), nFiles = 4)
    assert(out.count() === 500)
    assert(out.exceptAll(df).isEmpty && df.exceptAll(out).isEmpty)
  }
}
