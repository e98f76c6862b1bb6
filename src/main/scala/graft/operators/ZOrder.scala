package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the lakehouse `OPTIMIZE ... ZORDER BY`
  * layout operator (the reference's Delta maintenance story;
  * `/root/reference/spark/SaveDelta.scala` writes Delta but never
  * re-clusters). Interleaving the bits of two sort dimensions gives every
  * output file a BOUNDED min/max range in BOTH dimensions (~1/√nFiles of
  * the domain each), so parquet row-group statistics prune scans filtered
  * on either column — a linear sort gives locality in its leading column
  * only and leaves the other spanning the full domain in every file.
  *
  * All plain codegen built-ins (shifts + masks — the standard magic-number
  * bit spread), so the z-value costs a few ALU ops per row and the layout
  * pass is exactly one range exchange + local sort, the same cost class as
  * `orderBy`.
  */
object ZOrder {

  /** Bit-spread of the low 31 bits: b30..b0 → even bit positions. 31 and
    * not 32 so that `b`'s top spread bit lands in bit 62, never the sign
    * bit — an out-of-contract input degrades locality but can never flip
    * the code negative (which would range-sort FIRST and silently
    * scatter the curve). */
  private def spread(c: Column): Column = {
    val masks = Seq(
      (16, 0x0000FFFF0000FFFFL), (8, 0x00FF00FF00FF00FFL),
      (4, 0x0F0F0F0F0F0F0F0FL), (2, 0x3333333333333333L),
      (1, 0x5555555555555555L))
    masks.foldLeft(c.bitwiseAND(lit(0x7FFFFFFFL))) { case (x, (s, m)) =>
      (x.bitwiseOR(shiftleft(x, s))).bitwiseAND(lit(m))
    }
  }

  /** Morton code of two non-negative dimensions (each < 2³¹, masked;
    * callers bucket/quantize wider domains first — rank or hash, as with
    * any z-order implementation). `a` occupies even bits, `b` odd. */
  def zvalue(a: Column, b: Column): Column =
    spread(a.cast("long")).bitwiseOR(shiftleft(spread(b.cast("long")), 1))

  /** Morton code of 2–6 dimensions — the general `ZORDER BY (c1, …, ck)`
    * form. Dimension j contributes bit b at position `b·k + j`; each
    * dimension keeps its low `62/k` bits (inputs are masked, so wider
    * values must be rank/hash-quantized first, as with any z-order).
    * For k = 2 this produces exactly [[zvalue]]'s layout on in-range
    * inputs (spec-pinned); the per-bit construction costs ~62 bitwise
    * ops — constant-folded into codegen, still a few ALU ops per row. */
  def zvalueN(cols: Seq[Column]): Column = {
    val k = cols.length
    require(k >= 2 && k <= 6, s"zvalueN supports 2-6 dims, got $k")
    val bitsPerDim = 62 / k
    cols.zipWithIndex.map { case (c, j) =>
      val x = c.cast("long").bitwiseAND(lit((1L << bitsPerDim) - 1))
      (0 until bitsPerDim).map { b =>
        shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), b * k + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Rewrites `df` into `nFiles` range partitions of the z-curve, each
    * locally sorted — the write-side layout pass. Files then carry tight
    * min/max bounds on BOTH `a` and `b`. */
  def layout(df: DataFrame, a: Column, b: Column, nFiles: Int): DataFrame =
    layoutN(df, Seq(a, b), nFiles)

  /** [[layout]] over 2–6 dimensions via [[zvalueN]]. */
  def layoutN(df: DataFrame, cols: Seq[Column], nFiles: Int): DataFrame = {
    require(nFiles > 0, s"nFiles=$nFiles must be > 0")
    require(!df.columns.contains("__z"),
      "input already has a '__z' column — rename it first")
    val z = (if (cols.length == 2) zvalue(cols(0), cols(1))
      else zvalueN(cols)).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
