package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingling kernels.
  *
  * Round-19 optimization (guide §1.2 step 2 / §4): the shingle relation is
  * the hottest scan of the whole text-dedup family (q19/q51/q52/q63/q65/
  * q66), and it was built with
  * `array_distinct(transform(sequence(0, size(w)-n), i -> concat_ws(' ',
  * slice(w, i+1, n))))` — a higher-order-function chain Catalyst evaluates
  * INTERPRETED (lambda functions have no codegen), allocating a sequence
  * array, n-element slice arrays and a lambda frame per position, then an
  * O(len²)-ish distinct pass, per document. These kernels compute the same
  * values in one compiled loop each.
  *
  * Semantics are pinned by `ShinglesSpec` against the original SQL
  * expression: identical distinct set, identical first-occurrence order,
  * identical handling of empty strings (kept — `split` produces them on
  * repeated separators) and of n > size(w) (empty result; the SQL form
  * errored on that input, every caller filters `size(w) >= n` first).
  */
object ShingleKernel {
  private val SEP = UTF8String.fromString(" ")

  /** Distinct word n-grams of `w` in first-occurrence order — exactly
    * `array_distinct(transform(sequence(0, size(w)-n), i ->
    * concat_ws(' ', slice(w, i+1, n))))` for size(w) >= n. */
  def distinct(a: ArrayData, n: Int): ArrayData = {
    val sz = a.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](math.max(8, (sz - n + 1) * 2))
    val parts = new Array[UTF8String](n)
    var i = 0
    val last = sz - n
    while (i <= last) {
      var j = 0
      while (j < n) { parts(j) = a.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(SEP, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size)).asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }

  /** How many of the word n-grams of `w` (counted WITH multiplicity —
    * see [[ShingleBloomHits]] for why that is sound) might be in the
    * Bloom filter. Builds each shingle's bytes in a reused buffer — no
    * per-shingle string allocation — and hashes with the same
    * `xxhash64`-of-the-concatenated-string the build side aggregates, so
    * build and probe agree byte-for-byte. */
  def bloomHits(a: ArrayData, n: Int, bloom: Array[Long], numHashes: Int): Int = {
    val sz = a.numElements()
    if (sz < n) return 0
    var buf = new Array[Byte](128)
    var hits = 0
    var i = 0
    val last = sz - n
    while (i <= last) {
      var off = 0
      var j = 0
      var first = true
      while (j < n) {
        val s = a.getUTF8String(i + j)
        if (s != null) { // split() never yields nulls; concat_ws skips them
          val nb = s.numBytes
          if (off + nb + 1 > buf.length) {
            val grown = new Array[Byte](math.max(buf.length * 2, off + nb + 1))
            System.arraycopy(buf, 0, grown, 0, off)
            buf = grown
          }
          if (!first) { buf(off) = ' '; off += 1 }
          s.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + off)
          off += nb
          first = false
        }
        j += 1
      }
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, off, 42L)
      if (Bloom.mightContain(bloom, h, numHashes)) hits += 1
      i += 1
    }
    hits
  }
}

/** `shingle_array(w array<string>, n)` → the distinct word n-grams of `w`
  * in first-occurrence order, one compiled loop per row (replaces the
  * interpreted transform/slice/concat_ws/array_distinct chain — see
  * [[ShingleKernel]]). */
case class ShingleArray(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle_array: n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_array"

  override def nullSafeEval(v: Any): Any =
    ShingleKernel.distinct(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleKernel.distinct($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

/** `shingle_bloom_hits(w array<string>) → int`: how many word n-grams of
  * `w` might be in the plan-constant Bloom filter — the fused form of
  * `BloomHits(ShingleArray(w))` that never materializes the shingle
  * strings (one reused byte buffer, zero allocation per shingle).
  *
  * Counts WITH multiplicity where the unfused form counted distinct
  * shingles. For the decontamination gate this is still a sound (and
  * only trivially looser) bound: a doc's true overlap with any eval doc
  * counts DISTINCT shared shingles ≤ distinct Bloom hits ≤ hits with
  * multiplicity, so every doc the gate drops still had < minOverlap
  * overlap with every eval doc — the no-false-negative property the
  * exact verify join relies on is untouched, and the verify reproduces
  * the exact result on the (at most trivially wider) survivor set.
  */
case class ShingleBloomHits(child: Expression, n: Int, bloom: Array[Long],
                            numHashes: Int) extends UnaryExpression {
  require(n >= 1, s"shingle_bloom_hits: n must be >= 1, got $n")
  require(bloom.nonEmpty && (bloom.length & (bloom.length - 1)) == 0,
    s"shingle_bloom_hits: filter word count must be a power of two, got ${bloom.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def nullable: Boolean = child.nullable
  override def dataType: DataType = IntegerType
  override def prettyName: String = "shingle_bloom_hits"

  override def nullSafeEval(v: Any): Any =
    ShingleKernel.bloomHits(v.asInstanceOf[ArrayData], n, bloom, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val words = ctx.addReferenceObj("bloomWords", bloom, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleKernel.bloomHits($a, $n, $words, $numHashes);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleBloomHits =
    copy(child = newChild)
}
