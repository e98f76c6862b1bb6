package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Shared Bloom-filter bit logic. One 64-bit input hash is expanded into
  * `numHashes` bit positions by double hashing (Kirsch–Mitzenmacher:
  * `bit_i = h1 + i·h2 mod m` preserves the false-positive bound of k
  * independent hashes): h1 is the input hash itself (callers feed
  * `xxhash64(...)`, already full-avalanche), h2 a splitmix64 re-mix forced
  * odd so it is invertible mod the power-of-two filter size.
  *
  * A Bloom filter has NO false negatives — that is the property the
  * decontamination gate relies on — and a false-positive rate of
  * ≈ (1 − e^(−kn/m))^k for n inserted keys.
  */
object Bloom {
  /** splitmix64 finalizer (same mix as [[MinHashSignature]]). */
  @inline def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  @inline def setBits(words: Array[Long], h: Long, numHashes: Int): Unit = {
    val mask = (words.length.toLong << 6) - 1 // numBits - 1, numBits = 2^j
    val h2 = mix(h) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = (h + i * h2) & mask
      words((bit >>> 6).toInt) |= (1L << (bit & 63))
      i += 1
    }
  }

  @inline def mightContain(words: Array[Long], h: Long, numHashes: Int): Boolean = {
    val mask = (words.length.toLong << 6) - 1
    val h2 = mix(h) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = (h + i * h2) & mask
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Builds a Bloom filter over a BIGINT hash column in one aggregate pass:
  * `bloom_agg(xxhash64(key), numBits, numHashes) → array<bigint>` of
  * numBits/64 words. Partial buffers merge by bitwise OR (associative and
  * idempotent), so map-side combine works and the shuffle carries one
  * fixed-size bit array per partition regardless of row count.
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"bloom_agg: numBits must be a power of two >= 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"bloom_agg: numHashes must be in [1, 16], got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires a BIGINT key hash, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits >>> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.setBits(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length >>> 3)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "bloom_agg"
}

/** `bloom_hits(array<string>) → int`: how many elements of the input array
  * might be in the plan-constant Bloom filter. The filter rides as ONE
  * reference object inside the generated code (the [[NearestCentroids]]
  * pattern — plan size is O(1) in the filter size), and each element is
  * hashed with the SAME function the build side used (`XXH64` seed 42 —
  * bit-identical to the `xxhash64` builtin), so build and probe agree and
  * the no-false-negative property holds end-to-end.
  *
  * NULL array → NULL; NULL elements count as misses (a NULL shingle can't
  * have been inserted — `xxhash64` of the build column would skip it).
  */
case class BloomHits(child: Expression, bloom: Array[Long], numHashes: Int)
    extends UnaryExpression {

  require(bloom.nonEmpty && (bloom.length & (bloom.length - 1)) == 0,
    s"bloom_hits: filter word count must be a power of two, got ${bloom.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def nullable: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bloom_hits"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val s = a.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        if (Bloom.mightContain(bloom, h, numHashes)) hits += 1
      }
      i += 1
    }
    hits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val words = ctx.addReferenceObj("bloomWords", bloom, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val z = ctx.freshName("z")
      val h2 = ctx.freshName("h2")
      val bit = ctx.freshName("bit")
      val mask = ctx.freshName("mask")
      val hit = ctx.freshName("hit")
      val hits = ctx.freshName("hits")
      s"""
         |final int $n = $a.numElements();
         |final long $mask = (((long) $words.length) << 6) - 1L;
         |int $hits = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    final org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    final long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |    long $z = $h;
         |    $z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |    $z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
         |    final long $h2 = ($z ^ ($z >>> 31)) | 1L;
         |    boolean $hit = true;
         |    for (int $k = 0; $k < $numHashes; $k++) {
         |      final long $bit = ($h + ((long) $k) * $h2) & $mask;
         |      if (($words[(int) ($bit >>> 6)] & (1L << ($bit & 63L))) == 0L) {
         |        $hit = false;
         |        break;
         |      }
         |    }
         |    if ($hit) $hits++;
         |  }
         |}
         |${ev.value} = $hits;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomHits =
    copy(child = newChild)
}

/** `bloom_contains(keyHash) → boolean`: membership probe of a single
  * BIGINT key hash against a plan-constant Bloom filter — the scalar
  * sibling of [[BloomHits]], used for runtime-filter semi-join reduction
  * ([[graft.operators.RuntimeFilter]]). Same double-hashing scheme as
  * [[BloomFilterAgg]]; feed it the same `xxhash64(key)` the build side
  * aggregated. NULL → NULL (a NULL key joins nothing). */
case class BloomContains(child: Expression, bloom: Array[Long], numHashes: Int)
    extends UnaryExpression {

  require(bloom.nonEmpty && (bloom.length & (bloom.length - 1)) == 0,
    s"bloom_contains: filter word count must be a power of two, got ${bloom.length}")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT key hash, got ${child.dataType.catalogString}")

  override def nullable: Boolean = child.nullable
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_contains"

  override def nullSafeEval(v: Any): Any =
    Bloom.mightContain(bloom, v.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val words = ctx.addReferenceObj("bloomWords", bloom, "long[]")
    nullSafeCodeGen(ctx, ev, h => {
      val k = ctx.freshName("k")
      val z = ctx.freshName("z")
      val h2 = ctx.freshName("h2")
      val bit = ctx.freshName("bit")
      val mask = ctx.freshName("mask")
      val hit = ctx.freshName("hit")
      s"""
         |final long $mask = (((long) $words.length) << 6) - 1L;
         |long $z = $h;
         |$z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
         |final long $h2 = ($z ^ ($z >>> 31)) | 1L;
         |boolean $hit = true;
         |for (int $k = 0; $k < $numHashes; $k++) {
         |  final long $bit = ($h + ((long) $k) * $h2) & $mask;
         |  if (($words[(int) ($bit >>> 6)] & (1L << ($bit & 63L))) == 0L) {
         |    $hit = false;
         |    break;
         |  }
         |}
         |${ev.value} = $hit;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}
