package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen kernels for product quantization ([[graft.operators.PqSearch]]).
  *
  * The composed higher-order-function forms (`transform`/`aggregate`
  * lambdas over the centroid literals) run INTERPRETED per element —
  * m × kc × dsub interpreted ops per corpus vector for encoding and m per
  * scored pair, which dominates the O(corpus) encode and O(queries ×
  * corpus) scoring scans (the same reason [[DotProductI64]] and
  * [[NearestCentroids]] exist). Here the codebook is ONE plan-constant
  * `long[]` reference object and the generated code is flat primitive
  * loops.
  *
  * All arithmetic is exact 64-bit integer (|x| < 2^24 ⇒ per-subspace
  * squared distances < 2^53, m-subspace sums < 2^56) and argmin ties
  * break toward the LOWER centroid id — the contract q77's DuckDB oracle
  * replays bit-for-bit.
  */
private[graft] object PqKernels {
  /** Flatten m × kc × dsub to index ((j*kc)+c)*dsub + i. */
  def flatten(cents: Array[Array[Array[Long]]]): Array[Long] =
    cents.flatten.flatten
}

/** `pq_encode(v) → array<int>`: per subspace j, the id of the centroid
  * minimizing the exact integer squared distance (first minimum wins). */
case class PqEncode(child: Expression, cents: Array[Array[Array[Long]]])
    extends UnaryExpression {

  private def m: Int = cents.length
  private def kc: Int = cents(0).length
  private def dsub: Int = cents(0)(0).length
  @transient private lazy val flat: Array[Long] = PqKernels.flatten(cents)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.catalogString}")
  }

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != m * dsub) return null
    var i = 0
    while (i < m * dsub) { if (a.isNullAt(i)) return null; i += 1 }
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < kc) {
        val off = (j * kc + c) * dsub
        var acc = 0L
        var t = 0
        while (t < dsub) {
          val d = a.getLong(j * dsub + t) - flat(off + t)
          acc += d * d
          t += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqCents", flat, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val ok = ctx.freshName("ok")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bd = ctx.freshName("bd")
      s"""
         |boolean $ok = ($a.numElements() == ${m * dsub});
         |if ($ok) {
         |  for (int $i = 0; $i < ${m * dsub}; $i++) {
         |    if ($a.isNullAt($i)) { $ok = false; break; }
         |  }
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int[] $out = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    int $best = 0;
         |    long $bd = Long.MAX_VALUE;
         |    for (int $c = 0; $c < $kc; $c++) {
         |      final int $off = ($j * $kc + $c) * $dsub;
         |      long $acc = 0L;
         |      for (int $t = 0; $t < $dsub; $t++) {
         |        final long $d = $a.getLong($j * $dsub + $t) - $flatRef[$off + $t];
         |        $acc += $d * $d;
         |      }
         |      if ($acc < $bd) { $bd = $acc; $best = $c; }
         |    }
         |    $out[$j] = $best;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_adc_lut(v) → array<array<bigint>>`: the query's asymmetric-distance
  * lookup table — exact integer squared distance from each subspace of `v`
  * to every centroid (m rows × kc entries). */
case class PqAdcLut(child: Expression, cents: Array[Array[Array[Long]]])
    extends UnaryExpression {

  private def m: Int = cents.length
  private def kc: Int = cents(0).length
  private def dsub: Int = cents(0)(0).length
  @transient private lazy val flat: Array[Long] = PqKernels.flatten(cents)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.catalogString}")
  }

  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_adc_lut"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != m * dsub) return null
    var i = 0
    while (i < m * dsub) { if (a.isNullAt(i)) return null; i += 1 }
    val rows = new Array[Any](m)
    var j = 0
    while (j < m) {
      val row = new Array[Long](kc)
      var c = 0
      while (c < kc) {
        val off = (j * kc + c) * dsub
        var acc = 0L
        var t = 0
        while (t < dsub) {
          val d = a.getLong(j * dsub + t) - flat(off + t)
          acc += d * d
          t += 1
        }
        row(c) = acc
        c += 1
      }
      rows(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(rows)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqCents", flat, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val ok = ctx.freshName("ok")
      val i = ctx.freshName("i")
      val rows = ctx.freshName("rows")
      val row = ctx.freshName("row")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |boolean $ok = ($a.numElements() == ${m * dsub});
         |if ($ok) {
         |  for (int $i = 0; $i < ${m * dsub}; $i++) {
         |    if ($a.isNullAt($i)) { $ok = false; break; }
         |  }
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  final Object[] $rows = new Object[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    final long[] $row = new long[$kc];
         |    for (int $c = 0; $c < $kc; $c++) {
         |      final int $off = ($j * $kc + $c) * $dsub;
         |      long $acc = 0L;
         |      for (int $t = 0; $t < $dsub; $t++) {
         |        final long $d = $a.getLong($j * $dsub + $t) - $flatRef[$off + $t];
         |        $acc += $d * $d;
         |      }
         |      $row[$c] = $acc;
         |    }
         |    $rows[$j] = new org.apache.spark.sql.catalyst.util.GenericArrayData($row);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($rows);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcLut =
    copy(child = newChild)
}

/** `pq_adc_score(codes, luts) → bigint`: Σ_j luts[j][codes[j]] — the
  * per-(query, vector) ADC distance, the innermost op of the O(queries ×
  * corpus) scoring scan. */
case class PqAdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<array<bigint>>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(codesAny: Any, lutsAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val luts = lutsAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (luts.numElements() != m) return null
    var acc = 0L
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j) || luts.isNullAt(j)) return null
      val row = luts.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
      acc += row.getLong(c)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, luts) => {
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      s"""
         |final int $m = $codes.numElements();
         |if ($luts.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |    if ($codes.isNullAt($j) || $luts.isNullAt($j)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      final org.apache.spark.sql.catalyst.util.ArrayData $row = $luts.getArray($j);
         |      final int $c = $codes.getInt($j);
         |      if ($c < 0 || $c >= $row.numElements() || $row.isNullAt($c)) {
         |        ${ev.isNull} = true;
         |      } else {
         |        $acc += $row.getLong($c);
         |      }
         |    }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}
