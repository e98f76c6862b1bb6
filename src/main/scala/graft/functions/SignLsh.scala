package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** All sign-LSH table codes for one vector in a single codegen'd pass:
  * `sign_lsh_codes(v) → array<int>` of `planes.length / nBits` codes, where
  * code `t` packs the sign bits of `v · planes[t*nBits + b]`.
  *
  * Replaces the composed form (`nTables × nBits` separate [[DotProductF64]]
  * expressions, each carrying its own dim-element literal array, summed
  * through `when/shiftleft` trees): the expression count and analyzed-plan
  * size stayed O(tables × bits × dim) there — ~160 literal arrays at the
  * q38 config — which costs real driver time in analysis/codegen and grows
  * with the table count. Here the hyperplane matrix is ONE plan-constant
  * reference object and the generated code is a tight triple loop.
  *
  * Bit-exactness contract (the recall-gate oracles depend on it): each
  * projection accumulates left-to-right in doubles — the identical IEEE op
  * sequence as the [[DotProductF64]] form it replaces — and a bit is set
  * iff the projection is strictly positive. A NULL input array yields NULL;
  * a length-mismatched or null-element vector yields all-zero codes
  * (exactly what the when/otherwise composition produced from NULL dots).
  */
case class SignLshCodes(child: Expression, planes: Array[Array[Double]], nBits: Int)
    extends UnaryExpression {

  private def dim: Int = planes(0).length
  private def nTables: Int = planes.length / nBits
  @transient private lazy val flat: Array[Double] = planes.flatten

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint|double> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sign_lsh_codes"

  private def elemT: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val codes = new Array[Int](nTables)
    var ok = n == dim
    var i = 0
    while (ok && i < n) { if (a.isNullAt(i)) ok = false; i += 1 }
    if (ok) {
      var t = 0
      while (t < nTables) {
        var code = 0
        var b = 0
        while (b < nBits) {
          var acc = 0.0
          val off = (t * nBits + b) * dim
          var j = 0
          while (j < n) {
            val x = elemT match {
              case LongType => a.getLong(j).toDouble
              case _ => a.getDouble(j)
            }
            acc += x * flat(off + j)
            j += 1
          }
          if (acc > 0) code |= (1 << b)
          b += 1
        }
        codes(t) = code
        t += 1
      }
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("lshPlanes", flat, "double[]")
    val get = elemT match {
      case LongType => (arr: String, i: String) => s"$arr.getLong($i)"
      case _ => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val codes = ctx.freshName("codes")
      val ok = ctx.freshName("ok")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val acc = ctx.freshName("acc")
      val off = ctx.freshName("off")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val code = ctx.freshName("code")
      s"""
         |final int $n = $a.numElements();
         |final int[] $codes = new int[$nTables];
         |boolean $ok = ($n == $dim);
         |if ($ok) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { $ok = false; break; }
         |  }
         |}
         |if ($ok) {
         |  for (int $t = 0; $t < $nTables; $t++) {
         |    int $code = 0;
         |    for (int $b = 0; $b < $nBits; $b++) {
         |      double $acc = 0.0;
         |      final int $off = ($t * $nBits + $b) * $dim;
         |      for (int $j = 0; $j < $n; $j++) {
         |        $acc += ((double) ${get(a, j)}) * $flatRef[$off + $j];
         |      }
         |      if ($acc > 0) $code |= (1 << $b);
         |    }
         |    $codes[$t] = $code;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshCodes =
    copy(child = newChild)
}
