package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd array dot products / squared distance — the inner kernels of
  * every similarity operator (SURVEY §2.10 extension).
  *
  * Spark's higher-order functions (`aggregate(zip_with(...))`) are
  * INTERPRETED: each element allocates lambda-variable holders and walks an
  * expression tree, and the surrounding operator falls out of whole-stage
  * codegen. For an O(candidates × dim) kernel that interpretation is the
  * dominant cost at scale. These expressions generate a tight primitive
  * loop instead and keep the enclosing operator inside codegen.
  *
  * Null semantics intentionally match the `aggregate(zip_with(...))` forms
  * they replace: NULL input array, mismatched lengths (zip_with pads), or
  * any NULL element → NULL result — so swapping them into oracle-checked
  * queries changes nothing but speed.
  */
abstract class ArrayPairFold extends BinaryExpression {
  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullable: Boolean = true

  protected def checkArrayArgs(allowed: Set[DataType]): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(t, _) => allowed.contains(t)
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint|double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  /** java getter snippet for element i of an array of the given type. */
  protected def getter(arr: String, t: DataType, i: String): String = t match {
    case LongType => s"$arr.getLong($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  protected def read(a: ArrayData, t: DataType, i: Int): Double = t match {
    case LongType => a.getLong(i).toDouble
    case DoubleType => a.getDouble(i)
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }
}

/** Exact 64-bit integer dot product: `dot_i64(array<bigint>, array<bigint>)
  * → bigint`. Replaces the HOF form in the oracle-exact cosine paths
  * (scaled-integer embeddings: |x| < 2^23 ⇒ 64-element sums < 2^52, no
  * overflow). */
case class DotProductI64(left: Expression, right: Expression) extends ArrayPairFold {

  override def checkInputDataTypes(): TypeCheckResult = checkArrayArgs(Set(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_i64"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductI64 =
    copy(left = newLeft, right = newRight)
}

/** Double-accumulated dot product over bigint/double arrays (mixable):
  * `dot_f64(a, b) → double`. Left-to-right accumulation — the same IEEE op
  * sequence as the sequential `aggregate` fold it replaces, so results are
  * bit-identical. Used by the approximate re-rank paths and sign-LSH
  * projections. */
case class DotProductF64(left: Expression, right: Expression) extends ArrayPairFold {

  override def checkInputDataTypes(): TypeCheckResult =
    checkArrayArgs(Set(LongType, DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f64"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += read(a, ta, i) * read(b, tb, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val ga = getter(a, elemType(left), i)
      val gb = getter(b, elemType(right), i)
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $ga) * ((double) $gb);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF64 =
    copy(left = newLeft, right = newRight)
}

/** Squared euclidean distance over bigint/double arrays:
  * `sqdist_f64(a, b) → double` — the IVF assignment/probe kernel.
  * Accumulation order and op sequence match
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0d, (acc,x) -> acc+x)`. */
case class SqDistF64(left: Expression, right: Expression) extends ArrayPairFold {

  override def checkInputDataTypes(): TypeCheckResult =
    checkArrayArgs(Set(LongType, DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sqdist_f64"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = read(a, ta, i) - read(b, tb, i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val ga = getter(a, elemType(left), i)
      val gb = getter(b, elemType(right), i)
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $d = ((double) $ga) - ((double) $gb);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistF64 =
    copy(left = newLeft, right = newRight)
}
