package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** The `nProbe` nearest centroids of a vector in one codegen'd pass:
  * `nearest_centroids(v) → array<int>` of centroid indices ordered by
  * (squared distance, index) ascending.
  *
  * Replaces the SQL-string form (`transform(<1024-literal centroid
  * array>, c -> sqdist_f64(v, c))` + `array_sort(zip_with(...))`): the
  * centroid matrix there was re-parsed into a giant literal tree per
  * usage, and the per-centroid lambda ran interpreted. Here the trained
  * model is ONE plan-constant reference object and the generated code is
  * a flat distance loop plus an nProbe-step selection — O(1) plan size in
  * the cluster count.
  *
  * Semantics contract (matches the form it replaces, which the IVF recall
  * gate pins): distances accumulate `(x - c)²` left-to-right in doubles —
  * the [[SqDistF64]] op order — and ties break toward the LOWER index
  * (both `array_position(.., array_min(..))` and the `(d, i)` struct sort
  * did the same). NULL input array, length mismatch, a NULL element, or
  * all-NaN distances (a NaN vector element) → NULL (the composed form's
  * null-propagating dists / unorderable array_min made downstream drop
  * such rows; explode/element_at of NULL does too). */
case class NearestCentroids(child: Expression, cents: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression {

  require(nProbe >= 1 && nProbe <= cents.length,
    s"nProbe=$nProbe out of [1, ${cents.length}]")

  private def dim: Int = cents(0).length
  private def k: Int = cents.length
  @transient private lazy val flat: Array[Double] = cents.flatten

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint|double> input, got ${other.catalogString}")
  }

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  private def elemT: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != dim) return null
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    val dist = new Array[Double](k)
    var c = 0
    while (c < k) {
      var acc = 0.0
      val off = c * dim
      var j = 0
      while (j < n) {
        val x = elemT match {
          case LongType => a.getLong(j).toDouble
          case _ => a.getDouble(j)
        }
        val d = x - flat(off + j)
        acc += d * d
        j += 1
      }
      dist(c) = acc
      c += 1
    }
    val used = new Array[Boolean](k)
    val out = new Array[Int](nProbe)
    var p = 0
    while (p < nProbe) {
      var best = -1
      var bd = Double.PositiveInfinity
      var c2 = 0
      while (c2 < k) {
        if (!used(c2) && dist(c2) < bd) { bd = dist(c2); best = c2 }
        c2 += 1
      }
      // every remaining distance NaN (a NaN vector element) → no orderable
      // nearest cell; yield NULL like the composed array_min form did
      if (best < 0) return null
      used(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("ivfCentroids", flat, "double[]")
    val get = elemT match {
      case LongType => (arr: String, i: String) => s"$arr.getLong($i)"
      case _ => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val dist = ctx.freshName("dist")
      val used = ctx.freshName("used")
      val out = ctx.freshName("out")
      val ok = ctx.freshName("ok")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val off = ctx.freshName("off")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val p = ctx.freshName("p")
      val best = ctx.freshName("best")
      val bd = ctx.freshName("bd")
      s"""
         |final int $n = $a.numElements();
         |boolean $ok = ($n == $dim);
         |if ($ok) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { $ok = false; break; }
         |  }
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $dist = new double[$k];
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $acc = 0.0;
         |    final int $off = $c * $dim;
         |    for (int $j = 0; $j < $n; $j++) {
         |      final double $d = ((double) ${get(a, j)}) - $flatRef[$off + $j];
         |      $acc += $d * $d;
         |    }
         |    $dist[$c] = $acc;
         |  }
         |  final boolean[] $used = new boolean[$k];
         |  final int[] $out = new int[$nProbe];
         |  for (int $p = 0; $p < $nProbe && !${ev.isNull}; $p++) {
         |    int $best = -1;
         |    double $bd = Double.POSITIVE_INFINITY;
         |    for (int $c = 0; $c < $k; $c++) {
         |      if (!$used[$c] && $dist[$c] < $bd) { $bd = $dist[$c]; $best = $c; }
         |    }
         |    if ($best < 0) {
         |      ${ev.isNull} = true; // NaN distances: no orderable nearest cell
         |    } else {
         |      $used[$best] = true;
         |      $out[$p] = $best;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}
