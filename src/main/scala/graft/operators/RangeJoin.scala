package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join: match points to intervals (`start <= point <= end`) within
  * a key — the attribution-window / point-in-interval operator (the
  * other event-to-state alignment besides [[AsOfJoin]]).
  *
  * Spark plans a naive non-equi join as BroadcastNestedLoopJoin — a
  * quadratic scale-killer. This composes built-ins instead (SURVEY §7.1
  * preference order): quantize time into bins of `binWidth`, explode each
  * interval into the bins it overlaps (≤ len/binWidth + 1 rows — bounded
  * when interval length is bounded), equi-join points on (key, bin), and
  * apply the exact range predicate to the candidates. One shuffle keyed
  * on (key, bin), no cartesian anywhere; bin width tunes the replication/
  * selectivity trade exactly like the LSH band width in the dedup family.
  */
object RangeJoin {

  /** @param points    rows with `key` and `pointT`
    * @param intervals rows with `key`, `startT`, `endT` (inclusive ends)
    * @param binWidth  quantization width in `pointT` units; choose ≈ the
    *                  typical interval length so intervals explode into
    *                  ~2 bins */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      pointT: String,
      startT: String,
      endT: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(pointT) / binWidth))
    val iv = intervals.withColumn("__bin",
      explode(sequence(floor(col(startT) / binWidth), floor(col(endT) / binWidth))))
    p.join(iv, Seq(key, "__bin"))
      .filter(col(pointT) >= col(startT) && col(pointT) <= col(endT))
      .drop("__bin")
  }
}
