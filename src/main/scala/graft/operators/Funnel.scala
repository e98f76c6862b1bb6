package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered conversion-funnel analysis: for each user, the time of the
  * FIRST stage-1 event, the first stage-2 event within a window AFTER
  * it, the first stage-3 event within a window after THAT, and so on —
  * the product-analytics primitive behind "view → click → purchase
  * conversion" dashboards (the reference's BI layer consumes exactly
  * this family through Superset; the engine previously covered retention
  * (q70) and sessionization (q16) but not ordered multi-stage
  * progression).
  *
  * Semantics: strict ordering (`t > prev`), per-stage conversion windows
  * (`t <= prev + window`), first-occurrence at every stage — the
  * standard "windowed funnel" definition (ClickHouse `windowFunnel`,
  * Amplitude funnels). A user appears once with one nullable timestamp
  * column per stage; NULL = dropped off there.
  *
  * Scale shape: stage 1 is one user-keyed aggregate; each later stage is
  * an equi-join of the previous stage's (user, t) against the events of
  * that type plus another user-keyed aggregate — every shuffle is keyed
  * on user_id, so AQE reuses one partitioning family end to end and
  * nothing is ever quadratic or windowed globally. Converters shrink
  * monotonically stage over stage, so later joins get cheaper, and the
  * final assembly is left joins of per-stage relations each ≤ |users|.
  */
object Funnel {

  /** @param stages (eventType, windowMicros) — the window bounds each
    *               stage's distance from the PREVIOUS stage's timestamp;
    *               the first stage's window is ignored (it anchors).
    * @return one row per stage-1 user: (userCol, t_<stage1>, t_<stage2>,
    *         ...), micros, NULL where the user dropped off */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, stages: Seq[(String, Long)]): DataFrame = {
    require(stages.size >= 2, "funnel: need at least two stages")
    require(stages.map(_._1).distinct.size == stages.size,
      "funnel: duplicate stage event types")
    val u = col(userCol)
    def stageEvents(tpe: String) =
      events.filter(col(typeCol) === tpe).select(u, col(tsCol).as("__t"))

    val first = stageEvents(stages.head._1)
      .groupBy(u).agg(min(col("__t")).as(s"t_${stages.head._1}"))

    // fold: converters of stage i = (converters of i-1) ⋈ events of type i
    // within (prev, prev + window], first occurrence kept
    val converters: Seq[DataFrame] = stages.tail.scanLeft(first) {
      case (prev, (tpe, window)) =>
        val prevT = col(prev.columns.last)
        // right side renamed so the join condition can't bind ambiguously
        val ev = stageEvents(tpe).withColumnRenamed(userCol, "__u")
        prev.join(ev, col(userCol) === col("__u") &&
            col("__t") > prevT && col("__t") <= prevT + window)
          .groupBy(col(userCol))
          .agg(min(col("__t")).as(s"t_$tpe"))
    }

    // assemble: every stage-1 user, with NULLs where they dropped off —
    // each join side is ≤ |users| rows, keyed on user
    converters.tail.zip(stages.tail).foldLeft(first) {
      case (acc, (conv, (tpe, _))) =>
        acc.join(conv.select(u, col(s"t_$tpe")), Seq(userCol), "left")
    }
  }
}
