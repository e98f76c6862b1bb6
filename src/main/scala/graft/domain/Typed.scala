package graft.domain

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import Model.SportActivity

/** Typed `Dataset[T]` surface over the domain ops (SURVEY §1.4: case-class
  * Encoders where type safety helps; §7.1 extensions: custom
  * `Aggregator[IN,BUF,OUT]`). The untyped DataFrame ops in [[Ops]] remain
  * the primary (codegen-friendliest) path; this layer gives compile-time
  * row shapes at API boundaries. */
object Typed {

  /** Typed view of the decoded CDC stream / activities table. */
  def activities(df: DataFrame): Dataset[SportActivity] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[SportActivity]
  }

  final case class ActivityStats(count_activity: Long, mean_duration: Double)

  /** One-pass count+mean per key — a custom typed Aggregator (single
    * shuffle, partial merge on (count, sum)). */
  object ActivityStatsAgg extends Aggregator[SportActivity, (Long, Double), ActivityStats] {
    override def zero: (Long, Double) = (0L, 0.0)
    override def reduce(b: (Long, Double), a: SportActivity): (Long, Double) =
      (b._1 + 1, b._2 + a.activity_duration)
    override def merge(x: (Long, Double), y: (Long, Double)): (Long, Double) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Long, Double)): ActivityStats =
      ActivityStats(r._1, if (r._1 == 0) Double.NaN else r._2 / r._1)
    override def bufferEncoder: Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    override def outputEncoder: Encoder[ActivityStats] =
      Encoders.product[ActivityStats]
  }

  /** Typed equivalent of [[Ops.aggregateActivities]]. */
  def aggregateActivities(ds: Dataset[SportActivity]): Dataset[(Int, ActivityStats)] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.id_employee).agg(ActivityStatsAgg.toColumn.name("stats"))
  }
}
