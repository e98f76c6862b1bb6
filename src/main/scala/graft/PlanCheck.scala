package graft

import org.apache.spark.sql.SparkSession

import graft.queries.Catalog

/** Dev tool: print formatted physical plans for the named queries (or all
  * headliners) so pushdown/broadcast/codegen can be inspected.
  * Usage: runMain graft.PlanCheck [queryName ...] */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val targets =
      if (args.nonEmpty) args.toSeq.map(Catalog.byName)
      else Catalog.headlines
    targets.foreach { q =>
      println(s"\n========== ${q.name} ==========")
      q.run(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
