package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark-first implementation over the testdata tables
  * plus (when SQL-expressible) an equivalent ANSI/DuckDB oracle query.
  *
  * @param name     stable query id (key in SparkEntry.queries)
  * @param oracle   DuckDB SQL producing the same rows/columns; None → the
  *                 driver records a weaker rows-only check
  * @param headline whether Bench times this query per-round
  * @param run      (session, sfDir) => result DataFrame
  */
final case class Q(
    name: String,
    oracle: Option[String],
    headline: Boolean = false)(
    val run: (SparkSession, String) => DataFrame)
