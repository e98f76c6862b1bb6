package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suites — the engine form of the
  * reference's Great Expectations DAG
  * (`airflow/dags/data_validation_dag.py:306-319`: not-null on
  * `start_datetime`/`sport_type`, non-negative `activity_duration` /
  * `distance` with GE's missing-ignored + `mostly` semantics), widened to
  * the checks a corpus pipeline actually runs (uniqueness, value sets,
  * regex shape, referential integrity).
  *
  * Evaluation shape: every row-predicate expectation (not-null, between,
  * in-set, regex, unique) compiles into ONE aggregate pass over the table
  * — conditional sums plus distinct counts, partial-aggregated map-side,
  * so the report costs one scan regardless of suite size. Foreign-key
  * expectations each add one aggregate over a LEFT JOIN against their
  * reference table (broadcast when the dim is small — the usual case).
  * No collect: the report is itself a DataFrame.
  *
  * Semantics (GE-aligned, stated where they differ):
  * - `Between`/`InSet`/`Regex` ignore NULLs (GE's missing-ignored
  *   default): n_evaluated counts non-null values only.
  * - `mostly` is a PERMILLE (integer, so pass/fail is exact integer
  *   arithmetic both engines reproduce — a double fraction would make
  *   the gate float-sensitive): passed ⇔
  *   n_violations · 1000 ≤ (1000 − mostlyPermille) · n_evaluated.
  * - `Unique` counts the EXTRA copies (n_nonnull − n_distinct), not
  *   every member of a duplicate set as GE does — the count that answers
  *   "how many rows must dedup remove".
  */
object Expectations {

  sealed trait Expectation { def column: String; def label: String }
  /** Column must never be NULL. */
  final case class NotNull(column: String) extends Expectation {
    val label = "not_null"
  }
  /** Non-null values within [min, max] (either bound optional). */
  final case class Between(column: String, min: Option[Double] = None,
                           max: Option[Double] = None,
                           mostlyPermille: Int = 1000) extends Expectation {
    require(min.nonEmpty || max.nonEmpty, "between: need at least one bound")
    val label = "between"
  }
  /** Non-null values must be unique (violations = extra copies). */
  final case class Unique(column: String) extends Expectation {
    val label = "unique"
  }
  /** Non-null values drawn from a fixed set. */
  final case class InSet(column: String, values: Seq[String],
                         mostlyPermille: Int = 1000) extends Expectation {
    val label = "in_set"
  }
  /** Non-null values match a regex (Spark RLIKE). */
  final case class MatchesRegex(column: String, pattern: String,
                                mostlyPermille: Int = 1000) extends Expectation {
    val label = "matches_regex"
  }
  /** Non-null values must exist in `refTable.refColumn`. */
  final case class ForeignKey(column: String, refTable: DataFrame,
                              refColumn: String) extends Expectation {
    val label = "foreign_key"
  }

  private def mostlyOf(e: Expectation): Int = e match {
    case b: Between => b.mostlyPermille
    case s: InSet => s.mostlyPermille
    case r: MatchesRegex => r.mostlyPermille
    case _ => 1000
  }

  /** Validate `df` against the suite. Output: one row per expectation —
    * (expectation, column, n_evaluated, n_violations, passed) — in suite
    * order. */
  def validate(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    require(suite.nonEmpty, "expectations: empty suite")
    suite.foreach(e => require(df.columns.contains(e.column),
      s"expectations: no column `${e.column}`"))

    val indexed = suite.zipWithIndex
    val rowExps = indexed.filterNot(_._1.isInstanceOf[ForeignKey])
    val fkExps = indexed.collect { case (f: ForeignKey, p) => (f, p) }

    // one aggregate pass: per expectation an (evaluated, violations) pair
    val rowReport: Option[DataFrame] =
      if (rowExps.isEmpty) None
      else {
        val aggs: Seq[Column] = rowExps.map(_._1).zipWithIndex.flatMap { case (e, i) =>
          val c = col(e.column)
          // coalesce: sums are NULL on an empty table, and a NULL
          // violation count would make `passed` NULL instead of true
          def s0(x: Column) = coalesce(sum(x), lit(0L))
          val (evalCnt, violCnt): (Column, Column) = e match {
            case NotNull(_) =>
              (count(lit(1)), s0(when(c.isNull, 1L).otherwise(0L)))
            case Between(_, mn, mx, _) =>
              val out = Seq(mn.map(c < _), mx.map(c > _)).flatten
                .reduce(_ || _)
              (count(c), s0(when(c.isNotNull && out, 1L).otherwise(0L)))
            case Unique(_) =>
              (count(c), count(c) - countDistinct(c))
            case InSet(_, vs, _) =>
              (count(c), s0(when(c.isNotNull && !c.isin(vs: _*), 1L).otherwise(0L)))
            case MatchesRegex(_, p, _) =>
              (count(c), s0(when(c.isNotNull && !c.rlike(p), 1L).otherwise(0L)))
            case _: ForeignKey => throw new IllegalStateException("unreachable")
          }
          Seq(evalCnt.as(s"e$i"), violCnt.as(s"v$i"))
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val rows = rowExps.zipWithIndex.map { case ((e, pos), i) =>
          struct(lit(e.label).as("expectation"), lit(e.column).as("column"),
            col(s"e$i").as("n_evaluated"), col(s"v$i").as("n_violations"),
            (col(s"v$i") * 1000 <= lit(1000L - mostlyOf(e)) * col(s"e$i"))
              .as("passed"), lit(pos).as("__pos"))
        }
        Some(one.select(explode(array(rows: _*)).as("r")).select(col("r.*")))
      }

    // each FK: one aggregate over a left join against the reference side
    val fkReports = fkExps.map { case (f, pos) =>
      val refVals = f.refTable.select(col(f.refColumn).as("__ref")).distinct()
      df.select(col(f.column).as("__v"))
        .join(refVals, col("__v") === col("__ref"), "left")
        .agg(
          count(col("__v")).as("n_evaluated"),
          coalesce(sum(when(col("__v").isNotNull && col("__ref").isNull, 1L)
            .otherwise(0L)), lit(0L)).as("n_violations"))
        .select(lit(f.label).as("expectation"), lit(f.column).as("column"),
          col("n_evaluated"), col("n_violations"),
          (col("n_violations") === 0L).as("passed"), lit(pos).as("__pos"))
    }

    // suite order is part of the contract: a consumer zipping the report
    // against its suite must never pair the wrong counts (the union puts
    // FK rows last otherwise)
    (rowReport.toSeq ++ fkReports).reduce(_ unionByName _)
      .orderBy(col("__pos")).drop("__pos")
  }
}
