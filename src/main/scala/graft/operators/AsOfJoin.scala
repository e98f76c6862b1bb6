package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the most recent right row with
  * `right.time <= left.time` within the same key — the canonical
  * event-to-state alignment operator (Spark has no built-in).
  *
  * Per the extension preference order (SURVEY §7.1), this COMPOSES
  * built-ins rather than adding a custom LogicalPlan+Strategy, because the
  * semantics decompose exactly: union both sides with a side marker, one
  * window pass per key ordered by (time, right-first), carry the
  * last-seen right payload forward with `last(..., ignoreNulls)`, keep
  * left rows. One shuffle on the key, O(n log n) per-key sort, no
  * range-join row explosion — the same dataflow a dedicated AsOfJoinExec
  * would produce, but inside Catalyst/WholeStageCodegen with AQE for free.
  *
  * Tie rule: a right row at exactly `left.time` matches (inclusive) —
  * at equal time the right row sorts first (`__side` 0 < 1) — mirroring
  * DuckDB's `ASOF JOIN ... ON l.t >= r.t`.
  */
object AsOfJoin {

  /** @param left     rows to enrich; must contain `key` and `time`
    * @param right    state rows containing `key`, `time`, and `payloads`
    * @param key      equi-join key column name
    * @param time     ordering column name (same type both sides)
    * @param payloads right payload columns; emitted as `asof_<name>`,
    *                 NULL when no right row precedes the left row */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      payloads: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // Payloads travel as ONE struct so the matched right row is carried
    // whole — per-column carries would backfill a NULL field from an
    // OLDER right row, silently mixing rows.
    val payloadType = org.apache.spark.sql.types.StructType(
      payloads.map(p => right.schema(p)))
    val lSide = left
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(payloadType))
      .withColumn("__tb", lit(0L))
    // a NULL right time matches NOTHING (DuckDB: l.t >= NULL is never
    // true) — unfiltered it would sort NULLS-FIRST ahead of every real
    // row and be carried as the as-of match; NULL LEFT times then get a
    // NULL payload for free (they sort before all remaining right rows)
    val rSide0 = right.filter(col(time).isNotNull).select(
      col(key), col(time), lit(0).as("__side"),
      struct(payloads.map(col): _*).as("__r"),
      // deterministic winner among right rows tied on (key, time)
      xxhash64(struct(payloads.map(col): _*)).as("__tb"))
    // right rows contribute NULL for every left-only column
    val rSide = leftCols.foldLeft(rSide0) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = lSide.unionByName(rSide.select(lSide.columns.map(col): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloads.map(p => col("__c").getField(p).as(s"asof_$p")): _*)
  }
}
