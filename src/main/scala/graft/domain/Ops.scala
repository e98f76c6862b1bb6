package graft.domain

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Model.{SportyModes, TransportLimits}

/** Pure `DataFrame → DataFrame` batch operators for the sport-advantages
  * pipeline (SURVEY §7.1 `ops`). Each function is one reference operator,
  * re-expressed Spark-first; all are shuffle-minimal (pre-aggregation
  * before joins, broadcastable dimension sides) and UDF-free.
  */
object Ops {

  /** Debezium row image (payload.before / payload.after). */
  val cdcRowSchema: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("id_employee", IntegerType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("start_datetime", LongType), // epoch microseconds
    StructField("sport_type", StringType),
    StructField("distance", IntegerType),
    StructField("activity_duration", IntegerType),
    StructField("comment", StringType)))

  /** Debezium envelope schema (ref `SaveDelta.scala:87-95` — the declared
    * one is dead code there; this one is actually used). `before` is the
    * same row image as `after`: deletes carry the key there. */
  val cdcEnvelopeSchema: StructType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("before", cdcRowSchema),
      StructField("after", cdcRowSchema),
      StructField("source", StructType(Seq(
        StructField("table", StringType),
        // Debezium's per-connector sequence (Postgres LSN): the only
        // intra-millisecond order signal the envelope carries — ts_ms
        // alone cannot order a same-ms delete+re-create
        StructField("lsn", LongType)))),
      StructField("op", StringType),
      StructField("ts_ms", LongType))))))

  /** P1+P2+P3 (ref `SaveDelta.scala:134-149`): one `from_json` parse of the
    * envelope (the reference re-parses 7× with get_json_object), project
    * `payload.after.*`, convert epoch-µs → TimestampType (the reference's
    * `from_unixtime` degrades to a string — SURVEY §7.3 keeps proper
    * timestamps), drop rows with null id (non-inserts/garbage). */
  def decodeCdc(raw: DataFrame): DataFrame =
    raw
      .selectExpr("CAST(value AS STRING) AS value")
      .select(from_json(col("value"), cdcEnvelopeSchema).as("env"))
      .select(col("env.payload.after.*"))
      .withColumn("start_datetime", timestamp_micros(col("start_datetime")))
      .filter(col("id").isNotNull)

  /** Full CDC event decode for MERGE-style sinks: like [[decodeCdc]] but
    * keeps the `op` discriminator + `ts_ms`, and resolves the key from the
    * after-image (c/r/u) or the before-image (d — after is null there).
    * The reference appends `payload.after` for EVERY op
    * (`SaveDelta.scala:160`), turning deletes into all-null rows; here a
    * delete becomes a keyed tombstone an upsert sink can apply. */
  def decodeCdcOps(raw: DataFrame): DataFrame =
    raw
      .selectExpr("CAST(value AS STRING) AS value")
      .select(from_json(col("value"), cdcEnvelopeSchema).as("env"))
      .select(
        coalesce(col("env.payload.after.id"), col("env.payload.before.id")).as("key_id"),
        col("env.payload.op").as("op"),
        col("env.payload.ts_ms").as("ts_ms"),
        col("env.payload.source.lsn").as("seq"),
        col("env.payload.after.*"))
      .withColumn("start_datetime", timestamp_micros(col("start_datetime")))
      .filter(col("key_id").isNotNull && col("op").isin("c", "r", "u", "d"))

  /** S5 adapter: the reference HR workbook (read via
    * `spark.read.format("xlsx")` — French headers, every cell a raw
    * string) → the canonical Employee schema. Excel stores numbers as
    * doubles ("59019.0") and dates as day serials against the 1899-12-30
    * epoch (F13, ref `commute_validation.py:187-209` does the same
    * conversions in pandas). */
  def fromHrWorkbook(hr: DataFrame): DataFrame = {
    def num(c: String) = col(c).cast("double").cast("int")
    def serialDate(c: String) =
      date_add(lit("1899-12-30").cast("date"), col(c).cast("double").cast("int"))
    hr.select(
      num("ID salarié").as("id_employee"),
      col("Prénom").as("first_name"),
      col("Nom").as("last_name"),
      serialDate("Date de naissance").as("birthday"),
      col("BU").as("business_unity"),
      serialDate("Date d'embauche").as("hire_date"),
      num("Salaire brut").as("gross_salary"),
      col("Type de contrat").as("constract_type"),
      col("Adresse du domicile").as("address"),
      col("Moyen de déplacement").as("transport_mode"),
      num("Nombre de jours de CP").as("paid_leaved_days"))
  }

  /** A1 (ref `read_delta.py:114-127`): one row per employee — partial
    * aggregation map-side, single shuffle on id_employee. */
  def aggregateActivities(activities: DataFrame): DataFrame =
    activities
      .groupBy(col("id_employee"))
      .agg(
        count(lit(1)).as("count_activity"),
        avg(col("activity_duration")).as("mean_duration"))

  /** P7/P8/F8/F11 (ref `commute_validation.py:65-125`): classify each
    * employee's commute. `distanceCol` is the injected distance provider
    * (deterministic stub or a precomputed table join) — no external API in
    * the hot path. */
  def validateCommutes(
      employees: DataFrame,
      distanceCol: Column = Fixtures.distanceMeters(col("address"))): DataFrame = {
    val limit = TransportLimits.foldLeft(lit(null).cast("int")) {
      case (acc, (mode, m)) => when(col("transport_mode") === mode, m).otherwise(acc)
    }
    val sporty = col("transport_mode").isin(SportyModes.toSeq: _*)
    employees
      .withColumn("calculed_distance_m", when(sporty, distanceCol))
      .withColumn("limit_m", limit)
      .select(
        // Surrogate id derived from the (unique) employee key — NOT
        // row_number() over a global unpartitioned Window, which would pull
        // the whole table through one task at scale.
        col("id_employee").cast("int").as("id_validate"),
        col("id_employee"),
        col("calculed_distance_m").cast(DecimalType(10, 2)).as("calculed_distance"),
        // duration stub: distance at ~1.25 m/s walking-equivalent
        when(col("calculed_distance_m").isNotNull,
          (col("calculed_distance_m") / 1.25).cast(DecimalType(10, 2)))
          .as("calculed_duration"),
        when(!sporty, lit(false))
          .when(col("calculed_distance_m") <= col("limit_m"), lit(true))
          .otherwise(lit(false)).as("is_valid"),
        when(!sporty,
          format_string("Mode de transport '%s' non sportif", col("transport_mode")))
          .when(col("calculed_distance_m") > col("limit_m"),
            format_string("Distance (%.1f km) > limite (%d km)",
              col("calculed_distance_m") / 1000.0, (col("limit_m") / 1000).cast("int")))
          .otherwise(lit(null).cast("string")).as("error_message"),
        current_timestamp().as("created_at"))
  }

  /** J1+J2 (ref `read_delta.py:261-285`): slim employee projection (column
    * pruning reaches the scan), inner join validations, LEFT join the
    * pre-aggregated activities so zero-activity employees keep NULLs. */
  def buildFinal(
      employees: DataFrame,
      validations: DataFrame,
      activities: DataFrame): DataFrame = {
    val slim = employees.select(
      col("id_employee"), col("gross_salary"), col("business_unity"),
      col("constract_type"))
    val stats = aggregateActivities(activities)
    slim
      .join(validations, Seq("id_employee"))
      .join(stats, Seq("id_employee"), "left")
  }

  /** J3/F4-F7 flagship benefit report (ref `README.md:141-164`), single
    * pass — the reference's self-join CTE collapses into withColumns. */
  def benefitReport(finalDf: DataFrame): DataFrame = {
    val prime = when(col("is_valid"),
      round(col("gross_salary") * 0.05, 2)).otherwise(lit(0.0))
    finalDf.select(
      col("id_employee"), col("gross_salary"), col("business_unity"),
      col("constract_type"), col("calculed_distance"),
      col("is_valid").as("commute_valid"),
      when(col("count_activity") >= 15, lit(true)).otherwise(lit(false))
        .as("is_valid_activities"),
      col("mean_duration"),
      prime.as("commute_prime"),
      (col("gross_salary") + prime).as("total_salary"))
  }

  /** The same report as literal SQL (ref `README.md:141-164` verbatim
    * shape, CTE + self-join) — parity path for `spark.sql`. */
  val benefitReportSql: String = """
    WITH prime AS (
      SELECT id_employee,
             CASE WHEN is_valid THEN ROUND(gross_salary * 0.05, 2)
                  ELSE 0.0 END AS commute_prime
      FROM final
    )
    SELECT f.id_employee, f.gross_salary, f.business_unity, f.constract_type,
           f.calculed_distance,
           f.is_valid AS commute_valid,
           CASE WHEN f.count_activity >= 15 THEN true ELSE false END AS is_valid_activities,
           f.mean_duration,
           p.commute_prime,
           f.gross_salary + p.commute_prime AS total_salary
    FROM final f
    JOIN prime p ON f.id_employee = p.id_employee"""

  def benefitReportViaSql(spark: SparkSession, finalDf: DataFrame): DataFrame = {
    finalDf.createOrReplaceTempView("final")
    spark.sql(benefitReportSql)
  }

  /** P5 masking view (ref `init-db.sql:74-89`): NULL out PII for the BI
    * user. */
  def maskEmployees(
      employees: DataFrame,
      currentUser: Column = current_user(),
      biUser: String = "sportadvantagebiuser"): DataFrame = {
    def mask(c: String) =
      when(currentUser === biUser, lit(null).cast("string"))
        .otherwise(col(c)).as(c)
    employees.select(
      col("id_employee"), mask("first_name"), mask("last_name"),
      col("birthday"), col("business_unity"), col("hire_date"),
      col("gross_salary"), col("constract_type"), mask("address"),
      col("transport_mode"), col("paid_leaved_days"))
  }

  /** A2 (ref `SaveDelta.scala:233-242`): top-5 sports by activity count. */
  def topSports(activities: DataFrame, k: Int = 5): DataFrame =
    activities
      .groupBy(col("sport_type"))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("sport_type"))
      .limit(k)

  /** §2.9 Great-Expectations-derived invariants as one single-pass
    * aggregate over activities + an FK check (left-anti count). Returns
    * (ruleName → violationCount); all-zero = pass. */
  def qualityChecks(activities: DataFrame, employees: DataFrame): Map[String, Long] = {
    // coalesce: SUM over ZERO rows is SQL NULL — an empty ingest window
    // (exactly when a quality gate first runs) must report zeros, not NPE
    def cnt(c: org.apache.spark.sql.Column) = coalesce(sum(c), lit(0L))
    val row = activities.agg(
      cnt(when(col("start_datetime").isNull, 1L).otherwise(0L)).as("null_start_datetime"),
      cnt(when(col("sport_type").isNull, 1L).otherwise(0L)).as("null_sport_type"),
      cnt(when(col("activity_duration") < 0, 1L).otherwise(0L)).as("negative_duration"),
      cnt(when(col("distance").isNotNull && col("distance") < 0, 1L).otherwise(0L))
        .as("negative_distance"))
      .collect()(0)
    val orphans = activities
      .join(employees.select(col("id_employee")), Seq("id_employee"), "left_anti")
      .count()
    Map(
      "null_start_datetime" -> row.getLong(0),
      "null_sport_type" -> row.getLong(1),
      "negative_duration" -> row.getLong(2),
      "negative_distance" -> row.getLong(3),
      "fk_orphan_activities" -> orphans)
  }
}
