package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture builders replacing the reference's Excel file,
  * random generator and Google Distance Matrix API (SURVEY §2.1 S5/S8,
  * FIXTURES.md). Everything is hash-derived from stable keys — same output
  * on every run, no RNG, fully distributed (`spark.range`, no driver loops).
  *
  * Distributions mirror `activity_generator/sport_generation.py:42-208`
  * (weekday activity P=0.05, weekend P=0.15 — with the reference's
  * `start_day.weekday()` bug fixed, per SURVEY §7.3), and
  * `commute_validation/commute_validation.py:15-18` transport modes.
  */
object Fixtures {

  private def pick(h: org.apache.spark.sql.Column, values: Seq[String]) =
    element_at(typedLit(values), (pmod(h, lit(values.size)) + 1).cast("int"))

  private val FirstNames = Seq("Audrey", "Colin", "Marie", "Luc", "Sophie",
    "Paul", "Claire", "Hugo", "Emma", "Louis", "Léa", "Jules", "Chloé",
    "Nina", "Théo", "Manon")
  private val LastNames = Seq("Martin", "Bernard", "Dubois", "Thomas",
    "Robert", "Richard", "Petit", "Durand", "Leroy", "Moreau", "Simon",
    "Laurent", "Lefebvre", "Michel", "Garcia", "David")
  private val BusinessUnits = Seq("Finance", "Support", "Ventes", "R&D", "Marketing")
  private val TransportModes = Seq(
    "véhicule thermique/électrique", "Vélo/Trottinette/Autres",
    "Transports en commun", "Marche/running")
  private val Sports = Seq(
    "Course à pied", "Marche", "Randonnée", "Vélo", "Trottinette",
    "Natation", "Football", "Basketball", "Tennis", "Badminton", "Yoga",
    "Pilates", "Musculation", "Escalade", "Boxe", "Danse", "Ski",
    "Surf", "Golf", "Rugby", "Handball")
  /** Sports with a distance model; everything else ⇒ NULL distance
    * (ref `sport_generation.py:51-72`). min/max meters. */
  private val DistanceSports: Seq[(String, Int, Int)] = Seq(
    ("Course à pied", 3000, 15000), ("Marche", 2000, 8000),
    ("Randonnée", 5000, 20000), ("Vélo", 10000, 50000),
    ("Trottinette", 5000, 15000), ("Natation", 500, 3000))
  private val Comments = Seq(
    "Superbe séance !", "Nouveau record personnel !", "Fatigué mais content",
    "Très bonne sortie", "Temps idéal", "Dur dur aujourd'hui",
    "Avec les collègues", "Reprise en douceur", "Objectif atteint",
    "Belle progression", "Entraînement intensif", "Moment de détente")

  /** 161 employees, ids 10001…10161 (FIXTURES.md §1). */
  def employees(spark: SparkSession, n: Int = 161): DataFrame =
    spark.range(n).select(
      (col("id") + 10001).cast("int").as("id_employee"),
      pick(xxhash64(lit("fn"), col("id")), FirstNames).as("first_name"),
      pick(xxhash64(lit("ln"), col("id")), LastNames).as("last_name"),
      date_add(lit("1970-01-15").cast("date"),
        pmod(xxhash64(lit("bd"), col("id")), lit(365 * 30)).cast("int")).as("birthday"),
      pick(xxhash64(lit("bu"), col("id")), BusinessUnits).as("business_unity"),
      date_add(lit("2020-01-01").cast("date"),
        pmod(xxhash64(lit("hd"), col("id")), lit(365 * 3)).cast("int")).as("hire_date"),
      (lit(25570) + pmod(xxhash64(lit("sal"), col("id")), lit(49421))).cast("int").as("gross_salary"),
      when(pmod(xxhash64(lit("ct"), col("id")), lit(100)) < 93, "CDI")
        .otherwise("CDD").as("constract_type"),
      concat(lit("Rue "), pmod(xxhash64(lit("ad"), col("id")), lit(500)).cast("string"),
        lit(", 34970 Lattes")).as("address"),
      pick(xxhash64(lit("tm"), col("id")), TransportModes).as("transport_mode"),
      (lit(25) + pmod(xxhash64(lit("cp"), col("id")), lit(5))).cast("int").as("paid_leaved_days"))

  /** Deterministic address→distance stub replacing the Google Distance
    * Matrix API (ref `commute_validation.py:20-61`): hash(address) →
    * meters in [500, 30000], so all validity branches occur. */
  def distanceMeters(addressCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (lit(500) + pmod(xxhash64(lit("dist"), addressCol), lit(29501))).cast("int")

  /** One-year activity history (ref `sport_generation.py:136-208`):
    * P(activity)=0.05 weekday / 0.15 weekend per employee-day; hour 6–9
    * with P≈0.3 else 10–21; per-sport distance ranges; ~29% commented.
    * Employee 10001 is forced inactive to exercise the left-join NULL path
    * (FIXTURES.md §3). */
  def activities(spark: SparkSession, nEmployees: Int = 161, days: Int = 366): DataFrame = {
    val grid = spark.range(nEmployees.toLong * days).select(
      (col("id") / days).cast("int").as("emp_idx"),
      (col("id") % days).cast("int").as("day_idx"),
      col("id").as("gid"))
    val dated = grid
      .withColumn("id_employee", (col("emp_idx") + 10001).cast("int"))
      .withColumn("activity_date", date_add(lit("2024-01-01").cast("date"), col("day_idx")))
      .withColumn("is_weekend", dayofweek(col("activity_date")).isin(1, 7))
      .withColumn("p", pmod(xxhash64(lit("act"), col("gid")), lit(1000)))
      .filter(col("id_employee") =!= 10001 &&
        (col("p") < when(col("is_weekend"), 150).otherwise(50)))
    val sported = dated
      .withColumn("sport_type", pick(xxhash64(lit("sp"), col("gid")), Sports))
      .withColumn("hour",
        when(pmod(xxhash64(lit("hh"), col("gid")), lit(10)) < 3,
          (lit(6) + pmod(xxhash64(lit("h1"), col("gid")), lit(4))).cast("int"))
          .otherwise((lit(10) + pmod(xxhash64(lit("h2"), col("gid")), lit(12))).cast("int")))
      .withColumn("start_datetime",
        (unix_timestamp(col("activity_date").cast("timestamp")) + col("hour") * 3600)
          .cast("timestamp"))
    val distExpr = DistanceSports.foldLeft(lit(null).cast("int")) {
      case (acc, (sport, lo, hi)) =>
        when(col("sport_type") === sport,
          (lit(lo) + pmod(xxhash64(lit("dm"), col("gid")), lit(hi - lo + 1))).cast("int"))
          .otherwise(acc)
    }
    sported
      .withColumn("distance", distExpr)
      .withColumn("activity_duration",
        when(col("distance").isNotNull, (col("distance") / 2).cast("int") + 600)
          .otherwise((lit(1800) + pmod(xxhash64(lit("du"), col("gid")), lit(5401))).cast("int")))
      .withColumn("comment",
        when(pmod(xxhash64(lit("cm"), col("gid")), lit(42)) < 12,
          pick(xxhash64(lit("ct2"), col("gid")), Comments)).otherwise(lit(null).cast("string")))
      // grid id is already unique + deterministic — no global window sort
      .withColumn("id", (col("gid") + 1).cast("int"))
      .join(
        employees(spark, nEmployees).select(
          col("id_employee"), col("first_name"), col("last_name")),
        "id_employee")
      .select(col("id"), col("id_employee"), col("first_name"), col("last_name"),
        col("start_datetime"), col("sport_type"), col("distance"),
        col("activity_duration"), col("comment"))
  }

  /** Debezium-style CDC envelope JSON strings for the activities, plus
    * malformed rows (missing payload.after / null id) to exercise the
    * invalid-row drop path (FIXTURES.md §4; ref `SaveDelta.scala:149`). */
  def cdcEnvelopes(spark: SparkSession, nEmployees: Int = 20, days: Int = 60): DataFrame = {
    val good = activities(spark, nEmployees, days).select(
      to_json(struct(
        struct(
          lit(null).cast("string").as("before"),
          struct(
            col("id"), col("id_employee"), col("first_name"), col("last_name"),
            (unix_timestamp(col("start_datetime")) * 1000000L).as("start_datetime"),
            col("sport_type"), col("distance"), col("activity_duration"),
            col("comment")).as("after"),
          struct(lit("sport_activities").as("table")).as("source"),
          lit("c").as("op"),
          (unix_timestamp(col("start_datetime")) * 1000L).as("ts_ms")
        ).as("payload"))).as("value"))
    val malformed = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("""{"payload": {"before": null, "op": "d", "ts_ms": 1}}"""),
        org.apache.spark.sql.Row("""{"payload": {"after": {"id": null, "sport_type": "X"}}}"""),
        org.apache.spark.sql.Row("""not json at all""")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
    good.unionByName(malformed)
  }
}
