package graft.domain

import java.sql.{Date, Timestamp}

/** Typed row models for the sport-advantages domain (SURVEY §1.1/§1.2).
  * Column names deliberately preserve the reference's spellings —
  * `constract_type`, `calculed_distance`, `business_unity`,
  * `paid_leaved_days` (ref `init-scripts/init-db.sql:11-49`) — so SQL
  * parity and result hashing hold. */
object Model {

  /** ref `init-scripts/init-db.sql:11-23` + HR Excel columns. */
  final case class Employee(
      id_employee: Int,
      first_name: String,
      last_name: String,
      birthday: Date,
      business_unity: String,
      hire_date: Date,
      gross_salary: Int,
      constract_type: String,
      address: String,
      transport_mode: String,
      paid_leaved_days: Int)

  /** ref `init-scripts/init-db.sql:26-35`. */
  final case class CommuteValidation(
      id_validate: Int,
      id_employee: Int,
      calculed_distance: Option[BigDecimal],
      calculed_duration: Option[BigDecimal],
      is_valid: Boolean,
      error_message: Option[String],
      created_at: Timestamp)

  /** ref `init-scripts/init-db.sql:38-49`. */
  final case class SportActivity(
      id: Int,
      id_employee: Int,
      first_name: String,
      last_name: String,
      start_datetime: Timestamp,
      sport_type: String,
      distance: Option[Int],
      activity_duration: Int,
      comment: Option[String])

  /** One row of the `final` joined table (ref `read_delta.py:280-290`). */
  final case class EmployeeBenefit(
      id_employee: Int,
      gross_salary: Int,
      business_unity: String,
      constract_type: String,
      id_validate: Int,
      calculed_distance: Option[BigDecimal],
      calculed_duration: Option[BigDecimal],
      is_valid: Boolean,
      error_message: Option[String],
      created_at: Timestamp,
      count_activity: Option[Long],
      mean_duration: Option[Double])

  /** Per-mode commute distance limits in meters
    * (ref `commute_validation/commute_validation.py:15-18`). */
  val TransportLimits: Map[String, Int] = Map(
    "Marche/running" -> 15000,
    "Vélo/Trottinette/Autres" -> 25000)

  /** Sporty modes eligible for the prime (same source). */
  val SportyModes: Set[String] = TransportLimits.keySet
}
