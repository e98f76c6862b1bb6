package graft.domain

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DomainOpsSpec extends SparkSpec {

  lazy val employees = Fixtures.employees(spark).cache()
  lazy val activities = Fixtures.activities(spark).cache()
  lazy val validations = Ops.validateCommutes(employees).cache()
  lazy val finalDf = Ops.buildFinal(employees, validations, activities).cache()

  test("fixtures: 161 employees, plausible activity volume, employee 10001 inactive") {
    assert(employees.count() === 161)
    val n = activities.count()
    assert(n > 2000 && n < 8000, s"activity volume $n outside generator envelope")
    assert(activities.filter(col("id_employee") === 10001).count() === 0)
  }

  test("fixtures are deterministic across invocations") {
    val a = Fixtures.activities(spark, 10, 30).collect().map(_.toString).sorted
    val b = Fixtures.activities(spark, 10, 30).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("validateCommutes: non-sporty modes invalid with message; sporty obey limits") {
    val joined = employees.select(col("id_employee"), col("transport_mode"))
      .join(validations, "id_employee").cache()
    val nonSporty = joined.filter(
      !col("transport_mode").isin(Model.SportyModes.toSeq: _*))
    assert(nonSporty.filter(col("is_valid")).count() === 0)
    assert(nonSporty.filter(col("error_message").isNull).count() === 0)
    assert(nonSporty.filter(col("calculed_distance").isNotNull).count() === 0)
    val sportyValid = joined.filter(
      col("transport_mode").isin(Model.SportyModes.toSeq: _*) && col("is_valid"))
    assert(sportyValid.filter(col("calculed_distance") > 25000).count() === 0)
    val walkers = joined.filter(col("transport_mode") === "Marche/running" && col("is_valid"))
    assert(walkers.filter(col("calculed_distance") > 15000).count() === 0)
  }

  test("buildFinal: one row per employee, NULL stats for inactive employee") {
    assert(finalDf.count() === 161)
    val inactive = finalDf.filter(col("id_employee") === 10001).collect()(0)
    assert(inactive.isNullAt(inactive.fieldIndex("count_activity")))
    assert(inactive.isNullAt(inactive.fieldIndex("mean_duration")))
    assert(finalDf.filter(col("count_activity").isNotNull).count() === 160)
  }

  test("benefitReport: DataFrame form ≡ literal-SQL form (README.md:141-164)") {
    val df = Ops.benefitReport(finalDf)
    val viaSql = Ops.benefitReportViaSql(spark, finalDf)
    assert(df.schema.fieldNames.sameElements(viaSql.schema.fieldNames))
    assert(df.exceptAll(viaSql).isEmpty && viaSql.exceptAll(df).isEmpty)
  }

  test("benefitReport invariants: prime ⟺ valid commute; total = salary + prime; NULL count → false") {
    val r = Ops.benefitReport(finalDf).cache()
    assert(r.filter(col("commute_valid") && col("commute_prime") === 0).count() === 0)
    assert(r.filter(!col("commute_valid") && col("commute_prime") =!= 0).count() === 0)
    assert(r.filter(col("total_salary") =!= col("gross_salary") + col("commute_prime")).count() === 0)
    val inactive = r.filter(col("id_employee") === 10001).collect()(0)
    assert(inactive.getBoolean(inactive.fieldIndex("is_valid_activities")) === false)
    // prime formula: round(salary * 0.05, 2)
    assert(r.filter(col("commute_valid") &&
      col("commute_prime") =!= round(col("gross_salary") * 0.05, 2)).count() === 0)
  }

  test("maskEmployees: PII nulled for BI user, passthrough otherwise") {
    val masked = Ops.maskEmployees(employees, lit("sportadvantagebiuser"))
    assert(masked.filter(col("first_name").isNotNull || col("last_name").isNotNull ||
      col("address").isNotNull).count() === 0)
    assert(masked.count() === 161)
    val open = Ops.maskEmployees(employees, lit("analyst"))
    assert(open.filter(col("first_name").isNull).count() === 0)
  }

  test("topSports: 5 rows, descending counts") {
    val top = Ops.topSports(activities).collect()
    assert(top.length === 5)
    val counts = top.map(_.getLong(1))
    assert(counts.sameElements(counts.sortBy(-_)))
  }

  test("qualityChecks: fixtures satisfy all GE-derived invariants") {
    val report = Ops.qualityChecks(activities, employees)
    assert(report.values.forall(_ === 0L), s"violations: $report")
  }

  test("qualityChecks: an empty ingest window reports zeros, not a crash") {
    // SUM over zero rows is SQL NULL — the first run of a quality gate
    // sees exactly this shape and must pass with all-zero counts
    val report = Ops.qualityChecks(activities.limit(0), employees)
    assert(report.values.forall(_ === 0L), s"violations: $report")
  }

  test("cdc decode: drops malformed envelopes, keeps typed inserts") {
    val envelopes = Fixtures.cdcEnvelopes(spark, nEmployees = 10, days = 30).cache()
    val decoded = Ops.decodeCdc(envelopes).cache()
    val expected = Fixtures.activities(spark, 10, 30).count()
    assert(decoded.count() === expected) // 3 malformed rows dropped
    assert(decoded.schema("start_datetime").dataType.typeName === "timestamp")
    assert(decoded.filter(col("id").isNull).count() === 0)
    // round-trip: timestamps survive µs-epoch encode/decode
    val orig = Fixtures.activities(spark, 10, 30)
      .select(col("id"), col("start_datetime")).collect().map(r => r.getInt(0) -> r.getTimestamp(1)).toMap
    decoded.select(col("id"), col("start_datetime")).collect().foreach { r =>
      assert(orig(r.getInt(0)) === r.getTimestamp(1))
    }
  }
}
