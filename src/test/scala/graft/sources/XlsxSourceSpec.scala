package graft.sources.xlsx

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.IO

/** The from-scratch XLSX DataSource V2 (S5) must read the REFERENCE's own
  * HR workbook — the exact file the reference ingests with pandas/openpyxl
  * (`commute_validation.py:187-209`) — and agree with its documented shape
  * (161 employee rows; BASELINE.md). */
class XlsxSourceSpec extends SparkSpec {

  // The reference filename contains é; in a POSIX-locale JVM
  // (sun.jnu.encoding=ASCII) such paths are unresolvable, so stage a copy
  // under an ASCII name via the shell.
  private lazy val refXlsx: String = {
    import scala.sys.process._
    val dst = java.nio.file.Files.createTempDirectory("xlsx_ref").resolve("hr.xlsx")
    val rc = Seq("/bin/sh", "-c",
      s"""cp /root/reference/commute_validation/data/*.xlsx "$dst"""").!
    if (rc == 0) dst.toString else ""
  }

  test("reads the reference HR workbook: 161 rows, header-named columns") {
    assume(refXlsx.nonEmpty && new java.io.File(refXlsx).exists())
    val df = IO.readExcel(spark, refXlsx)
    assert(df.count() === 161)
    val cols = df.schema.fieldNames
    assert(cols.contains("ID salarié"), s"got ${cols.mkString(", ")}")
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    // every employee row carries an id; ids are unique
    val ids = df.select(col("ID salarié")).collect().map(_.getString(0))
    assert(ids.forall(s => s != null && s.nonEmpty))
    assert(ids.distinct.length === 161)
    // typed casts compose downstream (serial-date columns stay raw strings)
    val salaries = df.select(col("Salaire brut").cast("double")).na.drop()
    assert(salaries.count() > 0)
  }

  test("header=false surfaces the raw grid with generated column names") {
    assume(refXlsx.nonEmpty && new java.io.File(refXlsx).exists())
    val df = IO.readExcel(spark, refXlsx, header = false)
    assert(df.count() === 162) // header row + 161 data rows
    assert(df.schema.fieldNames.forall(_.startsWith("c")))
  }

  test("short name registration + one partition per workbook file") {
    assume(refXlsx.nonEmpty && new java.io.File(refXlsx).exists())
    val df = spark.read.format("xlsx").option("header", "true").load(refXlsx)
    assert(df.rdd.getNumPartitions === 1, "a workbook zip is not splittable")
    assert(df.count() === 161)
  }

  test("reference HR workbook flows through the full domain pipeline") {
    assume(refXlsx.nonEmpty && new java.io.File(refXlsx).exists())
    import graft.domain.{Model, Ops}
    import spark.implicits._
    val employees = Ops.fromHrWorkbook(IO.readExcel(spark, refXlsx))
    // typing holds against the canonical Employee model (real ids, serial
    // dates decoded, XML entities like R&D resolved)
    val typed = employees.as[Model.Employee].collect()
    assert(typed.length === 161)
    assert(typed.map(_.id_employee).distinct.length === 161)
    assert(typed.forall(e => e.birthday.toLocalDate.getYear >= 1930 &&
      e.birthday.toLocalDate.getYear <= 2010))
    assert(typed.forall(e => e.hire_date.toLocalDate.getYear >= 2000))
    assert(typed.exists(_.business_unity == "R&D"))
    assert(typed.forall(_.gross_salary > 0))
    // the reference's own transport vocabulary drives the validity rules
    val modes = typed.map(_.transport_mode).toSet
    assert(Model.SportyModes.subsetOf(modes), s"modes: $modes")
    // full pipeline over the real file: validate → join → benefit report
    val validations = Ops.validateCommutes(employees)
    val report = Ops.benefitReport(
      Ops.buildFinal(employees, validations,
        graft.domain.Fixtures.activities(spark, 5, 10)))
    val rows = report.collect()
    assert(rows.length === 161)
    rows.foreach { r =>
      val valid = r.getBoolean(r.fieldIndex("commute_valid"))
      val prime = r.getDouble(r.fieldIndex("commute_prime"))
      assert(if (valid) prime > 0 else prime == 0.0)
    }
  }

  test("cell-reference decoding handles multi-letter columns") {
    assert(XlsxParse.colIndex("A1") === 0)
    assert(XlsxParse.colIndex("B3") === 1)
    assert(XlsxParse.colIndex("Z9") === 25)
    assert(XlsxParse.colIndex("AA7") === 26)
    assert(XlsxParse.colIndex("AZ12") === 51)
  }
}
