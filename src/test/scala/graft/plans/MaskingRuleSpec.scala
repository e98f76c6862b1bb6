package graft.plans

import graft.SparkSpec

/** Engine-enforced masking (ref `init-db.sql:74-89`): the analysis rule —
  * installed via spark.sql.extensions in [[graft.SparkSpec]]'s session —
  * must mask EVERY read path of a protected relation, with zero effect for
  * non-restricted users. */
class MaskingRuleSpec extends SparkSpec {

  test("protected view is masked for the restricted user on SQL and DataFrame reads") {
    import spark.implicits._
    val me = spark.sql("SELECT current_user() AS u").head().getString(0)
    Seq((1, "alice", "1 Main St", 100.0), (2, "bob", null, 200.0))
      .toDF("id_employee", "first_name", "address", "gross_salary")
      .createOrReplaceTempView("employees_sec")
    MaskingPolicy.protect("employees_sec", Set("first_name", "address"), me)
    try {
      val sqlRows = spark.sql(
        "SELECT id_employee, first_name, address, gross_salary " +
          "FROM employees_sec ORDER BY id_employee").collect()
      assert(sqlRows.forall(r => r.isNullAt(1) && r.isNullAt(2)),
        "PII columns must be NULL for the restricted user")
      assert(sqlRows.map(_.getDouble(3)).toSeq === Seq(100.0, 200.0),
        "non-PII columns must pass through")
      val dfRows = spark.table("employees_sec").select("first_name").collect()
      assert(dfRows.forall(_.isNullAt(0)), "DataFrame read path must be masked too")
      // aggregates over masked columns can't leak either
      val n = spark.sql(
        "SELECT COUNT(first_name) AS n FROM employees_sec").head().getLong(0)
      assert(n === 0L)
    } finally MaskingPolicy.unprotect("employees_sec")
  }

  test("non-restricted user sees raw data; optimizer folds the mask away") {
    import spark.implicits._
    Seq((1, "alice")).toDF("id_employee", "first_name")
      .createOrReplaceTempView("employees_open")
    MaskingPolicy.protect("employees_open", Set("first_name"), "someone_else")
    try {
      val df = spark.table("employees_open").select("first_name")
      assert(df.collect().map(_.getString(0)).toSeq === Seq("alice"))
      // ReplaceCurrentLike + constant folding: no conditional survives for
      // a non-restricted session user
      assert(!df.queryExecution.optimizedPlan.toString.contains("current_user"))
    } finally MaskingPolicy.unprotect("employees_open")
  }

  test("unprotected relations are untouched") {
    import spark.implicits._
    Seq((1, "x")).toDF("a", "b").createOrReplaceTempView("plain_t")
    val plan = spark.table("plain_t").queryExecution.analyzed.toString
    assert(spark.table("plain_t").collect().length === 1)
    assert(!plan.contains("current_user"))
  }
}
