package graft
import graft.SparkSpec
/** The driver contract: entry() smoke rows, and every query paired with
  * an oracle under one name set — a missing/mismatched oracleSql entry
  * downgrades a query to a weaker rows-only check silently. */
class EntryContractSpec extends SparkSpec {
  test("driver entry contract: rows > 0 on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.queries.size === 140)
    assert(SparkEntry.oracleSql.size === 140)
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet)
  }

  // events.ts is TIMESTAMP(NANOS) parquet; runtimes differ on whether the
  // nanosAsLong legacy conf still applies. Pin the ADAPTATION (whatever the
  // scan resolves, Tables must hand consumers BIGINT epoch-nanos), not the
  // conf — environment drift then fails here with a named cause instead of
  // as 13 downstream `ts div …` analysis errors.
  test("events.ts normalizes to BIGINT epoch-nanos on this runtime") {
    val events = Tables.table(spark, sfDir, "events")
    val tsType = events.schema("ts").dataType
    assert(tsType === org.apache.spark.sql.types.LongType,
      s"events.ts resolved as $tsType — Tables.normalizeEventTs must cover it")
    val r = events.selectExpr(
      "min(ts div 1000000000) as lo", "max(ts div 1000000000) as hi").head()
    // sane epoch-second range (2020-01-01 .. 2030-01-01), catches unit slips
    assert(r.getLong(0) > 1577836800L && r.getLong(1) < 1893456000L,
      s"epoch-second bounds out of range: ${r.getLong(0)}..${r.getLong(1)}")
  }

  // session invariants the engine's time arithmetic depends on: UTC session
  // TZ (NTZ→LTZ interpretation + oracle parity). Assert loudly here rather
  // than letting a drifted driver session skew every time-bucketed query.
  test("session time zone is UTC") {
    assert(spark.conf.get("spark.sql.session.timeZone") === "UTC")
  }
}
