package graft
import graft.SparkSpec
/** The driver contract: entry() smoke rows, and every query paired with
  * an oracle under one name set — a missing/mismatched oracleSql entry
  * downgrades a query to a weaker rows-only check silently. */
class EntryContractSpec extends SparkSpec {
  test("driver entry contract: rows > 0 on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.queries.size === 88)
    assert(SparkEntry.oracleSql.size === 88)
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet)
  }
}
