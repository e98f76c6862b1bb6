package graft.queries

import graft.SparkSpec

/** Smoke + contract checks over the whole catalog: every query runs at
  * sf0.001, yields rows, and column names are unique (the driver's compare
  * sorts columns by name — duplicates would corrupt the hash). Value-level
  * correctness is the DuckDB oracle gate (tools/selfcheck.py). */
class CatalogSpec extends SparkSpec {

  test("catalog names are unique and oracle keys ⊆ query keys") {
    val names = Catalog.all.map(_.name)
    assert(names.distinct.size === names.size)
    assert(graft.SparkEntry.oracleSql.keySet.subsetOf(graft.SparkEntry.queries.keySet))
  }

  Catalog.all.foreach { q =>
    test(s"${q.name}: runs, non-empty, unique column names") {
      val df = q.run(spark, sfDir)
      val cols = df.schema.fieldNames
      assert(cols.distinct.length === cols.length, s"duplicate columns in ${cols.mkString(",")}")
      assert(df.count() > 0, s"${q.name} returned no rows")
    }
  }

  test("entry: flagship query returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
