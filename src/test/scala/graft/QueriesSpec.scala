package graft

/** Smoke: every declared query runs and yields rows on sf0.001, and every
  * oracle key is a declared query (driver-contract invariants).
  * Value-level correctness is checked against DuckDB by the driver (and
  * locally via tools/oracle_check.py) — not re-checked here.
  */
class QueriesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("query/oracle maps are consistent") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    assert(SparkEntry.allQueries.map(_.name).distinct.size ==
      SparkEntry.allQueries.size)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- SparkEntry.allQueries) {
    test(s"${q.name} runs on sf0.001 and returns rows") {
      val df = q.run(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0)
    }
  }
}
