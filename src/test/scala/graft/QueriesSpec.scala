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

  test("registerAll exposes the tables and custom functions to spark.sql") {
    graft.queries.Tables.registerAll(spark, sf)
    assert(spark.sql("SELECT count(*) FROM lineitem").head.getLong(0) > 0)
    val fp = spark.sql(
      "SELECT fnv1a64(text) AS fp FROM documents LIMIT 1").head.getLong(0)
    assert(fp != 0L)
    val sim = spark.sql("""SELECT cosine_sim(CAST(embedding AS array<float>),
        CAST(embedding AS array<float>)) AS s
      FROM embeddings LIMIT 1""").head.getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-6)
  }

  for (q <- SparkEntry.allQueries) {
    test(s"${q.name} runs on sf0.001 and returns rows") {
      val df = q.run(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0)
    }
  }
}
