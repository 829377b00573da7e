package graft

import org.apache.spark.sql.functions._

import graft.sources.GraftSink

/** The pure-SQL lifecycle of graftsink tables through the registered
  * TableCatalog: DDL, DML, time travel, schema evolution, and
  * interop with the path-based API — all `spark.sql`, no DataFrame
  * writer in the main flow.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = tmpDir("graft_catalog")
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", r)
    r
  }

  test("CREATE / INSERT / SELECT / INSERT OVERWRITE / DROP through SQL") {
    root
    spark.sql("CREATE NAMESPACE graft.core")
    spark.sql("CREATE TABLE graft.core.acct (k BIGINT, s STRING)")
    // empty from birth, but EXISTS (v0 manifest)
    assert(spark.sql("SELECT * FROM graft.core.acct").count() === 0L)
    spark.sql("INSERT INTO graft.core.acct VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.core.acct VALUES (3, 'c')")
    assert(spark.sql("SELECT k FROM graft.core.acct ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 2L, 3L))
    spark.sql("INSERT OVERWRITE graft.core.acct VALUES (9, 'z')")
    assert(spark.sql("SELECT k, s FROM graft.core.acct")
      .as[(Long, String)].collect().toSeq === Seq((9L, "z")))
    assert(spark.sql("SHOW TABLES IN graft.core").collect()
      .map(_.getString(1)).toSet === Set("acct"))
    spark.sql("DROP TABLE graft.core.acct")
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.core.acct").collect()
    }
  }

  test("VERSION AS OF time travel through SQL, including across a " +
    "schema change") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tt")
    spark.sql("CREATE TABLE graft.tt.h (k BIGINT, s STRING)")   // v0
    spark.sql("INSERT INTO graft.tt.h VALUES (1, 'a')")          // v1
    spark.sql("INSERT INTO graft.tt.h VALUES (2, 'b')")          // v2
    assert(spark.sql("SELECT k FROM graft.tt.h VERSION AS OF 1")
      .as[Long].collect().toSeq === Seq(1L))
    assert(spark.sql("SELECT count(*) FROM graft.tt.h VERSION AS OF 0")
      .as[Long].head() === 0L)
    spark.sql("ALTER TABLE graft.tt.h ADD COLUMN score DOUBLE")  // v3
    spark.sql("INSERT INTO graft.tt.h VALUES (3, 'c', 0.5)")     // v4
    // latest: evolved shape, old rows null-filled
    assert(spark.sql(
      "SELECT k, score FROM graft.tt.h ORDER BY k")
      .as[(Long, Option[Double])].collect().toSeq ===
      Seq((1L, None), (2L, None), (3L, Some(0.5))))
    // pinned BEFORE the evolution: the old shape, no score column
    assert(spark.sql("SELECT * FROM graft.tt.h VERSION AS OF 2")
      .columns.toSeq === Seq("k", "s"))
  }

  test("DELETE FROM WHERE is a copy-on-write version: atomic, " +
    "time-travelable, exact") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.del")
    spark.sql("CREATE TABLE graft.del.t (k BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.del.t VALUES " +
      "(1, 'keep'), (2, 'drop'), (3, 'keep'), (4, 'drop'), (5, NULL)")
    spark.sql("DELETE FROM graft.del.t WHERE s = 'drop'")
    // null-semantics: WHERE s = 'drop' is NULL for row 5 -> survives
    assert(spark.sql("SELECT k FROM graft.del.t ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 3L, 5L))
    spark.sql("DELETE FROM graft.del.t WHERE k >= 3 AND k <= 4")
    assert(spark.sql("SELECT k FROM graft.del.t ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 5L))
    // the pre-delete state is one VERSION AS OF away
    val dir = s"$root/del/t"
    val versions = GraftSink.latestVersion(spark, dir).get
    assert(spark.sql(
      s"SELECT count(*) FROM graft.del.t VERSION AS OF ${versions - 2}")
      .as[Long].head() === 5L)
  }

  test("catalog tables and path-based reads interoperate on the same " +
    "manifests") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mix")
    spark.sql("CREATE TABLE graft.mix.t (k BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.mix.t VALUES (1, 'a')")
    // path API sees the catalog's writes...
    val dir = s"$root/mix/t"
    assert(spark.read.format("graftsink").load(dir)
      .select("k").as[Long].collect().toSeq === Seq(1L))
    // ...and the catalog sees path-API appends
    Seq((2L, "b")).toDF("k", "s").write.format("graftsink")
      .mode("append").save(dir)
    assert(spark.sql("SELECT k FROM graft.mix.t ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 2L))
    // metadata COUNT(*) also rides SQL: zero readers
    val before = GraftSink.readersCreated.get()
    assert(spark.sql("SELECT count(*) FROM graft.mix.t")
      .as[Long].head() === 2L)
    assert(GraftSink.readersCreated.get() === before)
  }

  test("DDL guardrails: duplicate create, unknown table, rename") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.g")
    spark.sql("CREATE TABLE graft.g.a (k BIGINT)")
    intercept[Exception] { spark.sql("CREATE TABLE graft.g.a (k BIGINT)") }
    spark.sql("CREATE TABLE IF NOT EXISTS graft.g.a (k BIGINT)") // no-op
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.g.nope").collect()
    }
    spark.sql("INSERT INTO graft.g.a VALUES (7)")
    // the RENAME target is catalog-relative (same catalog by contract)
    spark.sql("ALTER TABLE graft.g.a RENAME TO g.b")
    assert(spark.sql("SELECT k FROM graft.g.b").as[Long].head() === 7L)
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.g.a").collect()
    }
  }
}
