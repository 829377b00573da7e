package graft

import org.apache.spark.sql.functions._

import graft.plans.{AccessPolicyCatalog, PolicyDef}

/** Access policies: the governed path is filtered + masked on a plain
  * read (no query-text opt-in), the injected row filter reaches the
  * scan's PushedFilters (policy as I/O pruning, not post-filtering),
  * ungoverned reads stay untouched, masked columns keep name/type, and
  * a type-changing mask is rejected loudly.
  */
class AccessPolicySpec extends SparkSpec {
  import spark.implicits._

  private lazy val govPath = {
    val p = tmpDir("rls_spec") + "/t"
    (1 to 200).map(i => (i.toLong, s"name_$i", i % 5, (i % 7) - 3))
      .toDF("id", "name", "seg", "bal").write.parquet(p)
    AccessPolicyCatalog.register(PolicyDef(
      p, rowFilter = Some("bal > 0"), masks = Map("name" -> "md5(name)")))
    p
  }

  test("plain read of the governed path is filtered and masked") {
    val got = spark.read.parquet(govPath)
      .orderBy("id").select("id", "name", "bal")
      .as[(Long, String, Int)].collect()
    val want = (1 to 200).map(i => (i.toLong, s"name_$i", (i % 7) - 3))
      .filter(_._3 > 0)
    assert(got.map(_._1).toSeq == want.map(_._1))
    assert(got.forall(_._3 > 0))
    // masked value = md5 of the raw value, name and type preserved
    val expect = spark.createDataset(want.map(_._2)).toDF("s")
      .select(md5(col("s"))).as[String].collect()
    assert(got.map(_._2).toSeq == expect.toSeq)
  }

  test("the policy predicate reaches PushedFilters on the governed scan") {
    val plan = spark.read.parquet(govPath).select("id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s+", " ").matches(".*PushedFilters: \\[.*GreaterThan\\(bal,0\\).*"),
      s"policy filter not pushed:\n$plan")
  }

  test("ungoverned paths are untouched") {
    val p = tmpDir("rls_spec_other") + "/t"
    (1 to 50).map(i => (i.toLong, -i)).toDF("id", "bal").write.parquet(p)
    assert(spark.read.parquet(p).count() == 50)
  }

  test("aggregate over the governed read equals the explicit form") {
    val gov = spark.read.parquet(govPath).groupBy("seg")
      .agg(count(lit(1)).as("n"), min("name").as("m"))
      .orderBy("seg").collect().toSeq
    val raw = (1 to 200).map(i => (i.toLong, s"name_$i", i % 5, (i % 7) - 3))
      .toDF("id", "name", "seg", "bal")
      .filter(col("bal") > 0)
      .select(col("seg"), md5(col("name")).as("name"))
      .groupBy("seg").agg(count(lit(1)).as("n"), min("name").as("m"))
      .orderBy("seg").collect().toSeq
    assert(gov == raw)
  }

  test("a type-changing mask is rejected loudly") {
    val p = tmpDir("rls_spec_bad") + "/t"
    (1 to 10).map(i => (i.toLong, i * 1.5)).toDF("id", "v")
      .write.parquet(p)
    AccessPolicyCatalog.register(PolicyDef(
      p, rowFilter = None, masks = Map("v" -> "'redacted'")))
    val e = intercept[Exception] {
      spark.read.parquet(p).collect()
    }
    assert(e.getMessage.contains("must keep type") ||
      Option(e.getCause).exists(_.getMessage.contains("must keep type")),
      s"unexpected error: ${e.getMessage}")
  }
}
