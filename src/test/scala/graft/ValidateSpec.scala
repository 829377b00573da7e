package graft

import org.apache.spark.sql.functions._

import graft.operators.Validate
import graft.operators.Validate.Rule

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some(5.0), "a"),   // passes both
    (2L, Some(-1.0), "b"),  // fails positive
    (3L, None, "c"),        // NULL predicate → fails positive (as null)
    (4L, Some(9.0), ""),    // fails nonempty
    (5L, Some(-2.0), "")    // fails both
  ).toDF("id", "v", "s")

  private val rules = Seq(
    Rule("positive", col("v") > 0),
    Rule("nonempty", length(col("s")) > 0))

  test("audit counts pass/fail/null per rule in one aggregate") {
    val got = Validate.audit(fixture, rules)
      .select("rule", "n_rows", "n_pass", "n_fail", "n_null", "fail_rate")
      .as[(String, Long, Long, Long, Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("nonempty", 5L, 3L, 2L, 0L, 0.4),
      ("positive", 5L, 2L, 3L, 1L, 0.6)))
  }

  test("quarantine: valid ∪ rejected = input; rejected rows name their rules") {
    val (good, bad) = Validate.quarantine(fixture, rules)
    assert(good.columns.toSeq == fixture.columns.toSeq,
      "valid side must keep the input schema")
    assert(good.select("id").as[Long].collect().sorted.toSeq == Seq(1L))
    val violations = bad.select(col("id"), col("violated"))
      .as[(Long, Seq[String])].collect().sortBy(_._1).toSeq
    assert(violations == Seq(
      (2L, Seq("positive")),
      (3L, Seq("positive")),
      (4L, Seq("nonempty")),
      (5L, Seq("positive", "nonempty"))))
    assert(good.count() + bad.count() == fixture.count())
  }

  test("audit handles rule names with dots; rejects duplicates") {
    val dotted = Validate.audit(fixture,
      Seq(Rule("v.is.positive", col("v") > 0)))
      .select("rule", "n_fail").as[(String, Long)].collect().toSeq
    assert(dotted == Seq(("v.is.positive", 3L)))
    intercept[IllegalArgumentException] {
      Validate.audit(fixture,
        Seq(Rule("dup", col("v") > 0), Rule("dup", col("v") < 0)))
    }
  }

  test("audit of k rules plans exactly one scan") {
    val df = SparkEntry.queries("q_quality_audit")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString()
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"audit must fold all rules into one scan:\n$plan")
  }

  test("audit over a clean table reports zero failures") {
    val got = Validate.audit(fixture.filter(col("id") === 1),
      rules).select("n_fail").as[Long].collect().toSeq
    assert(got == Seq(0L, 0L))
  }
}
