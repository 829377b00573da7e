package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.functions._

import graft.plans.ApproxGovernor

/** Approximation governor: flag off ⇒ the distinct Count survives and
  * results are exact; flag on ⇒ the optimized plan carries HLL++ (no
  * distinct aggregate), estimates land within the sketch bound, and
  * downstream expressions over the count still resolve (resultId
  * preservation). Soundness bounds: multi-column and FILTER'd
  * distincts never rewrite.
  */
class ApproxGovernorSpec extends SparkSpec {
  import spark.implicits._

  ApproxGovernor.install(spark)

  private lazy val df = (1 to 5000)
    .map(i => (i % 7, (i * 2654435761L) % 1000, i % 3))
    .toDF("g", "v", "w")

  private def aggFns(plan: DataFrame): Seq[AggregateExpression] =
    plan.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    }) ++ plan.queryExecution.optimizedPlan.children.flatMap(
      _.expressions.flatMap(_.collect {
        case ae: AggregateExpression => ae
      }))

  private def withFlag[A](on: Boolean)(body: => A): A =
    try {
      spark.conf.set(ApproxGovernor.Flag, on.toString)
      body
    } finally spark.conf.set(ApproxGovernor.Flag, "false")

  test("flag off: distinct Count survives, result exact") {
    val q = df.groupBy("g").agg(countDistinct("v").as("n"))
    withFlag(false) {
      assert(aggFns(q).exists(ae =>
        ae.isDistinct && ae.aggregateFunction.isInstanceOf[Count]))
      val exact = q.orderBy("g").as[(Int, Long)].collect()
      val want = (1 to 5000).map(i => (i % 7, (i * 2654435761L) % 1000))
        .distinct.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      exact.foreach { case (g, n) => assert(n == want(g)) }
    }
  }

  test("flag on: HLL++ replaces the distinct count, estimate in bound") {
    val q = df.groupBy("g").agg(countDistinct("v").as("n"))
    withFlag(true) {
      val fns = aggFns(q)
      assert(fns.exists(_.aggregateFunction
        .isInstanceOf[HyperLogLogPlusPlus]))
      assert(!fns.exists(ae =>
        ae.isDistinct && ae.aggregateFunction.isInstanceOf[Count]))
      val approx = q.orderBy("g").as[(Int, Long)].collect().toMap
      val exact = (1 to 5000).map(i => (i % 7, (i * 2654435761L) % 1000))
        .distinct.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      exact.foreach { case (g, n) =>
        assert(math.abs(approx(g) - n).toDouble / n <= 0.15,
          s"group $g: approx ${approx(g)} vs exact $n")
      }
    }
  }

  test("resultId preserved: arithmetic over the count still resolves") {
    val q = df.groupBy("g")
      .agg((countDistinct("v") * 2 + 1).as("n2"))
      .filter(col("n2") > 0)
    withFlag(true) {
      assert(q.count() == 7)
    }
  }

  test("soundness: multi-column and FILTER'd distincts never rewrite") {
    val multi = df.groupBy("g")
      .agg(countDistinct("v", "w").as("n"))
    val filtered = df.groupBy("g")
      .agg(count_distinct(col("v")).as("n"))
    withFlag(true) {
      assert(!aggFns(multi).exists(_.aggregateFunction
        .isInstanceOf[HyperLogLogPlusPlus]))
      assert(aggFns(multi).exists(ae =>
        ae.isDistinct && ae.aggregateFunction.isInstanceOf[Count]))
      // FILTER'd form via SQL (the DataFrame API has no FILTER clause)
      df.createOrReplaceTempView("ag_t")
      val f = spark.sql(
        "SELECT g, count(DISTINCT v) FILTER (WHERE w = 1) AS n " +
          "FROM ag_t GROUP BY g")
      assert(!aggFns(f).exists(_.aggregateFunction
        .isInstanceOf[HyperLogLogPlusPlus]))
      val _ = filtered // keep the plain form exercised above
    }
  }

  test("exact twin of the declared query agrees with the estimate") {
    val out = SparkEntry.queries("q_approx_governor")(
      spark, "/root/testdata/sf0.001")
      .select("approx_custs", "exact_custs")
      .as[(Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (a, e) =>
      assert(math.abs(a - e).toDouble / e <= 0.15, s"$a vs $e")
    }
  }
}
