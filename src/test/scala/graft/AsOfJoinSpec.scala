package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.operators.Joins
import graft.plans.AsOfJoinExec

/** The native whole-operator as-of join: semantics pinned against the
  * composed union-window form and against hand-computed oracles, plan
  * shape pinned to exactly the sort-merge layout the operator declares
  * (one exchange + one sort per side, nothing else).
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** collect() stops at AQE query-stage boundaries (stages wrap their
    * plan as a non-child field); recurse through them.
    */
  private def collectAll[T](p: SparkPlan)(
      pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    p.collect(pf) ++
      p.collect { case s: QueryStageExec => collectAll(s.plan)(pf) }.flatten
  }

  test("native as-of equals the composed union-window form on events") {
    val ev = graft.queries.Tables(spark, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("ts").as("click_ts"))
    val native = Joins.asofJoinMerge(purchases, clicks, Seq("user_id"),
      "ts", "ts", Seq("click_ts")).orderBy("event_id").collect()
    val composed = Joins.asofJoinLast(purchases, clicks, Seq("user_id"),
      "ts", "ts", Seq("click_ts")).orderBy("event_id").collect()
    assert(native.length == composed.length)
    assert(native.sameElements(composed))
  }

  test("plan: AsOfJoinExec with exactly one exchange and one sort per side") {
    val left = Seq((1L, ts(10), "a"), (2L, ts(20), "b"))
      .toDF("k", "t", "payload")
    val right = Seq((1L, ts(5), 1.0), (2L, ts(25), 2.0))
      .toDF("k", "t", "v")
    val df = Joins.asofJoinMerge(left, right, Seq("k"), "t", "t", Seq("v"))
    val plan = finalPlan(df)
    val asofs = collectAll(plan) { case e: AsOfJoinExec => e }
    assert(asofs.length == 1, plan.toString)
    val shuffles = collectAll(plan) { case e: ShuffleExchangeLike => e }
    assert(shuffles.length == 2, plan.toString)
    val sorts = collectAll(plan) {
      case s: org.apache.spark.sql.execution.SortExec => s
    }
    assert(sorts.length == 2, plan.toString)
  }

  test("latest-row-wins, ties visible, left rows without match kept") {
    val left = Seq(
      (1L, ts(10)), // after two right rows -> latest (t=8) wins
      (1L, ts(5)),  // tie with right at t=5 -> visible
      (1L, ts(1)),  // before all right rows -> null
      (9L, ts(50))  // key with no right rows -> null
    ).toDF("k", "t")
    val right = Seq(
      (1L, ts(5), "r5"), (1L, ts(8), "r8"), (2L, ts(1), "other")
    ).toDF("k", "t", "v")
    val got = Joins.asofJoinMerge(left, right, Seq("k"), "t", "t", Seq("v"))
      .orderBy("k", "t")
      .select("k", "asof_v").as[(Long, Option[String])].collect()
    assert(got.toSeq == Seq(
      (1L, None), (1L, Some("r5")), (1L, Some("r8")), (9L, None)))
  }

  test("NULL never matches: null keys/ts on either side, rows still kept") {
    val left = Seq(
      (Some(1L), Some(ts(10))), // normal match
      (None, Some(ts(10))),     // null key -> kept, no match
      (Some(1L), None)          // null ts -> kept, no match
    ).toDF("k", "t")
    val right = Seq(
      (Some(1L), Some(ts(5)), "r"),
      (Some(1L), None, "null_ts"),   // never a match
      (None, Some(ts(1)), "null_k")  // never a match
    ).toDF("k", "t", "v")
    val got = Joins.asofJoinMerge(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("k", "asof_v").as[(Option[Long], Option[String])]
      .collect().toSet
    assert(got == Set(
      (Some(1L), Some("r")), (None, None), (Some(1L), None)))
  }

  test("several value columns come from the SAME matched right row") {
    val left = Seq((1L, ts(10))).toDF("k", "t")
    val right = Seq(
      (1L, ts(4), "a", 1.0), (1L, ts(6), "b", 2.0)
    ).toDF("k", "t", "name", "score")
    val got = Joins.asofJoinMerge(left, right, Seq("k"), "t", "t",
        Seq("name", "score"))
      .select("asof_name", "asof_score").as[(String, Double)].collect()
    assert(got.toSeq == Seq(("b", 2.0)))
  }

  test("multi-column keys and genuinely-null right values survive the match") {
    val left = Seq(("eu", 1L, ts(10)), ("us", 1L, ts(10))).toDF("r", "k", "t")
    val right = Seq(
      ("eu", 1L, ts(5), Option.empty[String]), // matched row carries NULL value
      ("us", 1L, ts(5), Some("x"))
    ).toDF("r", "k", "t", "v")
    val got = Joins.asofJoinMerge(left, right, Seq("r", "k"), "t", "t",
        Seq("v"))
      .orderBy("r").select("r", "asof_v")
      .as[(String, Option[String])].collect()
    // the eu row DID match (a right row exists at t=5) — its value is
    // simply null; the operator must not confuse that with no-match
    assert(got.toSeq == Seq(("eu", None), ("us", Some("x"))))
  }

  test("self-join from one scan: shared expression IDs are re-aliased") {
    val ev = graft.queries.Tables(spark, sf, "events")
    // both sides from the SAME DataFrame instance — exprIds collide
    val df = Joins.asofJoinMerge(
      ev.select("event_id", "user_id", "ts"),
      ev.select(col("user_id"), col("ts"), col("value")),
      Seq("user_id"), "ts", "ts", Seq("value"))
    assert(df.count() == ev.count())
  }
}
