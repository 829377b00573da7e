package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Approximation governor — an optimizer-level accuracy/cost knob: when
  * a session opts in, every exact `COUNT(DISTINCT x)` in the plan is
  * rewritten to the mergeable HyperLogLog++ sketch aggregate
  * (`approx_count_distinct`) with a governed relative standard
  * deviation.
  *
  * Why in the OPTIMIZER and not in query text: at 100 TB an exact
  * distinct count is one of the most expensive shapes there is — every
  * (group, value) pair crosses a shuffle (Spark plans it as an Expand +
  * two aggregates) — while the sketch form ships constant-size partials
  * and never materializes the value set. Exploratory/dashboard sessions
  * want the cheap form EVERYWHERE without rewriting saved queries;
  * certification runs want exactness. A session flag moves the whole
  * surface between those modes — same query text, governed cost — the
  * same philosophy as [[SummaryRewrite]] (callers stay on the base
  * table; the plan does the navigation).
  *
  * Soundness bounds (enforced in the match):
  *   - only single-argument, unfiltered `COUNT(DISTINCT x)` rewrites —
  *     multi-column distincts and FILTER'd aggregates keep exact
  *     semantics (a sketch over a struct of columns would change null
  *     handling: COUNT DISTINCT drops rows where ANY column is null,
  *     HLL over a struct would count them);
  *   - `resultId` is preserved through `copy`, so parent expressions
  *     (aliases, arithmetic over the count) resolve unchanged;
  *   - result type matches (both LongType) — downstream operators are
  *     oblivious.
  *
  * The rewritten result is approximate (rsd default 5%): this is an
  * explicitly opted-in accuracy trade, surfaced to the gate as a
  * no-oracle query with a quantified tolerance against the exact twin
  * (`q_approx_governor`), never silently on — the flag defaults off
  * and every oracle-gated exact query runs with it off.
  */
object ApproxGovernor {
  /** Session flag: "true" enables the rewrite. Default off. */
  val Flag = "spark.graft.approx.countDistinct"
  /** Governed relative standard deviation for the sketch. */
  val Rsd = "spark.graft.approx.rsd"

  /** Idempotent runtime install (the public
    * `experimental.extraOptimizations` hook, like
    * [[SummaryRewrite.install]]); also injected session-wide by
    * `GraftExtensions`.
    */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[ApproxGovernorRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ApproxGovernorRule(spark)
  }
}

case class ApproxGovernorRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get(ApproxGovernor.Flag, "false").toBoolean) plan
    else {
      val rsd = spark.conf.get(ApproxGovernor.Rsd, "0.05").toDouble
      plan.transformAllExpressions {
        case ae @ AggregateExpression(
            Count(Seq(child)), _, true, None, _) =>
          ae.copy(
            aggregateFunction = HyperLogLogPlusPlus(child, rsd),
            isDistinct = false)
      }
    }
  }
}
