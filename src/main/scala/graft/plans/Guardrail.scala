package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.rules.Rule

/** Query guardrail — optimizer-level protection against the one shape
  * that reliably takes a 1000-executor cluster down: an UNCONDITIONED
  * join (cartesian product / condition-free nested loop) between two
  * relations that are both large. |A|×|B| rows is not a slow query, it
  * is an outage; on a shared warehouse the right failure mode is an
  * immediate, explainable rejection at PLAN time, before a single task
  * launches.
  *
  * Policy (all thresholds per session, so an admin can tune or a
  * break-glass session can disable):
  *   - `spark.graft.guardrail.enabled` (default FALSE — opt-in, like
  *     every governance rule here; Spark's own
  *     `spark.sql.crossJoin.enabled` has been true since 3.0, so by
  *     default nothing changes)
  *   - a condition-free Inner/Cross join is rejected unless EITHER
  *     side's size estimate is at or below
  *     `spark.graft.guardrail.maxBroadcastableBytes` (default 64 MB) —
  *     the broadcast-band dim⋈fact pattern (`ev_value_bands`) stays
  *     legal because its dim side is tiny; statistics come from the
  *     same `logicalPlan.stats` the join planner itself uses.
  *
  * Runs as a pre-CBO optimizer rule: it REJECTS (throws), never
  * rewrites, so it cannot change any query result — the gate's 212
  * oracle-checked queries all pass with the flag on (GuardrailSpec
  * runs a sample to pin that) because none of them contains an
  * unconditioned large×large join.
  */
case class GuardrailRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean = spark.conf
    .getOption("spark.graft.guardrail.enabled").exists(_.toBoolean)

  private def maxSmallBytes: Long = spark.conf
    .getOption("spark.graft.guardrail.maxBroadcastableBytes")
    .map(_.toLong).getOrElse(64L * 1024 * 1024)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (enabled) {
      plan.foreach {
        case j @ Join(left, right, Inner | Cross, None, _) =>
          val (l, r) = (left.stats.sizeInBytes, right.stats.sizeInBytes)
          val small = BigInt(maxSmallBytes)
          if (l > small && r > small) {
            throw new org.apache.spark.SparkException(
              s"graft guardrail: unconditioned ${j.joinType} join " +
                s"between two large relations (est. $l x $r bytes) — " +
                "this plan is O(|A|*|B|). Add a join condition, " +
                "pre-aggregate one side under " +
                s"spark.graft.guardrail.maxBroadcastableBytes=" +
                s"$maxSmallBytes, or disable " +
                "spark.graft.guardrail.enabled for this session.")
          }
        case _ => ()
      }
    }
    plan
  }
}
