package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Row-level security + column masking — the governance layer every
  * multi-tenant warehouse puts between tables and readers (Snowflake
  * row-access/masking policies, Databricks row filters), done as a
  * Catalyst rule so EVERY read path — `spark.read`, `spark.sql`, a
  * query buried in a library — hits the policy. Readers cannot opt
  * out by phrasing the query differently, because the rewrite happens
  * at the scan node, below anything they can write.
  *
  * A [[PolicyDef]] attaches to a table path: a row-filter predicate
  * (SQL text over the table's columns, evaluated on RAW values) and
  * per-column masking expressions (same-type SQL, e.g.
  * `md5(c_name)`). The rule wraps each matching scan as
  * `Project(masked, Filter(predicate, scan))`:
  *
  *  - expressions are resolved by the REAL analyzer against an
  *    auxiliary read of the table (functions, implicit casts — no
  *    hand-rolled resolution), then re-mapped onto the live scan's
  *    attribute ids; analysis is cached per policy;
  *  - masked output keeps the original name, `ExprId`, AND data type
  *    (a type-changing mask is rejected at registration-use time:
  *    parents were resolved against the original type);
  *  - the scan node is tagged once rewritten — the rule runs inside
  *    the operator-optimization fixpoint, so the tag is what keeps
  *    wrap-of-wrap from looping;
  *  - injected via `GraftExtensions.injectOptimizerRule`, i.e. INSIDE
  *    the operator batch — the injected Filter participates in normal
  *    predicate pushdown and lands in the scan's `PushedFilters`
  *    (AccessPolicySpec gates this): at 100 TB the policy predicate
  *    prunes I/O instead of post-filtering it.
  *
  * Scope note: policies key on the table PATH — register against the
  * governed copy/layout, as with [[SummaryCatalog]]. With no policies
  * registered the rule matches nothing (every oracle-gated query runs
  * ungoverned).
  */
case class PolicyDef(
    baseDir: String,
    rowFilter: Option[String],
    masks: Map[String, String])

object AccessPolicyCatalog {
  @volatile private var defs: List[PolicyDef] = Nil
  private val resolvedCache =
    new ConcurrentHashMap[(String, String), Expression]()

  def register(d: PolicyDef): Unit = synchronized {
    defs = d :: defs.filterNot(_.baseDir == d.baseDir)
  }
  def clear(): Unit = synchronized { defs = Nil; resolvedCache.clear() }
  def lookup(scanPaths: Seq[String]): Option[PolicyDef] =
    defs.find(d => scanPaths.nonEmpty &&
      scanPaths.forall(_.contains(d.baseDir)))

  /** `sqlText` analyzed against a fresh read of `dir` by the real
    * analyzer, cached; caller re-maps the returned expression's
    * attributes onto the live scan.
    */
  private[plans] def resolved(spark: SparkSession, dir: String,
      sqlText: String): Expression =
    resolvedCache.computeIfAbsent((dir, sqlText), { _ =>
      val analyzed = spark.read.parquet(dir)
        .selectExpr(s"($sqlText) AS __policy_expr")
        .queryExecution.analyzed
      analyzed match {
        case Project(Seq(a: Alias), _) => a.child
        case other => throw new IllegalStateException(
          s"unexpected policy analysis shape: $other")
      }
    })
}

case class AccessPolicyRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private val Applied = TreeNodeTag[Boolean]("graft.accessPolicy.applied")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case lr: LogicalRelation
        if lr.getTagValue(Applied).isEmpty && policyFor(lr).isDefined =>
      val d = policyFor(lr).get
      lr.setTagValue(Applied, true)
      if (d.masks.isEmpty) {
        // filter-only: no output ids change, wrap in place
        val byName = lr.output.map(a => a.name.toLowerCase -> a).toMap
        d.rowFilter.fold[LogicalPlan](lr) { f =>
          Filter(remap(AccessPolicyCatalog.resolved(spark, d.baseDir, f),
            byName), lr)
        }
      } else {
        // masking rewrites column VALUES under the ORIGINAL ids; the
        // scan must re-key to fresh ids first — an Alias that reuses
        // its own input's ExprId is ambiguous at binding time (the
        // projection resolves it to the raw input column and the mask
        // silently disappears; caught by AccessPolicySpec)
        val fresh = lr.newInstance()
        fresh.setTagValue(Applied, true)
        val byName = fresh.output.map(a => a.name.toLowerCase -> a).toMap
        val filtered = d.rowFilter.fold[LogicalPlan](fresh) { f =>
          Filter(remap(AccessPolicyCatalog.resolved(spark, d.baseDir, f),
            byName), fresh)
        }
        val out: Seq[NamedExpression] = lr.output.map { orig =>
          val freshAttr = byName(orig.name.toLowerCase)
          d.masks.get(orig.name) match {
            case Some(m) =>
              val expr = remap(
                AccessPolicyCatalog.resolved(spark, d.baseDir, m), byName)
              require(expr.dataType == orig.dataType,
                s"mask for ${orig.name} must keep type ${orig.dataType}, " +
                  s"got ${expr.dataType}")
              Alias(expr, orig.name)(exprId = orig.exprId)
            case None =>
              Alias(freshAttr, orig.name)(exprId = orig.exprId)
          }
        }
        Project(out, filtered)
      }
  }

  private def remap(e: Expression,
      byName: Map[String, Attribute]): Expression = e.transform {
    case a: Attribute => byName.getOrElse(a.name.toLowerCase,
      throw new IllegalStateException(
        s"policy references unknown column ${a.name}"))
  }

  private def policyFor(lr: LogicalRelation): Option[PolicyDef] =
    lr.relation match {
      case fs: HadoopFsRelation => AccessPolicyCatalog.lookup(
        fs.location.rootPaths.map(_.toString))
      case _ => None
    }
}
