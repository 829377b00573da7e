package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Aggregate navigation — route covered aggregates to a pre-built
  * summary table (the classic materialized-view rewrite, done as a
  * Catalyst `Rule[LogicalPlan]`).
  *
  * At 100 TB the recurring reporting shape — `GROUP BY` a handful of
  * low-cardinality dimensions with additive measures — rescans the
  * full fact table every run even though a tiny pre-aggregate already
  * holds the answer. The warehouse pattern is to maintain that
  * pre-aggregate once per load (the reference's recurring-batch loop,
  * `data_integration/main.ipynb`, re-pulls full query results on every
  * cycle for exactly these reporting shapes) and answer covered
  * queries from it. Doing the routing in the OPTIMIZER — instead of
  * asking users to point queries at the summary — keeps every caller
  * on the base table: the plan silently swaps a fact-table scan (at
  * sf0.1, 600 k rows; at 100 TB, everything) for a scan of a
  * dims-product-sized parquet (~42 rows here), and queries the summary
  * does NOT cover are left byte-for-byte untouched.
  *
  * Soundness rules (all enforced, see [[SummaryRewrite.rewrite]]):
  *   - the scan under the aggregate must be the registered base table,
  *     reached only through attribute-preserving `Project`s and
  *     `Filter`s whose predicates reference DIMENSION columns only
  *     (a measure filter changes which rows fold into a group — the
  *     summary can't answer it);
  *   - every grouping column must be a summary dimension (re-grouping
  *     a dims-SUBSET is fine: `SUM` of sums and `SUM` of counts
  *     re-aggregate losslessly — the additivity that makes rollup
  *     algebra work);
  *   - every aggregate must be `SUM(measure)` (→ `SUM(sum_measure)`),
  *     `COUNT(*)`/`COUNT(1)` (→ `SUM(cnt)`), or — for measures the
  *     registration declares NULL-FREE — `AVG(measure)`
  *     (→ `SUM(sum_measure)/SUM(cnt)`, the weighted mean over
  *     partials); all non-DISTINCT and unfiltered. `COUNT(DISTINCT)`
  *     and percentiles are not additive over partials and are
  *     deliberately not claimed (mergeable-sketch variants live in
  *     `graft.queries.Scale`).
  *
  * Output attribute `ExprId`s are preserved (aliases are re-issued
  * under the original ids), so parent operators — the final rounding
  * `Project`, sorts — resolve against the rewritten aggregate without
  * replanning.
  *
  * Registration: `spark.experimental.extraOptimizations` (the public
  * runtime hook — idempotent install via [[SummaryRewrite.install]])
  * or `SparkSessionExtensions.injectOptimizerRule` when building the
  * session (`graft.functions.GraftExtensions`). With an empty
  * [[SummaryCatalog]] the rule matches nothing.
  */
case class SummaryDef(
    baseDir: String,
    summaryPath: String,
    dims: Set[String],
    sums: Map[String, String],
    cntCol: String,
    nullFreeMeasures: Set[String] = Set.empty)

/** Process-wide registry of summary tables, keyed by the base-table
  * path the rewrite recognizes. Registration is per-dataset (the
  * maintenance job that refreshes the summary registers it); lookup
  * is on every optimized plan, so it stays a tiny immutable list.
  */
object SummaryCatalog {
  @volatile private var defs: List[SummaryDef] = Nil
  private val analyzedCache = new ConcurrentHashMap[String, LogicalPlan]()

  def register(d: SummaryDef): Unit = synchronized {
    defs = d :: defs.filterNot(_.baseDir == d.baseDir)
  }
  def clear(): Unit = synchronized { defs = Nil; analyzedCache.clear() }
  def lookup(scanPaths: Seq[String]): Option[SummaryDef] =
    defs.find(d => scanPaths.nonEmpty &&
      scanPaths.forall(_.contains(d.baseDir)))

  /** Analyzed relation of the summary parquet, cached so the optimizer
    * does not re-list files on every covered query. Fresh `ExprId`s per
    * cache entry are fine: each rewrite re-maps through attribute NAMES
    * and the plan is immutable.
    */
  private[plans] def summaryRelation(spark: SparkSession,
      path: String): LogicalPlan =
    analyzedCache.computeIfAbsent(path,
      p => spark.read.parquet(p).queryExecution.analyzed)
}

case class SummaryRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate => rewrite(agg).getOrElse(agg)
  }

  /** Unwraps attribute-only Projects and dim-only Filters down to the
    * base-table scan; returns the collected filter predicates.
    * Any other operator between aggregate and scan → no rewrite.
    */
  private def unwrap(plan: LogicalPlan,
      conds: List[Expression]): Option[(LogicalRelation, List[Expression])] =
    plan match {
      case lr: LogicalRelation => Some((lr, conds))
      case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(child, conds)
      case Filter(cond, child) => unwrap(child, cond :: conds)
      case _ => None
    }

  private def scanPaths(lr: LogicalRelation): Seq[String] = lr.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
    case _ => Seq.empty
  }

  private def rewrite(agg: Aggregate): Option[Aggregate] = for {
    (lr, conds) <- unwrap(agg.child, Nil)
    d <- SummaryCatalog.lookup(scanPaths(lr))
    // grouping: attribute refs over summary dims only
    groupAttrs <- Some(agg.groupingExpressions).filter(_.forall {
      case a: AttributeReference => d.dims.contains(a.name)
      case _ => false
    })
    // filters: every referenced column must be a dimension
    _ <- Some(conds).filter(_.forall(_.references.forall(
      a => d.dims.contains(a.name))))
    sOut = SummaryCatalog.summaryRelation(spark, d.summaryPath)
      .output.map(a => a.name -> a).toMap
    // aggregates: grouping passthroughs, or any expression tree over
    // SUM(measure) / COUNT(*) calls and dimension attributes —
    // CollapseProject routinely folds the final projection (rounding,
    // ratios) INTO the aggregate, so the agg calls sit under composite
    // expressions, not directly under the alias
    newAggs <- traverse(agg.aggregateExpressions) {
      case a: AttributeReference if d.dims.contains(a.name) =>
        Some(Alias(sOut(a.name), a.name)(exprId = a.exprId))
      case al @ Alias(child, name) =>
        rewriteExpr(child, d, sOut).map(c =>
          Alias(c, name)(exprId = al.exprId))
      case _ => None
    }
  } yield {
    val sRel = SummaryCatalog.summaryRelation(spark, d.summaryPath)
    val filtered = conds.foldLeft(sRel)((p, c) => Filter(
      c.transform { case a: AttributeReference => sOut(a.name) }, p))
    Aggregate(
      groupAttrs.map { case a: AttributeReference => sOut(a.name) },
      newAggs, filtered)
  }

  /** Rewrites an aggregate-output expression tree onto the summary:
    * covered aggregate calls swap to their partial re-aggregations,
    * dimension attributes remap by name, any composite around them
    * (rounding, arithmetic) is preserved node-for-node. `None` the
    * moment anything uncovered appears — an unknown aggregate
    * function, DISTINCT/FILTER modifiers, a measure attribute outside
    * an aggregate call — so partial coverage never half-rewrites.
    */
  private def rewriteExpr(e: Expression, d: SummaryDef,
      sOut: Map[String, Attribute]): Option[Expression] = e match {
    case AggregateExpression(s: Sum, Complete, false, None, _) =>
      s.child match {
        case m: AttributeReference if d.sums.contains(m.name) =>
          Some(AggregateExpression(s.copy(child = sOut(d.sums(m.name))),
            Complete, isDistinct = false))
        case _ => None
      }
    case AggregateExpression(c: Count, Complete, false, None, _)
        if c.children.forall(_.foldable) =>
      Some(AggregateExpression(Sum(sOut(d.cntCol)), Complete,
        isDistinct = false))
    // AVG(measure) = SUM(sum_measure) / SUM(cnt): the weighted mean
    // over partials — NOT avg of partial avgs, which would weight every
    // group equally. Sound ONLY for null-free measures (Average divides
    // by the non-null count; the summary's cnt counts all rows), so the
    // registration must declare the measure null-free — an ingest
    // contract the summary builder can assert (count(m) = count(*))
    // when it writes the partials.
    case AggregateExpression(av: Average, Complete, false, None, _) =>
      av.child match {
        case m: AttributeReference if d.sums.contains(m.name) &&
            d.nullFreeMeasures.contains(m.name) =>
          Some(Divide(
            Cast(AggregateExpression(Sum(sOut(d.sums(m.name))), Complete,
              isDistinct = false), org.apache.spark.sql.types.DoubleType),
            Cast(AggregateExpression(Sum(sOut(d.cntCol)), Complete,
              isDistinct = false), org.apache.spark.sql.types.DoubleType)))
        case _ => None
      }
    case _: AggregateExpression => None
    case a: AttributeReference =>
      if (d.dims.contains(a.name)) Some(sOut(a.name)) else None
    case other =>
      traverse(other.children)(rewriteExpr(_, d, sOut))
        .map(other.withNewChildren)
  }

  private def traverse[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val out = xs.map(f)
    if (out.forall(_.isDefined)) Some(out.map(_.get)) else None
  }
}

object SummaryRewrite {
  /** Idempotent runtime installation via the public
    * `spark.experimental.extraOptimizations` hook.
    */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[SummaryRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SummaryRewrite(spark)
  }
}
