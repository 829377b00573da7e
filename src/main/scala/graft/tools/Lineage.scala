package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage — the governance question every warehouse
  * change-review asks: "which SOURCE columns feed this output column?"
  * Computed by walking the ANALYZED logical plan (resolution done,
  * optimizer not yet run — lineage must describe what the query MEANS,
  * not what the optimizer happened to prune), propagating a
  * `ExprId → {(table, column)}` map bottom-up:
  *
  *  - a file scan maps each attribute to itself, table-named by its
  *    path's last segment (`lineitem.parquet` → `lineitem`);
  *  - `Project` / `Aggregate` / `Window` map each computed alias to
  *    the union of its referenced attributes' sources (VALUE lineage:
  *    `sum(a*b) AS x` ⇒ x ← {a, b});
  *  - every other operator (Filter, Join, Sort, SubqueryAlias, set
  *    ops via output positional merge…) passes sources through.
  *
  * This is value lineage, deliberately not CONTROL lineage: a filter
  * or join predicate influences which rows survive but not how an
  * output value is computed from inputs — impact analysis for "someone
  * wants to drop/retype column C" needs the value graph (control-edge
  * extension would add `plan.expressions.references` at each node).
  * At 100 TB lineage is a metadata walk — cost is plan size, never
  * data size.
  */
object Lineage {

  type Sources = Map[ExprId, Set[(String, String)]]

  /** (output column name → source (table, column) set), in the
    * DataFrame's output order.
    */
  def of(df: DataFrame): Seq[(String, Set[(String, String)])] = {
    val plan = df.queryExecution.analyzed
    val m = walk(plan)
    plan.output.map(a => a.name -> m.getOrElse(a.exprId, Set.empty))
  }

  /** Flat row form for gating: (out_col, src_table, src_column). */
  def rows(df: DataFrame): Seq[(String, String, String)] =
    of(df).flatMap { case (out, srcs) =>
      srcs.toSeq.sorted.map { case (t, c) => (out, t, c) }
    }

  private def tableName(lr: LogicalRelation): String = {
    val p = lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.headOption.fold("unknown")(_.getName)
      case _ => "unknown"
    }
    p.stripSuffix(".parquet").stripSuffix(".orc").stripSuffix(".csv")
      .stripSuffix(".json")
  }

  private def fromRefs(ne: NamedExpression, below: Sources): Sources =
    ne match {
      case a: Attribute =>
        Map(a.exprId -> below.getOrElse(a.exprId, Set.empty))
      case al: Alias =>
        Map(al.exprId -> al.references.toSeq
          .flatMap(r => below.getOrElse(r.exprId, Set.empty)).toSet)
      case other =>
        Map(other.exprId -> other.references.toSeq
          .flatMap(r => below.getOrElse(r.exprId, Set.empty)).toSet)
    }

  private def walk(plan: LogicalPlan): Sources = plan match {
    case lr: LogicalRelation =>
      val t = tableName(lr)
      lr.output.map(a => a.exprId -> Set(t -> a.name)).toMap
    case p: Project =>
      val below = walk(p.child)
      below ++ p.projectList.flatMap(fromRefs(_, below))
    case a: Aggregate =>
      val below = walk(a.child)
      below ++ a.aggregateExpressions.flatMap(fromRefs(_, below))
    case w: Window =>
      val below = walk(w.child)
      below ++ w.windowExpressions.flatMap(fromRefs(_, below))
    case e: Expand =>
      val below = walk(e.child)
      // each output position unions the sources of that position's
      // projections across all branches
      below ++ e.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> e.projections.flatMap(row =>
          row(i).references.toSeq
            .flatMap(r => below.getOrElse(r.exprId, Set.empty))).toSet
      }
    case g: Generate =>
      val below = walk(g.child)
      val genSrc = g.generator.references.toSeq
        .flatMap(r => below.getOrElse(r.exprId, Set.empty)).toSet
      below ++ g.generatorOutput.map(a => a.exprId -> genSrc)
    case u: Union =>
      val childMaps = u.children.map(walk)
      val merged = childMaps.reduce(_ ++ _)
      merged ++ u.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> u.children.zip(childMaps).flatMap {
          case (c, m) => m.getOrElse(c.output(i).exprId, Set.empty)
        }.toSet
      }
    case other =>
      other.children.map(walk)
        .foldLeft(Map.empty: Sources)(_ ++ _)
  }
}
