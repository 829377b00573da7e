package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlInternal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator as-of join, the deepest Spark extension tier (SURVEY
  * §2.3): a custom [[LogicalPlan]] node planned by an injected
  * [[SparkStrategy]] into a sort-merge physical operator. Spark has no
  * built-in ASOF JOIN (Trino/DuckDB/pandas `merge_asof` do); the
  * composed form ([[graft.operators.Joins.asofJoinLast]]) unions both
  * sides through one window, while this operator expresses it the way
  * a native engine would: each side hash-shuffles on the key and sorts
  * by (key, ts) — both declared to Catalyst via
  * `requiredChildDistribution` / `requiredChildOrdering`, so
  * EnsureRequirements co-partitions the sides and reuses any
  * pre-existing layout — then a single forward pass per partition
  * merges them. Cost at 100 TB: one shuffle + one sort per side
  * (parallel, each side only its own columns), then an O(|L| + |R|)
  * streaming merge with O(1) state — no window buffer holding both
  * sides' rows, no theta-join.
  *
  * Semantics (pinned by AsOfJoinSpec + the `ev_asof_native` oracle row,
  * matching DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`):
  * every left row is emitted; it carries the value columns of the
  * LATEST right row with an equal key and `rightTs <= leftTs` (ties
  * visible), else nulls. NULL never matches: a null key or ts on either
  * side yields (left row, nulls) / skips the right row — SQL equi-join
  * comparison semantics, not null-sorts-together window semantics.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    outAttrs: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs

  /** `outAttrs` are born here, not consumed — without this they'd be
    * flagged as missing input by CheckAnalysis.
    */
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** DataFrame-level entry: as-of join `left` to `right` on equal
    * `keys` with `rightTs <= leftTs`, surfacing each `valueCols` as
    * `asof_<name>` (nullable). Key/ts columns are resolved by name
    * against each side's analyzed plan; key and ts types must match
    * pairwise (the operator inserts no implicit casts).
    */
  def frame(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp0 = right.queryExecution.analyzed
    // Self-join guard: when both sides derive from the same scan their
    // attributes share expression IDs, and the analyzer's
    // DeduplicateRelations would regenerate the right child's output
    // WITHOUT rewriting this node's right-side expressions (it only
    // knows built-in node shapes). Re-alias the right side with fresh
    // IDs up front so the two sides never conflict.
    val rp = if (rp0.outputSet.intersect(lp.outputSet).isEmpty) rp0
      else Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"asof: column '$n' not found on $side side " +
            s"(${p.output.map(_.name).mkString(", ")})"))
    val lk = keys.map(attr(lp, _, "left"))
    val rk = keys.map(attr(rp, _, "right"))
    lk.zip(rk).foreach { case (a, b) =>
      require(org.apache.spark.sql.catalyst.types.DataTypeUtils.sameType(a.dataType, b.dataType),
        s"asof: key type mismatch ${a.name}: ${a.dataType} vs ${b.dataType}")
    }
    val lt = attr(lp, leftTs, "left")
    val rt = attr(rp, rightTs, "right")
    require(org.apache.spark.sql.catalyst.types.DataTypeUtils.sameType(lt.dataType, rt.dataType),
      s"asof: ts type mismatch ${lt.dataType} vs ${rt.dataType}")
    val vals = valueCols.map(attr(rp, _, "right"))
    val outAttrs = vals.map(a =>
      AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())
    GraftSqlInternal.ofRows(left.sparkSession,
      AsOfJoin(lp, rp, lk, rk, lt, rt, vals, outAttrs))
  }
}

/** Plans [[AsOfJoin]] to [[AsOfJoinExec]]; a no-op on every other node.
  * Injected via `SparkSessionExtensions.injectPlannerStrategy`
  * ([[graft.functions.GraftExtensions]]).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(j.leftKeys, j.rightKeys, j.leftTime, j.rightTime,
        j.rightValues, j.outAttrs, planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Children arrive co-hash-partitioned on the
  * keys and sorted by (keys, ts) ascending — Catalyst inserts (or
  * elides, when the layout already matches) the exchanges and sorts.
  * Each partition pair merges in one forward pass: the right side is a
  * one-row lookahead cursor; per left row it advances while the right
  * key is smaller, or equal with `rightTs <= leftTs`, remembering the
  * last equal-key row passed — which is exactly the as-of match when
  * its key still equals the left key. O(1) state per partition: the
  * cursor and one remembered (key, values) pair.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightValues: Seq[Expression],
    outAttrs: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs

  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext,
      "number of left rows with an as-of match"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  /** Left rows pass through in their partition order, so the left
    * child's layout survives — a downstream per-key window or another
    * key join reuses it without a new exchange.
    */
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val valExprs = rightValues
    val outputAttrs = output
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTime.dataType
    val nVals = rightValues.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val valProj = UnsafeProjection.create(valExprs, rOut)
      val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val joined = new JoinedRow
      val nullVals = new GenericInternalRow(nVals)

      // right-side lookahead cursor; rows with a null key or null ts
      // can never match (SQL comparison semantics), so skip them here —
      // they sort first (Ascending = NullsFirst) and are passed exactly
      // once. Copies are required: the sorter reuses its output row.
      var rKey: UnsafeRow = null
      var rTs: UnsafeRow = null
      var rVals: UnsafeRow = null
      def advanceRight(): Unit = {
        rKey = null; rTs = null; rVals = null
        var found = false
        while (!found && rIter.hasNext) {
          val r = rIter.next()
          val k = rKeyProj(r)
          val t = rTsProj(r)
          if (!k.anyNull && !t.isNullAt(0)) {
            rKey = k.copy(); rTs = t.copy(); rVals = valProj(r).copy()
            found = true
          }
        }
      }
      advanceRight()

      // last equal-key right row the cursor passed; valid for a left
      // row iff its key still compares equal
      var lastKey: UnsafeRow = null
      var lastVals: UnsafeRow = null

      lIter.map { l =>
        val lKey = lKeyProj(l)
        val lTs = lTsProj(l)
        val comparable = !lKey.anyNull && !lTs.isNullAt(0)
        if (comparable) {
          var continue = true
          while (continue && rKey != null) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) advanceRight()
            else if (c == 0 && tsOrd.compare(rTs, lTs) <= 0) {
              lastKey = rKey; lastVals = rVals
              advanceRight()
            } else continue = false
          }
        }
        val matched = comparable && lastKey != null &&
          keyOrd.compare(lastKey, lKey) == 0
        numOutputRows += 1
        if (matched) {
          numMatched += 1
          resultProj(joined(l, lastVals))
        } else resultProj(joined(l, nullVals))
      }
    }
  }
}
