package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark has no single built-in operator for, composed from
  * stock Catalyst primitives so AQE/codegen still apply (SURVEY §2.3 —
  * the reference delegates all joins to Dune/Trino; these cover the
  * analytical surface its consumers need, e.g. the transactions ⋈
  * price_usd as-of-date join).
  */
object Joins {

  /** As-of join: for every left row, the latest right row with the same
    * key and `rightTs` <= `leftTs` (ties: the right row is visible).
    * Matches Trino/DuckDB `ASOF JOIN ... ON l.k = r.k AND l.ts >= r.ts`.
    *
    * Implemented as union + running `last(_, ignoreNulls)` window — ONE
    * shuffle on the key, no join at all. The naive alternative
    * (theta-join on `l.ts >= r.ts` + max per left row) is a quadratic
    * range join; at 100 TB the union-window plan shuffles each side once
    * and streams each key group in ts order — this is the scale path.
    *
    * Right value columns surface as `asof_<name>`; left rows with no
    * prior right row get nulls.
    */
  def asofJoinLast(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val sideCol = "__graft_is_right"
    val tsCol = "__graft_ts"
    val l = left
      .withColumn(sideCol, lit(0))
      .withColumn(tsCol, col(leftTs))
    val r = right
      .select((keys :+ rightTs).map(col) ++ valueCols.map(col): _*)
      .withColumn(sideCol, lit(1))
      .withColumn(tsCol, col(rightTs))
      .withColumnsRenamed(valueCols.map(v => v -> s"__graft_v_$v").toMap)
      .drop(rightTs)
    // Right rows sort before left rows at equal ts, so a right row at
    // exactly leftTs is visible to that left row (ASOF >= semantics).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(sideCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // The running last() must skip LEFT rows yet keep a right row whose
    // value is genuinely NULL (ASOF matches the row, not the value), and
    // with several valueCols every asof_* must come from the SAME right
    // row. Wrap the right row's values in a struct: non-null for every
    // right row, so ignoreNulls only skips left rows.
    val packed = struct(valueCols.map(v => col(s"__graft_v_$v").as(v)): _*)
    val withRow = unioned.withColumn("__graft_asof_row",
      last(when(col(sideCol) === 1, packed), ignoreNulls = true).over(w))
    // Equi-join semantics: NULL keys never match (the window would
    // otherwise group all-null keys into one partition and match them)
    val keysNotNull = keys.map(col(_).isNotNull).reduce(_ && _)
    val withAsof = valueCols.foldLeft(withRow) { (df, v) =>
      df.withColumn(s"asof_$v",
        when(keysNotNull, col("__graft_asof_row").getField(v)))
    }
    withAsof.filter(col(sideCol) === 0)
      .drop("__graft_asof_row" +: sideCol +: tsCol +:
        valueCols.map(v => s"__graft_v_$v"): _*)
  }

  /** Whole-operator as-of join — same semantics as [[asofJoinLast]]
    * (latest right row per key with `rightTs <= leftTs`, left rows
    * always kept, `asof_<name>` value columns), but executed by the
    * injected native operator ([[graft.plans.AsOfJoinExec]]): each
    * side shuffles and sorts independently on (key, ts), then a single
    * forward merge pass per partition with O(1) state. Where
    * [[asofJoinLast]] pays one combined union shuffle + window
    * buffering, this pays two smaller parallel shuffles and no window
    * buffer — and the left side's layout survives for downstream
    * reuse. Requires [[graft.functions.GraftExtensions]] on the
    * session (it injects the planner strategy).
    */
  def asofJoinMerge(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame =
    graft.plans.AsOfJoin.frame(left, right, keys, leftTs, rightTs, valueCols)

  /** Point-in-interval join where BOTH sides are large: every point row
    * pairs with every interval row sharing its `keys` whose
    * `[startCol, endCol]` (inclusive) contains `pointCol`. All three
    * position columns are numeric (e.g. epoch micros).
    *
    * The broadcast-nested-loop form (`ev_value_bands`) needs one side
    * tiny; a raw theta-join on two large sides is quadratic per key. The
    * scale path is binning: positions bucket by `bucketWidth`, intervals
    * replicate to each bucket they overlap (`sequence` + `explode`), and
    * the join becomes an EQUI join on (keys, bucket) — one hash shuffle,
    * AQE/skew-handling apply, cost ∝ matches + interval spans/width. A
    * point lives in exactly one bucket, so each qualifying pair joins
    * exactly once — no dedup pass. Pick `bucketWidth` near the typical
    * interval length: replication stays O(1) per interval while buckets
    * stay selective.
    *
    * NULL in any position column or key drops the row (SQL range-join
    * semantics: NULL compares unknown).
    */
  def pointInIntervalJoin(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val b = "__graft_bucket"
    val p = points
      .filter(col(pointCol).isNotNull)
      .withColumn(b, floor(col(pointCol) / bucketWidth).cast("long"))
    val i = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .withColumn(b, explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    p.join(i, (keys :+ b).toSeq)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(b)
  }

  /** Skew-safe equi-join: spread each hot key of `large` over `buckets`
    * salt values (derived deterministically from `saltFrom`, so re-runs
    * are stable), replicate `small` once per salt value, join on
    * (key, salt). Result set is identical to `large.join(small, key)`;
    * the win is that one hot key's rows land in `buckets` shuffle
    * partitions instead of one straggler. Complements AQE skew-join
    * (which only splits at stage boundaries it can observe).
    */
  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
      buckets: Int, saltFrom: Seq[Column]): DataFrame = {
    val saltCol = "__graft_salt"
    val l = large.withColumn(saltCol,
      pmod(xxhash64(saltFrom: _*), lit(buckets.toLong)).cast("int"))
    val s = small.withColumn(saltCol,
      explode(array((0 until buckets).map(lit): _*)))
    l.join(s, Seq(key, saltCol)).drop(saltCol)
  }

  /** Null-skew-safe LEFT join: rows whose join key is NULL can never
    * match under SQL equality, yet a plain shuffle join still hashes
    * them ALL to one partition — with dirty data (unparsed ids, legacy
    * rows) that one task carries every null row in the table. Here the
    * null-key rows bypass the join entirely (null-extended directly,
    * exactly what the left join would emit for them) and only the
    * matchable rows enter the exchange. Result ≡ `left.join(right,
    * leftKey === rightKey, "left")` row-for-row (JoinsSpec law).
    */
  def nullSafeLeftJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    // lower-cased comparison: Spark resolves case-insensitively by
    // default (spark.sql.caseSensitive=false), so "Id" vs "id" would
    // pass a case-sensitive guard and then collide at resolution time
    val shared = left.columns.map(_.toLowerCase).toSet
      .intersect(right.columns.map(_.toLowerCase).toSet)
    require(shared.isEmpty,
      s"nullSafeLeftJoin: column names must be disjoint (the null branch " +
        s"null-extends right columns by NAME); shared: $shared")
    val matched = left.filter(col(leftKey).isNotNull)
      .join(right, col(leftKey) === col(rightKey), "left")
    val nullExtended = right.schema.fields.foldLeft(
      left.filter(col(leftKey).isNull)) { (df, f) =>
      df.withColumn(f.name, lit(null).cast(f.dataType))
    }
    matched.unionByName(nullExtended)
  }
}
