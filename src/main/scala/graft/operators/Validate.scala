package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level data-quality validation: declarative rules evaluated in
  * ONE pass over the data, either as an aggregate audit (per-rule
  * violation counts — the report a pipeline gates a load on) or as a
  * quarantine split (valid rows forward, violating rows to a reject
  * sink with the list of rules they broke).
  *
  * Null semantics are explicit: a rule passes only where its predicate
  * is TRUE — NULL predicates count as violations (`n_null` is also
  * reported separately in the audit, since "missing" and "wrong"
  * usually route to different owners). All rule expressions evaluate in
  * the same projection, so an audit of k rules costs one scan + one
  * 1-row aggregate regardless of k, and the quarantine split costs one
  * scan per output actually materialized — never a scan per rule.
  */
object Validate {

  /** A named row-level constraint; `predicate` TRUE = the row passes. */
  case class Rule(name: String, predicate: Column)

  private def passes(r: Rule): Column = coalesce(r.predicate, lit(false))

  /** Per-rule audit: one row per rule with pass/fail/null counts. The
    * k per-rule counts fold in a single aggregate over one scan
    * (conditional sums, no per-rule jobs); output is k rows.
    */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit: at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      s"audit: duplicate rule names in ${rules.map(_.name)}")
    // positional aliases, referenced back with backticks: a rule name
    // is data (it lands in the `rule` column), so a dot or space in it
    // must not be parsed as column navigation
    def q(s: String): Column = col(s"`$s`")
    val aggs = rules.zipWithIndex.flatMap { case (r, i) =>
      Seq(sum(when(passes(r), 1L).otherwise(0L)).as(s"__pass_$i"),
        sum(when(r.predicate.isNull, 1L).otherwise(0L)).as(s"__null_$i"))
    }
    val totals = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // pivot the single wide row into (rule, counts) rows with a stack —
    // k is tiny, the exploded shape is what reports/gates consume
    val stacked = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"),
        col("__n").as("n_rows"),
        q(s"__pass_$i").as("n_pass"),
        (col("__n") - q(s"__pass_$i")).as("n_fail"),
        q(s"__null_$i").as("n_null"))
    }
    totals.select(explode(array(stacked: _*)).as("a")).select("a.*")
      .withColumn("fail_rate",
        round(col("n_fail").cast("double") / greatest(col("n_rows"), lit(1L)), 4))
  }

  /** Quarantine split: `(valid, rejected)`. A row is valid iff EVERY
    * rule passes; rejected rows carry `violated` — the names of the
    * rules they broke (NULL predicate = broken). Both frames derive
    * from one plan; only what the caller writes is computed.
    */
  def quarantine(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "quarantine: at least one rule")
    val violated = filter(
      array(rules.map(r => when(!passes(r), lit(r.name))): _*),
      _.isNotNull)
    val tagged = df.withColumn("violated", violated)
    (tagged.filter(size(col("violated")) === 0).drop("violated"),
      tagged.filter(size(col("violated")) > 0))
  }
}
