package graft.operators

import org.apache.spark.sql.DataFrame

/** Incremental view maintenance for JOINS — the delta-rule algebra
  * that keeps a materialized join view fresh without recomputing it.
  * [[graft.plans.SummaryRewrite]] already maintains AGGREGATE views by
  * folding additive partials; joins need a different identity
  * (insert-only deltas, multiset semantics):
  *
  * {{{
  * (A ∪ ΔA) ⋈ (B ∪ ΔB)
  *   = A⋈B  ∪  ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB
  * }}}
  *
  * so the maintenance work is the three delta terms — each bounded by
  * |Δ| × match rate, never |A⋈B|. At 100 TB with a daily delta, every
  * term has a small side: Catalyst broadcasts ΔA into the B probe and
  * ΔB into the A probe, so the base tables are each scanned once with
  * NO base-side shuffle, and ΔA⋈ΔB is tiny-by-tiny. The view appends;
  * it is never rebuilt.
  *
  * Updates/deletes reduce to this by carrying signed multiplicities
  * (Z-sets: a changed row is a −1 retraction plus a +1 insertion and
  * the view compacts on the sign sum) — the insert-only form here is
  * the kernel both directions share.
  */
object Ivm {

  /** The three delta terms of the join identity, as one frame to
    * append to the materialized `A ⋈ B` view. All joins are plain
    * equi-joins on `keys` — AQE/broadcast planning applies.
    */
  def joinDelta(aOld: DataFrame, aDelta: DataFrame, bOld: DataFrame,
      bDelta: DataFrame, keys: Seq[String]): DataFrame =
    aDelta.join(bOld, keys)
      .unionByName(aOld.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))

  import org.apache.spark.sql.functions._

  /** Apply a SIGNED delta (Z-set) to a materialized multiset view —
    * the retraction direction [[joinDelta]]'s insert-only kernel
    * composes with: an update is (−1 old row, +1 new row), a delete is
    * −1, and the view compacts by summing multiplicities per distinct
    * row and re-expanding the positive sums. One hash shuffle on the
    * full row (the compaction group-by); delta-sized input on the
    * union side. Net-negative multiplicities indicate a retraction for
    * a row the view never held — a pipeline bug — and fail loudly
    * rather than clamp silently.
    *
    * `signedDelta` = the view's columns plus integer `signCol`.
    */
  def applySigned(view: DataFrame, signedDelta: DataFrame,
      signCol: String = "sign"): DataFrame = {
    val cols = view.columns.toSeq
    require(!cols.contains(signCol),
      s"view already has a '$signCol' column")
    require((cols :+ signCol).toSet ==
      signedDelta.columns.toSet,
      s"signed delta must be view columns + $signCol " +
        s"(got ${signedDelta.columns.mkString(", ")})")
    val m = "__graft_mult"
    val compacted = view.withColumn(signCol, lit(1L))
      .unionByName(signedDelta
        .select((cols.map(col) :+ col(signCol).cast("long")): _*))
      .groupBy(cols.map(col): _*)
      .agg(sum(signCol).as(m))
    // assertion rides the same plan: a negative sum poisons the
    // sequence() below with an explicit error, not a silent clamp
    compacted
      .withColumn(m, when(col(m) >= 0, col(m)).otherwise(
        raise_error(concat(lit("Ivm.applySigned: negative multiplicity "),
          col(m).cast("string")))))
      .filter(col(m) > 0)
      .withColumn("__graft_i", explode(expr(s"sequence(1, $m)")))
      .drop(m, "__graft_i")
  }
}
