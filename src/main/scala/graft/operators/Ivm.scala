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
}
