package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * split assignment, per-group contribution caps, and mixture
  * rebalancing. All three are assignment-by-arithmetic — no sampling
  * RNG, no driver state — so results are reproducible row-for-row
  * across runs, cluster sizes, AND engines (the bucket hash is md5,
  * which DuckDB/Trino compute identically, so the declared queries sit
  * under the exact-SQL oracle gate rather than a statistical check).
  */
object Curation {

  /** Deterministic bucket in `[0, buckets)` from a salted md5 of the
    * key. The salt separates independent decisions (split vs sampling
    * vs A/B) so they don't correlate; the first 8 hex chars give 32
    * uniform bits, and the mod bias is < buckets/2^32 — negligible for
    * the ≤10^4 buckets used here. Stable under repartitioning and
    * scale-out: the bucket is a pure function of (salt, key), nothing
    * positional.
    */
  def hashBucket(key: Column, salt: String, buckets: Int): Column = {
    require(buckets > 0, s"hashBucket: buckets must be positive, got $buckets")
    conv(substring(md5(concat(lit(salt + ":"), key.cast("string"))), 1, 8),
      16, 10).cast("long") % buckets
  }

  /** Deterministic weighted-sampling key (the A-ES / exponential-clocks
    * scheme): draw u ~ Uniform(0,1) from a salted md5 of the key, then
    * `-ln(u) / weight` is an Exponential(weight) arrival time — taking
    * the smallest k keys per stratum is a weighted sample without
    * replacement, P(selected) ∝ weight. Everything is a pure function
    * of (salt, key, weight): reruns, repartitioning, and cluster
    * scale-out pick the SAME sample, and min-k selection distributes as
    * a bounded top-k (no global sort). The key is floor-truncated to a
    * 1e-12 grid so the ln ULP across engines can't reorder ranks
    * (ties on the grid break by the caller's tiebreak column).
    */
  def weightedSampleKey(key: Column, weight: Column, salt: String): Column = {
    val h = conv(substring(md5(concat(lit(salt + ":"),
      key.cast("string"))), 1, 8), 16, 10).cast("double")
    // h ∈ [0, 2^32): map to u ∈ (0, 1) exactly (h integral in double)
    val u = (h + lit(1.0)) / lit(4294967297.0)
    floor(-log(u) / weight * 1e12) / 1e12
  }

  /** Train/val/test (or any weighted) split assignment: each key lands
    * in exactly one named split, with expected proportions
    * `weightPct/100`, decided by [[hashBucket]] — the split a document
    * gets is a property of the document, not of the run. Weights must
    * sum to 100.
    */
  def splitAssign(key: Column, salt: String,
      weights: Seq[(String, Int)]): Column = {
    require(weights.nonEmpty && weights.map(_._2).sum == 100,
      s"splitAssign: weights must sum to 100, got $weights")
    val b = hashBucket(key, salt, 100)
    // when-chain over cumulative bounds; the last split is the
    // otherwise-branch so the bounds always cover [0, 100)
    val bounds = weights.init.scanLeft(0)(_ + _._2).tail.zip(weights.init)
    bounds.foldRight(lit(weights.last._1): Column) {
      case ((upper, (name, _)), otherwise) =>
        when(b < upper, name).otherwise(otherwise)
    }
  }

  /** Cap each group's contribution to the corpus: keep at most `n` rows
    * per `group`, best-first by `order`. One keyed shuffle (the window);
    * at extreme group cardinality skew route through
    * [[graft.functions.TopK]]'s bounded aggregator instead — the
    * semantics are identical, this form keeps every surviving column
    * without restructuring.
    */
  def capPerGroup(df: DataFrame, group: Column, order: Seq[Column],
      n: Int): DataFrame = {
    require(n > 0, s"capPerGroup: n must be positive, got $n")
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(group).orderBy(order: _*)))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Rebalance a skewed corpus to a UNIFORM group mixture: every group
    * is deterministically downsampled to (in expectation) the smallest
    * group's size. A row survives iff
    * `bucket(key) * n_group < n_min * resolution` — pure integer
    * arithmetic, so the kept set is exactly reproducible. Group counts
    * are one tiny aggregate (a row per group) broadcast back onto the
    * fact side: cost at 100 TB is one scan + one broadcast join, no
    * fact-side shuffle.
    */
  def uniformMixture(df: DataFrame, group: Column, key: Column,
      salt: String, resolution: Int = 10000): DataFrame = {
    val counts = df.groupBy(group.as("__grp"))
      .agg(count(lit(1)).as("__n_grp"))
    val floor = broadcast(counts.agg(min("__n_grp").as("__n_min")))
    // null-safe join: a NULL group is a group like any other — a plain
    // === would silently drop its rows while still letting its count
    // set the floor, over-downsampling every real group
    df.join(broadcast(counts), group <=> col("__grp"))
      .crossJoin(floor)
      .filter(hashBucket(key, salt, resolution) * col("__n_grp") <
        col("__n_min") * lit(resolution.toLong))
      .drop("__grp", "__n_grp", "__n_min")
  }

  /** Temperature-flattened mixture at α = 0.5 (square-root sampling):
    * every group is deterministically downsampled toward a share
    * ∝ √(its natural size) — between [[uniformMixture]] (α = 0) and
    * keeping the natural mix (α = 1). A row survives iff
    * `bucket(key) < floor((resolution · √n_min) / √n_group)`: the
    * smallest group keeps everything, a group 100× larger keeps 10%.
    * α is FIXED at 0.5 on purpose — √, ×, ÷ are IEEE correctly-rounded
    * everywhere so the decision is bit-identical across engines and
    * reruns, while a general pow(n, α) is libm-dependent and flips
    * boundary rows. Same cost shape as [[uniformMixture]]: one tiny
    * per-group aggregate broadcast back, no fact-side shuffle.
    */
  def temperatureMixture(df: DataFrame, group: Column, key: Column,
      salt: String, resolution: Int = 10000): DataFrame = {
    val counts = df.groupBy(group.as("__grp"))
      .agg(count(lit(1)).as("__n_grp"))
    val floorRow = broadcast(counts.agg(min("__n_grp").as("__n_min")))
    df.join(broadcast(counts), group <=> col("__grp"))
      .crossJoin(floorRow)
      .filter(hashBucket(key, salt, resolution) <
        floor((lit(resolution.toDouble) * sqrt(col("__n_min"))) /
          sqrt(col("__n_grp"))))
      .drop("__grp", "__n_grp", "__n_min")
  }

  /** Byte-budget shard assignment: every row gets the shard its global
    * byte offset (exclusive prefix sum of `bytesCol` in `orderCol`
    * order) falls in — the deterministic "write the corpus as ~equal
    * shards" step of a training-data export, with a manifest one
    * groupBy away.
    *
    * A global ordered cumulative sum is the textbook scale trap: the
    * naive `Window.orderBy(orderCol)` funnels 100 TB through ONE
    * partition. This is the two-phase form that doesn't: rows bucket
    * coarsely by `orderCol div bucketSize`; per-bucket byte sums (one
    * ordinary aggregate) feed a window over the BUCKET relation —
    * n/bucketSize rows, the pre-aggregate-only global window this
    * repo's Analytics rule allows — whose exclusive prefix is each
    * bucket's starting offset; offsets broadcast back and each row
    * adds its intra-bucket exclusive prefix, a window PARTITIONED by
    * bucket (≤ bucketSize rows per partition). Integral `div`
    * end-to-end — no double rounding at 100 TB offsets. Shards can
    * exceed `budget` by at most one row's bytes (a row is never
    * split); every shard start is exact.
    */
  def shardByBytes(df: DataFrame, orderCol: String, bytesCol: Column,
      budget: Long, bucketSize: Long = 4096L): DataFrame = {
    require(budget > 0, s"shardByBytes: budget must be positive, got $budget")
    val sized = df.withColumn("__bytes", bytesCol.cast("bigint"))
      .withColumn("__b", expr(s"$orderCol div $bucketSize"))
    val offsets = sized.groupBy("__b").agg(sum("__bytes").as("__bsum"))
      .withColumn("__offset", coalesce(
        sum("__bsum").over(Window.orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__b", "__offset")
    sized.join(broadcast(offsets), "__b")
      .withColumn("__local", coalesce(
        sum("__bytes").over(Window.partitionBy("__b").orderBy(orderCol)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("shard_id", expr(s"(__offset + __local) div $budget"))
      .drop("__b", "__offset", "__local", "__bytes")
  }

  /** Contrastive-batch shaping: assign docs to `nBatches` training
    * batches so no two members of one near-dup CLUSTER share a batch —
    * in-batch negatives (CLIP/SimCLR-style contrastive losses) treat
    * every other batch member as a negative, and a near-duplicate
    * landing in the same batch becomes a FALSE negative that actively
    * un-trains the model. Input `members`: (id, cluster) — singletons
    * carry their own id as cluster.
    *
    * Deterministic, one cluster-keyed window, no RNG: member rank0
    * within its cluster (ordered by id) lands in batch
    * (rank0 + cluster mod n) mod n — distinct batches per cluster by
    * construction, and the cluster-offset stagger spreads small
    * clusters evenly instead of piling every rank-0 doc into batch 0.
    * Members past rank n−1 are DROPPED (a cluster may fill at most one
    * slot per batch — the dedup-aware cap; report the drop count, as
    * any bounding operator must). At scale: the window shuffles the
    * (id, cluster) relation once on cluster; nothing is corpus-quadratic.
    */
  def contrastiveBatches(members: DataFrame, nBatches: Int): DataFrame = {
    val w = Window.partitionBy("cluster").orderBy("id")
    members
      .withColumn("rank0", row_number().over(w).cast("long") - 1L)
      .filter(col("rank0") < nBatches)
      .withColumn("batch",
        (col("rank0") + col("cluster") % nBatches) % nBatches)
      .drop("rank0")
  }
}
