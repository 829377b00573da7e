package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan quality gates: the 100 TB design rules from SURVEY §7
  * asserted against the actual Catalyst output, so a regression that
  * un-pushes a filter, turns a broadcast into a shuffle join, or adds
  * an extra shuffle fails CI — not just the benchmark.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  /** Formatted explain — scan details (PushedFilters/ReadSchema) are
    * printed in full there, unlike the truncated tree toString.
    */
  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** The plan AQE actually ran (collect first, then read it back). */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString()
  }

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  test("q6: predicates and projection reach the parquet scan") {
    val p = formatted(q("q6_revenue_filter"))
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"))
    assert(p.contains("LessThan(l_quantity"))
    // column pruning: the scan must not read unprojected columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_orderkey"))
  }

  test("q_aqp_revenue: est and exact fold in ONE lineitem scan " +
      "(conditional aggregation, no self-join)") {
    val p = formatted(q("q_aqp_revenue"))
    val scans = p.linesIterator.count(l =>
      l.contains("Location:") && l.contains("lineitem"))
    assert(scans === 1,
      s"AQP must pay one fact scan for estimate AND audit, saw $scans")
    // the sample-bucket md5 is computed once, inside the single pass
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "no join: the est/exact combine is conditional aggregation")
  }

  test("q3: dimension join broadcasts; top-k is TakeOrderedAndProject") {
    val p = plan(q("q3_segment_topk"))
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q7: every dimension side broadcasts; lineitem⋈orders is the " +
      "only shuffled join") {
    // 6-relation join: supplier, customer, nation×2 (and on q8 also
    // part/region) must all fold to BroadcastHashJoins after their
    // selective filters; only the fact⋈fact pair may shuffle. AQE's
    // final plan is the one that counts.
    val p = finalPlan(q("q7_volume_shipping"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected >=4 broadcast dim joins, got " +
      s"$broadcasts:\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"))
    val shuffledJoins = "SortMergeJoin".r.findAllIn(p).length +
      "ShuffledHashJoin".r.findAllIn(p).length
    assert(shuffledJoins <= 1,
      s"only lineitem⋈orders may shuffle, got $shuffledJoins:\n$p")
  }

  test("ev_click_in_view: the large-large interval join is equi, " +
      "never a nested loop") {
    val p = plan(q("ev_click_in_view"))
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"binned point-in-interval join must stay an equi join:\n$p")
  }

  test("q1: aggregation is partial+final (map-side combine)") {
    val p = finalPlan(q("q1_pricing_summary"))
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "expected a partial HashAggregate before the shuffle")
    // "*(n)" marks whole-stage-codegen stages in the executed plan
    assert(p.contains("*("),
      s"agg pipeline should be inside whole-stage codegen:\n$p")
  }

  test("as-of join plans exactly one shuffle and no range join") {
    val p = plan(q("ev_asof_click"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "as-of must not plan a quadratic join")
    // one Exchange for the union+window key partitioning; the final
    // orderBy adds a range Exchange — nothing else
    val exchanges = "Exchange (hashpartitioning|rangepartitioning)".r
      .findAllIn(p).size
    assert(exchanges <= 2, s"expected <=2 exchanges, plan had $exchanges:\n$p")
  }

  test("tiny range-dimension join is broadcast nested loop, not cartesian") {
    val p = plan(q("ev_value_bands"))
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("salted join stays an equi hash/merge join on (key, salt)") {
    val p = plan(q("q_salted_join"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("sessionize reuses one user_id partitioning for both windows and agg") {
    val p = plan(q("ev_sessionize"))
    // lag window, running-sum window, and groupBy(user_id, seq) must all
    // ride the same hashpartitioning(user_id) exchange; orderBy adds one
    // range exchange at the end
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n$p")
  }

  test("lag/lead/ntile windows share one customer partitioning") {
    val p = plan(q("q_lag_lead"))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1,
      s"both window orderings must ride one exchange, got $hashEx:\n$p")
  }

  test("percent_rank/cume_dist/nth_value share one priority partitioning") {
    val p = plan(q("q_window_stats"))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1,
      s"all four analytics must ride one exchange, got $hashEx:\n$p")
  }

  test("ev_interpolate: the four neighbour lookups stack on one " +
      "event_type partitioning (no exchange between the windows)") {
    val p = plan(q("ev_interpolate"))
    val first = p.indexOf("Window")
    val last = p.lastIndexOf("Window")
    assert(first >= 0 && last > first, s"expected stacked windows:\n$p")
    // the spine between the outermost and innermost window operator
    // carries only projections — an Exchange there would mean the
    // prev/next lookups repartitioned between frames
    assert(!p.substring(first, last).contains("Exchange"),
      s"windows must share one partitioning:\n$p")
  }

  test("watermark-filtered scan prunes via pushed-down predicate") {
    val df = graft.queries.Tables(spark, sf, "orders")
      .filter(col("o_orderdate") > lit("1997-06-01"))
      .select("o_orderkey", "o_orderdate")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThan(o_orderdate"))
  }

  test("q_dune_source: watermark lands IN the dune scan, not above it") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val df = q("q_dune_source")
    // AQE wraps the physical plan; collect inside the adaptive plan
    val phys = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = phys.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty, "expected a BatchScanExec leaf (dune connector)")
    val desc = scans.head.scan.description()
    assert(desc.contains("GreaterThan(o_orderdate,1996-12-31)"),
      s"watermark not pushed into the scan: $desc")
    // accepted filters are DROPPED from the plan above the scan — no
    // residual re-evaluation of the watermark
    val residual = phys.collect {
      case f: FilterExec if f.condition.toString.contains("1996-12-31") => f }
    assert(residual.isEmpty, "watermark re-evaluated above the scan")
    // declared schema ⇒ the scan reads only the projected fields
    assert(scans.head.scan.readSchema().fieldNames.toSet ==
      Set("o_orderdate", "o_totalprice"))
  }

  test("q_partition_prune: the month predicate prunes directories") {
    val p = formatted(q("q_partition_prune"))
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse(
      fail(s"no PartitionFilters line in:\n$p"))
    assert(pf.contains("om") && pf.contains("1997-09"),
      s"month predicate must be a partition filter: $pf")
    // and it must NOT appear as a data filter (the scan may have no
    // PushedFilters line at all once every predicate is partition-level)
    val pushed = p.linesIterator.find(_.contains("PushedFilters"))
    assert(pushed.forall(!_.contains("om")),
      s"om is a partition column, not a data filter: $pushed")
  }

  test("q_ri_audit: orphan checks are hash anti joins, never nested loops") {
    val p = plan(q("q_ri_audit"))
    assert(p.contains("LeftAnti"), s"expected anti joins in:\n$p")
    assert(!p.toLowerCase.contains("cartesian")
      && !p.contains("BroadcastNestedLoop"),
      s"anti join must stay a hash join:\n$p")
  }

  test("q19: the OR branches stay above an equi hash join (no nested " +
      "loop), and the join keys' null filters reach the scans") {
    val p = formatted(q("q19_disjunctive"))
    assert(!p.toLowerCase.contains("cartesian")
      && !p.contains("BroadcastNestedLoop"),
      s"disjunctive predicate must not degrade the join:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull"),
      s"join-key IsNotNull should reach the scans:\n$p")
  }

  test("q_dpp: the runtime-derived month dim prunes fact partitions " +
      "dynamically") {
    val p = formatted(q("q_dpp"))
    val pf = p.linesIterator.find(l => l.contains("PartitionFilters")
        && l.contains("om")).getOrElse(
      fail(s"no PartitionFilters on om in:\n$p"))
    assert(pf.toLowerCase.contains("dynamicpruning"),
      s"month set is runtime data — pruning must be dynamic: $pf")
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // the 100 TB lever for selective dim⋈fact SHUFFLE joins (too big to
    // broadcast): a bloom filter built on the filtered side is applied
    // at the fact scan, dropping non-matching rows before the shuffle.
    // Thresholds are tuned for testdata scale; at real scale defaults
    // (10 MB creation side / 10 GB application side) gate the same plan.
    val resets = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
      .map { case (k, v) =>
        val prev = spark.conf.getOption(k); spark.conf.set(k, v); k -> prev }
    try {
      val o = graft.queries.Tables(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderpriority")
      val l = graft.queries.Tables(spark, sf, "lineitem")
        .select("l_orderkey", "l_extendedprice")
      val joined = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.executedPlan.toString()
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"expected a runtime bloom filter on the fact scan:\n$p")
      // the filter must sit on the FACT (lineitem) side, under its
      // shuffle — pre-shuffle row pruning, not a post-join afterthought
      assert(p.linesIterator.exists(l =>
        l.contains("might_contain") && l.contains("l_orderkey")),
        s"bloom filter must guard the lineitem scan:\n$p")
    } finally resets.foreach { case (k, prev) =>
      prev.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("q_bloom_join: the explicit bloom probe guards the fact scan " +
      "below the join") {
    val p = plan(q("q_bloom_join"))
    // the sketch probe (the facade lowers to the native might_contain
    // expression) must sit on the orders (fact) side as a plain filter
    // — pre-join row pruning — and the join stays semi, no cartesian
    // fallback
    assert(p.linesIterator.exists(l =>
      l.contains("might_contain") && l.contains("xxhash64(o_custkey")),
      s"bloom probe must test the fact join key:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_dune_watermark: the MAX/COUNT probe is pushed INTO the scan") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val df = q("q_dune_watermark")
    val phys = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = phys.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty, "expected a BatchScanExec leaf")
    val desc = scans.head.scan.description()
    assert(desc.contains("PushedAggregates=[MAX(o_orderdate), COUNT(*), " +
      "MAX(o_totalprice)]"), s"aggregates not pushed: $desc")
    assert(desc.contains("GreaterThan(o_orderdate,1996-12-31)"),
      s"watermark filter must still reach the scan: $desc")
    // partial pushdown: the scan's output IS the partial aggregate
    // schema (one row per split) — Spark's final agg merges #splits
    // rows, never the payload's
    assert(scans.head.scan.readSchema().fieldNames.toSet ==
      Set("max(o_orderdate)", "count(*)", "max(o_totalprice)"),
      s"scan must emit partial aggregate rows: " +
        scans.head.scan.readSchema().simpleString)
  }

  test("AQE splits a skewed join partition at runtime") {
    // the automatic counterpart to Joins.saltedEquiJoin: one key
    // carrying most of the rows becomes one straggler partition unless
    // AQE's skew-join rule splits it. Thresholds tuned to testdata
    // scale; at real scale the defaults (256 MB / 5x median) gate the
    // same re-plan.
    import spark.implicits._
    val resets = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB")
      .map { case (k, v) =>
        val prev = spark.conf.getOption(k); spark.conf.set(k, v); k -> prev }
    try {
      // 50k rows on ONE key + 1k spread keys vs a 1k-key dim
      val fact = ((1 to 50000).map(_ => 7L) ++ (1 to 1000).map(_.toLong))
        .toDF("k").withColumn("payload", lit("x" * 64))
      val dim = (1 to 1000).map(i => (i.toLong, s"d$i")).toDF("k", "name")
      // aggregate over the payload so column pruning cannot shrink the
      // skewed partition below the detection threshold
      val joined = fact.join(dim, "k")
        .agg(sum(length(col("payload"))).as("n"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString()
      assert(p.contains("skew=true"),
        s"expected AQE to mark the skewed SMJ (skew=true):\n$p")
    } finally resets.foreach { case (k, prev) =>
      prev.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("EXISTS subquery decorrelates to a semi join, not per-row eval") {
    val p = plan(q("q_exists_subquery"))
    assert(p.contains("LeftSemi"), s"expected a decorrelated semi join:\n$p")
    assert(!p.contains("InSubqueryExec") && !p.contains("ScalarSubquery"),
      s"subquery must not survive decorrelation:\n$p")
  }

  test("correlated scalar subquery decorrelates to aggregate-then-join") {
    val p = plan(q("q_correlated_avg"))
    // the per-part average is computed ONCE as a partial+final agg and
    // joined back — a surviving scalar subquery would re-run per row
    assert(!p.contains("ScalarSubquery"),
      s"scalar subquery must not survive decorrelation:\n$p")
    assert(p.contains("partial_avg"),
      s"expected the decorrelated aggregate:\n$p")
  }

  test("q21: the double-correlated EXISTS shape scans lineitem ONCE") {
    // per-order counts come from windows over the per-(order, supplier)
    // aggregate, not a join-back — a second fact scan here means the
    // decorrelation regressed to the self-join form
    // AdaptiveSparkPlanExec.toString appends the pre-AQE "Initial
    // Plan" section — count scans only in the plan that actually ran
    val p = finalPlan(q("q21_waiting_supplier"))
      .split("== Initial Plan ==").head
    val scans = "lineitem\\.parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected 1 lineitem scan, got $scans:\n$p")
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"))
  }

  test("q15: argmax selects by broadcast max equality, never a global " +
      "sort of the revenue view") {
    val p = plan(q("q15_top_supplier"))
    // the only Sort allowed is the final s_suppkey presentation sort
    // AFTER the winner filter; a Sort on total_revenue would mean the
    // argmax degenerated to order-by-limit over the full view
    assert(!p.contains("Window"), s"no window rank expected:\n$p")
    assert(!"Sort \\[total_revenue".r.findFirstIn(p).isDefined,
      s"the revenue view must not be globally sorted:\n$p")
  }

  test("q2: per-group argmin scans the fact once — a frame-aggregate " +
      "window over the pair aggregate, not a join-back or a rank") {
    val p = finalPlan(q("q2_min_cost_supplier"))
      .split("== Initial Plan ==").head
    val scans = "lineitem\\.parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected 1 lineitem scan, got $scans:\n$p")
    assert(!p.contains("row_number"),
      s"argmin must keep ties, not rank them away:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-100 must not globally sort:\n$p")
  }

  test("q16: the supplier denylist anti-joins BEFORE the distinct agg") {
    val p = plan(q("q16_supplier_variety"))
    assert(p.contains("LeftAnti"), s"expected a decorrelated NOT IN:\n$p")
    // the anti join must appear deeper than (after in plan text = below)
    // the distinct aggregate so excluded rows never enter the shuffle
    val anti = p.indexOf("LeftAnti")
    val agg = p.indexOf("HashAggregate")
    assert(anti > agg, s"anti join must sit under the aggregate:\n$p")
  }

  test("q11: the global threshold is a broadcast single row over the " +
      "SAME aggregated view, not a second fact pass") {
    val p = finalPlan(q("q11_value_concentration"))
      .split("== Initial Plan ==").head
    val scans = "lineitem\\.parquet".r.findAllIn(p).length
    assert(scans == 1,
      s"the per-part aggregate must be reused for the total, got " +
        s"$scans lineitem scans:\n$p")
  }

  test("Graph.triangles: every orientation/wedge/closing join is a hash " +
      "join on node ids — no cartesian, no nested loop, no window") {
    // gate the OPERATOR plan, not the declared query's full pipeline:
    // g_triangles feeds it from the exact pair baseline, whose labeled
    // cross join is the one intentional cartesian in the repo
    import spark.implicits._
    val edges = (0L to 40L).flatMap(a => Seq((a, (a + 1) % 41),
      (a, (a + 7) % 41))).toDF("id_a", "id_b")
    val p = plan(graft.operators.Graph.triangles(edges))
    assert(!p.contains("CartesianProduct"),
      s"wedge generation must never go cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"the closing-edge probe must be an equi join:\n$p")
    assert(!p.contains("Window"),
      s"triangle enumeration needs no window sort:\n$p")
  }

  test("e_pq_topk: the coarse ADC pass broadcasts the query tables and " +
      "keeps top-k in the bounded aggregator, never a window sort") {
    val p = plan(q("e_pq_topk"))
    assert(p.contains("BroadcastExchange"),
      s"query-side ADC tables must broadcast:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"shortlist must ride the bounded TopK aggregator:\n$p")
    assert(!p.contains("Window"),
      s"no window sort anywhere in the PQ path:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the code scan must stream against a broadcast, not pair " +
        s"partitions:\n$p")
  }

  test("d_posting_search: the posting scan prunes to the queried " +
      "terms' bucket directories and pushes the token filter") {
    val p = formatted(q("d_posting_search"))
    // the bucket IN (...) predicate must land as a partition filter on
    // the posting-table scan (only the queried buckets' dirs open) and
    // the token IN (...) as a pushed data filter inside them
    assert(p.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(p).isDefined,
      s"bucket pruning must reach the posting scan:\n$p")
    assert("PushedFilters: \\[[^\\]]*[Ii]n\\(token".r.findFirstIn(p)
      .isDefined, s"token IN must push into the posting scan:\n$p")
  }

  test("d_bm25_topk: index-only scoring — bucket-pruned posting scan, " +
      "broadcast df, top-k without a global sort") {
    val p = formatted(q("d_bm25_topk"))
    // same index discipline as the boolean search: only the queried
    // terms' bucket dirs open, token IN pushes into them
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(p).isDefined,
      s"bucket pruning must reach the posting scan:\n$p")
    assert("PushedFilters: \\[[^\\]]*[Ii]n\\(token".r.findFirstIn(p)
      .isDefined, s"token IN must push into the posting scan:\n$p")
    // k rows cross the final boundary; the documents table is nowhere
    // in the plan (tf/df/dl all come from the index + sidecar)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must be TakeOrderedAndProject:\n$p")
    assert(!p.contains("documents.parquet"),
      s"BM25 must never rescan the corpus text:\n$p")
  }

  test("d_passage_dedup: one passage-keyed shuffle, no self-join") {
    val p = plan(q("d_passage_dedup"))
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"passage dedup is a window + fold-back, never a join:\n$p")
    // exactly one hash exchange on the passage key feeds the
    // first-occurrence window; the doc_id agg rides partial+final
    val passageExchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(passage"))
    assert(passageExchanges == 1,
      s"expected exactly one passage-keyed exchange, got $passageExchanges:\n$p")
  }

  test("q_unpivot: melt plans as map-side Expand + ONE aggregate " +
      "exchange — no join, no per-measure rescan") {
    val p = plan(q("q_unpivot"))
    assert(p.contains("Expand"), s"unpivot should plan as Expand:\n$p")
    assert(!p.contains("Join"), s"no join in a reshape:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"expected exactly one aggregate exchange, got $exchanges:\n$p")
  }

  test("q_array_functions: lambda forms stay in ONE aggregation round " +
      "trip — no second explode+groupBy") {
    val p = plan(q("q_array_functions"))
    assert(!p.contains("Generate"),
      s"derived metrics must not explode the array again:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"one exchange builds the per-order arrays, got $exchanges:\n$p")
  }

  test("q_table_patch: one full-outer hash join computes the patch; " +
      "apply is anti-join + union, nothing nested-loop") {
    val p = plan(q("q_table_patch"))
    assert(p.contains("FullOuter"), s"diff needs the full-outer join:\n$p")
    assert(p.contains("LeftAnti"), s"apply drops patched keys anti-join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"reconciliation must stay hash-joined:\n$p")
  }

  test("g_triangles / g_clustering: edge generation is the bucketed " +
      "sign-band join — no CartesianProduct anywhere in the plan") {
    for (name <- Seq("g_triangles", "g_clustering")) {
      val p = plan(q(name))
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$name edge list must come from the (band, key) equi join, " +
          s"never an all-pairs product:\n$p")
      // the candidate generator's band join is a hash-partitioned
      // equi join on (band, key) — visible as a SortMergeJoin or
      // ShuffledHashJoin keyed on band
      assert(p.contains("band"), s"$name lost the band-keyed join:\n$p")
    }
  }

  test("q_dim_lookup: SCD2 interval lookup is an EQUI join on the key " +
    "with the validity interval as residual, never a nested loop") {
    val p = finalPlan(q("q_dim_lookup"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"temporal lookup degenerated to a range-only join:\n$p")
    assert(p.contains("Join") && p.contains("LeftOuter"),
      s"expected a left outer equi join:\n$p")
  }

  test("q_recursive_cte: engine-iterative UnionLoop whose frontier " +
      "SHRINKS — the total walk-row budget is an enforced contract, " +
      "not an assumption") {
    // The 100× story for WITH RECURSIVE rests on the frontier (rows
    // still walking) shrinking every iteration: total rows through
    // the loop = Σ_k (⌊log₂ k⌋ + 1) ≈ n·log₂(maxKey), never n².
    // Tables.configure sets the 50M session guard for sf1 headroom;
    // this gate pins the per-QUERY contract by running the walk under
    // the EXACT analytic budget for this dataset — any future edit
    // that makes the frontier grow (re-emitting finished rows, losing
    // the cur>1 cutoff) exceeds the budget and trips the engine's own
    // recursion row limit, failing here loudly.
    import spark.implicits._
    val keys = graft.queries.Tables(spark, sf, "orders")
      .select($"o_orderkey").as[Long].collect()
    // rows ever emitted by the recursion for key k: the anchor row
    // plus one per halving step until cur reaches 1 — i.e. k's bit
    // length, except key 0 which stops at its anchor (1 row, not 0)
    val budget = keys.map(k =>
      math.max(1L, 64L - java.lang.Long.numberOfLeadingZeros(k))).sum
    val prev = spark.conf.get("spark.sql.cteRecursionRowLimit")
    try {
      // +1: UnionLoopExec raises at accumulated == limit BEFORE the
      // final empty iteration proves exhaustion, so the limit must
      // strictly exceed the total. One row of slack against a
      // frontier-growth regression that would add >= |orders| rows.
      spark.conf.set("spark.sql.cteRecursionRowLimit",
        (budget + 1).toString)
      val df = q("q_recursive_cte")
      val rows = df.collect() // would throw past the budget
      // sanity: per-depth counts sum back to the keys that CAN reach
      // the root (every walk from k >= 1 finishes exactly once; key 0
      // halves to itself and stops at its anchor without ever hitting
      // cur = 1)
      assert(rows.map(_.getAs[Long]("n_orders")).sum
        === keys.count(_ >= 1L))
      assert(plan(df).contains("UnionLoop"),
        "recursive CTE must plan as the engine-iterative UnionLoop")
    } finally spark.conf.set("spark.sql.cteRecursionRowLimit", prev)
  }
}
