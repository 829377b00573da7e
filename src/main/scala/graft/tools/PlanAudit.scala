package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md: the formatted physical plan of one
  * representative query per operator family, so plan-quality review
  * (pushdown, pruning, exchange counts, codegen spans) reads from a
  * committed artifact instead of ad-hoc explain calls.
  *
  * `sbt "runMain graft.tools.PlanAudit"` (writes PLANS.md in cwd).
  */
object PlanAudit {
  private val picks = Seq(
    "q6_revenue_filter" -> "pushdown + pruning: all predicates and the 2-column projection reach the scan",
    "q1_pricing_summary" -> "partial+final agg inside whole-stage codegen; 6-group shuffle",
    "q3_segment_topk" -> "broadcast dim joins + TakeOrderedAndProject top-k (no global sort)",
    "q_bucketed_join" -> "co-located SMJ over bucketed tables: no join-side Exchange",
    "q_partition_prune" -> "month predicate as PartitionFilters: out-of-range dirs never open",
    "q_dune_watermark" -> "DSv2 complete aggregate pushdown: MAX/COUNT probes emit one row from the scan, no aggregate exec above",
    "q_sink_grouped_max" -> "grouped metadata aggregate on the lakehouse sink: per-status MAX/COUNT fold from manifest rows (GraftSinkMetaAggScan), zero data files opened",
    "q_sink_skip_str" -> "truncated string bounds: a hash-prefix probe prunes to its band files; PushedFilters shows the claimed shapes",
    "q_sink_segments" -> "segment-level pruning: a top-of-keyspace probe resolves only the matching segment's entry list before per-file skipping (round-7 manifest-list layer)",
    "q_aqp_revenue" -> "AQP in ONE scan: est and exact are conditional aggregates over the same lineitem pass (round 7 fix of the double-scan plan), the md5 sample bucket computed once",
    "q_exists_subquery" -> "correlated EXISTS decorrelated to a left-semi join",
    "q_correlated_avg" -> "correlated scalar subquery decorrelated to aggregate-then-join",
    "ev_asof_click" -> "as-of join as union + running last(): one hash shuffle, no range join",
    "ev_asof_native" -> "native whole-operator as-of: AsOfJoinExec, one exchange + sort per side, O(1)-state forward merge",
    "q_unpivot" -> "melt as map-side Expand (x3 fan-out in the scan stage) + ONE aggregate exchange; no join, no per-measure rescan",
    "q_array_functions" -> "array lambdas (aggregate/filter/transform/exists) as codegen'd expressions over per-order arrays: one groupBy exchange, no re-explode",
    "q_tx_read" -> "manifest-resolved transactional reads: each tx pairs orders+lineitem from ONE committed manifest; carried-forward table read from its original dir",
    "q_mor_delete" -> "merge-on-read view: base scan LEFT ANTI broadcast tombstones; post-compaction phase is a plain scan",
    "e_ann_topk_agg" -> "bounded top-k aggregator: <=k rows per group cross the shuffle, no window sort",
    "d_clean_pipeline" -> "cleaning capstone: gates fused into the scan side, two shuffles total",
    "d_mix_uniform" -> "mixture rebalance: per-group counts broadcast back, fact side filters without shuffling",
    "d_decontaminate" -> "decontamination: one corpus pass, one gram-keyed shuffle (no self-join)",
    "q_quality_audit" -> "k-rule quality audit folds into ONE scan + one single-row aggregate",
    "q_zorder_skip" -> "z-ordered rewrite read back: both box predicates reach the scan as PushedFilters over the clustered files",
    "q_dpp" -> "dynamic partition pruning: the runtime month dim lands as a dynamicpruning subquery in the fact scan's PartitionFilters",
    "q_moving_avg" -> "interval-RANGE window over the daily pre-aggregate: the global window's input is day rows, not orders",
    "q_profile_stats" -> "unpivot-first profiling: one scan, one-distinct rewrite (no per-distinct Expand), 4 metric rows out",
    "d_tfidf_topk" -> "tf-idf: the token stream shuffles once into (doc,term); df and N come back as broadcasts",
    "q_hll_merge" -> "sketch-merge read path: only the persisted sketch table is scanned, unioned per type",
    "d_fuzzy_blocked" -> "record linkage: sorted-neighborhood window — lead(k) successors within each brand block; the edit-distance filter runs over n*w window pairs, never a cross join",
    "q_null_skew_join" -> "null-skew-safe left join: null keys take the union branch, only matchable rows enter the exchange",
    "d_incr_dedup" -> "incremental dedup: batch joins the persisted key index (corpus never scanned); within-batch window over batch keys only",
    "d_shard_manifest" -> "two-phase global cumsum: bucket sums -> tiny bucket-prefix window -> broadcast offsets + per-bucket local windows; no single-partition global window",
    "e_semdedup_pairs" -> "SemDeDup blocking: soft cell assignment (broadcast centroids, per-id window), then a cell-keyed self-join — pairwise work is per-cell, never n^2",
    "e_pq_topk" -> "PQ/ADC coarse pass: the corpus streams as 16-byte codes against broadcast per-query ADC tables (m lookups per pair, inside codegen), the bounded top-k aggregator keeps the shortlist, and the exact rerank joins only broadcast survivors",
    "e_ivfpq_topk" -> "IVF-PQ composed probe: broadcast centroids rank cells per query, the cell join touches only probed (cell, code) index rows — no embeddings in the index — and the exact rerank joins the corpus on broadcast survivors",
    "q_table_patch" -> "anti-entropy repair: ONE full-outer key join with a single struct null-safe comparison computes the minimal patch; apply is anti-join + union — patch volume tracks drift, not table size",
    "ev_interpolate" -> "linear gap interpolation: all four neighbour lookups (prev/next value and hour) ride ONE event_type partitioning over the calendar-bounded spine, never the event stream",
    "d_collapse_repeats" -> "token-stutter scrub: pure codegen'd HOFs over the scan, zero exchanges before the final sort",
    "q15_top_supplier" -> "argmax without a global sort: the revenue view aggregates once, its max returns as a broadcast single row, equality selects the winner",
    "q21_waiting_supplier" -> "double-correlated EXISTS/NOT EXISTS decorrelated to ONE per-(order,supplier) aggregate + per-order windows over it: the fact is scanned once (join-back would scan twice — pushed-filter drift defeats exchange reuse)",
    "q22_idle_customers" -> "decorrelated NOT EXISTS: broadcast scalar threshold + hash LEFT ANTI against the date-filtered orders (predicate pushed into that scan)",
    "q_hll_sliding" -> "sliding distinct from the sketch table: date-RANGE window unions <=7 tiny daily sketches per anchor — the approx branch reads only sketch rows (the events scan in this plan is the exact verification twin that rides along for ToleranceCheck)",
    "d_ppjoin_pairs" -> "PPJoin prefix filtering: ONE tokenization exchange reused by the df-count, prefix-window, and both verify branches; only prefix (rare) shingles enter the candidate join, survivors verify on full sets",
    "d_bm25_topk" -> "BM25 over the persisted posting index: queried terms' bucket dirs prune the scan, df falls out of the fetched rows, dl/avgdl come from the tiny sidecar, top-10 is TakeOrderedAndProject",
    "q_bloom_join" -> "bloom semi-join reduction: the dim keys' sketch probes as a might_contain filter on the fact scan BEFORE the join — shuffle carries probable matches, the semi join removes false positives",
    "d_passage_dedup" -> "passage-grain dedup: chunk explode into one passage-keyed first-occurrence window, per-doc retention folds back on doc_id — one shuffle, no self-join",
    "d_incr_minhash" -> "incremental near-dup probe: batch bands join the PERSISTED band index on (t, sig), rescore joins the persisted shingle sets — corpus text never rescanned",
    "q_summary_rewrite" -> "aggregate navigation: the optimizer rule swaps the fact scan for the dims-product summary — the plan's only file scan is the summary parquet, re-aggregated by SUM of sums/counts",
    "q_quantile_merge" -> "histogram-quantile walk: one scan of the persisted bins table, cumulative + total as two frames over ONE partitioned sort, both crossings by conditional MIN — the fact table appears nowhere",
    "q_skew_profile" -> "skew diagnostic: per key column one key-count shuffle then a 1-row fold of the bounded count relation — cost tracks distinct keys, not rows",
    "d_phrase_mine" -> "PMI phrase mining: one posexplode + per-doc lead() builds the bigram stream; pair counts shuffle once on the pair, unigram counts join vocab-sized, totals broadcast as 1-row relations, top-20 is TakeOrdered",
    "mm_dedup" -> "cross-modal content dedup: one md5-hash shuffle over the asset stream (digests computable at ingest); dup groups fold map-side before the exchange",
    "q_zonemap_lookup" -> "zone-map pruned scan: the file list comes from the persisted per-file (min,max) index BEFORE planning — the lineitem scan's ReadFiles covers only the range-clustered files intersecting the predicate, and the exact filter re-applies above",
    "q_result_cache" -> "result-cache hit path: the whole plan is ONE parquet read of the fingerprint entry plus the declared sort — the orders table appears nowhere",
    "q_market_basket" -> "basket affinity: the distinct (order,item) relation shuffles once on the order key and BOTH self-join sides reuse that exchange; item frequencies and the basket count come back as broadcasts onto pair-sized data",
    "q20_promo_supplier" -> "nested double aggregation: per-part totals re-aggregate the (part,supplier) partial via ReusedExchange — one fact scan feeds both aggregation levels, dominance tests in BIGINT cross-multiplication",
    "ev_lag_features" -> "lag-feature matrix: row-frame lags and RANGE-frame 7-day rollups share ONE user partitioning over the per-day pre-aggregate — one shuffle, one sort, four features",
    "ev_cusum" -> "CUSUM change-point: one fold into (type,day) counts, then cumulative/total/argmax as frames over ONE type partitioning of the calendar-sized daily relation — the deviation path never leaves BIGINT",
    "q_bitemporal" -> "bitemporal matrix: each cell is one snapshot version's scan + a validity-interval filter + a 1-row fold — transaction time picks the directory, valid time slices rows, nothing else moves",
    "d_pii_scrub" -> "PII redaction: three regexp passes + per-pattern counts fused into the document scan, zero exchanges before the final sort",
    "q_recursive_cte" -> "WITH RECURSIVE as UnionLoop: the anchor scan plus an iterated step whose frontier shrinks as walks reach the root — engine-iterative, no driver loop",
    "q_lateral_topn" -> "LATERAL with ORDER BY+LIMIT decorrelated: one nation-customer join + per-region rank window; customer is scanned once, never per region",
    "q_ivm_join" -> "join-view delta maintenance: the three delta terms each broadcast their small side onto a single base scan per table; the recomputed twin in the same plan is the audit, not the maintenance path",
    "q_bucket_prune" -> "bucketed point lookup: SelectedBucketsCount shows only the IN-list keys' hash buckets open — layout-as-index, no shuffle",
    "d_hybrid_rrf" -> "hybrid RRF retrieval: each leg is a bounded top-20 (BM25 rides the pruned posting index, cosine broadcasts one query vector), rank windows run over the 20 limited rows, fusion is a result-sized full-outer join",
    "e_mmr_rerank" -> "MMR diversification: each query's <= topN shortlist groups into one array row and the whole k-step greedy runs as higher-order array expressions in a single plan — one shuffle, one job, nothing after the shortlist is corpus-sized",
    "ev_ewma" -> "exact EWMA: the fact folds once into (type, day) cents, the 20-day support is a bounded range self-join of that calendar-sized relation, the Q20 fixed-point fold stays BIGINT end to end",
    "q_patch_coalesce" -> "sparse-patch coalescing: per-version conflict fold then latest-non-null-per-column via max_by FILTER — two partial+final aggregates on the same key, no window sort",
    "e_contrastive_batches" -> "contrastive batch shaping: the dup-cluster relation takes one cluster-keyed window (rank + modular stagger), then two bounded aggregates — nothing corpus-quadratic after the pair stage",
    "q_golden_record" -> "survivorship merge: one entity-keyed partial+final aggregate (priority/greatest/best-record rules as max_by over scalar orderings) + an entity-sized consensus fold; nothing beyond entity-sized crosses an exchange",
    "q_drift_ks" -> "KS drift: ECDF walk over the $100 grid relation (bounded by price range, not sample size), integer cross-multiplied deviations, one argmax window",
    "g_lpa_communities" -> "label propagation: per round one edge-label broadcast join + a (node,label) count fold + a per-node argmax window, labels checkpointed — rounds never re-run upstream",
    "q_bitmap_sliding" -> "exact sliding distinct: the bitmap-union aggregator rides a date-RANGE frame over the calendar-sized partial table (<=7 byte-ORs per anchor), cardinality is one codegen'd popcount — no events rescan",
    "q_dsv2_sink" -> "DSv2 sink read-back: the scan plans one split per manifest-listed file (latest manifest only — torn writes invisible), then one partial+final audit aggregate",
    "q_sink_changes" -> "change-feed read: scanned file set = manifest(latest) minus manifest(base), a driver-side metadata diff — only the appended files are opened, the carried-forward data is never rescanned",
    "q_bloom_skip" -> "Bloom file skipping: point-lookup probe keeps only files whose persisted per-file filter holds all the key's bit positions (no false negatives; exact IN re-applied above the pruned scan) — works on layouts where zone maps prune nothing",
    "q_sink_skip" -> "manifest-bounds file skipping in the DSv2 sink scan: the key-range predicate surfaces as PushedFilters and prunes the scan to the intersecting band files (advisory — Spark re-applies everything above)",
    "q_sql_catalog" -> "TableCatalog SQL surface: the aggregate reads a catalog-resolved graftsink table whose content was built by SQL INSERT + copy-on-write DELETE; the scan is the same manifest-listed file scan as the path API",
    "q_dim_lookup" -> "fact-to-SCD2 lookup: LEFT equi join on the key with the validity interval as residual — hash/SMJ, never a range-only nested loop (PlanSpec-gated)",
    "ev_pattern_match" -> "sequence-pattern tape: ONE user-keyed sort-aggregate builds the per-user initials string, the regex counts matches inside the projection, the histogram fold is value-bounded",
    "d_ngram_novelty" -> "n-gram novelty: gram first-occurrence fold + join-back share the gram key (two shuffles, the decontamination shape); the per-doc score is one more keyed fold",
    "e_cluster_split" -> "cluster-aware split: the persisted cluster relation joins doc-sized, the salted-md5 split is a pure projection (no window), and the leakage audit is two cluster-keyed partial+final aggregates",
    "q_sink_nan" -> "NaN-aware bounds probe: the range predicate on the NaN-poisoned cluster column surfaces as PushedFilters; finite-bounded band files prune, the [lo, NaN] band survives (indeterminate = may-match) so every NaN row arrives",
    "q_rename_evolution" -> "zero-rewrite evolution read: one manifest-listed scan spans birth-shape and post-rename file generations — each file parses under its own recorded DDL, reconciled by the RENAMED name; no per-generation union in the plan")

  def main(args: Array[String]): Unit = {
    val spark = graft.queries.Tables.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_PLANLOCK_SF", "/root/testdata/sf0.001"))
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of representative queries\n\n")
    sb.append("Generated by `graft.tools.PlanAudit` at sf0.001 (4 shuffle\n")
    sb.append("partitions for readability — partition COUNTS scale with the\n")
    sb.append("session, plan SHAPE does not). One query per operator family;\n")
    sb.append("the properties called out per plan are the ones PlanSpec\n")
    sb.append("asserts as tests.\n")
    picks.foreach { case (name, why) =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name\n\n$why\n\n```\n$plan```\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${picks.size} plans)")
    spark.stop()
  }
}
