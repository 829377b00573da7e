package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quantified health for the declared queries that have no
  * SQL-expressible oracle (sketches, hash families, LSH/IVF, the fake
  * codec): each is measured against its exact twin at Verify time and
  * the numbers are written beside the oracle dump as
  * `tolerance_check.json` — so the round's artifacts carry "approx
  * within X% of exact" / "recall ≥ Y vs brute force" instead of a bare
  * `no_oracle`. The same properties are enforced as hard assertions in
  * ScaleSpec / SimilaritySpec / DedupSpec; this is their driver-visible
  * form, computed on the Verify scale factor.
  *
  * Inputs are the parquet results Verify just wrote under `outDir` —
  * never recomputed (the exact similarity twins are deliberately
  * quadratic; running them twice would double Verify's wall-clock).
  * Each check is isolated: one failing or missing input yields one
  * failed Check row, never an empty artifact.
  */
object ToleranceCheck {

  case class Check(metric: String, value: Double, bound: Double,
      pass: Boolean, note: String)

  def run(spark: SparkSession, outDir: String,
      sfDir: String = ""): Seq[(String, Check)] = {
    def res(name: String): DataFrame = spark.read.parquet(s"$outDir/$name")

    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("id_a").cast("long"), col("id_b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def topkSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("corpus_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(got: Set[(Long, Long)], want: Set[(Long, Long)]): Double =
      if (want.isEmpty) 1.0 else got.intersect(want).size.toDouble / want.size

    val checks = Seq.newBuilder[(String, Check)]
    def check(name: String)(body: => Check): Unit =
      try checks += name -> body
      catch { case e: Throwable =>
        checks += name -> Check("check_error", -1.0, 0.0, pass = false,
          s"tolerance check failed to run: ${e.getMessage}")
      }
    // An empty comparison input means a broken upstream dump, not
    // health: fail THIS check loudly (the per-check isolation above
    // turns it into one failed row) instead of letting a null max
    // coalesce into a vacuous pass.
    def maxOrFail(df: DataFrame, c: String): Double = {
      val row = df.agg(max(col(c))).head
      require(!row.isNullAt(0),
        s"no rows to compare for $c — upstream dump empty?")
      row.get(0) match {
        case d: java.lang.Double => d.doubleValue()
        case n: Number => n.doubleValue()
      }
    }

    // HLL++ sketch vs exact distinct (both columns live in the query)
    check("q_approx_distinct") {
      val adErr = maxOrFail(res("q_approx_distinct")
        .select((abs(col("approx_parts") - col("exact_parts")) /
          col("exact_parts")).as("rel_err")), "rel_err")
      Check("max_rel_err_vs_exact", adErr, 0.15, adErr <= 0.15,
        "approx_count_distinct vs countDistinct(l_partkey) per l_suppkey; " +
          "HLL++ default rsd=0.05, bound = 3 sigma for the max over groups")
    }

    // optimizer-governed approx rewrite vs the exact twin of the SAME
    // query text (both columns live in the dumped row)
    check("q_approx_governor") {
      val err = maxOrFail(res("q_approx_governor")
        .select((abs(col("approx_custs") - col("exact_custs")) /
          col("exact_custs")).as("rel_err")), "rel_err")
      Check("max_rel_err_vs_exact", err, 0.15, err <= 0.15,
        "ApproxGovernorRule: COUNT(DISTINCT o_custkey) rewritten to " +
          "HLL++ at plan time under the session flag; rsd=0.05, bound " +
          "= 3 sigma for the max over 5 groups")
    }

    // merged daily HLL sketches vs exact distinct users (both columns
    // live in the query; the sketch side never rescans events)
    check("q_hll_merge") {
      val hllErr = maxOrFail(res("q_hll_merge")
        .select((abs(col("approx_users") - col("exact_users")) /
          col("exact_users")).as("rel_err")), "rel_err")
      Check("max_rel_err_vs_exact", hllErr, 0.05, hllErr <= 0.05,
        "estimate(union of per-day hll_sketch_agg(user_id)) vs " +
          "countDistinct per event_type; lgK=12 RSE ~1.6%")
    }

    // sliding-window union of daily sketches vs exact windowed distinct
    check("q_hll_sliding") {
      val slErr = maxOrFail(res("q_hll_sliding")
        .select((abs(col("approx_users") - col("exact_users")) /
          col("exact_users")).as("rel_err")), "rel_err")
      Check("max_rel_err_vs_exact", slErr, 0.05, slErr <= 0.05,
        "estimate(union of <=7 daily hll sketches per RANGE window) vs " +
          "exact 7-day-window countDistinct per (event_type, day)")
    }

    // sketches built THROUGH the streaming engine must estimate
    // exactly like the batch-built table: HLL union is a per-register
    // max, insensitive to arrival order, so any drift means the
    // streamed aggregation lost or duplicated rows
    check("st_sliding_distinct") {
      val j = res("st_sliding_distinct").alias("s")
        .join(res("q_hll_sliding").alias("b"),
          Seq("event_type", "day"))
        .select((abs(col("s.approx_users") - col("b.approx_users")) /
          greatest(col("b.approx_users"), lit(1.0))).as("rel_diff"))
      val d = maxOrFail(j, "rel_diff")
      Check("max_rel_diff_vs_batch_sketches", d, 0.0, d <= 0.0,
        "streamed daily HLL sketches, trailing-7-day RANGE union: " +
          "estimates must EQUAL the batch q_hll_sliding (order-" +
          "insensitive register maxima)")
    }

    // percentile sketch vs exact interpolated percentiles
    check("q_approx_percentiles") {
      val apErr = maxOrFail(res("q_approx_percentiles").alias("a")
        .join(res("q_percentiles").alias("e"), Seq("priority"))
        .select(greatest(
          abs(col("p50_approx") - col("p50")) / col("p50"),
          abs(col("p95_approx") - col("p95")) / col("p95")).as("rel_err")),
        "rel_err")
      Check("max_rel_err_vs_exact", apErr, 0.02, apErr <= 0.02,
        "percentile_approx(10k sketch) vs exact percentile, p50+p95")
    }

    // persisted histogram partials vs exact interpolated percentiles:
    // the estimate is the upper edge of the bin where the cumulative
    // count crosses q·n, so it sits within ~one bin width of the true
    // order statistic (width = domain/4095 ≈ 0.1% of the p50 values
    // here; bound 0.01 is a 10x margin over that construction bound)
    check("q_quantile_merge") {
      val qErr = maxOrFail(res("q_quantile_merge").alias("h")
        .join(res("q_percentiles").alias("e"), Seq("priority"))
        .select(greatest(
          abs(col("p50_hist") - col("p50")) / col("p50"),
          abs(col("p95_hist") - col("p95")) / col("p95")).as("rel_err")),
        "rel_err")
      Check("max_rel_err_vs_exact", qErr, 0.01, qErr <= 0.01,
        "equi-width histogram partials (4096 bins, merged by SUM over " +
          "months) vs exact percentile, p50+p95 per priority; error " +
          "bounded by one bin width by construction")
    }

    // FNV fingerprint dedup must reproduce the exact word-set groups
    // (collision-free on this corpus): same (keep_id, dup_count) set
    def groups(name: String): Set[(Long, Long)] =
      res(name).select(col("keep_id").cast("long"),
        col("dup_count").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    check("d_dedup_fingerprint") {
      val fpMatch = groups("d_dedup_fingerprint") == groups("d_dedup_exact")
      Check("groups_equal_exact_twin",
        if (fpMatch) 1.0 else 0.0, 1.0, fpMatch,
        "fnv1a64 fingerprint groups == exact word-set groups (no collisions)")
    }

    // Distributed BPE must learn the IDENTICAL merge sequence as the
    // driver-side exact twin: same ranks, pairs, and counts, in order
    check("d_bpe_merges") {
      def seq(name: String): Seq[(Int, String, String, Long)] =
        res(name).orderBy("rank")
          .select(col("rank").cast("int"), col("left"), col("right"),
            col("pair_count").cast("long"))
          .collect().map(r =>
            (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
          .toSeq
      val same = seq("d_bpe_merges") == seq("d_bpe_exact")
      Check("merge_sequence_equals_exact_twin",
        if (same) 1.0 else 0.0, 1.0, same,
        "distributed BPE merge rules (rank, left, right, count) == " +
          "driver-exact greedy on the same word-frequency table")
    }

    // Rank-greedy distributed encoding must reproduce every per-doc
    // token count derived through the INDEPENDENT sequential-replay
    // path (apply merges in rank order to fixpoint — equal to
    // rank-greedy by the standard BPE equivalence; a divergence in
    // either the equivalence or the distributed plumbing fails here)
    if (sfDir.nonEmpty) check("d_bpe_encode") {
      val merges = res("d_bpe_merges").orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val got = res("d_bpe_encode").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .selectExpr("doc_id",
          "regexp_extract_all(lower(text), '[a-z]+', 0) AS ws")
        .collect()
      def tokCount(w: String): Long = {
        var syms = w.map(_.toString).toVector
        merges.foreach { case (l, r) =>
          val out = collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { x =>
            if (out.nonEmpty && out.last == l && x == r)
              out(out.length - 1) = l + r
            else out += x
          }
          syms = out.toVector
        }
        syms.length.toLong
      }
      val cache = collection.mutable.Map.empty[String, Long]
      val want = docs.map { row =>
        val ws = row.getSeq[String](1)
        (row.getLong(0),
          ws.map(w => cache.getOrElseUpdate(w, tokCount(w))).sum,
          ws.map(_.length.toLong).sum)
      }.toSet
      val same = got == want
      Check("per_doc_counts_equal_sequential_replay",
        if (same) 1.0 else 0.0, 1.0, same,
        "rank-greedy distributed BPE encode (token, char counts per " +
          "doc) == driver sequential-replay of the learned merges")
    }

    // MinHash candidates must recall the exact high-jaccard pairs
    check("d_minhash_pairs") {
      val mhRecall = recall(pairSet(res("d_minhash_pairs")),
        pairSet(res("d_jaccard_pairs")))
      Check("recall_vs_exact_jaccard", mhRecall, 0.95, mhRecall >= 0.95,
        "fraction of exact jaccard>=0.6 pairs present at est_jaccard>=0.5")
    }

    check("d_minhash_capped") {
      val cappedRecall = recall(pairSet(res("d_minhash_capped")),
        pairSet(res("d_jaccard_capped")))
      Check("recall_vs_exact_jaccard", cappedRecall, 0.95,
        cappedRecall >= 0.95,
        "trigram-shingled capped (maxDf=0.004) minhash vs capped exact " +
          "jaccard, threshold 0.6")
    }

    // HLL inclusion-exclusion overlap: the subtraction concentrates the
    // union's absolute error onto the (smaller) intersection, so the
    // bound is looser than the plain-union checks — 3 sketches at lgK=12
    // RSE ~1.6% each, overlap here is a large fraction of the union.
    check("q_hll_intersect") {
      val r = res("q_hll_intersect")
        .select((abs(col("approx_both") - col("exact_both")) /
          col("exact_both")).as("rel_err"))
      val e = maxOrFail(r, "rel_err")
      Check("rel_err_vs_exact", e, 0.1, e <= 0.1,
        "inclusion-exclusion |view ∩ purchase| from merged daily HLL " +
          "sketches vs exact both-types distinct count")
    }

    // Incremental probe of the persisted MinHash index: must recall the
    // capped-jaccard pairs that CROSS the batch/corpus split (batch =
    // doc_id % 5 == 0; within-batch and within-corpus pairs are the
    // batch/full runs' job). Same parameters as d_minhash_capped, so
    // the same ≥0.95 band-collision law applies; precision is exact by
    // construction (candidates rescore on true shingle sets).
    check("d_incr_minhash") {
      val want = pairSet(res("d_jaccard_capped"))
        .filter { case (a, b) => (a % 5 == 0) != (b % 5 == 0) }
      val got = pairSet(res("d_incr_minhash"))
      val r = recall(got, want)
      Check("recall_vs_exact_jaccard_cross", r, 0.95, r >= 0.95,
        "persisted-index probe (frozen stop list, 8 band tables) vs " +
          "capped exact jaccard restricted to batch x corpus pairs")
    }

    // Winnowing fingerprints: a pair with capped trigram-jaccard >= 0.6
    // shares most 3-word sequences, hence long normalized substrings,
    // hence (by the w+k-1 guarantee) winnow fingerprints — so the
    // char-level operator must recall the word-level exact pairs. The
    // kernel itself (rolling hash ≡ direct hash, window-min law, pinned
    // values) is pinned in DedupSpec.
    check("d_winnow_pairs") {
      val wRecall = recall(pairSet(res("d_winnow_pairs")),
        pairSet(res("d_jaccard_capped")))
      Check("recall_vs_exact_jaccard", wRecall, 0.95, wRecall >= 0.95,
        "winnow (k=16, w=4, containment>=0.5) pairs cover the exact " +
          "capped trigram-jaccard>=0.6 pairs")
    }

    // SimHash: every emitted pair within the declared hamming budget
    // (exact signature values are pinned bit-for-bit in DedupSpec).
    // Unlike the twin comparisons above, an EMPTY pair set is a legal
    // outcome for a pair query, so the null max coalesces to 0 here.
    check("d_simhash_pairs") {
      val shMax = res("d_simhash_pairs")
        .agg(coalesce(max("hamming"), lit(0)).cast("double")).head.getDouble(0)
      Check("max_hamming", shMax, 3.0, shMax <= 3.0,
        "banded candidates filtered to hamming<=3; exact signature values " +
          "pinned in DedupSpec")
    }

    // CMS heavy hitters vs the exact token top-20
    check("d_token_topk_approx") {
      val exactTok = res("d_token_topk")
        .select(col("token"), col("freq").cast("long"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val approxTok = res("d_token_topk_approx")
        .select(col("token"), col("freq_est").cast("long"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val tokOverlap =
        if (exactTok.isEmpty) 1.0
        else approxTok.keySet.intersect(exactTok.keySet).size.toDouble /
          exactTok.size
      Check("topk_overlap_vs_exact", tokOverlap, 0.9, tokOverlap >= 0.9,
        "count-min + per-partition candidates top-20 token overlap with " +
          "the exact groupBy twin; count error law pinned in HeavyHittersSpec")
    }

    // bloom decontamination vs the exact twin: the sketch may only ADD
    // flagged docs (no false negatives — a lost contamination would be
    // an eval-leak), and at ~1e-6 fpp it should add essentially none
    check("d_decontaminate_bloom") {
      def flagged(name: String): Set[(Long, String)] =
        res(name).select(col("doc_id").cast("long"), col("split"))
          .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val exact = flagged("d_decontaminate")
      val bloom = flagged("d_decontaminate_bloom")
      val missed = exact.diff(bloom).size
      val extra = bloom.diff(exact).size
      Check("missed_plus_extra_docs", (missed * 1000 + extra).toDouble, 2.0,
        missed == 0 && extra <= 2,
        "bloom prefilter must flag every exactly-contaminated doc " +
          "(missed scaled x1000 so any loss fails) and add <=2 false " +
          "positives at 30 bits/gram")
    }

    // SemDeDup cell-blocked pairs vs the exact near-dup pair set:
    // precision is 1.0 by construction (every emitted pair carries its
    // exact cosine, re-thresholded), so the one quantity that can
    // degrade is boundary recall — near-dups split across two k-means
    // cells are never scored
    check("e_semdedup_pairs") {
      val semRecall = recall(pairSet(res("e_semdedup_pairs")),
        pairSet(res("e_neardup_pairs")))
      Check("recall_vs_exact_neardup", semRecall, 0.78, semRecall >= 0.78,
        "fraction of exact cosine>=0.4 pairs recovered by IVF-cell " +
          "blocking (8 spherical k-means++ cells, soft-assigned to " +
          "the 2 nearest; measured 0.8475 bit-stable, bound 0.07 below)")
    }

    // LSH / IVF top-k recall vs the brute-force exact twin.
    //
    // Bound discipline (round 8, re-derived round 9): every ANN bound
    // is MEASURED MINUS A SMALL MARGIN (<= 0.1), not a loose floor — a
    // bound of 0.45 against a measured 0.8 would let a 40-point recall
    // regression ship green. Round 8's tightening caught that the
    // "bit-stable" r5-r7 recalls were luck (KMeans random-init sampled
    // by partition placement; 0.80 -> 0.56 across identical binaries),
    // but its fix pinned the PLACEMENT coin and froze a poor codebook
    // (ivf family 0.80 -> 0.64). Round 9 removed the coin: quantizer
    // fits are deterministic k-means++ over a content-keyed bounded
    // sample (Kernels.kmeansFit via ivfFit), so fits are pure
    // functions of the data by ALGORITHM, independent of partition
    // layout and executor count. Measured recalls are bit-identical
    // across 3 fresh JVMs at 16/16/24 cores: ivf family 0.80,
    // knn_graph 0.7308, semdedup 0.8475, lsh 0.84. Bounds sit
    // 0.05-0.09 below those. If a future intentional parameter change
    // (nProbe, tables, bands) moves a measured value, re-derive the
    // bound as measured-0.05 in the same commit — never widen it to
    // make a regression pass.
    check("e_lsh_topk") {
      val lshRecall = recall(topkSet(res("e_lsh_topk")),
        topkSet(res("e_ann_topk")))
      Check("recall_vs_brute_force", lshRecall, 0.75, lshRecall >= 0.75,
        "multiprobe SRP-LSH (8 bits x 6 tables, 8 query-side probes) " +
          "top-5 overlap with exact cosine top-5")
    }
    check("e_ivf_topk") {
      val ivfRecall = recall(topkSet(res("e_ivf_topk")),
        topkSet(res("e_ann_topk")))
      Check("recall_vs_brute_force", ivfRecall, 0.75, ivfRecall >= 0.75,
        "IVF 6-of-16-cell probing (k-means++ quantizer), top-5 " +
          "overlap with exact cosine top-5 (this synthetic corpus " +
          "has weak cluster structure — random embeddings — so " +
          "recall tracks the probed fraction; measured 0.80 " +
          "bit-stable, bound 0.05 below)")
    }
    check("e_ivf_persisted") {
      val pRecall = recall(topkSet(res("e_ivf_persisted")),
        topkSet(res("e_ann_topk")))
      Check("recall_vs_brute_force", pRecall, 0.75, pRecall >= 0.75,
        "probe of the PERSISTED cell-partitioned IVF index, top-5 " +
          "overlap with exact cosine top-5 (same contract as e_ivf_topk)")
    }
    check("st_ivf_maint") {
      val r = recall(topkSet(res("st_ivf_maint")),
        topkSet(res("e_ann_topk")))
      Check("recall_vs_brute_force", r, 0.75, r >= 0.75,
        "probe of the STREAM-MAINTAINED IVF index (per-micro-batch " +
          "frozen-centroid assignment appended cell-partitioned), " +
          "same recall contract as the batch-built index — " +
          "incremental maintenance lost no vectors")
    }
    // k-NN graph over the whole corpus: recall vs the exact
    // brute-force graph (oracle-checked e_knn_exact). Same cell-probe
    // contract as e_ivf_topk, measured across ALL nodes instead of the
    // 5-query sample — the corpus-wide law the sampled probes imply.
    check("e_knn_graph") {
      val r = recall(topkSet(res("e_knn_graph")),
        topkSet(res("e_knn_exact")))
      Check("recall_vs_exact_graph", r, 0.68, r >= 0.68,
        "IVF-probed top-5 neighbour graph (6-of-16 cells, persisted " +
          "index) vs the exact brute-force k-NN graph, all nodes")
    }
    check("e_ivfpq_topk") {
      val r = recall(topkSet(res("e_ivfpq_topk")),
        topkSet(res("e_ann_topk")))
      Check("recall_vs_brute_force", r, 0.75, r >= 0.75,
        "IVF-PQ composed index (6-of-16 cells, 16-byte codes, " +
          "rerank=100): recall is bounded by the cell pruning — it " +
          "must track e_ivf_topk's at the same nProbe, the PQ stage " +
          "losing essentially nothing")
    }

    // The recall/nProbe dial as GATED rows (round 10): the SCALE.md
    // dial table is tool-emitted prose (tools.AnnDial); a quantizer
    // change that FLATTENS the dial — a degenerate fit putting most of
    // the corpus in one cell makes recall stop rising with probed
    // cells while still passing the fixed-point bounds above — would
    // ship green without these. Two laws, measured bit-stable at
    // sf0.01 (recall@5 = 0.48 / 0.80 / 1.00 at nProbe 2/6/16, gaps
    // 0.32 and 0.20; bound 0.1 sits half below the smaller gap):
    // recall must RISE at each dial step, and the FULL probe must
    // reproduce brute force exactly — nProbe=nCells scores the whole
    // corpus with exact cosine, so any loss means the index dropped
    // or mis-assigned vectors.
    if (sfDir.nonEmpty) {
      lazy val dial: Map[Int, Double] = {
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id").as("id"), col("embedding"))
        val queries = emb.orderBy("id").limit(5)
        val exact = graft.operators.Similarity
          .bruteForceTopK(emb, queries, k = 5)
          .select("query_id", "corpus_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val index = graft.operators.Similarity.ivfFit(emb, nCells = 16)
        try Seq(2, 6, 16).map { nProbe =>
          val got = graft.operators.Similarity
            .ivfProbe(index, queries, k = 5, nProbe = nProbe)
            .select("query_id", "corpus_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          nProbe -> recall(got, exact)
        }.toMap
        finally index.release()
      }
      check("e_ivf_dial_monotone") {
        val gap = math.min(dial(6) - dial(2), dial(16) - dial(6))
        Check("min_recall_gain_per_dial_step", gap, 0.1, gap >= 0.1,
          f"recall@5 vs brute force must rise with nProbe " +
            f"(2: ${dial(2)}%.2f, 6: ${dial(6)}%.2f, 16: ${dial(16)}%.2f); " +
            "a flat dial means the quantizer degenerated")
      }
      check("e_ivf_dial_full_probe") {
        Check("recall_at_full_probe", dial(16), 1.0, dial(16) >= 1.0,
          "nProbe=16/16 scores the whole corpus with exact cosine — " +
            "identity with brute-force top-5 is the construction law")
      }
    }

    // centroid features are means of L1-normalized histograms: each
    // media type's 16 weights must sum to 1 (up to 6-dp rounding)
    check("mm_feature_centroids") {
      val fcErr = maxOrFail(res("mm_feature_centroids")
        .groupBy("media_type").agg(abs(sum("avg_weight") - 1.0).as("err")),
        "err")
      Check("max_l1_mass_error", fcErr, 1e-4, fcErr <= 1e-4,
        "per-media-type mean histogram retains unit L1 mass")
    }

    checks.result()
  }
}
