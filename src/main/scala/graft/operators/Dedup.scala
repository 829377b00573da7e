package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{fnv1a64, hamming64, minhash_sigs, simhash64, winnow_fingerprints, word_ngrams}
import graft.functions.TextAnalysis.tokens

/** Deduplication operators for training-data pipelines (builder-prompt
  * extension surface). All operate on an (id, text) pair of columns and
  * return either survivor sets or candidate duplicate pairs
  * `(id_a < id_b)`.
  *
  * Scale design: nothing here ever compares all O(n²) pairs. Exact and
  * fingerprint dedup are single hash-shuffles on the key; MinHash/LSH
  * and SimHash generate candidates by bucket join (shuffle on
  * band/bucket key), so cost tracks the number of *colliding* pairs,
  * not n². Skewed buckets (a shingle shared by every doc, an all-zeros
  * band) are the known hazard — AQE skew-join handles moderate cases;
  * pathological hot shingles should be length-filtered upstream.
  */
object Dedup {

  /** Canonical word-set key: distinct sorted tokens re-joined. Detects
    * reorder/repeat duplicates of the same vocabulary (bag-of-words
    * identity) — one deterministic string key, one shuffle to dedup.
    */
  def wordSetKey(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_join(array_sort(array_distinct(tokens(text))), " ")

  /** Exact dedup on an arbitrary key: one group per key, smallest id
    * survives. `dropDuplicates` would also work but picks an arbitrary
    * survivor; min(id) is deterministic (required by the oracle gate).
    */
  def exactDedup(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.groupBy(col(keyCol).as("dup_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Incremental dedup: classify a NEW batch against a persisted key
    * index without touching the corpus — the nightly-ingest shape at
    * 100 TB, where "dedup the new day" must cost O(batch + index
    * lookup), never O(corpus rescan). `keyIndex` is the (distinct) key
    * table maintained alongside the corpus (at scale: 8-byte
    * fingerprints, see [[fingerprintDedup]]); each batch row comes
    * back labeled `dup_corpus` (key already ingested), `dup_batch`
    * (an earlier row IN this batch has the key — min-id survivor
    * rule), or `new`. Appending the `new`+first-`dup_batch` keys to
    * the index is the caller's follow-up write. Two key-partitioned
    * hash joins (AQE broadcasts the batch side when small); the
    * within-batch first is a bounded window over batch keys only.
    */
  def incrementalDedup(batch: DataFrame, idCol: String, keyCol: String,
      keyIndex: DataFrame): DataFrame = {
    val idx = keyIndex.select(col(keyCol)).distinct()
      .withColumn("__in_corpus", lit(true))
    batch.join(idx, Seq(keyCol), "left")
      .withColumn("__first", min(col(idCol)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(keyCol)))
      .withColumn("status",
        when(col("__in_corpus"), "dup_corpus")
          .when(col(idCol) =!= col("__first"), "dup_batch")
          .otherwise("new"))
      .drop("__in_corpus", "__first")
  }

  /** 64-bit fingerprint dedup: same as exact but on fnv1a64(key) —
    * constant-width keys, cheap shuffles at 100 TB (8-byte vs
    * arbitrary-length text keys).
    */
  def fingerprintDedup(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.withColumn("fp", fnv1a64(col(keyCol)))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Distinct word n-grams per document, the shared shingle builder for
    * the similarity joins: `(id, grams array<string>)`. n=1 → the plain
    * distinct token set; n>1 → space-joined n-gram shingles; fewer than
    * n tokens → empty array. One codegen'd pass per row
    * ([[graft.expressions.WordNGrams]]) — the equivalent
    * `transform(sequence, slice, array_join)` composition evaluates
    * interpreted per element and re-tokenizes per slice (O(len²) per
    * row), which dominated the whole family's runtime before this
    * expression existed.
    */
  private def distinctGrams(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    Ops.spreadNarrow(df).select(col(idCol).as("id"),
      word_ngrams(col(textCol), n).as("grams"))

  /** MinHash/LSH near-dup pairs, pure Catalyst: shingle → per-doc
    * minhash signature vector ([[graft.expressions.MinHashSigs]], one
    * codegen'd pass) → banded bucket join (docs agreeing on ANY of the
    * `numHashTables` signature slots become candidates — cost tracks
    * collisions, not n²) → EXACT Jaccard re-score over the surviving
    * shingle sets, threshold applied to the exact value. The classic
    * production split: the sketch only generates candidates, the
    * verdict is exact — so a reported pair's `est_jaccard` is its true
    * (post-cap) Jaccard, and the only approximation is recall (a
    * jaccard-j pair is missed with probability (1-j)^tables; identical
    * sets are always recalled). Deterministic for a fixed seed.
    *
    * (Replaced the spark.ml HashingTF+MinHashLSH composition: the ML
    * path shuffled 2^18-dim sparse vectors through the join and scored
    * with a non-codegen UDF — 8-byte signature slots and a codegen'd
    * intersection do the same work at a fraction of the bytes, with no
    * HashingTF bucket-collision error in the score.)
    *
    * @param threshold minimum exact Jaccard to keep.
    * @param n shingle width: 1 = word sets; ≥2 = word n-grams — the
    *          scale setting, since n-gram document frequencies are far
    *          more selective than single-word ones (candidates track
    *          genuine near-dups, not shared vocabulary).
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      numHashTables: Int = 8, threshold: Double = 0.5,
      seed: Long = 42L, maxDf: Double = 1.0, n: Int = 1): DataFrame = {
    val rawToks = distinctGrams(df, idCol, textCol, n)
      .withColumnRenamed("grams", "toks")
      .filter(size(col("toks")) > 0)
    val toks =
      if (maxDf >= 1.0) rawToks
      else {
        // stop-shingle cap, map-side: broadcast the one-row hot array
        // and array_except it out of each doc's shingle set in place;
        // denominator = ALL input docs, same as jaccardPairs — one
        // maxDf meaning everywhere
        val exploded = rawToks.select(col("id"), explode(col("toks")).as("t"))
        val hot = hotTermArray(exploded, "t", maxDf,
          df.select(col(idCol)).distinct().count())
        rawToks.crossJoin(broadcast(hot))
          .select(col("id"), array_except(col("toks"), col("__hot")).as("toks"))
          .filter(size(col("toks")) > 0)
      }
    // one explicit id-partitioning caps the whole shingle/cap subtree:
    // the band explode and BOTH exact-rescore branches read the same
    // exchange (ReuseExchange), so tokenization + hot-term cap run
    // once, not three times
    val keyed = toks.repartition(col("id"))
    val banded = keyed.select(col("id"),
      posexplode(minhash_sigs(col("toks"), numHashTables, seed)))
      .toDF("id", "t", "sig")
    val cand = banded.select(col("id").as("id_a"), col("t"), col("sig"))
      .join(banded.select(col("id").as("id_b"), col("t"), col("sig")),
        Seq("t", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val inter = size(array_intersect(col("toks_a"), col("toks_b")))
      .cast("double")
    cand
      .join(keyed.select(col("id").as("id_a"), col("toks").as("toks_a")), "id_a")
      .join(keyed.select(col("id").as("id_b"), col("toks").as("toks_b")), "id_b")
      .withColumn("est_jaccard", round(inter /
        (size(col("toks_a")) + size(col("toks_b")) - inter), 4))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** Stop-term cap shared by the similarity operators: the set of
    * terms whose document frequency exceeds `maxDf` × `nDocs`,
    * aggregated to a single array row. The caller broadcast-crossJoins
    * it and strips hot terms MAP-SIDE with `array_except` — the
    * per-doc arrays never leave their partition for the cap (the old
    * shape exploded, anti-joined, and re-grouped: one full shuffle of
    * every shingle occurrence plus a collect_list, all replaced by a
    * codegen'd set difference). The hot set is small by construction —
    * it is the stop-list (df > maxDf·n bounds its size by
    * occurrences/(maxDf·n)) — so the broadcast is KBs. Never a
    * driver-side collect.
    */
  private def hotTermArray(exploded: DataFrame, termCol: String,
      maxDf: Double, nDocs: Long): DataFrame =
    exploded.groupBy(termCol)
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf * nDocs)
      .agg(collect_list(col(termCol)).as("__hot"))

  /** The hot stop-shingle relation for an EXPLICIT document universe
    * and denominator — the persistable form of the cap
    * [[hotTermArray]] applies inline: an incremental near-dup index
    * must freeze its stop list at build time so a later batch shingles
    * under the SAME cap (recomputing df over corpus+batch would
    * silently shift which shingles score). One row, `__hot`
    * array<string>.
    */
  def hotShingleArray(df: DataFrame, idCol: String, textCol: String,
      n: Int, maxDf: Double, nDocsDenominator: Long): DataFrame =
    hotTermArray(
      distinctGrams(df, idCol, textCol, n)
        .select(col("id"), explode(col("grams")).as("t")),
      "t", maxDf, nDocsDenominator)

  /** `(id, toks)` capped shingle sets under a PRE-BUILT stop list
    * (map-side `array_except` against the broadcast one-row hot
    * array) — the probe-time twin of the cap inside
    * [[minhashPairs]]/[[jaccardPairs]], taking the frozen list instead
    * of recomputing it.
    */
  def cappedGrams(df: DataFrame, idCol: String, textCol: String,
      n: Int, hot: DataFrame): DataFrame =
    distinctGrams(df, idCol, textCol, n)
      .filter(size(col("grams")) > 0)
      .crossJoin(broadcast(hot))
      .select(col("id"), array_except(col("grams"), col("__hot")).as("toks"))
      .filter(size(col("toks")) > 0)

  /** Banded MinHash signature rows `(id, t, sig)` for a capped toks
    * relation — the persistable index payload: 8-byte signature per
    * (doc, table), the bucket join key incremental probes collide on.
    */
  def minhashBands(toks: DataFrame, numHashTables: Int,
      seed: Long): DataFrame =
    toks.select(col("id"), posexplode(
      minhash_sigs(col("toks"), numHashTables, seed)))
      .toDF("id", "t", "sig")

  /** SimHash near-dup pairs: 64-bit signature per doc, banded into
    * `bands` sub-keys; docs sharing any band become candidates
    * (bucket join, no n²), then exact Hamming distance filters.
    * A pair within `maxHamming` of 64-bit distance must agree on at
    * least one band when `maxHamming < bands` (pigeonhole).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    require(maxHamming < bands,
      s"pigeonhole guarantee needs maxHamming < bands " +
        s"(got maxHamming=$maxHamming, bands=$bands): a pair $maxHamming " +
        "bits apart could differ in every band and never become a candidate")
    val width = 64 / bands
    // 1L << 64 wraps to 1 on the JVM — width 64 (bands=1, unreachable
    // with the require above but kept correct) needs the -1L mask
    val mask = if (width == 64) -1L else (1L << width) - 1
    val sigs = Ops.spreadNarrow(df).select(col(idCol).as("id"),
      simhash64(col(textCol)).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * width)
            .bitwiseAND(lit(mask)).as("key"))
      }: _*)).as("bk"))
    val a = banded.select(col("id").as("id_a"), col("sig").as("sig_a"),
      col("bk").as("k"))
    val b = banded.select(col("id").as("id_b"), col("sig").as("sig_b"),
      col("bk").as("k"))
    a.join(b, Seq("k")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").distinct()
      .withColumn("hamming", hamming64(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Connected components over a duplicate-pair relation — the step
    * that turns pairwise similarity hits into dedup decisions: pairs
    * (a~b, b~c) chain into one cluster {a,b,c} with a single survivor
    * (the minimum id), which no per-pair rule can decide. Min-label
    * propagation with pointer jumping: every vertex starts as its own
    * label; each round a vertex takes the minimum label in its
    * neighborhood (one join + one groupBy, both keyed shuffles — no
    * adjacency matrices, no driver-side graph) and then follows its
    * label's label (one more self-join) — the shortcutting that turns
    * O(diameter) rounds into O(log diameter), the practical difference
    * between 6 rounds and 60 on chain-shaped duplicate data. `maxIter`
    * bounds a non-converging pathology loudly rather than looping
    * forever. Each round `localCheckpoint`s the (small) label relation
    * so the iteration's lineage doesn't stack into an ever-deeper plan.
    *
    * Round structure is tuned for iteration cost, not just round count:
    * round 0 (take the neighborhood min of the identity labeling) is
    * folded into initialization as a plain `groupBy` over the edge
    * list, and each round's convergence test rides the propagation
    * aggregate — the previous label travels through the fold as a
    * tagged union branch, so "did anything change" is a filter on the
    * checkpointed result instead of a third join. Every plan a round
    * generates is codegen-compiled fresh (the checkpoint cuts lineage),
    * so one less join per round is also one less compile per round —
    * on an iterative operator that fixed cost dominates small inputs
    * and is pure overhead at any size.
    *
    * Returns `(id, cluster)` — cluster = min id reachable, one row per
    * vertex that appears in `pairs`.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    // checkpoint the edge list ONCE: `pairs` is typically the output of
    // an expensive similarity join, and every propagation round reads
    // edges — without the cut, each round would re-run that join
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()
    val idType = edges.schema("src").dataType
    // round 0 pre-folded: label(v) = min(v, min neighbor) — the edge
    // list is symmetrized, so every vertex appears as src
    var labels = edges.groupBy("src").agg(min("dst").as("m"))
      .select(col("src").as("id"),
        least(col("src"), col("m")).as("cluster"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // neighborhood minimum: my own label ∪ my neighbors' labels; the
      // own-label branch carries its value again as `own`, so the fold
      // also yields the pre-round label (`max(own)` — exactly one
      // non-null per id) and convergence needs no join against labels
      val ownRows = labels.select(col("id"), col("cluster"),
        col("cluster").as("own"))
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("cluster"),
          lit(null).cast(idType).as("own"))
      val folded = ownRows.unionByName(viaNeighbors)
        .groupBy("id").agg(min("cluster").as("cluster"),
          max("own").as("prev"))
      // pointer jump: every label IS some vertex's id with its own
      // row, so label(v) := label(label(v)) is one self-join
      val next = folded
        .join(folded.select(col("id").as("cluster"),
          col("cluster").as("jumped")), "cluster")
        .select(col("id"), col("jumped").as("cluster"), col("prev"))
        .localCheckpoint()
      converged = next.filter(col("cluster") =!= col("prev")).isEmpty
      labels = next.drop("prev")
      iter += 1
    }
    require(converged,
      s"connectedComponents: no fixpoint after $maxIter rounds — " +
        "component diameter exceeds maxIter; raise it for chain-shaped data")
    labels
  }

  /** Winnowing-fingerprint near-dup pairs (Schleimer/Wilkerson/Aiken,
    * SIGMOD 2003 — the MOSS scheme): each document is reduced to the
    * window-minimum subset of its rolling-hash char k-grams
    * ([[graft.expressions.WinnowFingerprints]], one codegen'd pass),
    * pairs are generated by joining on shared fingerprints (bucket
    * join — cost tracks collisions, not n²), and the score is the
    * overlap coefficient |F_a ∩ F_b| / min(|F_a|, |F_b|) over the
    * fingerprint sets. Char-level where MinHash/Jaccard here are
    * word-level: reordered words, inserted whitespace, or punctuation
    * edits don't move fingerprints, and any shared normalized substring
    * of length ≥ w + k − 1 is guaranteed to share a fingerprint — the
    * copy-detection contract the word-set operators can't give.
    *
    * Scale shape is the [[jaccardPairs]] one: a document contributes
    * ~2/(w+1) of its grams (the winnowing density bound), so the
    * exploded relation is w/2× smaller than the full gram relation
    * before the join ever runs; `maxDf` strips boilerplate fingerprints
    * (shared headers/footers) map-side via the broadcast hot array.
    */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, w: Int = 4, threshold: Double = 0.5,
      maxDf: Double = 1.0): DataFrame = {
    val raw = Ops.spreadNarrow(df).select(col(idCol).as("id"),
      winnow_fingerprints(col(textCol), k, w).as("fps"))
      .filter(size(col("fps")) > 0)
    val capped =
      if (maxDf >= 1.0) raw
      else {
        val exploded = raw.select(col("id"), explode(col("fps")).as("fp"))
        val hot = hotTermArray(exploded, "fp", maxDf,
          df.select(col(idCol)).distinct().count())
        raw.crossJoin(broadcast(hot))
          .select(col("id"), array_except(col("fps"), col("__hot")).as("fps"))
          .filter(size(col("fps")) > 0)
      }
    val sized = capped.select(col("id"),
      size(col("fps")).cast("bigint").as("sz"), explode(col("fps")).as("fp"))
    val a = sized.select(col("id").as("id_a"), col("sz").as("sz_a"), col("fp"))
    val b = sized.select(col("id").as("id_b"), col("sz").as("sz_b"), col("fp"))
    a.join(b, Seq("fp")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("common"))
      .withColumn("containment", round(col("common").cast("double") /
        least(col("sz_a"), col("sz_b")), 4))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "containment")
  }

  /** Exact n-gram Jaccard similarity join: explode distinct n-grams,
    * join on the shingle (candidates = co-occurring pairs only), count
    * intersections, filter by true Jaccard. n=1 → word-set Jaccard.
    *
    * `maxDf` < 1.0 enables the scale path: shingles present in more
    * than that fraction of documents are dropped before the join
    * (standard stop-shingle filtering) and Jaccard is computed over the
    * surviving shingles. A shingle shared by every document would
    * otherwise make the candidate join quadratic in corpus size — with
    * the cap, join cost tracks the rare-shingle collision count.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 1, threshold: Double = 0.6,
      maxDf: Double = 1.0): DataFrame = {
    val grams = distinctGrams(df, idCol, textCol, n)
    // per-doc gram count travels WITH the rows from before the explode —
    // a plain projection, where a window count after the explode would
    // re-shuffle the entire exploded relation
    val exploded = grams.filter(size(col("grams")) > 0)
      .select(col("id"), size(col("grams")).cast("bigint").as("sz"),
        explode(col("grams")).as("g"))
    val sized =
      if (maxDf >= 1.0) exploded
      else {
        // denominator = ALL input docs (the documented maxDf meaning),
        // not just docs that produced grams
        val nDocs = df.select(col(idCol)).distinct().count()
        // map-side cap: broadcast the one-row hot array, array_except
        // it from each doc's gram set, and size/explode the capped
        // arrays directly — no regroup shuffle of the exploded relation
        val hot = hotTermArray(exploded.drop("sz"), "g", maxDf, nDocs)
        grams.filter(size(col("grams")) > 0)
          .crossJoin(broadcast(hot))
          .select(col("id"),
            array_except(col("grams"), col("__hot")).as("gs"))
          .filter(size(col("gs")) > 0)
          .select(col("id"), size(col("gs")).cast("bigint").as("sz"),
            explode(col("gs")).as("g"))
      }
    val a = sized.select(col("id").as("id_a"), col("sz").as("sz_a"), col("g"))
    val b = sized.select(col("id").as("id_b"), col("sz").as("sz_b"), col("g"))
    a.join(b, Seq("g")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard", round(col("common").cast("double") /
        (col("sz_a") + col("sz_b") - col("common")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** PPJoin-style prefix-filtered EXACT similarity join: the same
    * result relation as [[jaccardPairs]] (same shingles, same
    * threshold, NO frequency cap — semantics untouched) from a far
    * smaller candidate join. Shingles rank under one global rare-first
    * total order (ascending document frequency, shingle text as
    * tiebreak) and only each doc's first `|s| − ceil(t·|s|) + 1` — its
    * PREFIX — enter the candidate join. Completeness (All-Pairs/PPJoin
    * prefix lemma): J(a,b) ≥ t forces overlap o ≥ ceil(t·max(|a|,|b|));
    * if the prefixes were disjoint, every common shingle of `a` would
    * sit in its last ceil(t·|a|)−1 positions — fewer than o — and
    * (under the SHARED order) any common shingle inside a's prefix is ≤
    * b's prefix boundary, hence inside b's prefix too. So qualifying
    * pairs always collide on a prefix shingle; frequency-hot shingles
    * land at the END of the order and never generate candidates —
    * the capped twins' stop-shingle effect with zero semantic change.
    * Survivors verify EXACTLY via one codegen'd `array_intersect` over
    * the full shingle arrays (bounded by candidate count, not n²).
    *
    * At 100 TB: one shingle-keyed agg for document frequencies, one
    * per-doc window for ranks (rides the id partitioning the shingle
    * build already has), a candidate join whose input is prefix rows
    * only (≈ (1−t) of the exploded volume, and biased to RARE shingles
    * — the hot keys that make the naive join quadratic are exactly the
    * ones prefixes exclude), then an id-keyed verify join on candidate
    * pairs.
    */
  def ppjoinPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 1, threshold: Double = 0.6): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df"), col("g"))
    // explicit null guards BEFORE the repartition: the explode branch,
    // the df-count branch, and both verify-join branches each push
    // their own implicit IsNotNull constraints — without these guards
    // the subtrees differ per branch, ReuseExchange sees four distinct
    // plans, and tokenization runs four times instead of once
    val grams = distinctGrams(df, idCol, textCol, n)
      .filter(size(col("grams")) > 0
        && col("id").isNotNull && col("grams").isNotNull)
    // one explicit id-partitioning so the prefix window and both
    // verify-join branches reuse a single tokenization exchange
    val keyed = grams.repartition(col("id"))
    val exploded = keyed.select(col("id"),
      size(col("grams")).cast("bigint").as("sz"),
      explode(col("grams")).as("g"))
    val dfreq = exploded.groupBy("g").agg(count(lit(1)).as("df"))
    // α = ceil(t·|s|) computed with a tiny downward nudge: IEEE can
    // land t·|s| a few ULPs ABOVE an exact integer (0.6×15 =
    // 9.000000000000002), and ceil of that overshoots α by 1 — a
    // SHORTER prefix, which would break the completeness guarantee.
    // The nudge only ever lengthens the prefix (more candidates,
    // never fewer).
    val alpha = ceil(col("sz") * threshold - lit(1e-9))
    val prefix = exploded.join(dfreq, "g")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("sz") - alpha + 1)
      .select("id", "sz", "g")
    val candA = prefix.select(col("id").as("id_a"), col("sz").as("sz_a"),
      col("g"))
    val candB = prefix.select(col("id").as("id_b"), col("sz").as("sz_b"),
      col("g"))
    val cand = candA.join(candB, Seq("g"))
      .filter(col("id_a") < col("id_b")
        // length filter: J ≤ min/max, so J ≥ t needs min ≥ t·max
        && least(col("sz_a"), col("sz_b")).cast("double") >=
          greatest(col("sz_a"), col("sz_b")) * threshold - lit(1e-9))
      .select("id_a", "id_b").distinct()
    val inter = size(array_intersect(col("gs_a"), col("gs_b")))
      .cast("double")
    cand
      .join(keyed.select(col("id").as("id_a"), col("grams").as("gs_a")),
        "id_a")
      .join(keyed.select(col("id").as("id_b"), col("grams").as("gs_b")),
        "id_b")
      .withColumn("jaccard", round(inter /
        (size(col("gs_a")) + size(col("gs_b")) - inter), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
