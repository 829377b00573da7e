package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{cosine_sim, sq8_cosine, sq8_quantize, srp_bucket, srp_probes}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the builder-prompt extension spec:
  *  - [[bruteForceTopK]] — exact cosine top-k. The query side is
  *    broadcast, so the big side streams once with no shuffle; cost is
  *    O(|corpus| × |queries|). The right baseline, and fine whenever
  *    |queries| is small.
  *  - [[lshTopK]] — signed-random-projection LSH: corpus and queries
  *    bucketed by L independent hash tables; only same-bucket pairs are
  *    scored, then exact cosine re-ranks. Cost tracks collisions, not
  *    |corpus| × |queries| — the 100 TB path. Recall tuned by
  *    (numBits ↓, tables ↑); verified against brute force in
  *    SimilaritySpec.
  */
object Similarity {

  /** Exact top-k nearest neighbours by cosine for each query row.
    * `queries`/`corpus`: (id, embedding). Self-matches excluded.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      k: Int = 5): DataFrame = {
    // the corpus is the streamed side of every scoring pass: spread a
    // narrow (single-row-group) input so the cosine sweep parallelizes
    val c = Ops.spreadNarrow(corpus).select(col("id").as("corpus_id"),
      col("embedding").as("c_emb"))
    val q = queries.select(col("id").as("query_id"),
      col("embedding").as("q_emb"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("cosine", round(cosine_sim(col("q_emb"), col("c_emb")), 4))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** LSH-bucketed approximate top-k: candidates = pairs sharing a
    * bucket in ANY of `tables` independent SRP hash tables; exact
    * cosine re-rank on candidates only.
    *
    * `nProbes > 1` turns on QUERY-SIDE multiprobe (Lv et al., VLDB
    * 2007): each query additionally visits the `nProbes - 1`
    * neighbouring buckets reached by flipping its lowest-|margin|
    * projection bits ([[graft.expressions.Kernels.srpProbes]]). The
    * corpus keeps exactly one bucket per table — index size, the
    * corpus-side shuffle, and the big-side scan are all unchanged;
    * recall is bought with nProbes× more rows on the (tiny) query
    * side. That's the right trade at 100 TB: corpus rows are billions,
    * query rows are thousands.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      numBits: Int = 8, tables: Int = 4, seed: Long = 42L,
      nProbes: Int = 1): DataFrame = {
    def bucketed(df: DataFrame, idName: String, embName: String,
        probes: Int) = {
      // corpus side stays on the scalar bucket (no per-row array of
      // probe arrays on the billion-row side)
      val tb =
        if (probes == 1) array((0 until tables).map { t =>
          struct(lit(t).as("table"),
            srp_bucket(col("embedding"), numBits, seed + t).as("bucket"))
        }: _*)
        else flatten(array((0 until tables).map { t =>
          transform(
            srp_probes(col("embedding"), numBits, seed + t, probes),
            b => struct(lit(t).as("table"), b.as("bucket")))
        }: _*))
      Ops.spreadNarrow(df)
        .select(col("id").as(idName), col("embedding").as(embName),
          explode(tb).as("tb"))
    }
    val c = bucketed(corpus, "corpus_id", "c_emb", 1)
    val q = bucketed(queries, "query_id", "q_emb", nProbes)
    val candidates = c.join(q, Seq("tb"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select("query_id", "q_emb", "corpus_id", "c_emb").distinct()
    val scored = candidates
      .withColumn("cosine", round(cosine_sim(col("q_emb"), col("c_emb")), 4))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    * partitions the corpus into `nCells` cells; each query probes only
    * its `nProbe` nearest cells and scores that fraction of the corpus.
    * Cost ≈ |corpus| × nProbe / nCells per query versus brute force's
    * |corpus| — the classic ANN trade; `nProbe == nCells` degenerates
    * to exact brute force (the spec asserts that equality).
    *
    * Composition: a deterministic driver-fitted k-means++ quantizer
    * over a content-keyed bounded sample (see [[ivfFit]]),
    * `zip_with`+`aggregate` for the squared-distance cell ranking (pure
    * codegen'd builtins), [[graft.functions.TopK]]'s bounded aggregator
    * for the final per-query k — no window sort anywhere.
    */
  /** A fitted IVF index: the coarse quantizer's cell assignment of the
    * corpus plus its centroid table. Building it is the one-time batch
    * cost of the ANN family (like building any index); [[ivfProbe]]
    * queries amortize it. The assignment is PERSISTED at fit time —
    * without that, every probe would re-scan and re-assign the whole
    * corpus, amortizing only the k-means fit. The index owns that
    * cached state: call [[IvfIndex.release]] when done with it (at
    * real scale the equivalent is writing `assigned` as a
    * cell-partitioned table).
    */
  case class IvfIndex(assigned: DataFrame, centroids: DataFrame,
      nCells: Int) {
    def release(): Unit = { assigned.unpersist(); () }
  }

  /** The quantizer metric must match the scoring metric: final scores
    * are cosine, so cluster and probe on L2-NORMALIZED vectors
    * (spherical k-means) — on raw vectors a same-direction neighbour
    * with a large norm lands in a Euclidean-far cell and is never
    * probed. Cosine itself is scale-invariant, so scoring still uses
    * the raw embeddings. Zero vectors stay zero rather than NaN/null.
    */
  private def l2normed(e: org.apache.spark.sql.Column) = {
    val d = e.cast("array<double>")
    val n = sqrt(aggregate(d, lit(0.0), (acc, x) => acc + x * x))
    transform(d, x => coalesce(x / nullif(n, lit(0.0)), lit(0.0)))
  }

  /** @param cache persist the cell assignment (the long-lived-index
    *               contract; callers own [[IvfIndex.release]]). Pass
    *               false for one-shot fit+probe compositions, which
    *               would otherwise leak the cached RDD.
    *
    * Fit protocol (deterministic by ALGORITHM, round 9):
    *  1. a bounded CONTENT-KEYED training sample — the `sampleN`
    *     rows with the smallest `xxhash64(id)` (TakeOrdered: one
    *     O(n log sampleN) scan, no full sort, no shuffle). Keying the
    *     sample on row content makes it a pure function of the DATA —
    *     independent of partition layout, split planning, task
    *     scheduling, and executor count. (Round 8 instead pinned the
    *     shuffle placement that MLlib's random init sampled through;
    *     that made fits reproducible but froze a POOR codebook —
    *     recall fell 0.80 → 0.64.)
    *  2. driver-side spherical k-means with deterministic k-means++
    *     seeding over that sample ([[graft.expressions.Kernels
    *     .kmeansFit]]) — the standard IVF contract: a coarse
    *     quantizer converges on ~256·nCells training vectors no
    *     matter the corpus size (FAISS trains IVF on a bounded sample
    *     at any scale), so at 100 TB this step is unchanged.
    *  3. one shuffle-free assignment scan: the fitted centroids ride
    *     into tasks as a codegen reference object and each row's cell
    *     is a pure projection ([[graft.functions.GraftFunctions
    *     .ivf_cell]]) — no window argmin, no centroid join, no MLlib
    *     model object.
    */
  def ivfFit(corpus: DataFrame, nCells: Int = 16,
      seed: Long = 42L, cache: Boolean = true): IvfIndex = {
    import graft.functions.GraftFunctions.ivf_cell
    val sampleN = math.max(nCells * 256, 2048)
    val sample = corpus
      .select(col("embedding").cast("array<float>").as("e"),
        xxhash64(col("id")).as("hk"))
      .orderBy("hk")
      .limit(sampleN)
      .collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "ivfFit: empty corpus — nothing to quantize")
    // a corpus smaller than the requested cell count quantizes at its
    // own size (one row per cell is the finest meaningful quantizer) —
    // the graceful-degradation contract small filtered corpora rely on
    val effCells = math.min(nCells, sample.length)
    val flat = graft.expressions.Kernels.kmeansFit(
      sample, effCells, iters = 12, seed = seed)
    val dim = sample(0).length
    val raw = Ops.spreadNarrow(corpus)
      .select(col("id").as("corpus_id"), col("embedding").as("c_emb"),
        ivf_cell(col("embedding").cast("array<float>"), flat, effCells)
          .as("cell"))
    val assigned = if (cache)
      raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else raw
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = flat.grouped(dim).zipWithIndex
      .map { case (v, i) => (i, v.map(_.toDouble)) }
      .toSeq.toDF("cell", "centroid")
    IvfIndex(assigned, centroids, effCells)
  }

  /** Assign a batch of embeddings to FROZEN centroids — the streaming
    * maintenance path: a production ANN index retrains its coarse
    * quantizer rarely (a batch job), while arrivals are assigned and
    * appended continuously. One broadcast of the tiny centroid table,
    * codegen'd zip_with/aggregate distance, row_number argmin (ties to
    * the lowest cell); output shape matches [[IvfIndex.assigned]], so
    * appends land straight into the cell-partitioned index and probes
    * see new vectors immediately. Per-batch cost is O(batch × nCells)
    * — never touches the index. Assignment agrees with [[ivfFit]]'s
    * own except on exact-distance NEAR-TIES (the fit assigns through
    * `ivf_cell`'s float accumulation, this path through zip_with
    * doubles — rounding may break a near-tie the other way), harmless
    * for ANN (either cell is equally probe-able; the spec law is
    * tie-tolerant). The ranking itself IS [[probeCells]] at nProbe=1 —
    * one definition, so the streamed assignment can never diverge
    * structurally from the probe side.
    */
  def assignToCells(batch: DataFrame, centroids: DataFrame): DataFrame =
    probeCells(batch, centroids, nProbe = 1, "c_emb" -> col("embedding"))
      .select(col("query_id").as("corpus_id"), col("c_emb"), col("cell"))

  /** Per-query nearest-cell ranking — THE probe-side cell selection
    * shared by [[ivfProbe]], [[ivfPqProbe]], and the diagnostics that
    * must count exactly what probes scan ([[graft.tools.AnnDial]]):
    * rank cells by squared euclidean distance of the NORMALIZED query
    * to the (normalized-space) centroid (zip_with + aggregate, inside
    * whole-stage codegen), keep the `nProbe` nearest, ties to the
    * lowest cell. `carry` columns (the query payload each caller needs
    * downstream — raw embedding, ADC table) ride through the ranking
    * so no join-back is ever paid. One definition means the dial's
    * probed-fraction accounting can never desynchronize from the real
    * probe path.
    */
  private[graft] def probeCells(queries: DataFrame, centroids: DataFrame,
      nProbe: Int, carry: (String, Column)*): DataFrame = {
    val dist2 = aggregate(
      zip_with(col("q_normed"), col("centroid"),
        (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    val payload = carry.map { case (n, c) => c.as(n) }
    val names = carry.map { case (n, _) => col(n) }
    queries
      .select(col("id").as("query_id") +:
        l2normed(col("embedding")).as("q_normed") +: payload: _*)
      .crossJoin(broadcast(centroids))
      .select(col("query_id") +: col("cell") +: dist2.as("d2") +:
        names: _*)
      .withColumn("cell_rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d2").asc, col("cell"))))
      .filter(col("cell_rank") <= nProbe)
      .select(col("query_id") +: col("cell") +: names: _*)
  }

  def ivfProbe(index: IvfIndex, queries: DataFrame, k: Int = 5,
      nProbe: Int = 4): DataFrame = {
    val probes = probeCells(queries, index.centroids, nProbe,
      "q_emb" -> col("embedding"))
    val scored = probes.join(index.assigned, Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        round(cosine_sim(col("q_emb"), col("c_emb")), 4).as("cosine"))
    graft.functions.TopK.perKey(scored, k)
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L): DataFrame =
    ivfProbe(ivfFit(corpus, nCells, seed, cache = false), queries, k, nProbe)

  /** Persist a fitted index as Parquet: the cell assignment
    * hive-partitioned on `cell` (each IVF cell is its own directory, so
    * a probe of nProbe cells lists and reads exactly nProbe/nCells of
    * the index — partition pruning does the inverted-file part of IVF
    * at the storage layer) plus the tiny centroid table. This is the
    * real ANN contract at 100 TB: the k-means fit and corpus assignment
    * run ONCE as a batch job; every query workload after that is
    * [[ivfLoad]] + [[ivfProbe]] and never re-reads, re-normalizes, or
    * re-assigns the corpus.
    */
  def ivfSave(index: IvfIndex, path: String): Unit = {
    index.assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(path + "/assigned")
    index.centroids.write.mode("overwrite").parquet(path + "/centroids")
  }

  /** Reopen a persisted index. The assignment stays on disk (partition-
    * pruned per probe) rather than cached — a 100 TB index does not fit
    * in memory, and the probed fraction streams fine.
    */
  def ivfLoad(spark: org.apache.spark.sql.SparkSession,
      path: String): IvfIndex = {
    val centroids = spark.read.parquet(path + "/centroids")
    IvfIndex(spark.read.parquet(path + "/assigned"), centroids,
      nCells = centroids.count().toInt)
  }

  /** Int8 scalar-quantized (SQ8) top-k: score the corpus with integer
    * cosine over 4×-smaller int8 codes ([[graft.expressions.Kernels
    * .sq8Quantize]]), keep the best `rerank` candidates per query via
    * the bounded [[graft.functions.TopK]] aggregator, then re-score
    * ONLY that shortlist with exact float cosine and take the final k.
    *
    * The 100 TB story: the coarse pass streams codes (a quarter of the
    * raw bytes — the scan, shuffle, and cache all shrink 4×) and ships
    * ≤rerank rows per query per map task; the exact pass touches
    * |queries| × rerank rows, a broadcast-joined shortlist, not the
    * corpus. With `rerank ≥ |corpus|` the path degenerates to exact
    * brute force (spec-asserted); at practical rerank (4-8×k) the
    * true top-k survive the int8 coarse ranking whenever quantization
    * error is below the neighbour gap — recall is pinned in
    * SimilaritySpec and quantified per-run in the tolerance artifact.
    */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      rerank: Int = 25): DataFrame = {
    val wideCorpus = Ops.spreadNarrow(corpus)
    val c = wideCorpus.select(col("id").as("corpus_id"),
      sq8_quantize(col("embedding")).as("c_code"))
    val q = queries.select(col("id").as("query_id"),
      sq8_quantize(col("embedding")).as("q_code"))
    val coarse = c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        sq8_cosine(col("q_code"), col("c_code")).as("sq8_cos"))
    val shortlist = graft.functions.TopK.perKey(coarse, rerank)
      .select("query_id", "corpus_id")
    // exact rerank: the ORIGINAL corpus streams once against the
    // broadcast shortlist (no second spread — the broadcast-filtered
    // scan does almost no per-row work, so the coarse pass's widened
    // copy is not re-materialized); raw embeddings only surface for
    // survivors
    val exact = corpus
      .select(col("id").as("corpus_id"), col("embedding").as("c_emb"))
      .join(broadcast(shortlist), "corpus_id")
      .join(broadcast(queries.select(col("id").as("query_id"),
        col("embedding").as("q_emb"))), "query_id")
      .select(col("query_id"), col("corpus_id"),
        round(cosine_sim(col("q_emb"), col("c_emb")), 4).as("cosine"))
    graft.functions.TopK.perKey(exact, k)
  }

  /** Trained PQ codebooks: `m` subspaces × `k` centroids over
    * `dim/m`-float subvectors, flat per [[graft.expressions.Kernels
    * .pqTrain]]'s layout. Kilobytes at any practical setting — rides
    * into tasks as a codegen reference object, never a join side.
    */
  case class PqCodebooks(flat: Array[Float], m: Int, k: Int)

  /** Train PQ codebooks on a bounded sample of the corpus. The collect
    * is BOUNDED BY CONSTRUCTION at `sampleN` embeddings (the standard
    * PQ contract: codebooks converge on 10⁴-10⁵ training vectors no
    * matter the corpus size — at 100 TB you still train on ~64k rows),
    * so this is a documented driver-side sample, not a corpus
    * collect. Deterministic under `seed`.
    */
  def pqFit(corpus: DataFrame, m: Int = 16, k: Int = 16,
      sampleN: Int = 4096, iters: Int = 12, seed: Long = 42L): PqCodebooks = {
    // content-keyed bounded sample (same discipline as ivfFit): a bare
    // limit() takes whichever splits schedule first, so the codebooks
    // would vary with partition layout; TakeOrdered on xxhash64(id)
    // makes them a pure function of the data
    val sample = corpus
      .select(col("embedding").cast("array<float>").as("e"),
        xxhash64(col("id")).as("hk"))
      .orderBy("hk")
      .limit(sampleN)
      .collect()
      .map(_.getSeq[Float](0).toArray)
    PqCodebooks(
      graft.expressions.Kernels.pqTrain(sample, m, k, iters, seed), m, k)
  }

  /** PQ/ADC approximate top-k (Jégou et al., TPAMI 2011) against
    * pre-trained codebooks: the corpus streams as m-byte PQ codes
    * (16 bytes vs 256 for a 64-dim float32 embedding — the coarse
    * scan's IO shrinks 16×, four times past SQ8's 4×), each query
    * precomputes its m·k ADC distance table once, and every
    * (query, code) pair scores in m table lookups inside whole-stage
    * codegen. The best `rerank` candidates per query — kept by the
    * bounded [[graft.functions.TopK]] aggregator, no window sort —
    * are re-scored with exact float cosine, and the final k emitted.
    *
    * Same degenerate law as SQ8: `rerank ≥ |corpus|` makes the coarse
    * ranking irrelevant and the result exactly equals brute force
    * (spec-asserted). At practical rerank the true top-k survive
    * whenever PQ quantization error stays below the neighbour gap —
    * on the fixture corpus the declared query matches the EXACT
    * oracle at rerank=50.
    */
  def pqTopKWith(cb: PqCodebooks, corpus: DataFrame, queries: DataFrame,
      k: Int = 5, rerank: Int = 50): DataFrame = {
    import graft.functions.GraftFunctions.{pq_adc, pq_adc_table, pq_encode}
    val c = Ops.spreadNarrow(corpus).select(col("id").as("corpus_id"),
      pq_encode(col("embedding"), cb.flat, cb.m, cb.k).as("code"))
    val q = queries.select(col("id").as("query_id"),
      pq_adc_table(col("embedding"), cb.flat, cb.m, cb.k).as("qtab"))
    // ADC approximates ‖a−b‖² on the unit sphere; 1 − d/2 recovers
    // approximate cosine so the shared TopK ordering (score desc) holds
    val coarse = c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        (lit(1.0) - pq_adc(col("qtab"), col("code")) / 2).as("adc_sim"))
    val shortlist = graft.functions.TopK.perKey(coarse, rerank)
      .select("query_id", "corpus_id")
    // exact rerank over the broadcast shortlist only (the SQ8 pattern:
    // raw embeddings surface for ≤ rerank×|queries| survivors)
    val exact = corpus
      .select(col("id").as("corpus_id"), col("embedding").as("c_emb"))
      .join(broadcast(shortlist), "corpus_id")
      .join(broadcast(queries.select(col("id").as("query_id"),
        col("embedding").as("q_emb"))), "query_id")
      .select(col("query_id"), col("corpus_id"),
        round(cosine_sim(col("q_emb"), col("c_emb")), 4).as("cosine"))
    graft.functions.TopK.perKey(exact, k)
  }

  /** One-shot fit + search (fixture/spec convenience; long-lived
    * deployments call [[pqFit]] once and reuse the codebooks).
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      m: Int = 16, numCentroids: Int = 16, rerank: Int = 50,
      seed: Long = 42L): DataFrame =
    pqTopKWith(pqFit(corpus, m, numCentroids, seed = seed), corpus,
      queries, k, rerank)

  /** IVF-PQ: the composed billion-scale index layout (what FAISS's
    * IVFPQ names) — the coarse quantizer's cells bound WHICH corpus
    * fraction a query touches (partition pruning), and PQ codes bound
    * the BYTES each touched row costs (16-byte codes, no embeddings in
    * the index at all). The index over a 100 TB embedding corpus is
    * ~6 TB of (cell, code) rows; a 6-of-16-cell probe reads ~2 TB of
    * codes where flat IVF reads ~37 TB of floats.
    *
    * Codes quantize the raw (normalized) vectors, not per-cell
    * residuals — residual encoding (FAISS's default) buys accuracy at
    * the cost of a per-(query, cell) ADC table; with the exact-rerank
    * shortlist downstream the simpler shared table wins here, and the
    * recall difference is absorbed by `rerank` (quantified in the
    * tolerance artifact: IVF-PQ tracks flat IVF's recall at the same
    * nProbe, so the PQ stage loses essentially nothing).
    */
  case class IvfPqIndex(assigned: DataFrame, centroids: DataFrame,
      cb: PqCodebooks, nCells: Int) {
    def release(): Unit = { assigned.unpersist(); () }
  }

  /** One batch pass builds both quantizers: spherical k-means cells
    * (shared with [[ivfFit]]) and sample-trained PQ codebooks
    * ([[pqFit]]); the index rows are (corpus_id, cell, code) — the
    * embedding column itself is DROPPED, which is the point.
    */
  def ivfPqFit(corpus: DataFrame, nCells: Int = 16, m: Int = 16,
      k: Int = 32, seed: Long = 42L, cache: Boolean = true): IvfPqIndex = {
    import graft.functions.GraftFunctions.pq_encode
    val ivf = ivfFit(corpus, nCells, seed, cache = false)
    val cb = pqFit(corpus, m, k, seed = seed)
    val raw = ivf.assigned.select(col("corpus_id"), col("cell"),
      pq_encode(col("c_emb"), cb.flat, cb.m, cb.k).as("code"))
    val assigned = if (cache)
      raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else raw
    IvfPqIndex(assigned, ivf.centroids, cb, ivf.nCells)
  }

  /** Persist the composed index: (corpus_id, code) rows
    * hive-partitioned on `cell` — same pruning contract as
    * [[ivfSave]], but each cell directory holds 16-byte codes instead
    * of embeddings, so the on-disk index is ~16× smaller and a probe
    * lists nProbe directories of codes. Codebooks and centroids are
    * kilobytes, stored beside it.
    */
  def ivfPqSave(index: IvfPqIndex, path: String): Unit = {
    index.assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(path + "/assigned")
    index.centroids.write.mode("overwrite").parquet(path + "/centroids")
    val spark = index.centroids.sparkSession
    import spark.implicits._
    index.cb.flat.toSeq.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("i", "v")
      .withColumn("m", lit(index.cb.m)).withColumn("k", lit(index.cb.k))
      .coalesce(1).write.mode("overwrite").parquet(path + "/codebooks")
  }

  /** Reopen a persisted composed index; the code table stays on disk
    * (partition-pruned per probe), only the kilobyte codebook loads.
    */
  def ivfPqLoad(spark: org.apache.spark.sql.SparkSession,
      path: String): IvfPqIndex = {
    val centroids = spark.read.parquet(path + "/centroids")
    val cbRows = spark.read.parquet(path + "/codebooks")
      .orderBy("i").collect()
    val cb = PqCodebooks(cbRows.map(_.getAs[Float]("v")),
      cbRows.head.getAs[Int]("m"), cbRows.head.getAs[Int]("k"))
    IvfPqIndex(spark.read.parquet(path + "/assigned"), centroids, cb,
      nCells = centroids.count().toInt)
  }

  /** Probe the composed index: rank cells per query (broadcast
    * centroids, the [[ivfProbe]] dial), ADC-score ONLY the probed
    * cells' codes, keep a bounded shortlist, exact-rerank against the
    * corpus. `corpus` supplies raw embeddings for the rerank join —
    * the index itself carries none.
    */
  def ivfPqProbe(index: IvfPqIndex, corpus: DataFrame, queries: DataFrame,
      k: Int = 5, nProbe: Int = 6, rerank: Int = 100): DataFrame = {
    import graft.functions.GraftFunctions.{pq_adc, pq_adc_table}
    val probes = probeCells(queries, index.centroids, nProbe,
      "qtab" -> pq_adc_table(col("embedding"), index.cb.flat,
        index.cb.m, index.cb.k))
    val coarse = probes.join(index.assigned, Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        (lit(1.0) - pq_adc(col("qtab"), col("code")) / 2).as("adc_sim"))
    val shortlist = graft.functions.TopK.perKey(coarse, rerank)
      .select("query_id", "corpus_id")
    val exact = corpus
      .select(col("id").as("corpus_id"), col("embedding").as("c_emb"))
      .join(broadcast(shortlist), "corpus_id")
      .join(broadcast(queries.select(col("id").as("query_id"),
        col("embedding").as("q_emb"))), "query_id")
      .select(col("query_id"), col("corpus_id"),
        round(cosine_sim(col("q_emb"), col("c_emb")), 4).as("cosine"))
    graft.functions.TopK.perKey(exact, k)
  }

  /** SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    * arXiv:2303.09540): block the corpus by the IVF coarse quantizer's
    * cells (spherical k-means — the same geometry the cosine scores
    * live in), then score pairs ONLY within a cell. Emits
    * (id_a, id_b, cosine) for same-cell pairs with cosine ≥ threshold;
    * downstream keeps one representative per group exactly as with the
    * exact pair relation.
    *
    * The 100 TB contract: pairwise work is Σ|cell|² instead of n² —
    * with balanced cells ≈ assignTo²·n²/nCells — and the cell join is
    * a co-partitioned self-join on a small int key, no broadcast of
    * the corpus anywhere. The known weakness of hard cell blocking is
    * boundary recall (a near-dup pair split across two cells is never
    * scored); `assignTo` applies the standard IVF soft-assignment fix:
    * every vector indexes under its `assignTo` nearest cells, so a
    * boundary pair only escapes when NONE of the two vectors'
    * cell sets intersect. ToleranceCheck quantifies exactly that —
    * the fraction of the exact brute-force pair set recovered — and
    * the fixture's bound is pinned there. Precision is 1.0 by
    * construction: every emitted pair carries its EXACT cosine,
    * re-verified against the threshold.
    */
  def semDedupPairs(embeddings: DataFrame, threshold: Double,
      nCells: Int = 8, assignTo: Int = 2, seed: Long = 42L): DataFrame = {
    // one cell = no blocking: the method degenerates to the exact
    // relation (spec law), skipping the quantizer k-means can't fit
    if (nCells <= 1) return nearDupPairs(embeddings, threshold)
    // only the centroids are used (soft assignment below replaces the
    // fit's hard single-cell assignment, which stays unexecuted)
    semDedupPairsWith(embeddings, threshold,
      ivfFit(embeddings, nCells, seed, cache = false).centroids, assignTo)
  }

  /** [[semDedupPairs]] against an EXISTING quantizer's centroid table
    * (e.g. the corpus's persisted IVF index) — at scale the clustering
    * is built once and dedup reuses it rather than re-fitting.
    */
  def semDedupPairsWith(embeddings: DataFrame, threshold: Double,
      centroids: DataFrame, assignTo: Int): DataFrame = {
    // soft assignment: rank cells per vector in the quantizer's
    // (normalized) space, keep the assignTo nearest — same codegen'd
    // zip_with distance as ivfProbe's query-side ranking
    val dist2 = aggregate(
      zip_with(col("v_normed"), col("centroid"),
        (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    // NOTE on the duplicated assignment subtree: both self-join
    // branches recompute the (cheap) centroid distances + ranking
    // window rather than sharing one exchange — measured, an explicit
    // cell repartition to force ReuseExchange costs MORE here, because
    // the cell join broadcasts its build side and the streamed side
    // then flows with NO exchange at all; pinning a shared exchange
    // would buy one window at the price of shuffling the corpus.
    val soft = Ops.spreadNarrow(embeddings)
      .select(col("id"), col("embedding"),
        l2normed(col("embedding")).as("v_normed"))
      .crossJoin(broadcast(centroids))
      .select(col("id"), col("embedding"), col("cell"), dist2.as("d2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("id").orderBy(col("d2").asc, col("cell"))))
      .filter(col("rk") <= assignTo)
    val a = soft.select(col("cell"), col("id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = soft.select(col("cell"), col("id").as("id_b"),
      col("embedding").as("emb_b"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      // score BEFORE the dedup (the signBandPairs discipline): cosine
      // is a pure function of the pair, so a multi-cell collision
      // recomputes the identical value, and the dedup shuffle carries
      // (id, id, cosine) instead of two embedding vectors per row
      .withColumn("cosine", round(cosine_sim(col("emb_a"), col("emb_b")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      // a pair sharing several cells must be emitted once
      .dropDuplicates("id_a", "id_b")
  }

  /** Sign-band LSH candidate pairs with exact cosine verification —
    * the bucketed edge generator for similarity-GRAPH queries
    * (`g_triangles` / `g_clustering`), replacing [[nearDupPairs]]'s
    * crossJoin on their path. The banding is DETERMINISTIC and
    * engine-portable by construction: band `k`'s key is the integer
    * packing of `sign(embedding[k·bits + i]) for i in 1..bits`
    * (1-indexed, matching SQL array semantics) — no hash function, no
    * random hyperplanes — so a SQL oracle recomputes the SAME key from
    * the same parquet floats and the emitted relation is exactly
    * checkable despite being a recall-lossy subset of the brute-force
    * pair set. (Sign bits ARE a signed-random-projection family with
    * the axis-aligned hyperplanes; collision probability per bit is
    * 1 − θ/π, so high-cosine pairs — the ones that form duplicate
    * communities — survive banding with high probability.)
    *
    * The 100 TB contract: one explode to `bands` keyed rows per
    * vector, a self-equi-join on (band, key) — hash shuffle, never
    * Cartesian — a pair-dedup, and exact cosine re-verification of
    * candidates only. Pairwise work is Σ_bucket |bucket|² with
    * E|bucket| ≈ n / 2^bits per band: `bits` is the knob that grows
    * with corpus size (8–16 at real scale), exactly like MinHash band
    * width. Precision is 1.0 (every emitted pair carries its exact
    * cosine, re-checked against the threshold); recall is fixed by the
    * band scheme and identical in any engine that replays it.
    */
  def signBandPairs(embeddings: DataFrame, threshold: Double,
      bands: Int = 10, bits: Int = 6): DataFrame = {
    val key = (0 until bits).map { i =>
      when(element_at(col("embedding"),
        (col("band") * bits + i + 1).cast("int")) >= 0f,
        lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
    val keyed = Ops.spreadNarrow(embeddings)
      .select(col("id"), col("embedding"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("key", key)
    val a = keyed.select(col("band"), col("key"), col("id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = keyed.select(col("band"), col("key"), col("id").as("id_b"),
      col("embedding").as("emb_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      // score BEFORE the dedup: cosine is a pure function of the pair,
      // so a multi-band collision re-computes the identical value but
      // the dedup shuffle then carries (id, id, cosine) — not two
      // embedding vectors per row. At scale that's the difference
      // between shuffling candidate ids and shuffling the corpus.
      .withColumn("cosine", round(cosine_sim(col("emb_a"), col("emb_b")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      // a pair colliding in several bands must be emitted once
      .dropDuplicates("id_a", "id_b")
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup detection).
    * Brute-force pair generation — the exact-answer baseline; LSH
    * bucketing ([[signBandPairs]], or [[lshTopK]]'s hashed variant) is
    * the scale path.
    */
  def nearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    // spread side a: CartesianExec pairs partitions, so a 1x1-partition
    // cross join is ONE task scoring all n^2 pairs
    val a = Ops.spreadNarrow(embeddings).select(col("id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = embeddings.select(col("id").as("id_b"),
      col("embedding").as("emb_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(cosine_sim(col("emb_a"), col("emb_b")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** MMR (maximal marginal relevance, Carbonell & Goldstein SIGIR'98)
    * diversified re-ranking: from each query's top-`topN` shortlist,
    * greedily select `k` results maximizing
    * `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)` — the standard
    * diversity pass behind retrieval serving AND dedup-aware training
    * sample selection (pure top-k hands back near-duplicates; MMR
    * spends the slots on coverage).
    *
    * Everything after the shortlist is RESULT-SIZED: each query's
    * <= topN candidates are grouped into ONE array row and the whole
    * k-step greedy runs as higher-order array expressions inside a
    * single plan — one shuffle, one job, no per-step scheduling
    * barriers (the k-round join/checkpoint shape this replaced spent
    * ~10 fixed-cost jobs on 60 rows). At 100 TB only the shortlist
    * source changes (swap [[bruteForceTopK]] for the persisted IVF
    * probe); the greedy never sees corpus-sized data.
    *
    * Exactness discipline: rel and sim are the codegen'd cosine
    * rounded at 1e-4 (the parity anchor every ANN oracle uses); the
    * greedy score is two IEEE products and one subtraction in fixed
    * operand order; ties break on id. NOTE `1.0 − λ` is computed in
    * doubles HERE — an oracle must interpolate
    * `(1.0 - lambda).toString` (e.g. 0.30000000000000004 for λ=0.7),
    * never the decimal it "should" be.
    */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, topN: Int = 20,
      k: Int = 5, lambda: Double = 0.7): DataFrame = {
    // Single-plan greedy (round-8 rewrite): the old shape ran the k-step
    // greedy as k driver-scheduled rounds — window + two joins +
    // localCheckpoint PER STEP, 10+ jobs whose fixed scheduling cost
    // dominated the (tiny, result-sized) data work — 3.0 s for 3
    // queries x 20 candidates. The shortlist is BOUNDED (<= topN rows
    // per query), so the whole greedy fits in one row: group each
    // query's shortlist into an array<struct> and run selection as
    // higher-order array expressions (aggregate = argmax, filter =
    // drop picked, transform = fold the new pairwise sim into ms).
    // One shuffle (the groupBy), one job, zero checkpoints. At 100 TB
    // only the shortlist source changes (swap [[bruteForceTopK]] for
    // the persisted IVF probe); per-query state is still <= topN
    // structs — the greedy never sees corpus-sized data.
    //
    // Exactness is bit-identical to the join-based shape: rel and sim
    // are the codegen'd cosine rounded at 1e-4, the greedy score is
    // `lam * rel - oml * ms` in that fixed operand order, ties break
    // on id ascending, and `1.0 - lambda` is computed in doubles HERE
    // (an oracle must interpolate `(1.0 - lambda).toString`, e.g.
    // 0.30000000000000004 for λ=0.7, never the decimal it "should"
    // be). The argmax fold is order-independent (strict > / tie on
    // unique id), so collect_list's nondeterministic order cannot
    // change the result.
    val lam = lit(lambda)
    val oml = lit(1.0 - lambda)
    val emb = corpus.select(col("id"), col("embedding"))
    val cand = bruteForceTopK(corpus, queries, topN)
      .select(col("query_id"), col("corpus_id").as("id"),
        col("cosine").as("rel"))
      .join(emb, "id")
    def score(x: Column): Column =
      lam * x.getField("rel") - oml * x.getField("ms")
    // argmax by (score desc, id asc); null on an empty state (only
    // reachable when topN < k), dropped before the final explode
    def pickExpr(arr: Column): Column =
      aggregate(arr, get(arr, lit(0)), (acc, x) =>
        when(score(x) > score(acc)
          || (score(x) === score(acc)
            && x.getField("id") < acc.getField("id")), x)
          .otherwise(acc))
    var df = cand.groupBy("query_id")
      .agg(collect_list(struct(col("id"), col("rel"),
        col("embedding").as("emb"), lit(0.0).as("ms"))).as("state0"))
    for (t <- 1 to k) {
      df = df.withColumn(s"pick$t", pickExpr(col(s"state${t - 1}")))
      val p = col(s"pick$t")
      if (t < k) df = df.withColumn(s"state$t",
        transform(
          filter(col(s"state${t - 1}"),
            x => x.getField("id") =!= p.getField("id")),
          x => struct(x.getField("id").as("id"),
            x.getField("rel").as("rel"),
            x.getField("emb").as("emb"),
            greatest(x.getField("ms"),
              round(cosine_sim(x.getField("emb"), p.getField("emb")), 4))
              .as("ms"))))
    }
    val picksArr = filter(array((1 to k).map(t => col(s"pick$t")): _*),
      p => p.isNotNull)
    df.select(col("query_id"), posexplode(picksArr))
      .select(col("query_id"),
        (col("pos") + 1).cast("bigint").as("sel_rank"),
        col("col").getField("id").as("doc_id"),
        col("col").getField("rel").as("rel"),
        (lam * col("col").getField("rel")
          - oml * col("col").getField("ms")).as("score"))
      .orderBy("query_id", "sel_rank")
  }
}
