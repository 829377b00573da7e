package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Analytics, Curation, Events, Ingest, Multimodal, NamedQuery, Relational, Scale, Streaming, TrainingData}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator surfaces here as a named query; the driver
  * runs each against the DuckDB oracle (Verify) and the bench harness
  * (Bench).
  */
object SparkEntry {
  /** The full declared query set, one NamedQuery per operator. */
  def allQueries: Seq[NamedQuery] =
    Relational.all ++ TrainingData.all ++ Curation.all ++ Events.all ++
      Scale.all ++ Streaming.all ++ Multimodal.all ++ Ingest.all ++
      Analytics.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap

  /** Headline bench set: everything except
    *
    *  - the exact-similarity queries that are quadratic *by
    *    definition*: word-set Jaccard / MinHash-at-0.5 on this corpus
    *    (`documents` shares a ~30-word vocabulary, so they emit most
    *    of the n² pairs — at sf0.1 that is the answer, not an
    *    inefficiency) and the brute-force k-NN self-join
    *    `e_knn_exact` (all n top-k lists ARE the output). They stay
    *    in the correctness gate at sf0.01; their scale twins
    *    (`d_jaccard_capped` / `d_minhash_capped` / `d_ppjoin_pairs` /
    *    `e_knn_graph`) ARE in the bench set.
    *  - the streaming-engine queries, whose data computation is
    *    already benched by their batch twins (`ev_tumbling_hourly`,
    *    `ev_asof_click`, `d_clean_pipeline`/`d_split_assign`, the
    *    events scan); what they add is fixed per-query streaming
    *    startup + checkpoint I/O (~4-8 s regardless of sf), which
    *    would measure engine spin-up, not data-scale throughput. They
    *    stay in the correctness gate.
    */
  /** Machine-readable form of the exclusions above — emitted into
    * bench_detail.json by [[Bench]] so the artifact declares its own
    * coverage caps instead of leaving them implicit in code.
    */
  def benchExclusions: Seq[(String, String)] = Seq(
    "d_jaccard_pairs" -> ("quadratic by definition: exact word-set " +
      "Jaccard oracle anchor on a ~30-word shared vocabulary emits " +
      "most n^2 pairs; scale twin d_jaccard_capped IS benched"),
    "d_minhash_pairs" -> ("quadratic by definition: uncapped MinHash " +
      "oracle anchor; scale twin d_minhash_capped IS benched"),
    "e_knn_exact" -> ("brute-force k-NN self-join oracle anchor " +
      "(all n top-k lists ARE the output); scale twin e_knn_graph " +
      "IS benched"),
    "d_bpe_exact" -> ("driver-serial oracle twin of d_bpe_merges, " +
      "which IS benched"),
    "st_* (timed separately)" -> ("streaming queries are timed " +
      "single-shot in the bench's own streaming section, excluded " +
      "from the scale total: per-query fixed engine startup + " +
      "checkpoint I/O dominates regardless of sf; their data " +
      "computation is benched by batch twins"))

  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    (queries -- benchExclusions.map(_._1))
      .filter { case (name, _) => !name.startsWith("st_") } ++
      benchVariants

  /** Bench-only bodies substituted under the declared names: the HLL
    * queries carry an exact-countDistinct verification twin for
    * ToleranceCheck that rescans events and dominates wall time; the
    * bench times the sketch-only read path instead (the steady-state
    * cost at scale). Correctness still runs the full declared bodies.
    */
  def benchVariants: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hll_merge" -> (Scale.hllMergeSketchOnly(_, _)),
    "q_hll_sliding" -> (Scale.hllSlidingSketchOnly(_, _)),
    "q_hll_intersect" -> (Scale.hllIntersectSketchOnly(_, _)))
}
