package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark plan builder over a testdata dir and,
  * when SQL-expressible, the equivalent ANSI SQL for the DuckDB oracle
  * (driver contract — see SparkEntry). Column names and row order are
  * part of the contract: both sides alias identically and end with the
  * same ORDER BY; double aggregates are rounded on both sides so
  * summation-order ULP noise cannot flip the hash compare.
  *
  * Rounding caveat: engines disagree on round-to-decimal exactly at
  * half boundaries (observed: DuckDB 0.43475 → 0.4348 vs JVM
  * BigDecimal-of-nearest-double → 0.4347). When a derived ratio can
  * land on a boundary, truncate instead — `floor(x * 1e4) / 1e4` is
  * pure IEEE and bit-identical everywhere (see
  * `TextAnalysis.qualityScore`). Sums of input data rarely hit
  * boundaries, but any new FAIL that differs in the last rounded digit
  * should reach for the floor-scaled form on both sides.
  */
case class NamedQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** All testdata tables are single parquet files: `$dir/$name.parquet`. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every testdata table as a temp view so the full surface
    * is reachable from `spark.sql(...)` — with [[configure]]'s
    * extensions the custom functions (fnv1a64, cosine_sim, …) are
    * callable there too.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(t => apply(spark, dir, t).createOrReplaceTempView(t))

  /** Event-time normalizer for the `events` table, adaptive to how the
    * generator wrote `ts` — the column has shipped as parquet
    * TIMESTAMP(NANOS) (read as nanos LongType under `nanosAsLong`) and
    * as plain TIMESTAMP micros (read as TIMESTAMP_NTZ, no UTC
    * adjustment flag). Every consumer normalizes to session-zone
    * TimestampType (session pinned UTC), so windows/watermarks and the
    * DuckDB oracle — which reads the same file natively — see the same
    * instants whichever physical type the file carries.
    */
  def eventTime(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions
          .expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions
          .col("ts").cast("timestamp"))
      case _ => df
    }

  /** Session config every graft entry point uses. `nanosAsLong` is
    * kept for the TIMESTAMP(NANOS) variant of the `events` table
    * (Spark has no nanosecond timestamp type and otherwise refuses the
    * file); `ts` then arrives as nanos-since-epoch LongType and
    * [[eventTime]] converts. Harmless for the micros variant.
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .withExtensions(new graft.functions.GraftExtensions)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    // r14 (guide §3.1): let AQE rewrite a sort-merge join to a
    // shuffled-hash join at runtime when EVERY post-shuffle partition
    // of the build side is under this bound — the size-guarded form of
    // "prefer hash when the per-partition build fits in memory"
    // (default 0 = never). Scale-adaptive by construction: the check
    // is a runtime byte size per partition, so at 100 TB a join whose
    // partitions outgrow the bound keeps the spill-safe sort-merge
    // path. Measured on the join-heavy bench set (quiet, focused,
    // OPTIMIZATION_r14.md): q2 -22%, q9 -19%, q_exists -17%,
    // q5/q7/q_correlated -12%, nothing outside noise got slower.
    // Static plans (PLANS.lock) are untouched — the rewrite is
    // AQE-runtime-only. Shuffle codec stays lz4: zstd was A/B-measured
    // +10-25% slower at bench scale (CPU-bound shuffles).
    .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "128m")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // recursive CTEs (q_recursive_cte): the default 1M-row guard trips
    // at sf0.1 already (|orders| × log2(maxKey) rows pass through the
    // loop); 50M covers sf1 with the same headroom while still
    // guarding against a genuinely non-terminating recursion
    .config("spark.sql.cteRecursionRowLimit", "50000000")
    .config("spark.ui.enabled", "false")
}
