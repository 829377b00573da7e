package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone-map index — the lakehouse "skipping index": a tiny
  * persisted table of per-file (min, max, rows) for a chosen column,
  * consulted BEFORE any data file is listed or opened. Parquet
  * row-group stats (the `q_zorder_skip` path) already skip WITHIN a
  * scan, but the scan still lists every file and reads every footer —
  * at 100 TB that is millions of S3 HEAD/GET calls before the first
  * row. A zone map moves the pruning decision into the PLANNING step:
  * one read of a file-count-sized index picks the handful of files
  * whose [min, max] interval intersects the predicate, and the scan is
  * constructed over only those. This is exactly Delta/Iceberg's
  * file-statistics pruning, rebuilt on plain parquet.
  *
  * Layout contract: [[build]] range-partitions the data on the indexed
  * column first, so file intervals are near-disjoint and a point/range
  * predicate survives in O(files_hit) — an unclustered layout would
  * give every file the full value range and prune nothing (same reason
  * Z-order precedes row-group skipping).
  *
  * Reference context: the reference's incremental loads re-query Dune
  * by a watermark band (SURVEY §2.10); a zone map is the same
  * "touch only the relevant slice" contract applied to files at rest.
  */
object ZoneMap {

  /** Suffix of the index directory beside the data. */
  private def indexPath(dataPath: String): String = s"${dataPath}_zonemap"

  /** Rewrite `df` clustered on `colName` into `numFiles` files and
    * persist the per-file zone map beside it. Two jobs: one range
    * shuffle (the same cost as any sort-ish layout rewrite) and one
    * stats fold whose shuffle output is file-count-sized.
    */
  def build(df: DataFrame, dataPath: String, colName: String,
      numFiles: Int): Unit = {
    df.repartitionByRange(numFiles, col(colName))
      .write.mode("overwrite").parquet(dataPath)
    val spark = df.sparkSession
    spark.read.parquet(dataPath)
      .groupBy(input_file_name().as("file"))
      .agg(min(colName).as("lo"), max(colName).as("hi"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(indexPath(dataPath))
  }

  /** Files whose [lo, hi] interval intersects [from, to). The collect
    * is bounded by FILE COUNT (the zone map is the small side by
    * construction — one row per file; at 100 TB with 1 GiB files that
    * is ~10⁵ rows, a driver-trivial list the planner must hold anyway
    * to construct the scan).
    */
  def pruneFiles(spark: SparkSession, dataPath: String,
      from: String, to: String): (Seq[String], Long) = {
    val zm = spark.read.parquet(indexPath(dataPath))
    val total = zm.count()
    val hit = zm.filter(col("hi") >= lit(from) && col("lo") < lit(to))
      .select("file").collect().map(_.getString(0)).toSeq
    (hit, total)
  }

  /** A DataFrame over ONLY the files that can contain rows of
    * [from, to) on the indexed column. The caller re-applies the exact
    * predicate (zone intervals over-approximate — a surviving file may
    * still hold out-of-range rows); this is enforced here so the
    * operator cannot return false positives.
    */
  def read(spark: SparkSession, dataPath: String, colName: String,
      from: String, to: String): DataFrame = {
    val (files, _) = pruneFiles(spark, dataPath, from, to)
    if (files.isEmpty)
      // preserve schema on an empty prune: scan the (cheap) index's
      // source dir with an always-false filter
      spark.read.parquet(dataPath).filter(lit(false))
    else
      spark.read.parquet(files: _*)
        .filter(col(colName) >= lit(from) && col(colName) < lit(to))
  }
}
