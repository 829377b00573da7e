package graft.plans

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.Kernels

/** Plan-fingerprint result cache — cross-session query-result reuse,
  * the warehouse "result cache" every serving layer puts in front of
  * repeated dashboard queries: identical-semantics plans read the
  * previously materialized parquet instead of recomputing. Spark's own
  * `df.cache()` is session-lifetime and memory-resident; this persists
  * results keyed by the CANONICALIZED logical plan, so a restarted
  * job, a different session, or a syntactically different but
  * semantically identical query (aliases renamed, projection order
  * preserved — Catalyst's `sameResult` normalization) hits the same
  * entry.
  *
  * Key = FNV-1a 64 of (canonicalized analyzed plan, result schema).
  * Canonicalization normalizes expression IDs and alias names, so two
  * builds of "the same" DataFrame from different code paths collide
  * onto one entry (ResultCacheSpec gates this); plans that differ in
  * any literal, column, or operator hash apart.
  *
  * STALENESS CONTRACT (the part every result cache must state): the
  * fingerprint covers the plan, not the data underneath it. A mutable
  * table invalidates by scoping `root` — compose with
  * [[graft.operators.Ops.snapshotWrite]]'s version numbers
  * (`root/v=N/`) or any load watermark, so a new snapshot starts an
  * empty cache level and old entries age out with their snapshot. The
  * testdata tables are immutable per sf dir, the simple case.
  *
  * Concurrency: the materialization is last-writer-wins over a
  * deterministic result — two racing sessions write the same bytes,
  * and parquet overwrite is directory-atomic enough for a CACHE (a
  * torn read falls back to recompute-by-miss on the `_SUCCESS` probe).
  */
object ResultCache {

  /** Stable 64-bit fingerprint of the query's semantics: the OPTIMIZED
    * canonicalized plan, so Catalyst's normalizations (trivial-alias
    * collapse, constant folding, predicate simplification) fold
    * syntactic variants onto one key before hashing — strictly more
    * collisions (= more hits) than the analyzed plan, still never
    * across genuinely different results (optimization is
    * deterministic and result-preserving).
    */
  def fingerprint(df: DataFrame): String = {
    val plan = df.queryExecution.optimizedPlan.canonicalized
    val key = plan.toString + "\n" + df.schema.catalogString
    java.lang.Long.toHexString(
      Kernels.fnv1a64(UTF8String.fromString(key)))
  }

  /** The result of `df`, served from `root` when a completed entry
    * exists, materialized there first when not. Returns (result, hit).
    */
  def cached(df: DataFrame, root: String): (DataFrame, Boolean) = {
    val spark = df.sparkSession
    val path = s"$root/${fingerprint(df)}"
    val hit = Files.exists(Paths.get(
      path.stripPrefix("file:"), "_SUCCESS"))
    if (!hit) df.write.mode("overwrite").parquet(path)
    (spark.read.parquet(path), hit)
  }
}
