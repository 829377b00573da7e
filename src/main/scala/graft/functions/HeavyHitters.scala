package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Approximate heavy hitters (top-k by frequency) — the sketch twin of
  * an exact `groupBy(token).count().orderBy.limit(k)`, for corpora
  * whose distinct-key cardinality makes the exact shuffle the
  * bottleneck.
  *
  * Two distributed passes, neither shuffling the raw keys:
  *  1. a Count-Min sketch over the full column
  *     (`df.stat.countMinSketch` — partial sketches per partition,
  *     merged associatively; the sketch is KBs regardless of input
  *     size);
  *  2. per-partition local counting that emits each partition's
  *     `localM` most frequent keys as CANDIDATES (`mapPartitions` — a
  *     genuine per-partition imperative pass; a global top-k key is
  *     always a local top-M key in at least one partition whenever its
  *     count exceeds inputRows/localM, the SpaceSaving guarantee).
  *
  * The candidate set (≤ localM × partitions, deduped — bounded,
  * documented driver-side materialization like the job-table reads) is
  * then scored against the sketch and the k best kept. Estimates are
  * upper-biased by CMS collisions (ε·N bound), never under — so with
  * `localM` sized to the guarantee the result misses no true heavy
  * hitter; counts carry the sketch's ε error, quantified per-run in
  * the tolerance artifact against the exact twin.
  */
object HeavyHitters {

  /** Top-`k` values of `keyCol` by approximate frequency.
    * Output: (keyCol, freq_est) ordered by freq_est desc, key asc.
    */
  def approxTopK(df: DataFrame, keyCol: String, k: Int,
      localM: Int = 256, eps: Double = 1e-4, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("string").as("k"))
    val cms = keys.stat.countMinSketch("k", eps, confidence, seed)
    val candidates: Dataset[String] = keys.as[String].mapPartitions { it =>
      val counts = new java.util.HashMap[String, Long]()
      it.foreach(s => if (s != null) counts.merge(s, 1L, _ + _))
      import scala.jdk.CollectionConverters._
      counts.asScala.toSeq.sortBy { case (key, n) => (-n, key) }
        .take(localM).map(_._1).iterator
    }
    val local = candidates.distinct().collect() // ≤ localM × partitions
    local.map(key => (key, cms.estimateCount(key)))
      .sortBy { case (key, n) => (-n, key) }
      .take(k).toSeq
      .toDF(keyCol, "freq_est")
  }
}
