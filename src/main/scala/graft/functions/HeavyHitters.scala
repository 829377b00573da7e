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
  *  2. a per-partition BOUNDED Misra-Gries summary that emits each
  *     partition's surviving keys as CANDIDATES (`mapPartitions` — a
  *     genuine per-partition imperative pass). The summary holds at
  *     most `localM × 8` counters regardless of distinct-key
  *     cardinality — the point of the sketch regime; an unbounded
  *     local hash map would OOM exactly when the exact shuffle would.
  *     Guarantee: any key whose count in SOME partition exceeds
  *     partitionRows/(localM×8) survives there, so every global top-k
  *     key far above that noise floor reaches the candidate set.
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
    val cap = localM * 8
    val candidates: Dataset[String] = keys.as[String].mapPartitions { it =>
      // Misra-Gries: bounded at `cap` counters. A new key arriving at
      // a full summary triggers the batch decrement — subtract the
      // minimum count from every counter and evict the zeroed ones
      // (at least one slot frees). Counts become lower bounds; only
      // MEMBERSHIP matters here (the CMS supplies the estimates).
      val counts = new java.util.HashMap[String, Long]()
      it.foreach { s =>
        if (s != null) {
          val cur = counts.get(s)
          if (cur != 0L || counts.containsKey(s)) counts.put(s, cur + 1L)
          else {
            if (counts.size >= cap) {
              var min = Long.MaxValue
              val it1 = counts.values().iterator()
              while (it1.hasNext) { val v = it1.next(); if (v < min) min = v }
              val it2 = counts.entrySet().iterator()
              while (it2.hasNext) {
                val e = it2.next()
                val nv = e.getValue - min
                if (nv <= 0L) it2.remove() else e.setValue(nv)
              }
            }
            if (counts.size < cap) counts.put(s, 1L)
          }
        }
      }
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
