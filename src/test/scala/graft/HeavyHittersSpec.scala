package graft

import org.apache.spark.sql.functions._

import graft.functions.HeavyHitters

/** Laws of the Count-Min + per-partition-candidates heavy hitter
  * sketch: on a planted Zipf-ish fixture the top-k SET is exact and
  * every estimate is >= the true count (CMS never underestimates) and
  * within the eps*N upper bound.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("planted skew: exact top-k set, upper-biased bounded counts") {
    // key i appears 1000/(i+1) times — unambiguous ranking
    val truth = (0 until 50).map(i => s"key$i" -> (1000L / (i + 1)))
    val rows = truth.flatMap { case (k, n) => Seq.fill(n.toInt)(k) }
    // deterministic spread across partitions
    val df = rows.zipWithIndex
      .map { case (k, i) => (i % 16, k) }.toDF("p", "token")
      .repartition(16, col("p")).select("token")
    val n = rows.size
    val got = HeavyHitters.approxTopK(df, "token", k = 10)
      .as[(String, Long)].collect()
    assert(got.map(_._1).toSeq == truth.take(10).map(_._1),
      s"top-10 set/order mismatch: ${got.toSeq}")
    val trueCounts = truth.toMap
    got.foreach { case (k, est) =>
      val exact = trueCounts(k)
      assert(est >= exact, s"CMS must never underestimate ($k: $est < $exact)")
      assert(est <= exact + math.ceil(1e-4 * n).toLong + 1,
        s"estimate outside eps*N bound ($k: $est vs $exact, n=$n)")
    }
  }

  test("high-cardinality tail: summary stays bounded, heavies survive") {
    // 200k distinct singleton keys (>> the localM*8 counter budget)
    // drowning 5 heavy keys: Misra-Gries must keep the summary at the
    // cap and still surface every heavy key
    val heavies = (0 until 5).flatMap(i => Seq.fill(5000)(s"hot$i"))
    val tail = (0 until 200000).map(i => s"tail$i")
    val df = (heavies ++ tail).zipWithIndex
      .map { case (k, i) => (i % 8, k) }.toDF("p", "token")
      .repartition(8, col("p")).select("token")
    val got = HeavyHitters.approxTopK(df, "token", k = 5, localM = 64)
      .as[(String, Long)].collect()
    assert(got.map(_._1).toSet == (0 until 5).map(i => s"hot$i").toSet,
      s"heavy keys lost: ${got.toSeq}")
    got.foreach { case (_, est) => assert(est >= 5000L) }
  }

  test("ties order deterministically by key") {
    val df = (Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(2)("z"))
      .toDF("token")
    val got = HeavyHitters.approxTopK(df, "token", k = 2)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 5L), ("b", 5L)))
  }
}
