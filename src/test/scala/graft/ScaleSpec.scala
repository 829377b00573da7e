package graft

/** Sketch-vs-exact agreement for the Scale query family (the sketches
  * have no SQL oracle; these pin them against their exact twins).
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("approx percentiles sit within 2% of the exact percentiles") {
    val approx = SparkEntry.queries("q_approx_percentiles")(spark, sf)
      .as[(String, Double, Double)].collect()
      .map { case (p, a, b) => p -> (a, b) }.toMap
    val exact = SparkEntry.queries("q_percentiles")(spark, sf)
      .select($"priority", $"p50", $"p95")
      .as[(String, Double, Double)].collect()
    assert(exact.nonEmpty && approx.size == exact.length)
    exact.foreach { case (p, e50, e95) =>
      val (a50, a95) = approx(p)
      assert(math.abs(a50 - e50) / e50 < 0.02, s"$p p50: $a50 vs $e50")
      assert(math.abs(a95 - e95) / e95 < 0.02, s"$p p95: $a95 vs $e95")
    }
  }

  test("approx distinct counts sit within 5% of the exact counts") {
    val rows = SparkEntry.queries("q_approx_distinct")(spark, sf)
      .select($"approx_parts", $"exact_parts")
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"approx $approx vs exact $exact")
    }
  }
}
