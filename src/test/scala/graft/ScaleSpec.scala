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

  test("hll merge law: union of daily sketches ≡ one global sketch, " +
      "and the estimate tracks the exact count") {
    import org.apache.spark.sql.functions._
    val ev = graft.queries.Events.events(spark, sf)
    // the q_hll_merge shape: per-day sketches unioned per event_type
    val merged = ev
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    // the single-pass twin: one sketch over all days
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
    val m = merged.as[(String, Long)].collect().toMap
    val d = direct.as[(String, Long)].collect().toMap
    assert(m.nonEmpty && m.keySet == d.keySet)
    // Datasketches HLL union with identical lgK is lossless: merging
    // the daily sketches must estimate exactly what one sketch of the
    // union estimates — the property that makes incremental
    // maintenance sound (no drift as more days fold in)
    m.foreach { case (t, est) => assert(est == d(t), s"$t: $est vs ${d(t)}") }
    // and the declared query's estimate is within HLL tolerance of exact
    val q = SparkEntry.queries("q_hll_merge")(spark, sf)
      .select($"approx_users", $"exact_users").as[(Long, Long)].collect()
    assert(q.nonEmpty)
    q.foreach { case (a, e) =>
      assert(math.abs(a - e).toDouble / e <= 0.05, s"hll $a vs exact $e") }
  }
}
