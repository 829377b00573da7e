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

  test("histogram-partial quantiles: construction law — estimate in " +
      "[type-1 order statistic, +one bin width]") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val hist = SparkEntry.queries("q_quantile_merge")(spark, sf)
      .as[(String, Double, Double)].collect()
      .map { case (p, a, b) => p -> (a, b) }.toMap
    val o = graft.queries.Tables(spark, sf, "orders")
    val mm = o.agg(min("o_totalprice"), max("o_totalprice")).head
    val width = (mm.getDouble(1) - mm.getDouble(0)) / 4095
    // the exact TYPE-1 quantile (smallest value whose CDF reaches q):
    // the bin where the cumulative count crosses ceil(q·n) is exactly
    // the bin CONTAINING this order statistic, so the upper-edge
    // estimate must sit in [t1, t1 + width]. (The interpolated
    // percentile is a different convention: on small samples it drifts
    // by the local inter-value gap — many bins at sf0.001 — which is
    // why the anchor here is the order statistic; ToleranceCheck pins
    // the interpolated comparison at the Verify scale, where gaps are
    // sub-bin: measured max_rel_err 4.2e-4 vs its 0.01 bound.)
    val ranked = o.select(col("o_orderpriority").as("priority"),
        col("o_totalprice").as("v"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("priority").orderBy("v")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("priority")))
    def t1(q: Double): Map[String, Double] = ranked
      .filter(col("rn") >= ceil(lit(q) * col("n")))
      .groupBy("priority").agg(min("v").as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val (t50, t95) = (t1(0.5), t1(0.95))
    assert(hist.nonEmpty && hist.size == t50.size)
    hist.foreach { case (p, (h50, h95)) =>
      // 0.005 slack: the estimate is rounded to 2 decimals
      assert(h50 >= t50(p) - 0.005 && h50 <= t50(p) + width + 0.005,
        s"$p p50: $h50 outside [${t50(p)}, +$width]")
      assert(h95 >= t95(p) - 0.005 && h95 <= t95(p) + width + 0.005,
        s"$p p95: $h95 outside [${t95(p)}, +$width]")
    }
  }

  test("histogram merge law: quantiles from month partials equal " +
      "quantiles from one global histogram") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val fromPartials = SparkEntry.queries("q_quantile_merge")(spark, sf)
      .as[(String, Double, Double)].collect().toSeq.sorted
    // independent single-pass histogram: same frozen domain, no month
    // split — merging partials must be invisible to the walk
    val o = graft.queries.Tables(spark, sf, "orders")
    val mm = o.agg(min("o_totalprice"), max("o_totalprice")).head
    val lo = mm.getDouble(0)
    val width = (mm.getDouble(1) - lo) / 4095
    val wCum = Window.partitionBy("priority").orderBy("bin")
    val wAll = Window.partitionBy("priority")
    val global = o
      .select(col("o_orderpriority").as("priority"),
        floor((col("o_totalprice") - lit(lo)) / lit(width)).as("bin"))
      .groupBy("priority", "bin").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("total", sum("cnt").over(wAll))
      .groupBy("priority")
      .agg(
        min(when(col("cum") >= ceil(lit(0.5) * col("total")), col("bin")))
          .as("b50"),
        min(when(col("cum") >= ceil(lit(0.95) * col("total")), col("bin")))
          .as("b95"))
      .select(col("priority"),
        round(lit(lo) + (col("b50") + 1) * lit(width), 2),
        round(lit(lo) + (col("b95") + 1) * lit(width), 2))
      .as[(String, Double, Double)].collect().toSeq.sorted
    assert(fromPartials.nonEmpty && fromPartials == global)
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

  test("bitemporal law: a later merge never rewrites what an earlier " +
      "version believed about an earlier valid time") {
    val m = SparkEntry.queries("q_bitemporal")(spark, sf)
      .select($"tx_version", $"valid_at", $"n_rows", $"total_cents")
      .as[(Int, Int, Long, Long)].collect()
      .map { case (tx, t, n, c) => (tx, t) -> ((n, c)) }.toMap
    assert(m.size == 3)
    // belief about valid-time 1 is identical at tx 0 and tx 1
    assert(m((0, 1)) == m((1, 1)))
    // and the current state genuinely moved (the delta landed)
    assert(m((1, 2)) != m((1, 1)))
  }

  test("bitmap distinct: build/union/cardinality laws") {
    import graft.functions.BitmapDistinct._
    import org.apache.spark.sql.functions.{col, countDistinct}
    import spark.implicits._
    // kernel laws on planted ids (duplicates, byte boundaries, zero)
    val idsA = Seq(0L, 7L, 8L, 8L, 63L, 64L, 1000L)
    val idsB = Seq(8L, 9L, 64L, 5000L)
    val bmA = idsA.foldLeft(Array.emptyByteArray)(setBit)
    val bmB = idsB.foldLeft(Array.emptyByteArray)(setBit)
    def card(b: Array[Byte]): Long =
      graft.expressions.Kernels.bitmapCardinality(b)
    assert(card(bmA) === idsA.distinct.size.toLong)
    assert(card(or(bmA, bmB)) === (idsA ++ idsB).distinct.size.toLong)
    // idempotent and commutative union
    assert(card(or(bmA, bmA)) === card(bmA))
    assert(or(bmA, bmB).toSeq === or(bmB, bmA).toSeq)
    // the aggregate path equals countDistinct on a real frame
    val df = (idsA ++ idsB).toDF("id")
    val viaBitmap = df.agg(cardinality(build(col("id")))).head.getLong(0)
    val exact = df.agg(countDistinct("id")).head.getLong(0)
    assert(viaBitmap === exact)
    // domain guard fires on negative keys
    intercept[Exception] {
      Seq(-1L).toDF("id").agg(cardinality(build(col("id")))).head()
    }
  }
}
