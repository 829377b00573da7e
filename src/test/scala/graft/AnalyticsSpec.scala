package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laws for the data-ops/analytics queries ([[graft.queries.Analytics]])
  * that the oracle gate's hash compare can't state directly — coverage
  * and frame semantics. Runs on sf0.001 (the smoke fixture).
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  test("chunk overlap covers every token exactly once per stride window") {
    val chunks = run("d_chunk_overlap")
      .select("doc_id", "chunk_idx", "tok_start", "len")
      .as[(Long, Long, Long, Long)].collect().groupBy(_._1)
    val nTokens = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        graft.functions.TextAnalysis.tokenCount(col("text")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(chunks.nonEmpty)
    chunks.foreach { case (doc, cs) =>
      val n = nTokens(doc)
      val sorted = cs.sortBy(_._2)
      // starts are exactly 0, 48, 96, … while start < n
      assert(sorted.map(_._3).toSeq ==
        (0L until n by 48L).toSeq, s"doc $doc starts")
      // every chunk is non-empty, ends within the doc, and all chunks
      // together cover [0, n): chunk i ends at start+len, the last one
      // exactly at n or at start+64
      sorted.foreach { case (_, _, s, l) =>
        assert(l > 0 && s + l <= n && l <= 64, s"doc $doc chunk ($s,$l)")
      }
      val lastCovered = sorted.map(c => c._3 + c._4).max
      assert(lastCovered == n, s"doc $doc tail uncovered")
    }
  }

  test("tfidf ranks ≤3 terms per doc, df consistent corpus-wide") {
    val out = run("d_tfidf_topk")
      .select("doc_id", "rk", "term", "df")
      .as[(Long, Long, String, Long)].collect()
    val perDoc = out.groupBy(_._1)
    perDoc.foreach { case (doc, rows) =>
      val rks = rows.map(_._2).sorted.toSeq
      assert(rks == (1L to rks.length).toSeq && rks.length <= 3,
        s"doc $doc ranks $rks")
    }
    // one df per term, everywhere it appears
    out.groupBy(_._3).foreach { case (term, rows) =>
      assert(rows.map(_._4).distinct.length == 1, s"term $term df drift")
    }
  }

  test("table diff statuses partition the union of keys; delta is 10×|changed mod-7 keys|") {
    val out = run("q_table_diff")
      .select("status", "n", "price_delta")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet.subsetOf(Set("added", "removed", "changed", "unchanged")))
    assert(out.contains("changed") && out.contains("unchanged"))
    // changed rows are exactly the mod-7 keys in the overlap window,
    // and each contributes exactly +10 price drift
    val changed = out("changed")
    assert(math.abs(changed._3 - 10.0 * changed._2) < 1e-6,
      s"changed delta ${changed._3} != 10 × ${changed._2}")
  }

  test("moving average equals revenue on the first day and trails afterwards") {
    val rows = run("q_moving_avg")
      .select("day", "revenue", "avg7")
      .as[(java.sql.Date, Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.head._2 - rows.head._3) < 1e-9,
      "first day's trailing avg must be its own revenue")
    // avg7 stays within the min..max envelope of any 7-value window
    val all = rows.map(_._2)
    assert(rows.forall { case (_, _, a) => a >= all.min - 1e-9 && a <= all.max + 1e-9 })
  }

  test("histogram buckets partition all orders and respect bucket bounds") {
    val out = run("q_histogram")
      .select("bucket", "n", "lo_price", "hi_price")
      .as[(Long, Long, Double, Double)].collect()
    val total = spark.read.parquet(s"$dir/orders.parquet").count()
    assert(out.map(_._2).sum == total, "every order lands in one bucket")
    out.filter(b => b._1 > 0 && b._1 < 19).foreach {
      case (b, _, lo, hi) =>
        assert(lo >= b * 25000.0 - 0.01 && hi < (b + 1) * 25000.0 + 0.01,
          s"bucket $b range [$lo,$hi]")
    }
  }

  test("anomaly: flagged events really sit ≥2.5σ from their user's mean") {
    val flagged = run("ev_anomaly")
      .select("event_id", "z").as[(Long, Double)].collect()
    assert(flagged.forall(_._2 >= 2.5))
    // spot-verify one event against recomputed per-user moments
    if (flagged.nonEmpty) {
      val ev = graft.queries.Events.events(spark, dir)
      val byUser = ev.groupBy("user_id")
        .agg(avg("value").as("mu"), stddev_samp("value").as("sigma"))
      val joined = ev.join(byUser, "user_id")
        .filter(col("event_id") === flagged.head._1)
        .select((abs(col("value") - col("mu")) / col("sigma")).as("z"))
        .as[Double].head()
      assert(math.abs(joined - flagged.head._2) < 1e-3)
    }
  }

  test("pagerank: ranks positive, hubs outrank leaves, mass conserved") {
    import org.apache.spark.sql.functions._
    // recompute the full rank vector (the declared query keeps top-25)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val e = li.select(col("l_suppkey").as("a"),
      (col("l_partkey") + 1000000L).as("b")).distinct()
    val top = run("g_pagerank").select("node", "pagerank")
      .as[(Long, Double)].collect()
    assert(top.length == 25 && top.forall(_._2 > 0))
    assert(top.map(_._2).toSeq == top.map(_._2).sorted.reverse.toSeq)
    // suppliers (degree ~ parts supplied) are the hubs of this
    // bipartite graph: the top of the ranking must be supplier nodes
    assert(top.take(5).forall(_._1 < 1000000L),
      s"top ranks should be supplier hubs: ${top.take(5).toSeq}")
    // total mass ≈ 1: symmetric graph has no dangling nodes, each
    // round redistributes all mass (± the 1e-9/node/round rounding)
    val nNodes = e.select("a").union(e.select("b")).distinct().count()
    assert(top.map(_._2).sum <= 1.0 && top.map(_._2).sum > 25.0 / nNodes,
      "top-25 mass must be a plausible fraction of 1")
  }

  test("profile stats: one row per profiled column, counts match the table") {
    val out = run("q_profile_stats")
      .select("column_name", "n_non_null", "n_distinct")
      .as[(String, Long, Long)].collect()
    assert(out.map(_._1).toSet ==
      Set("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    val n = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(out.forall(r => r._2 == n), "no nulls in the fixture")
    assert(out.forall(r => r._3 > 0 && r._3 <= n))
  }

  test("q_backfill_plan partitions the audit's missing days into " +
    "disjoint contiguous ranges") {
    val gaps = run("q_gap_audit").select("missing_day")
      .as[String].collect().toSet
    val plan = run("q_backfill_plan")
      .select("gap_start", "gap_end", "n_days")
      .as[(String, String, Long)].collect().sortBy(_._1)
    def d(s: String) = java.time.LocalDate.parse(s)
    // each range is exactly its day count, fully missing, contiguous
    val covered = plan.flatMap { case (s, e, n) =>
      val days = Iterator.iterate(d(s))(_.plusDays(1))
        .takeWhile(!_.isAfter(d(e))).map(_.toString).toSeq
      assert(days.size.toLong === n, s"range $s..$e length")
      assert(days.forall(gaps), s"range $s..$e contains a present day")
      days
    }
    // together the ranges are exactly the audit (no overlap, no loss)
    assert(covered.length === covered.distinct.length)
    assert(covered.toSet === gaps)
    // maximality: ranges cannot touch (else they'd be one island)
    plan.sliding(2).foreach {
      case Array((_, e1, _), (s2, _, _)) =>
        assert(d(e1).plusDays(1).isBefore(d(s2)),
          s"adjacent ranges $e1 / $s2 should have coalesced")
      case _ => ()
    }
  }

  test("q_golden_record: priority name, max balance, 3 sources") {
    val golden = run("q_golden_record")
      .select("entity", "name", "acctbal_cents", "n_sources")
      .as[(Long, String, Long, Long)].collect()
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_name"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val full = golden.filter(_._4 == 3L)
    assert(full.nonEmpty)
    full.foreach { case (e, name, cents, _) =>
      // priority rule: source 0 (custkey = 3e) always has a non-null,
      // unshouted name — it must survive verbatim
      assert(name === cust(3 * e)._1, s"entity $e name")
      // greatest-value rule across the three source records
      val maxCents = (0L to 2L).map(s => cust(3 * e + s)._2).max
      assert(cents === maxCents, s"entity $e balance")
    }
  }

  test("q_drift_ks matches a driver-side ECDF recomputation") {
    val li = spark.read.parquet(s"$dir/orders.parquet")
      .filter(year(col("o_orderdate")).isin(1997, 1998))
      .select(floor(col("o_totalprice") / 10000.0).cast("long").as("g"),
        year(col("o_orderdate")).as("y"))
      .as[(Long, Int)].collect()
    val grids = li.map(_._1).distinct.sorted
    val na = li.count(_._2 == 1997).toLong
    val nb = li.count(_._2 == 1998).toLong
    var cuma = 0L; var cumb = 0L
    val devs = grids.map { g =>
      cuma += li.count(r => r._1 == g && r._2 == 1997)
      cumb += li.count(r => r._1 == g && r._2 == 1998)
      g -> math.abs(nb * cuma - na * cumb)
    }
    val expectMax = devs.map(_._2).max
    val row = run("q_drift_ks").head()
    // d_num reports as BIGINT at the edge (arithmetic stays DECIMAL
    // internally; decimal output columns hash unstably cross-engine)
    assert(row.getAs[Long]("d_num") === expectMax)
    assert(row.getAs[Long]("n_base") === na)
    assert(row.getAs[Long]("n_curr") === nb)
    assert(row.getAs[Long]("d_e6") ===
      expectMax * 1000000L / (na * nb))
  }

  test("q_patch_coalesce equals the last-non-null window twin") {
    import org.apache.spark.sql.expressions.Window
    // independent reimplementation: same deterministic patch stream,
    // coalesced with last(ignoreNulls) over an unbounded frame instead
    // of the query's max_by FILTER aggregates — same answer required
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val versions = li.select(col("l_orderkey").as("okey"),
        col("l_linenumber").cast("long").as("seq"),
        when(col("l_linenumber") % 2 === 1,
          round(col("l_quantity")).cast("long")).as("qty"),
        when(col("l_linenumber") % 3 === 1, col("l_returnflag"))
          .as("flag"),
        when(col("l_linenumber") % 2 === 0,
          round(col("l_extendedprice") * 100).cast("long"))
          .as("price_cents"))
      .groupBy("okey", "seq")
      .agg(max("qty").as("qty"), max("flag").as("flag"),
        max("price_cents").as("price_cents"))
    val w = Window.partitionBy("okey").orderBy("seq")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val twin = versions
      .withColumn("qty", last("qty", ignoreNulls = true).over(w))
      .withColumn("flag", last("flag", ignoreNulls = true).over(w))
      .withColumn("price_cents",
        last("price_cents", ignoreNulls = true).over(w))
      .groupBy("okey").agg(first("qty").as("qty"),
        first("flag").as("flag"), first("price_cents").as("price_cents"))
    val got = run("q_patch_coalesce")
      .select("okey", "qty", "flag", "price_cents")
    assert(got.count() == twin.count())
    assert(got.except(twin).isEmpty && twin.except(got).isEmpty)
    // sparse semantics: some keys must have a NULL column survive
    // (all patches for that column absent), or the fixture is trivial
    assert(got.filter(col("qty").isNull || col("flag").isNull
      || col("price_cents").isNull).count() > 0)
  }
}
