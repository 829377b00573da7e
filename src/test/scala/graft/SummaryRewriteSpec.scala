package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.{SummaryCatalog, SummaryDef, SummaryRewrite}

/** Aggregate navigation ([[graft.plans.SummaryRewrite]]): covered
  * aggregates route to the summary scan; anything the summary cannot
  * answer exactly is left untouched. Both directions are plan-gated
  * AND value-gated against direct computation on the fact table.
  */
class SummaryRewriteSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private lazy val seeded: (String, String) = {
    val root = tmpDir("graft_sumspec")
    val fact = s"$root/fact"
    val summary = s"$root/summary"
    spark.read.parquet(s"$sf/lineitem.parquet").write.parquet(fact)
    spark.read.parquet(fact)
      .groupBy("l_returnflag", "l_linestatus", "l_linenumber")
      .agg(sum("l_quantity").as("sum_qty"),
        sum("l_extendedprice").as("sum_price"),
        count(lit(1)).as("cnt"))
      .write.parquet(summary)
    (fact, summary)
  }

  private def withSummary[A](f: (String, String) => A): A = {
    val (fact, summary) = seeded
    SummaryCatalog.register(SummaryDef(
      baseDir = fact, summaryPath = summary,
      dims = Set("l_returnflag", "l_linestatus", "l_linenumber"),
      sums = Map("l_quantity" -> "sum_qty",
        "l_extendedprice" -> "sum_price"),
      cntCol = "cnt",
      nullFreeMeasures = Set("l_quantity")))
    SummaryRewrite.install(spark)
    try f(fact, summary) finally SummaryCatalog.clear()
  }

  /** Root paths of every file scan in the final adaptive plan —
    * descends through AQE roots, materialized query stages, and
    * reused exchanges (whose plans hide outside `children`).
    */
  private def scannedPaths(df: DataFrame): Seq[String] = {
    df.collect() // finalize AQE
    import org.apache.spark.sql.execution._
    def scans(p: SparkPlan): Seq[String] = p match {
      case a: adaptive.AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: adaptive.QueryStageExec => scans(q.plan)
      case r: exchange.ReusedExchangeExec => scans(r.child)
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
      case other => other.children.flatMap(scans)
    }
    val out = scans(df.queryExecution.executedPlan)
    assert(out.nonEmpty, "no file scans found in " +
      df.queryExecution.executedPlan)
    out
  }

  test("covered aggregate scans the summary, not the fact table") {
    withSummary { (fact, summary) =>
      val df = spark.read.parquet(fact)
        .where(col("l_linenumber") <= 2)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sq"), count(lit(1)).as("n"))
      val paths = scannedPaths(df)
      assert(paths.nonEmpty && paths.forall(_.contains(summary)), paths)
      assert(!paths.exists(_.contains(fact)), paths)
    }
  }

  test("rewritten values equal direct fact-table computation") {
    withSummary { (fact, _) =>
      def q(path: String): Array[(String, String, Double, Long)] =
        spark.read.parquet(path)
          .where(col("l_linenumber") <= 3)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(round(sum("l_quantity"), 2).as("sq"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag", "l_linestatus")
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
            r.getLong(3)))
      val rewritten = q(fact)
      // same shape against the ORIGINAL lineitem file: not registered,
      // so this runs the stock full-scan plan on identical data
      val direct = spark.read.parquet(s"$sf/lineitem.parquet")
        .where(col("l_linenumber") <= 3)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sq"), count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
          r.getLong(3)))
      assert(rewritten.sameElements(direct))
    }
  }

  test("dims-subset regrouping re-aggregates partials losslessly") {
    withSummary { (fact, summary) =>
      val df = spark.read.parquet(fact)
        .groupBy("l_linenumber")
        .agg(sum("l_extendedprice").as("sp"))
        .orderBy("l_linenumber")
      assert(scannedPaths(df).forall(_.contains(summary)))
      val direct = spark.read.parquet(s"$sf/lineitem.parquet")
        .groupBy("l_linenumber")
        .agg(sum("l_extendedprice").as("sp"))
        .orderBy("l_linenumber")
        .collect().map(r => (r.getInt(0), r.getDouble(1)))
      val got = df.collect().map(r => (r.getInt(0), r.getDouble(1)))
      got.zip(direct).foreach { case ((m1, v1), (m2, v2)) =>
        assert(m1 == m2)
        assert(math.abs(v1 - v2) <= math.abs(v2) * 1e-12)
      }
    }
  }

  test("declared-null-free AVG rewrites as the weighted mean of " +
      "partials; AVG of an undeclared measure does not") {
    withSummary { (fact, summary) =>
      val covered = spark.read.parquet(fact)
        .groupBy("l_returnflag")
        .agg(avg("l_quantity").as("aq"))
      assert(scannedPaths(covered).forall(_.contains(summary)))
      val direct = spark.read.parquet(s"$sf/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(avg("l_quantity").as("aq"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      covered.collect().foreach { r =>
        assert(math.abs(r.getDouble(1) - direct(r.getString(0))) <=
          math.abs(direct(r.getString(0))) * 1e-12)
      }
      // l_extendedprice is summed but NOT declared null-free: its AVG
      // must keep the fact scan (Average divides by the non-null
      // count; the summary's cnt counts all rows)
      val undeclared = spark.read.parquet(fact)
        .groupBy("l_returnflag")
        .agg(avg("l_extendedprice").as("ap"))
      assert(scannedPaths(undeclared).forall(_.contains(fact)))
    }
  }

  test("uncovered aggregates are left untouched") {
    withSummary { (fact, _) =>
      // MIN is not derivable from sum/count partials — fact scan stays
      val min_ = spark.read.parquet(fact)
        .groupBy("l_returnflag")
        .agg(min("l_quantity").as("mq"))
      assert(scannedPaths(min_).forall(_.contains(fact)))
      // measure-predicate filter changes group membership — fact scan
      val mfilter = spark.read.parquet(fact)
        .where(col("l_quantity") > 25)
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("sq"))
      assert(scannedPaths(mfilter).forall(_.contains(fact)))
      // grouping outside the summary dims — fact scan
      val odim = spark.read.parquet(fact)
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n"))
      assert(scannedPaths(odim).forall(_.contains(fact)))
      // COUNT(DISTINCT measure) is not additive over partials
      val cd = spark.read.parquet(fact)
        .groupBy("l_returnflag")
        .agg(countDistinct("l_quantity").as("nd"))
      assert(scannedPaths(cd).forall(_.contains(fact)))
      // grouping by an EXPRESSION over a dim (not a bare attribute):
      // the summary holds raw dim values, so this must keep the fact
      // scan even though the expression's inputs are all dims
      val gexpr = spark.read.parquet(fact)
        .groupBy(upper(col("l_returnflag")).as("rf"))
        .agg(sum("l_quantity").as("sq"))
      assert(scannedPaths(gexpr).forall(_.contains(fact)))
    }
  }

  test("incremental summary refresh: the declared query's only file " +
      "scan is the refreshed summary") {
    val df = SparkEntry.queries("q_summary_incr")(spark, sf)
    val paths = scannedPaths(df)
    assert(paths.forall(_.contains("summary_v2")), paths)
  }

  test("SQL-text queries route through the same rewrite") {
    withSummary { (fact, summary) =>
      spark.read.parquet(fact).createOrReplaceTempView("srw_fact")
      try {
        val df = spark.sql(
          """SELECT l_returnflag, round(sum(l_quantity), 2) AS sq,
            |  count(*) AS n
            |FROM srw_fact WHERE l_linenumber <= 2
            |GROUP BY l_returnflag""".stripMargin)
        assert(scannedPaths(df).forall(_.contains(summary)))
      } finally spark.catalog.dropTempView("srw_fact")
    }
  }

  test("law: randomized covered shapes all route to the summary and " +
      "equal the direct computation") {
    withSummary { (fact, summary) =>
      val rnd = new scala.util.Random(42)
      val dims = Seq("l_returnflag", "l_linestatus", "l_linenumber")
      (1 to 10).foreach { i =>
        val groupDims = rnd.shuffle(dims).take(1 + rnd.nextInt(2))
        val thresh = 1 + rnd.nextInt(6)
        val aggs = rnd.shuffle(Seq(
          sum("l_quantity").as("a1"),
          sum("l_extendedprice").as("a2"),
          count(lit(1)).as("a3"),
          avg("l_quantity").as("a4"))).take(1 + rnd.nextInt(3))
        def shape(path: String) = spark.read.parquet(path)
          .where(col("l_linenumber") <= thresh)
          .groupBy(groupDims.map(col): _*)
          .agg(aggs.head, aggs.tail: _*)
          .orderBy(groupDims.map(col): _*)
        val viaSummary = shape(fact)
        assert(scannedPaths(viaSummary).forall(_.contains(summary)),
          s"shape $i (dims=$groupDims, thresh=$thresh) kept a fact scan")
        val got = viaSummary.collect()
        val want = shape(s"$sf/lineitem.parquet").collect()
        assert(got.length == want.length, s"shape $i row counts")
        got.zip(want).foreach { case (g, e) =>
          (0 until g.length).foreach { c =>
            (g.get(c), e.get(c)) match {
              case (a: java.lang.Double, b: java.lang.Double) =>
                assert(math.abs(a - b) <= math.abs(b) * 1e-12 + 1e-12,
                  s"shape $i col $c: $a vs $b")
              case (a, b) => assert(a == b, s"shape $i col $c: $a vs $b")
            }
          }
        }
      }
    }
  }

  test("unregistered tables never match") {
    SummaryRewrite.install(spark)
    val df = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(scannedPaths(df).forall(_.contains("orders")))
  }
}
