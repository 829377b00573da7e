package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the graph family's decade (sf0.1 → sf1): `g_pagerank` and
  * `g_lpa_communities` are the costliest batch rows whose Pregel-shaped
  * driver loops are CLAIMED one-exchange-per-round, but round 8 left
  * them with no sf1 row in SCALE.md. This pins the claim with numbers:
  * per-round cost (total / fixed round count — both loops are
  * round-count-bounded, never data-bounded) must grow like the EDGE
  * COUNT, not like rounds × table: the per-round work is one
  * edge⋈rank broadcast join + one node-sized aggregate, so its decade
  * ratio tracks |edges|'s, and the exponent vs edges stays ≈ 1.
  *
  * Uses the same `/tmp/sf1` timing-only key-shifted replica as the
  * round-5 read decade (built here via [[ScaleUp]] when absent) —
  * never a correctness input. Median-of-3, local[32], same binary at
  * both scales. Output: markdown rows for SCALE.md.
  *
  * `sbt "runMain graft.tools.GraphDecade"`
  */
object GraphDecade {
  def main(args: Array[String]): Unit = {
    val sf01 = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val sf1 = args.drop(1).headOption.getOrElse("/tmp/sf1")
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$sf1/lineitem.parquet")))
      ScaleUp.main(Array(sf01, sf1, "10"))
    val spark = graft.queries.Tables.configure(SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors() min 32}]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def edges(dir: String, repeatOnly: Boolean): Long = {
      val base = spark.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_suppkey").as("a"),
          (col("l_partkey") + 1000000L).as("b"))
        .agg(count(lit(1)).as("m"))
      (if (repeatOnly) base.filter(col("m") >= 2) else base).count()
    }
    def median3(name: String, dir: String): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(1)
    }
    // warm both paths once (codegen spin-up is not data throughput)
    Seq("g_pagerank", "g_lpa_communities")
      .foreach(n => graft.SparkEntry.queries(n)(spark, sf01).count())
    val rows = for (q <- Seq("g_pagerank", "g_lpa_communities")) yield {
      val rounds = if (q == "g_pagerank") 10 else graft.queries.Analytics.lpaRounds
      val (t01, t1) = (median3(q, sf01), median3(q, sf1))
      val repeatOnly = q != "g_pagerank"
      val (e01, e1) = (edges(sf01, repeatOnly), edges(sf1, repeatOnly))
      val perRound01 = t01 / rounds
      val perRound1 = t1 / rounds
      val timeRatio = t1 / t01
      val edgeRatio = e1.toDouble / e01
      val expVsEdges = math.log(timeRatio) / math.log(edgeRatio)
      f"| $q | $rounds | $e01 | $e1 | ${edgeRatio}%.2f | $perRound01%.3f | $perRound1%.3f | $timeRatio%.2f | $expVsEdges%.2f |"
    }
    println("| query | rounds | edges sf0.1 | edges sf1 | edge ratio | s/round sf0.1 | s/round sf1 | time ratio | exp vs edges |")
    println("|---|---|---|---|---|---|---|---|---|")
    rows.foreach(println)
    spark.stop()
  }
}
