package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: plan-time column-statistics cost across a file-count
  * decade — pins SCALE.md's round-14 claim that CBO stats are O(files)
  * ONCE per committed version (the first plan's fold) and O(1) for
  * every plan after it (the per-version memo), so a recurring CBO
  * workload over a 1e5–1e6-file table pays the decode+merge exactly
  * once instead of on every query. The end-to-end column times a real
  * CBO-enabled catalog plan against the memo-warm table.
  * Run: `sbt "runMain graft.tools.StatsDecade"`.
  */
object StatsDecade {
  def main(args: Array[String]): Unit = {
    val spark = graft.queries.Tables.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](b: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = b
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val root = java.nio.file.Files
      .createTempDirectory("statsdecade").toString
    spark.conf.set("spark.sql.catalog.graftsd",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftsd.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftsd.wh")
    println("files | cold fold (first plan) | memo hit ×1000 (per-plan)" +
      " | CBO join plan (warm)")
    for (files <- Seq(16, 64, 248, 992)) {
      val dir = s"$root/wh/t$files"
      spark.range(files * 500L)
        .select(col("id").as("k"), (col("id") % 97).as("d"),
          concat(lit("v"), col("id") % 1000).as("s"))
        .repartition(files)
        .write.format("graftsink").mode("overwrite").save(dir)
      val m = graft.sources.GraftSink.latestManifest(spark, dir).get
      require(m.files.size == files, s"seeded ${m.files.size}")
      // first plan of the version: the O(files × cols) decode+merge
      val (cold, wCold) = t(
        graft.sources.GraftSink.versionColumnStats(dir, m))
      require(cold._1.nonEmpty)
      // every later plan: the memo hit
      val (_, wWarm) = t((1 to 1000).foreach { _ =>
        graft.sources.GraftSink.versionColumnStats(dir, m)
      })
      // end-to-end: a CBO-enabled catalog join PLANS against the memo
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val (_, wPlan) = t(spark.sql(
        s"SELECT a.k FROM graftsd.wh.t$files a JOIN graftsd.wh.t$files" +
          " b ON a.d = b.d AND b.k < 100")
        .queryExecution.optimizedPlan)
      spark.conf.set("spark.sql.cbo.enabled", "false")
      println(f"$files%5d | $wCold%10.4f s | ${wWarm * 1000}%9.4f ms" +
        f" total (${wWarm}%.6f s / 1000 plans) | $wPlan%8.4f s")
    }
    spark.stop()
  }
}
