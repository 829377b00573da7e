package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: incremental OPTIMIZE cost vs table size — pins SCALE.md's
  * round-14 claim that `cluster(incremental = true)` tracks the TAIL
  * (new data + the few overlapping boundary files), not the table: a
  * 10× larger clustered table with the same-sized key-local tail pays
  * roughly the same re-cluster wall, while the FULL rewrite pays 10×.
  * Run: `sbt "runMain graft.tools.ClusterIncrProbe"`.
  */
object ClusterIncrProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.queries.Tables.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sink = graft.sources.GraftSink
    def t[A](b: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = b
      (a, (System.nanoTime() - t0) / 1e9)
    }
    println("table rows | files | incr cluster (fixed 50k tail) | " +
      "rows rewritten | full cluster")
    for (rows <- Seq(500000L, 5000000L)) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"clusterincr_$rows").toString + "/t"
      spark.range(rows)
        .select(col("id").as("k"),
          sha2(col("id").cast("string"), 256).as("pad"))
        .repartition(8)
        .write.format("graftsink").mode("append").save(dir)
      val bytes = sink.latestManifest(spark, dir).get
        .files.map(_.bytes).sum
      val target = math.max(1L, bytes / 32) // ~32-file sorted run
      sink.cluster(spark, dir, Seq("k"), targetBytes = target)
      // the time-ordered-ingest shape: a KEY-LOCAL 50k tail at the top
      spark.range(rows, rows + 50000L)
        .select(col("id").as("k"),
          sha2(col("id").cast("string"), 256).as("pad"))
        .repartition(2)
        .write.format("graftsink").mode("append").save(dir)
      val (st, wIncr) = t(sink.cluster(spark, dir, Seq("k"),
        targetBytes = target, incremental = true))
      val files = sink.latestManifest(spark, dir).get.files.size
      val (stFull, wFull) = t(sink.cluster(spark, dir, Seq("k"),
        targetBytes = target))
      println(f"$rows%10d | $files%5d | $wIncr%10.2f s | " +
        f"${st.rows}%12d | $wFull%7.2f s (${stFull.rows} rows)")
    }
    spark.stop()
  }
}
