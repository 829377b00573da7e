package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry: times one declared query three times (cold +
  * warm), so plan-level regressions can be chased without a full bench
  * run. `sbt "runMain graft.tools.Profile <queryName> <sfDir>"`
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val spark = graft.queries.Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"run $i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // the plan AQE actually executed, after the warm runs
    if (sys.env.contains("SPARK_GRAFT_PROFILE_PLAN")) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      println(df.queryExecution.executedPlan.toString())
    }
    spark.stop()
  }
}
