package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named declared queries to files —
  * the optimization-round evidence trail (`plans/r<N>/<q>_before.txt` /
  * `..._after.txt`). Runs at sf0.001 with 4 shuffle partitions, the
  * PlanAudit readability convention: partition COUNTS scale with the
  * session, plan SHAPE does not.
  *
  * `sbt "runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <name>..."`
  * writes `<outDir>/<name>_<suffix>.txt` per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <name>...")
    val sf = args(0)
    val out = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val spark = graft.queries.Tables.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(out).mkdirs()
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$out/${n}_$suffix.txt"), plan)
      println(s"[plandump] $n -> $out/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
