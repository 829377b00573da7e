package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev loop for a SUBSET of declared queries: dumps each named query's
  * result plus the matching slice of oracle_sql.json, in the exact
  * layout `tools/oracle_check.py` consumes — so a single query's oracle
  * can be iterated in seconds instead of re-running the full Verify.
  * `sbt "runMain graft.tools.QueryDump <sfDir> <outDir> <name> [name…]"`
  */
object QueryDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = args(1)
    val names = args.drop(2).toSeq
    require(names.nonEmpty, "usage: QueryDump <sfDir> <outDir> <name>...")
    val spark = graft.queries.Tables.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(out).mkdirs()
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, dir)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$n")
      println(s"[dump] $n written")
    }
    import graft.Json.{quote => q}
    val json = graft.SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$out/oracle_sql.json"), json)
    spark.stop()
  }
}
