package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the Spark-side schema of every testdata table (parquet
  * physical types differ: ms vs ns timestamps, list<float>).
  * `sbt "runMain graft.tools.SchemaProbe /root/testdata/sf0.001"`
  */
object SchemaProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // Tables.configure carries nanosAsLong, without which the events
    // table (TIMESTAMP(NANOS)) refuses to load at all
    val spark = graft.queries.Tables.configure(
      SparkSession.builder().master("local[4]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      val df = spark.read.parquet(s"$dir/$t.parquet")
      println(s"== $t: ${df.schema.simpleString}")
    }
    spark.read.parquet(s"$dir/events.parquet").show(3, false)
    spark.stop()
  }
}
