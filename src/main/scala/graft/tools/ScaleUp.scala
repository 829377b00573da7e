package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds a TIMING-ONLY scaled replica of an sf directory: `factor`
  * key-shifted copies of every fact/dim table, referential integrity
  * preserved (copy i's orders reference copy i's customers, etc.), so
  * join/agg cardinalities scale like a real sf increase.
  *
  * This is a measurement artifact for the SCALE.md probe — never a
  * correctness input (the DuckDB oracle gate runs exclusively on the
  * driver-generated sf directories). Value distributions are copied
  * verbatim; only key spaces stretch.
  *
  * `sbt "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf1 10"`
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, f) = args.take(3)
    val factor = f.toInt
    val spark = graft.queries.Tables.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

    /** stride = max+1 of a key's DEFINING table, so a fact's FK shifts
      * by the same per-copy stride as the dim it references — copy i's
      * orders hit exactly copy i's customers.
      */
    def stride(t: String, c: String): Long =
      read(t).agg(max(col(c))).head.getLong(0) + 1L

    /** `factor` copies, each listed column shifted into its own
      * disjoint per-copy range.
      */
    def replicate(t: String, shifts: (String, Long)*): Unit = {
      val copies = read(t).withColumn("cp",
          explode(sequence(lit(0), lit(factor - 1))))
      val shifted = shifts.foldLeft(copies) { case (df, (c, s)) =>
        df.withColumn(c, col(c) + col("cp") * s)
      }.drop("cp")
      shifted.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"  $t -> ${factor}x")
    }

    // fixed-size dims stay as-is (TPC-H keeps region/nation constant)
    for (t <- Seq("region", "nation"))
      read(t).write.mode("overwrite").parquet(s"$dst/$t.parquet")

    val (custS, suppS, partS) = (stride("customer", "c_custkey"),
      stride("supplier", "s_suppkey"), stride("part", "p_partkey"))
    val orderS = stride("orders", "o_orderkey")
    replicate("customer", "c_custkey" -> custS)
    replicate("supplier", "s_suppkey" -> suppS)
    replicate("part", "p_partkey" -> partS)
    replicate("orders", "o_orderkey" -> orderS, "o_custkey" -> custS)
    replicate("lineitem", "l_orderkey" -> orderS,
      "l_partkey" -> partS, "l_suppkey" -> suppS)
    replicate("events", "event_id" -> stride("events", "event_id"),
      "user_id" -> stride("events", "user_id"))
    replicate("documents", "doc_id" -> stride("documents", "doc_id"))
    replicate("embeddings", "vec_id" -> stride("embeddings", "vec_id"))
    println(s"== $dst ready (${factor}x $src)")
    spark.stop()
  }
}
