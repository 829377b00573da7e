package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
object TmpIvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.queries.Tables.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val embs = spark.read.parquet(dir + "/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = embs.filter(col("id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(embs, q, 5))
    for (np <- Seq(4, 6, 8)) {
      val idx = Similarity.ivfFit(embs)
      val got = pairs(Similarity.ivfProbe(idx, q, 5, nProbe = np))
      println(s"PROBE nProbe=$np recall=${got.intersect(brute).size.toDouble / brute.size}")
    }
    spark.stop()
  }
}
