package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the IVF recall/cost dial with the round-9 k-means++
  * quantizer: one fit, then probes at nProbe ∈ {2,4,6,8,12,16} of 16
  * cells against the exact brute-force top-5 — the table SCALE.md
  * cites so the "nProbe is the recall/cost dial" claim carries current
  * numbers (the pre-round-9 "8 cells measured 0.88" figure described
  * the retired MLlib random-init quantizer). Probed fraction is the
  * actual fraction of corpus rows scored, not nProbe/nCells (cells are
  * not perfectly balanced).
  *
  * `sbt "runMain graft.tools.AnnDial [sfDir]"`
  */
object AnnDial {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.queries.Tables.configure(SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors() min 32}]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val queries = emb.orderBy("id").limit(5)
    val exact = graft.operators.Similarity
      .bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val index = graft.operators.Similarity.ivfFit(emb, nCells = 16)
    val cellSizes = index.assigned.groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = cellSizes.values.sum.toDouble
    val nQ = queries.count().toDouble
    println("| nProbe (of 16) | recall@5 | corpus fraction scored |")
    println("|---|---|---|")
    for (nProbe <- Seq(2, 4, 6, 8, 12, 16)) {
      val got = graft.operators.Similarity
        .ivfProbe(index, queries, k = 5, nProbe = nProbe)
        .select("query_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = got.intersect(exact).size.toDouble / exact.size
      // ACTUAL scored fraction: rows entering the scoring join (each
      // query's probed cells' mass) over |corpus| x |queries| — counted
      // through the SAME probeCells ranking the probe path uses, so
      // this column can never desynchronize from what probes scan
      val probedMass = graft.operators.Similarity
        .probeCells(queries, index.centroids, nProbe)
        .select("cell").collect()
        .map(r => cellSizes.getOrElse(r.getInt(0), 0L)).sum.toDouble
      val frac = probedMass / (total * nQ)
      println(f"| $nProbe | $recall%.2f | ${frac * 100}%.1f%% |")
    }
    index.release()
    spark.stop()
  }
}
