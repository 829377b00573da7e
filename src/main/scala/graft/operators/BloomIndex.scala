package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BitmapDistinct

/** File-level Bloom-filter skipping index — the POINT-LOOKUP complement
  * of [[ZoneMap]]: a persisted per-file m-bit filter over a chosen key
  * column, consulted before any data file is opened. Zone maps prune
  * RANGES but require the layout clustered on the indexed column; a
  * Bloom filter prunes EQUALITY probes on any layout and any number of
  * secondary key columns — the "find this user_id / doc_id / order key
  * across a table laid out by date" case, where every file's [min, max]
  * on the probe column spans the whole domain and a zone map prunes
  * nothing.
  *
  * Mechanics: per key, `hashes` positions from the engine's own
  * `xxhash64` (seed-salted), folded per file into a byte bitmap by the
  * same [[graft.functions.BitmapDistinct]] aggregator the exact-distinct
  * family uses. A probe recomputes its positions THROUGH a 1-row Spark
  * plan (bit-identical to the build by construction — no re-implemented
  * hash to drift) and keeps files whose filter has ALL positions set:
  * no false negatives ever, false positives bounded by the classic
  * (1 − e^(−kn/m))^k, and the read path re-applies the exact predicate
  * so even those never surface (the [[ZoneMap.read]] discipline).
  *
  * Scale shape: the index is one row per file — 16 KiB per 1 GiB file
  * at the default 2^17 bits — and the probe's driver-side work is a
  * file-count-sized collect, which the planner needs to construct the
  * scan anyway (same justification as [[ZoneMap.pruneFiles]]).
  */
object BloomIndex {

  private def indexPath(dataPath: String): String = s"${dataPath}_bloom"

  /** The k seed-salted bit positions of a key expression. */
  private def positions(key: Column, bits: Int, hashes: Int): Seq[Column] =
    (1 to hashes).map(seed =>
      pmod(xxhash64(key, lit(seed)), lit(bits.toLong)))

  /** Write `df` into `numFiles` files (layout UNCONSTRAINED — hash
    * spread here, but any layout works) and persist the per-file Bloom
    * table beside it. One extra stats job whose shuffle output is
    * file-count-sized bitmap partials.
    */
  def build(df: DataFrame, dataPath: String, colName: String,
      numFiles: Int, bits: Int = 1 << 17, hashes: Int = 3): Unit = {
    df.repartition(numFiles).write.mode("overwrite").parquet(dataPath)
    val spark = df.sparkSession
    spark.read.parquet(dataPath)
      .select(input_file_name().as("file"),
        explode(array(positions(col(colName), bits, hashes): _*)).as("pos"))
      .groupBy("file")
      .agg(BitmapDistinct.build(col("pos")).as("bloom"))
      .coalesce(1)
      .write.mode("overwrite").parquet(indexPath(dataPath))
  }

  private def bitSet(buf: Array[Byte], pos: Long): Boolean = {
    val byteIdx = (pos >>> 3).toInt
    byteIdx < buf.length && (buf(byteIdx) & (1 << (pos & 7).toInt)) != 0
  }

  /** Files that MIGHT contain any of `keys` (no false negatives).
    * Probe positions are computed through a 1-row Spark plan so they
    * are bit-identical to the build's; the index collect is bounded by
    * file count. Returns (surviving files, total files).
    */
  def pruneFiles(spark: SparkSession, dataPath: String,
      keys: Seq[Any], bits: Int = 1 << 17,
      hashes: Int = 3): (Seq[String], Long) = {
    import scala.jdk.CollectionConverters._
    val probe = spark.createDataFrame(
      keys.map(k => org.apache.spark.sql.Row(k)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.catalyst.expressions.Literal(keys.head)
            .dataType))))
    val keyPositions: Seq[Seq[Long]] = probe
      .select(array(positions(col("k"), bits, hashes): _*).as("p"))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
    val index = spark.read.parquet(indexPath(dataPath))
      .select("file", "bloom").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1))
    val hit = index.collect {
      case (f, bloom) if keyPositions.exists(_.forall(bitSet(bloom, _))) => f
    }.toSeq
    (hit, index.length)
  }

  /** A DataFrame over only the files that can contain `keys` on the
    * indexed column, with the exact membership predicate re-applied —
    * Bloom false positives cannot surface.
    */
  def read(spark: SparkSession, dataPath: String, colName: String,
      keys: Seq[Any], bits: Int = 1 << 17, hashes: Int = 3): DataFrame = {
    val (files, _) = pruneFiles(spark, dataPath, keys, bits, hashes)
    if (files.isEmpty)
      spark.read.parquet(dataPath).filter(lit(false))
    else
      spark.read.parquet(files: _*)
        .filter(col(colName).isin(keys: _*))
  }
}
