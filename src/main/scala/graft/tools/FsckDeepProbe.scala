package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** One-off: shallow vs deep fsck wall on a multi-version table —
  * pins SCALE.md's "deep is a bandwidth-bound full referenced-byte
  * read; run it at DR-drill cadence" claim with numbers.
  */
object FsckDeepProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.queries.Tables.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("fsckdeep").toString + "/t"
    for (i <- 0 until 3)
      spark.range(2L << 20)
        .select((col("id") + i * (2L << 20)).as("k"),
          sha2(col("id").cast("string"), 256).as("pad"))
        .repartition(16)
        .write.format("graftsink").mode("append").save(dir)
    val bytes = graft.sources.GraftSink.latestManifest(spark, dir)
      .get.files.map(_.bytes).sum
    def t[A](b: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = b
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (s1, w1) = t(graft.sources.GraftSink.fsck(spark, dir))
    val (d1, w2) = t(graft.sources.GraftSink.fsck(spark, dir, deep = true))
    println(f"table: ${s1.filesChecked} referenced files, " +
      f"${bytes / 1e6}%.0f MB head (history adds prior versions)")
    println(f"shallow fsck: $w1%.2f s (clean=${s1.clean})")
    println(f"deep fsck:    $w2%.2f s (deepVerified=${d1.deepVerified})")
    // the SCHEDULED-CADENCE form: one new version lands (1/16th of a
    // full append), the incremental pass re-hashes only it — the
    // full-drill wall above is the DR-drill cost, this is the cadence
    // cost, O(new data)
    spark.range(2L << 17)
      .select((col("id") + 1000L * (2L << 20)).as("k"),
        sha2(col("id").cast("string"), 256).as("pad"))
      .repartition(2)
      .write.format("graftsink").mode("append").save(dir)
    val (i1, w3) = t(graft.sources.GraftSink.fsck(spark, dir,
      deep = true, sinceVerified = true))
    val (i2, w4) = t(graft.sources.GraftSink.fsck(spark, dir,
      deep = true, sinceVerified = true))
    println(f"incremental deep (1 new version): $w3%.2f s " +
      f"(hashed=${i1.contentHashed}, skipped=${i1.skippedVerified}, " +
      f"deepVerified=${i1.deepVerified})")
    println(f"incremental deep (nothing new):   $w4%.2f s " +
      f"(hashed=${i2.contentHashed}, skipped=${i2.skippedVerified})")
    spark.stop()
  }
}
