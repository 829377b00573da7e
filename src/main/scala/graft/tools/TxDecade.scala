package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: the Transaction layer's cost shape across a table-count
  * decade — pins SCALE.md's claims that (a) a steady-state `syncTo`
  * is O(changed tables) + O(members) tiny sidecar reads (the
  * divergence guard), never O(warehouse bytes), (b) `fsck` existence
  * is metadata-priced while `fsck(deep)` is bandwidth-priced, and
  * (c) the checksum sidecar adds only a per-file hash job to publish.
  * Run: `sbt "runMain graft.tools.TxDecade"`.
  */
object TxDecade {
  def main(args: Array[String]): Unit = {
    val spark = graft.queries.Tables.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val tx = graft.operators.Transaction
    def t[A](b: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = b
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def table(tag: Long, rows: Int) =
      (1 to rows).map(i => (i.toLong, tag)).toDF("k", "tag").coalesce(2)
    println("tables | publish-all | sync-all | publish-1 | sync-1 " +
      "(guard reads N-1 sidecars) | resync-0 | fsck | fsck(deep)")
    for (n <- Seq(4, 16, 64)) {
      val base = java.nio.file.Files
        .createTempDirectory(s"txdecade_$n").toString
      val (src, dst) = (s"$base/src", s"$base/rep")
      val all = (0 until n).map(i => s"t$i" -> table(0L, 2000)).toMap
      val (_, wPubAll) = t(tx.publish(spark, src, all))
      val (c0, wSyncAll) = t(tx.syncTo(spark, src, dst))
      require(c0 == n)
      val (_, wPub1) = t(tx.publish(spark, src,
        Map("t0" -> table(1L, 2000))))
      val (c1, wSync1) = t(tx.syncTo(spark, src, dst))
      require(c1 == 1, s"steady-state sync must copy ONLY the " +
        s"rewritten table, copied $c1")
      val (c2, wSync0) = t(tx.syncTo(spark, src, dst))
      require(c2 == 0)
      val (f1, wF) = t(tx.fsck(spark, src))
      val (f2, wFD) = t(tx.fsck(spark, src, deep = true))
      require(f1.clean && f2.deepVerified)
      // DEEP HISTORY + the scheduled cadence (round 14): 8 more
      // single-table rewrites stack committed txs, then the
      // incremental pass re-hashes ONLY the 8 new member dirs —
      // manifest parses are memoized per (path, len, mtime) and the
      // sidecar reads fan out cluster-wide, so the cadence cost
      // tracks the NEW data, not table count × history depth
      (2 to 9).foreach(j =>
        tx.publish(spark, src, Map("t1" -> table(j.toLong, 2000))))
      val (i1, wI1) = t(tx.fsck(spark, src, deep = true,
        sinceVerified = true))
      require(i1.deepVerified && i1.skippedVerified > 0 &&
        i1.contentHashed > 0, s"$i1")
      val (i2, wI2) = t(tx.fsck(spark, src, deep = true,
        sinceVerified = true))
      require(i2.deepVerified && i2.contentHashed == 0, s"$i2")
      println(f"$n%6d | $wPubAll%9.2f s | $wSyncAll%7.2f s | " +
        f"$wPub1%8.2f s | $wSync1%6.2f s | $wSync0%7.2f s | " +
        f"$wF%5.2f s | $wFD%6.2f s | incr(8 new) $wI1%5.2f s | " +
        f"incr(0) $wI2%5.2f s")
    }
    spark.stop()
  }
}
