package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{MergeOnRead, Ops}

/** SCALE.md measurement harness for the two MERGE-ON-READ seams the
  * lakehouse decade doesn't cover:
  *
  * 1. TOMBSTONE-GROWTH read path. [[MergeOnRead.readCurrent]]
  *    subtracts tombstones with one LEFT ANTI join that Catalyst
  *    broadcasts "while the tombstone set is small" — but nothing
  *    pinned the cost when an uncompacted right-to-be-forgotten
  *    backlog outgrows `autoBroadcastJoinThreshold` (10 MB default),
  *    the exact regime a 100 TB deployment hits between compactions.
  *    Measured here: the SAME tombstoned fraction (10%, applied as 20
  *    accumulating batches — a backlog, not one delete) of a
  *    string-keyed corpus (sha-256 uids, the realistic forget-key
  *    shape) at 1x and 10x. At 1x the tombstone relation sits under
  *    the threshold and the anti join broadcasts; at 10x it crosses
  *    and flips to a shuffle join. The rows record both plans, read
  *    times, compaction cost, and the cadence rule derived from them.
  *
  * 2. COMPACTION AMORTIZATION. The [[MergeOnRead]] scaladoc promises
  *    "a periodic compact folds tombstones into a single rewrite,
  *    amortizing N deletes into one table pass"; the bench only times
  *    the single-delete query. Timed here at sf0.1: N=100
  *    explicit-key tombstone batches + ONE compact, vs N=100
  *    copy-on-write keyed deletes ([[Ops.deleteMatching]]) over the
  *    same base, same key batches (pre-materialized OUTSIDE both
  *    timed regions so each side reads identical tiny key tables).
  *
  * `sbt "runMain graft.tools.MorDecade [sfDir] [sf10Dir]"`
  */
object MorDecade {

  private def time[A](reps: Int)(body: => A): Double = {
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    times.sorted.apply(times.size / 2)
  }

  private def joinStrategies(df: DataFrame): Seq[String] = {
    df.count() // AQE finalizes the plan at runtime
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      (p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => walk(a.executedPlan)
        case b: org.apache.spark.sql.execution.joins
            .BroadcastHashJoinExec =>
          Seq(s"BroadcastHashJoin[${b.joinType}]")
        case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          Seq(s"SortMergeJoin[${s.joinType}]")
        case h: org.apache.spark.sql.execution.joins
            .ShuffledHashJoinExec =>
          Seq(s"ShuffledHashJoin[${h.joinType}]")
        case _ => Seq.empty
      }) ++ p.children.flatMap(walk) ++
        (p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case _ => Seq.empty
        })
    walk(df.queryExecution.executedPlan).distinct
  }

  private def dirBytes(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else fs.getContentSummary(p).getLength
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val sf10 = args.drop(1).headOption.getOrElse("/tmp/sf1")
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$sf10/lineitem.parquet")))
      ScaleUp.main(Array(sfDir, sf10, "10"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.queries.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files
      .createTempDirectory("graft_mor_decade").toString

    // ---- 1. tombstone growth: 10% backlog at 1x and 10x ------------
    println("## MOR tombstone growth (readCurrent anti-join regime)")
    println("| scale | base rows | tombstone keys | tombstone bytes | " +
      "anti-join strategy | read s | compact s | post-compact read s |")
    println("|---|---|---|---|---|---|---|---|")
    for ((label, dir) <- Seq("1x" -> sfDir, "10x" -> sf10)) {
      val root = s"$work/growth_$label"
      val base = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(sha2(concat_ws("#", col("l_orderkey"),
          col("l_linenumber")), 256).as("uid"),
          col("l_quantity"), col("l_extendedprice"), col("l_shipdate"))
      MergeOnRead.init(base, root)
      val nBase = spark.read.parquet(s"$root/data").count()
      // 20 accumulating batches of 0.5% each — a backlog between
      // compactions, not one bulk delete
      val keyed = spark.read.parquet(s"$root/data").select("uid")
      for (b <- 0 until 20)
        MergeOnRead.deleteKeys(spark, root,
          keyed.filter(pmod(hash(col("uid")), lit(200)) === b))
      val tombBytes = dirBytes(spark, s"$root/deletes")
      val tombKeys = spark.read.parquet(s"$root/deletes/d*").count()
      def view = MergeOnRead.readCurrent(spark, root, "uid")
      val strategies = joinStrategies(view)
      val readS = time(3)(view.count())
      val t0 = System.nanoTime()
      MergeOnRead.compact(spark, root, "uid")
      val compactS = (System.nanoTime() - t0) / 1e9
      val postS = time(3)(view.count())
      println(f"| $label | $nBase | $tombKeys | ${tombBytes / 1e6}%.1f MB " +
        f"| ${strategies.mkString(";")} | $readS%.2f | $compactS%.2f " +
        f"| $postS%.2f |")
    }

    // ---- 2. amortization: 100 batches + 1 compact vs 100 COW -------
    println()
    println("## MOR compaction amortization (N=100 delete batches, sf0.1 orders)")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    // pre-materialize the 100 key batches once, outside both timed
    // regions: both sides read identical tiny key tables
    val keySeed = s"$work/key_batches"
    o.select(col("o_orderkey"),
        pmod(col("o_orderkey"), lit(1000)).as("b"))
      .filter(col("b") < 100)
      .write.partitionBy("b").parquet(keySeed)
    def batch(i: Int): DataFrame =
      spark.read.parquet(s"$keySeed/b=$i").select("o_orderkey")

    val morRoot = s"$work/amort_mor"
    MergeOnRead.init(o, morRoot)
    var t0 = System.nanoTime()
    for (i <- 0 until 100)
      MergeOnRead.deleteKeys(spark, morRoot, batch(i))
    val morDeletesS = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    MergeOnRead.compact(spark, morRoot, "o_orderkey")
    val morCompactS = (System.nanoTime() - t0) / 1e9
    val morRows = spark.read.parquet(s"$morRoot/data").count()

    val cowPath = s"$work/amort_cow/orders"
    o.write.parquet(cowPath)
    t0 = System.nanoTime()
    for (i <- 0 until 100)
      Ops.deleteMatching(spark, cowPath, batch(i), "o_orderkey")
    val cowS = (System.nanoTime() - t0) / 1e9
    val cowRows = spark.read.parquet(cowPath).count()

    require(morRows == cowRows,
      s"amortization twins diverged: mor=$morRows cow=$cowRows")
    println("| path | 100 deletes s | compact s | total s | rows after |")
    println("|---|---|---|---|---|")
    println(f"| merge-on-read (100 tombstone appends + 1 compact) " +
      f"| $morDeletesS%.1f | $morCompactS%.1f " +
      f"| ${morDeletesS + morCompactS}%.1f | $morRows |")
    println(f"| copy-on-write (100 Ops.deleteMatching rewrites) " +
      f"| $cowS%.1f | — | $cowS%.1f | $cowRows |")
    println(f"| ratio (COW / MOR) | | | " +
      f"${cowS / (morDeletesS + morCompactS)}%.1f x | |")
    spark.stop()
  }
}
