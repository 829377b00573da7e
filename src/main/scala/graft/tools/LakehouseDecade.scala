package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Ops
import graft.sources.GraftSink

/** SCALE.md measurement harness for the LAKEHOUSE WRITE/MAINTENANCE
  * paths — the rows the read-query decade doesn't cover: partitioned
  * merge-upsert, SQL MERGE INTO on a graftsink table, small-file
  * compaction, the change-feed log walk, and the metadata watermark
  * probe. Run at two scale factors and compare:
  *
  *   sbt "runMain graft.tools.LakehouseDecade /root/testdata/sf0.1"
  *   sbt "runMain graft.tools.LakehouseDecade /tmp/sf1"
  *
  * Each operation is timed median-of-3 with seeding kept OUTSIDE the
  * timed region. The deltas are FIXED-SIZE by design: the claims under
  * test are O(touched partitions) / O(touched files) / O(delta), so a
  * constant increment against a 10× table should give ~flat times for
  * the graftsink paths — the table layouts hold bytes-per-file
  * roughly constant (file COUNT grows with data, like a real
  * warehouse), which is exactly what makes "touched files" a
  * scale-free unit. merge_part is the exception to flatness: its
  * hive layout partitions by calendar month and the timing replica
  * stretches keys, not dates, so touched months grow ~10× — its
  * measured ratio reads as O(touched-partition BYTES), not O(table).
  */
object LakehouseDecade {
  private def time[A](reps: Int)(body: => A): Double = {
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    times.sorted.apply(times.size / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.queries.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val nRows = orders.count()
    // bounded file size, growing file count — the warehouse layout
    val nFiles = math.max(16, (nRows / 15000L).toInt)
    val work = java.nio.file.Files
      .createTempDirectory("graft_lh_decade").toString
    val out = Seq.newBuilder[(String, Double)]

    // ---- merge_part: Ops.mergeUpsertPartitioned, hive months ----
    {
      val base = orders
        .withColumn("om", date_format(col("o_orderdate"), "yyyy-MM"))
        .filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), col("o_totalprice"), col("om"))
        .withColumn("etl_updated_ts", lit(1L))
      val p = s"$work/pmerge/orders"
      Ops.mergeUpsertPartitioned(spark, p, base, Seq("o_orderkey"), "om")
      val delta = orders
        .withColumn("om", date_format(col("o_orderdate"), "yyyy-MM"))
        .filter(col("o_orderkey") % 2 === 0 && col("om") >= "1997-09")
        .select(col("o_orderkey"),
          (col("o_totalprice") * 2).as("o_totalprice"), col("om"))
        .withColumn("etl_updated_ts", lit(2L))
        .cache()
      delta.count() // materialize: time the merge, not the delta scan
      out += "merge_part" -> time(3) {
        Ops.mergeUpsertPartitioned(spark, p, delta,
          Seq("o_orderkey"), "om")
      }
      delta.unpersist()
    }

    // ---- graftsink base table, key-banded files ----
    val sink = s"$work/sink/orders"
    orders.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .repartitionByRange(nFiles, col("o_orderkey"))
      .write.format("graftsink").mode("overwrite").save(sink)
    val baseVersion = GraftSink.latestVersion(spark, sink).get

    // ---- merge_into: SQL MERGE, fixed 1 500-key delta band ----
    {
      spark.conf.set("spark.sql.catalog.lhd",
        "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.lhd.root", s"$work/cat")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS lhd.m")
      spark.sql("CREATE TABLE lhd.m.orders " +
        "(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)")
      orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .repartitionByRange(nFiles, col("o_orderkey"))
        .writeTo("lhd.m.orders").append()
      // fixed-size source: 1000 updates in one key band + 500 inserts
      val maxKey = nRows * 4 // orderkeys are sparse; safely above max
      spark.range(1000, 2000)
        .select(col("id").as("o_orderkey"), lit("U").as("o_orderstatus"),
          lit(1.0).as("o_totalprice"))
        .union(spark.range(maxKey, maxKey + 500)
          .select(col("id").as("o_orderkey"),
            lit("N").as("o_orderstatus"), lit(2.0).as("o_totalprice")))
        .createOrReplaceTempView("lhd_delta")
      out += "merge_into" -> time(3) {
        spark.sql("""MERGE INTO lhd.m.orders t USING lhd_delta s
          ON t.o_orderkey = s.o_orderkey
          WHEN MATCHED THEN UPDATE SET
            t.o_totalprice = s.o_totalprice,
            t.o_orderstatus = s.o_orderstatus
          WHEN NOT MATCHED THEN INSERT *""")
      }
    }

    // ---- changefeed: fixed 3×2000-row deltas over the big base ----
    {
      val delta = orders.limit(2000)
        .select(col("o_orderkey"), col("o_orderstatus"),
          (col("o_totalprice") + 1).as("o_totalprice"))
        .coalesce(1).cache()
      delta.count()
      (1 to 3).foreach(_ => delta.write.format("graftsink")
        .mode("append").save(sink))
      out += "changefeed" -> time(3) {
        spark.read.format("graftsink")
          .option("changesFrom", baseVersion).load(sink)
          .agg(count(lit(1)), sum("o_totalprice")).collect()
      }
      delta.unpersist()
    }

    // ---- meta_watermark: ungrouped MAX from the manifest ----
    out += "meta_watermark" -> time(3) {
      spark.read.format("graftsink").load(sink)
        .agg(max("o_orderkey")).collect()
    }

    // ---- grouped_wm: per-partition MAX GROUP BY on a status-
    // clustered copy — the incremental loop's per-partition watermark,
    // answered from manifest rows (zero file opens at either scale)
    {
      val gsink = s"$work/sink/by_status"
      orders.select(col("o_orderstatus"), col("o_orderkey"))
        .repartitionByRange(3, col("o_orderstatus"))
        .write.format("graftsink").mode("overwrite").save(gsink)
      out += "grouped_wm" -> time(3) {
        spark.read.format("graftsink").load(gsink)
          .groupBy("o_orderstatus").agg(max("o_orderkey")).collect()
      }
    }

    // ---- compact: 12 fixed-size small appends over the big base ----
    {
      val tiny = orders.limit(2000)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
        .coalesce(1).cache()
      tiny.count()
      def seedSmall(): Unit =
        (1 to 12).foreach(_ => tiny.write.format("graftsink")
          .mode("append").save(sink))
      // time(1) per seeded state; 3 seed+compact rounds, report median
      val times = (1 to 3).map { _ =>
        seedSmall()
        val t0 = System.nanoTime()
        // base files are ~1 MB (15k rows × ~70 B); tiny appends are
        // ~140 KB — the threshold separates them at every sf
        GraftSink.compact(spark, sink,
          targetBytes = 64L * 1024 * 1024, smallBytes = 512L * 1024)
        (System.nanoTime() - t0) / 1e9
      }
      out += "compact" -> times.sorted.apply(1)
      tiny.unpersist()
    }

    // ---- cluster_tail: INCREMENTAL clustering of a fixed append
    // tail against the 10× base. One untimed FULL pass first converts
    // every file (including compact-* output above) to a sorted
    // cluster-* run, so the timed onlyNew passes see exactly the tail.
    {
      GraftSink.cluster(spark, sink, Seq("o_orderkey"))
      val tail = orders.limit(2000)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
        .coalesce(1).cache()
      tail.count()
      val times = (1 to 3).map { _ =>
        (1 to 2).foreach(_ => tail.write.format("graftsink")
          .mode("append").save(sink))
        val t0 = System.nanoTime()
        GraftSink.cluster(spark, sink, Seq("o_orderkey"),
          onlyNew = true)
        (System.nanoTime() - t0) / 1e9
      }
      out += "cluster_tail" -> times.sorted.apply(1)
      tail.unpersist()
    }

    // ---- restore: publish an old version's file list as the new
    // head — O(manifest), nothing copied
    out += "restore" -> time(3) {
      GraftSink.restore(spark, sink, baseVersion)
    }

    // ---- tt_meta: pinned-version metadata COUNT — one manifest
    // read, zero data files opened at either scale
    out += "tt_meta" -> time(3) {
      spark.read.format("graftsink").option("version", baseVersion)
        .load(sink).count()
    }

    // ---- vacuum: expire the history the rounds above accumulated,
    // then re-vacuum the already-clean table — O(manifest count +
    // data-dir listing), no data reads; median of 3 ≈ the clean-table
    // floor, which is the steady-state nightly cost
    out += "vacuum" -> time(3) {
      GraftSink.vacuum(spark, sink, keepVersions = 3, graceMs = 0L)
    }

    // ---- clone_sync: incremental replication with a FIXED delta —
    // the O(changed files) claim: each rep appends one fixed 2000-row
    // file at the source and syncs; the copy is the delta file plus
    // one manifest publish, so the time should stay ~flat while the
    // table (and its file count) grows 10×. (A fresh cloneSnapshot
    // seeds the replica untimed — that one IS O(table).)
    {
      val replica = s"$work/sink/replica"
      GraftSink.cloneSnapshot(spark, sink, replica)
      val delta = orders.limit(2000)
        .select(col("o_orderkey"), col("o_orderstatus"),
          (col("o_totalprice") + 2).as("o_totalprice"))
        .coalesce(1).cache()
      delta.count()
      val times = (1 to 3).map { _ =>
        delta.write.format("graftsink").mode("append").save(sink)
        val t0 = System.nanoTime()
        val copied = GraftSink.cloneSync(spark, sink, replica)
        val dt = (System.nanoTime() - t0) / 1e9
        require(copied == 1, s"fixed delta must sync as one file, got $copied")
        dt
      }
      delta.unpersist()
      out += "clone_sync" -> times.sorted.apply(1)
    }

    val rows = out.result()
    println(rows.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString(s"""{"sf":"$sfDir","rows":$nRows,"files":$nFiles,""",
        ",", "}"))
    spark.stop()
  }
}
