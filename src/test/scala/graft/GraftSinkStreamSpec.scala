package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.GraftSink

/** The sink's streaming tail: manifest versions as offsets, each
  * micro-batch = the files committed since the last consumed version.
  */
class GraftSinkStreamSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshName: String = { n += 1; s"sink_tail_$n" }

  test("tailing picks up each append exactly once") {
    val dir = tmpDir("sink_stream") + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").write.format("graftsink")
      .mode("append").save(dir)                       // v0
    val name = freshName
    val q = spark.readStream.format("graftsink")
      .option("startingVersion", 0).load(dir)
      .writeStream.format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).select("k").as[Long].collect().toSet
        === Set(1L, 2L))
      // two more commits while the stream runs
      Seq((3L, "c")).toDF("k", "s").write.format("graftsink")
        .mode("append").save(dir)                     // v1
      Seq((4L, "d")).toDF("k", "s").write.format("graftsink")
        .mode("append").save(dir)                     // v2
      q.processAllAvailable()
      val got = spark.table(name).select("k").as[Long].collect().toSeq
      assert(got.sorted === Seq(1L, 2L, 3L, 4L),
        s"each row exactly once, got $got")
    } finally q.stop()
  }

  test("restart from checkpoint resumes at the committed version") {
    val dir = tmpDir("sink_stream_ckpt") + "/t"
    val out = tmpDir("sink_stream_out")
    val ckpt = s"$out/ckpt"
    def runOnce(): Unit = {
      val q = spark.readStream.format("graftsink")
        .option("startingVersion", 0).load(dir)
        .writeStream.format("parquet")
        .option("path", s"$out/data")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    Seq((1L, "a")).toDF("k", "s").write.format("graftsink")
      .mode("append").save(dir)                       // v0
    runOnce()
    Seq((2L, "b")).toDF("k", "s").write.format("graftsink")
      .mode("append").save(dir)                       // v1
    runOnce()
    // a run with NOTHING new must add nothing (offset replay safety)
    runOnce()
    val got = spark.read.parquet(s"$out/data").select("k").as[Long]
      .collect().toSeq
    assert(got.sorted === Seq(1L, 2L),
      s"restart must consume only the new version, got $got")
  }

  test("an overwrite mid-stream surfaces its full new content " +
    "(snapshot semantics)") {
    val dir = tmpDir("sink_stream_ow") + "/t"
    Seq((1L, "a")).toDF("k", "s").write.format("graftsink")
      .mode("append").save(dir)                       // v0
    val name = freshName
    val q = spark.readStream.format("graftsink")
      .option("startingVersion", 0).load(dir)
      .writeStream.format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      Seq((9L, "z")).toDF("k", "s").write.format("graftsink")
        .mode("overwrite").save(dir)                  // v1: all-new files
      q.processAllAvailable()
      assert(spark.table(name).select("k").as[Long].collect().toSet
        === Set(1L, 9L))
    } finally q.stop()
  }

  test("streaming WRITE: a graftsink-to-graftsink pipe lands each " +
    "epoch as one manifest version") {
    val src = tmpDir("sink_w_src") + "/s"
    val dst = tmpDir("sink_w_dst") + "/d"
    val ckpt = tmpDir("sink_w_ckpt")
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").write.format("graftsink")
      .mode("append").save(src)
    def pipe(): Unit = {
      val q = spark.readStream.format("graftsink")
        .option("startingVersion", 0).load(src)
        .writeStream.format("graftsink")
        .option("path", dst)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    pipe()
    assert(spark.read.format("graftsink").load(dst)
      .select("k").as[Long].collect().toSet === Set(1L, 2L))
    Seq((3L, "c")).toDF("k", "s").write.format("graftsink")
      .mode("append").save(src)
    pipe()
    val out = spark.read.format("graftsink").load(dst)
      .select("k").as[Long].collect().toSeq
    assert(out.sorted === Seq(1L, 2L, 3L), s"exactly once, got $out")
    // each drained epoch published one version carrying its epoch id
    val m = GraftSink.latestManifest(spark, dst).get
    assert(m.epoch.isDefined)
  }

  test("epoch replay after checkpoint loss of the commit marker " +
    "publishes NOTHING (exactly-once, structurally)") {
    val src = tmpDir("sink_r_src") + "/s"
    val dst = tmpDir("sink_r_dst") + "/d"
    val ckpt = tmpDir("sink_r_ckpt")
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").write.format("graftsink")
      .mode("append").save(src)
    def pipe(): Unit = {
      val q = spark.readStream.format("graftsink")
        .option("startingVersion", 0).load(src)
        .writeStream.format("graftsink")
        .option("path", dst)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    pipe()
    assert(spark.read.format("graftsink").load(dst).count() === 2L)
    // simulate the canonical failure window: the sink committed but
    // the driver died before recording the batch — delete the commit
    // marker so recovery REPLAYS the epoch against the sink
    val commits = new java.io.File(s"$ckpt/commits")
    val latest = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toInt)
    assert(latest.delete())
    // the sidecar checksum too, or the local FS treats the re-write of
    // the marker as another writer's interference
    val crc = new java.io.File(commits, s".${latest.getName}.crc")
    if (crc.exists()) assert(crc.delete())
    pipe()
    val out = spark.read.format("graftsink").load(dst)
      .select("k").as[Long].collect().toSeq
    assert(out.sorted === Seq(1L, 2L),
      s"the replayed epoch must publish nothing, got $out")
  }

  test("complete-mode aggregation: each epoch truncates to the fresh " +
    "aggregate; history stays time-travelable") {
    val src = tmpDir("sink_c_src")
    val dst = tmpDir("sink_c_dst") + "/d"
    val ckpt = tmpDir("sink_c_ckpt")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$src/in"))
    Seq((1L, "x"), (2L, "y"), (3L, "x")).toDF("k", "tag")
      .coalesce(1).write.mode("append").parquet(s"$src/in")
    val schema = spark.read.parquet(s"$src/in").schema
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(s"$src/in")
        .groupBy("tag").agg(count(lit(1)).as("n"))
        .writeStream.format("graftsink")
        .option("path", dst)
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    assert(spark.read.format("graftsink").load(dst)
      .as[(String, Long)].collect().toMap === Map("x" -> 2L, "y" -> 1L))
    Seq((4L, "y"), (5L, "z")).toDF("k", "tag")
      .coalesce(1).write.mode("append").parquet(s"$src/in")
    run()
    assert(spark.read.format("graftsink").load(dst)
      .as[(String, Long)].collect().toMap ===
      Map("x" -> 2L, "y" -> 2L, "z" -> 1L),
      "the table must BE the refreshed aggregate, not an append log")
  }

  test("a late starting version skips the history before it") {
    val dir = tmpDir("sink_stream_late") + "/t"
    Seq((1L, "a")).toDF("k", "s").write.format("graftsink")
      .mode("append").save(dir)                       // v0
    Seq((2L, "b")).toDF("k", "s").write.format("graftsink")
      .mode("append").save(dir)                       // v1
    val name = freshName
    val q = spark.readStream.format("graftsink")
      .option("startingVersion", 1).load(dir)
      .writeStream.format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).select("k").as[Long].collect().toSet
        === Set(2L), "v0's file was consumed as part of neither batch")
    } finally q.stop()
  }

  test("maxFilesPerTrigger drains the initial snapshot as BOUNDED " +
    "batches — every row exactly once, no batch over the cap") {
    val dir = tmpDir("sink_stream_admit") + "/t"
    // one version whose snapshot holds 6 single-row files
    spark.range(0, 6).select(col("id").as("k"))
      .repartitionByRange(6, col("k"))
      .write.format("graftsink").mode("overwrite").save(dir)
    assert(GraftSink.latestManifest(spark, dir).get.files.size === 6)
    val name = freshName
    val q = spark.readStream.format("graftsink")
      .option("startingVersion", 0)
      .option("maxFilesPerTrigger", 2).load(dir)
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table(name).select("k").as[Long].collect().sorted
      === (0L until 6L).toSeq, "backfill must deliver exactly once")
    val sq = q.asInstanceOf[org.apache.spark.sql.streaming
      .StreamingQuery]
    val batchRows = sq.recentProgress.map(_.numInputRows)
      .filter(_ > 0)
    assert(batchRows.length >= 3,
      s"6 files / cap 2 needs >= 3 batches, got ${batchRows.toSeq}")
    assert(batchRows.forall(_ <= 2),
      s"no batch may exceed the 2-file cap: ${batchRows.toSeq}")
  }

  test("maxBytesPerTrigger budgets batches by manifest-recorded " +
    "file bytes") {
    val dir = tmpDir("sink_stream_bytes") + "/t"
    spark.range(0, 4).select(col("id").as("k"))
      .repartitionByRange(4, col("k"))
      .write.format("graftsink").mode("overwrite").save(dir)
    val m = GraftSink.latestManifest(spark, dir).get
    assert(m.files.size === 4 && m.files.forall(_.bytes > 0))
    val name = freshName
    // budget of ONE file's bytes: each batch admits exactly one file
    // (at-least-one-per-trigger keeps progress)
    val q = spark.readStream.format("graftsink")
      .option("startingVersion", 0)
      .option("maxBytesPerTrigger", m.files.map(_.bytes).min)
      .load(dir)
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table(name).select("k").as[Long].collect().sorted
      === (0L until 4L).toSeq)
    val batches = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(batches.length === 4,
      s"a one-file byte budget must make 4 batches: ${batches.toSeq}")
  }

  test("admission control across restarts and appends: partial " +
    "snapshot offsets resume; legacy un-limited checkpoints upgrade") {
    val dir = tmpDir("sink_stream_admit2") + "/t"
    val out = tmpDir("sink_stream_admit2_out")
    val ckpt = s"$out/ckpt"
    def runOnce(maxFiles: Option[Int]): Unit = {
      val r = spark.readStream.format("graftsink")
        .option("startingVersion", 0)
      val q = maxFiles.fold(r)(m => r.option("maxFilesPerTrigger", m))
        .load(dir)
        .writeStream.format("parquet")
        .option("path", s"$out/data")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    spark.range(0, 5).select(col("id").as("k"))
      .repartitionByRange(5, col("k"))
      .write.format("graftsink").mode("overwrite").save(dir)  // v0
    // legacy first: no rate limit — plain `v` offsets in the log
    runOnce(None)
    // appends, then a LIMITED resume over the same checkpoint: the
    // old offsets parse and only the new files drain, capped
    Seq(100L, 101L, 102L).toDF("k").coalesce(1)
      .write.format("graftsink").mode("append").save(dir)     // v1
    Seq(103L).toDF("k").coalesce(1)
      .write.format("graftsink").mode("append").save(dir)     // v2
    runOnce(Some(1))
    // idempotent tail: nothing new, nothing added
    runOnce(Some(1))
    val got = spark.read.parquet(s"$out/data").select("k").as[Long]
      .collect().sorted
    assert(got.toSeq === Seq(0L, 1L, 2L, 3L, 4L, 100L, 101L, 102L,
      103L), s"exactly once across limited restarts, got $got")
  }
}
