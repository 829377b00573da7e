package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

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
}
