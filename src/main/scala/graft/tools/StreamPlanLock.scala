package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.{StreamExecution, StreamingQueryWrapper}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** STREAMPLANS.lock — diff-gated fingerprints of the RUNTIME physical
  * plans of every declared `st_*` streaming query.
  *
  * `PLANS.lock` covers the 250 batch plans; the streaming queries were
  * excluded because their builders run the stream and return a plain
  * read of the sink — the DECLARED DataFrame's plan is just a scan.
  * But the stateful computation itself (state-store operator chains,
  * watermark placement and delay, output modes, stream-stream join
  * types) had no drift gate: a silent extra state-store exec or a
  * lost watermark would ship green (round-9 verdict ask #5). This
  * tool closes that: it RUNS each `st_*` builder at the fixture scale
  * with a [[StreamingQueryListener]] registered, captures every
  * [[StreamExecution]] the builder starts (onQueryStarted is
  * synchronous with `start()`, so the manager still holds the query),
  * and fingerprints each one's `lastExecution.executedPlan` — the
  * IncrementalExecution plan of the final micro-batch, where the
  * stateful operators actually appear — with [[PlanLock.shape]]'s
  * canonical normalization plus stateful discriminants (watermark
  * delayMs, save-exec output mode, FMGWS timeout, state-join type).
  *
  * A builder may start several streams (bootstrap+resume pairs, index
  * maintenance feeding a probe); all are captured IN START ORDER and
  * joined with ';' — start order is deterministic because the
  * builders await each stream inline.
  *
  * Gate: `tools/roundcheck.sh` regenerates and hard-fails on any diff
  * vs the committed STREAMPLANS.lock, exactly like PLANS.lock; an
  * intentional streaming-plan change commits the regenerated lock in
  * the same commit.
  *
  * `sbt "runMain graft.tools.StreamPlanLock [out] [sfDir]"`
  */
object StreamPlanLock {

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("STREAMPLANS.lock")
    val spark = graft.queries.Tables.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.drop(1).headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_PLANLOCK_SF", "/root/testdata/sf0.001"))

    val captured = new ConcurrentLinkedQueue[StreamExecution]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = {
        // synchronous with start(): the manager holds the live query
        spark.streams.get(e.id) match {
          case w: StreamingQueryWrapper => captured.add(w.streamingQuery); ()
          case s: StreamExecution => captured.add(s); ()
          case _ => ()
        }
      }
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith("st_"))
      .map { case (name, fn) =>
        captured.clear()
        val fp =
          try {
            fn(spark, sf).count()
            val plans = new scala.collection.mutable.ArrayBuffer[String]
            var se = captured.poll()
            while (se != null) {
              // a stream that never ran a batch has no lastExecution
              val exec = Option(se.lastExecution)
              plans += exec.map(e => PlanLock.fingerprint(e.executedPlan))
                .getOrElse("NO_BATCH")
              se = captured.poll()
            }
            if (plans.isEmpty) "NO_STREAM_STARTED"
            else plans.mkString(";")
          } catch { case e: Throwable =>
            System.err.println(s"[streamplanlock] $name failed: " +
              e.getMessage)
            "BUILD_FAILED"
          }
        s"$name\t$fp"
      }
    spark.streams.removeListener(listener)
    val header =
      "# STREAMPLANS.lock — runtime stateful-plan fingerprints " +
        "(graft.tools.StreamPlanLock)\n" +
      "# One line per st_* query; several ';'-joined fingerprints when " +
        "the builder\n" +
      "# starts several streams (start order). Regenerate with:\n" +
      "#   sbt \"runMain graft.tools.StreamPlanLock\"\n" +
      "# roundcheck fails on any diff vs this committed file.\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      header + rows.mkString("", "\n", "\n"))
    println(s"wrote $out (${rows.size} fingerprints)")
    spark.stop()
  }
}
