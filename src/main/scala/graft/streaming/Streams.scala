package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.queries.Tables

/** Structured Streaming surface over the `events` table (SURVEY §2.10:
  * the reference is poll-based batch with a persisted high-water-mark —
  * exactly `Trigger.AvailableNow` + checkpointed offsets, so the same
  * transforms here ARE the incremental path run continuously).
  *
  * Every transform takes an unbounded DataFrame and stays source-
  * agnostic: tests feed `MemoryStream`, the driver-facing queries feed
  * the parquet file source, production would swap in Kafka — the plan
  * is identical. State lives in the checkpointed state store, sized by
  * the watermark: at 100 TB/day the state held is (watermark horizon ×
  * key cardinality), not history.
  */
object Streams {

  /** `events.ts` arrives as whatever physical type the generator wrote
    * (nanos LongType or TIMESTAMP_NTZ micros — see
    * [[Tables.eventTime]]); every streaming consumer first normalizes
    * to a µs TimestampType so watermarks/windows get real event time.
    */
  def withEventTime(df: DataFrame): DataFrame = Tables.eventTime(df)

  /** File-source stream over a testdata dir. Schema comes from a batch
    * probe of the same file (file streams require a declared schema —
    * at scale this is the contract schema, not an inference pass).
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = Tables(spark, dir, "events").schema
    // The file stream source needs a directory basePath; the testdata
    // dir holds one parquet file per table, so glob-filter to ours.
    withEventTime(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
  }

  /** Tumbling 1-hour counts per event type, 1-hour watermark: the
    * streaming twin of the batch `ev_tumbling_hourly`. Append mode
    * emits each window once the watermark passes its end — partial
    * aggregation still happens map-side before the shuffle, and state
    * is one row per open (window, type).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))

  /** Native session windows (30-min gap) per user, for append-mode
    * emission once the watermark closes a session.
    */
  def sessionWindows(events: DataFrame): DataFrame =
    events.withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))

  /** Exactly-once by key: watermarked streaming dedup.
    * `dropDuplicatesWithinWatermark` is the form whose state actually
    * evicts: entries expire once the watermark passes their event time
    * plus the delay, so state is (watermark horizon × key arrival
    * rate). Plain `dropDuplicates("event_id")` would keep every id
    * forever — the watermark only bounds state when the event-time
    * column is part of the dedup key, which an id-only dedup can't do.
    */
  def dedupe(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  // ---- custom state: typed sessionization via flatMapGroupsWithState

  case class SessionEvent(user_id: Long, ts_us: Long, value: Double)
  /** [[SessionEvent]] + the watermark column (must stay in the plan
    * feeding flatMapGroupsWithState for event-time timeout).
    */
  private[streaming] case class TimedEvent(user_id: Long, ts_us: Long,
      value: Double, ts: java.sql.Timestamp)
  case class SessionState(start_us: Long, end_us: Long, n: Long, value: Double)
  case class Session(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long, total_value: Double)

  val GapUs: Long = 30L * 60 * 1000 * 1000

  /** Custom-state sessionization (30-min gap), the
    * `flatMapGroupsWithState` form: closed sessions are emitted when a
    * later event proves the gap, or when the event-time timeout fires
    * (watermark passed last-event + gap). Must agree with the batch
    * lag/running-sum form in [[graft.queries.Events]] — the spec
    * asserts that parity.
    *
    * `watermarkDelay` is the late-arrival tolerance. At the default
    * (= the gap) an event late enough to precede the open session by a
    * full gap is already behind the watermark, so the in-batch LATE
    * path below is boundary-only; a tolerance beyond the gap (e.g.
    * "90 minutes") admits genuinely late events, which that path then
    * sessionizes to match the batch twin within each micro-batch.
    */
  def sessionize(events: Dataset[SessionEvent],
      watermarkDelay: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermarkDelay)
      .as[TimedEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[TimedEvent],
            state: GroupState[SessionState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.start_us, s.end_us, s.n, s.value))
          } else {
            // Batch order is arbitrary: sort this batch's events by ts.
            // Across batches an event may still arrive out of order
            // (older than the open session) as long as it beats the
            // watermark: if it is within a gap of the open session it
            // merges (extending start downward); if it is more than a
            // gap EARLIER it cannot belong to the open or any future
            // session, so it goes to a per-batch LATE accumulator where
            // such events merge among themselves under the same gap
            // rule (two late events within a gap of each other form ONE
            // late session, matching the batch twin), and at end of
            // batch either merges into the open session (if later
            // events extended its start down within a gap) or closes.
            // Sessions already emitted are never revised (same
            // as Spark's native session_window); late events arriving
            // in DIFFERENT batches still close separately — the
            // documented bound of the no-revision policy.
            val sorted = rows.toSeq.sortBy(_.ts_us)
            var cur = state.getOption
            var late: Option[SessionState] = None
            val closed = Seq.newBuilder[Session]
            // Merge the late accumulator into a session whose start has
            // been pulled (by intermediate events) to within a gap of
            // late.end — the batch twin yields ONE session there. Runs
            // wherever the open session leaves play: both when a later
            // event closes it mid-batch and at end-of-batch flush.
            def absorbLate(s: SessionState): SessionState = late match {
              case Some(l) if s.start_us - l.end_us < GapUs =>
                late = None
                SessionState(math.min(l.start_us, s.start_us),
                  math.max(l.end_us, s.end_us), s.n + l.n, s.value + l.value)
              case _ => s
            }
            sorted.foreach { e =>
              val (ts, v) = (e.ts_us, e.value)
              cur match {
                case Some(s0) if ts - s0.end_us >= GapUs =>
                  val s = absorbLate(s0)
                  closed += Session(user, s.start_us, s.end_us, s.n, s.value)
                  cur = Some(SessionState(ts, ts, 1L, v))
                case Some(s) if s.start_us - ts >= GapUs =>
                  // ascending sort ⇒ ts >= late.end_us, so only the
                  // forward gap needs checking
                  late match {
                    case Some(l) if ts - l.end_us < GapUs =>
                      late = Some(SessionState(l.start_us, ts, l.n + 1,
                        l.value + v))
                    case Some(l) =>
                      closed += Session(user, l.start_us, l.end_us, l.n,
                        l.value)
                      late = Some(SessionState(ts, ts, 1L, v))
                    case None =>
                      late = Some(SessionState(ts, ts, 1L, v))
                  }
                case Some(s) =>
                  cur = Some(SessionState(math.min(s.start_us, ts),
                    math.max(s.end_us, ts), s.n + 1, s.value + v))
                case None =>
                  cur = Some(SessionState(ts, ts, 1L, v))
              }
            }
            cur = cur.map(absorbLate)
            late.foreach(l =>
              closed += Session(user, l.start_us, l.end_us, l.n, l.value))
            cur.foreach { s =>
              state.update(s)
              // Timeout once the watermark proves the gap; must be set
              // strictly beyond the current watermark or Spark rejects it.
              state.setTimeoutTimestamp(math.max(
                s.end_us / 1000 + GapUs / 1000,
                state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  // ---- end-to-end runners (the production sink shape)

  case class ScoredEvent(event_id: Long, user_id: Long, event_type: String,
      value: Double, ts_us: Long)
  case class MomentState(n: Long, mean: Double, m2: Double)
  case class Alert(event_id: Long, user_id: Long, event_type: String,
      value: Double, n_prev: Long, z: Double)

  /** Per-user PREFIX z-score anomaly stream: each event is scored
    * against the running moments of that user's PRIOR events (Welford
    * n/mean/M2 in the state store — O(1) state per key, never the
    * history), and emitted when it sits ≥ `zThresh` sample standard
    * deviations out with at least `minPrev` priors. This is the online
    * twin of the batch global-moments scan `ev_anomaly`: the stream
    * can't see the future, so its baseline is the exclusive prefix —
    * exactly the `ROWS UNBOUNDED PRECEDING AND 1 PRECEDING` window of
    * the SQL oracle. z is floor-truncated to 4 digits on both sides so
    * accumulation-order ULP noise can't flip the threshold compare.
    *
    * Events are folded in (event-time, event_id) order within each
    * micro-batch; across batches the state carries forward, so
    * correctness at scale needs time-ordered file arrival — the same
    * contract every watermark-incremental ingest in this repo already
    * relies on (SURVEY §2.10).
    */
  def anomalyAlerts(events: Dataset[ScoredEvent], minPrev: Int = 10,
      zThresh: Double = 3.0): Dataset[Alert] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[MomentState, Alert](OutputMode.Append,
        GroupStateTimeout.NoTimeout) { (uid, it, state) =>
        var st = state.getOption.getOrElse(MomentState(0L, 0.0, 0.0))
        val out = Seq.newBuilder[Alert]
        // batch arrival order is not event order: sort the group's
        // slice so the prefix fold is deterministic
        it.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
          if (st.n >= minPrev) {
            val sigma = math.sqrt(st.m2 / (st.n - 1))
            if (sigma > 0) {
              val z = math.floor(
                math.abs((e.value - st.mean) / sigma) * 1e4) / 1e4
              if (z >= zThresh)
                out += Alert(e.event_id, uid, e.event_type, e.value, st.n, z)
            }
          }
          val n1 = st.n + 1
          val d = e.value - st.mean
          val mean1 = st.mean + d / n1
          st = MomentState(n1, mean1, st.m2 + d * (e.value - mean1))
        }
        state.update(st)
        out.result().iterator
      }
  }

  case class KeyedEvent(event_id: Long, user_id: Long, day: String,
      event_type: String, ts_us: Long, ts: java.sql.Timestamp)

  /** Rate limiting at the stream: pass at most `maxPerKey` events per
    * (user, day), dropping the rest AT INGEST — the guardrail that
    * keeps one runaway client from flooding a 100 TB pipeline, applied
    * where it's cheapest (state = ONE counter per ACTIVE key; a batch
    * job would buffer the flood first and filter after). Events fold
    * in (event-time, event_id) order within each batch; the counter
    * carries across batches so replays/late batches can't exceed the
    * cap.
    *
    * State eviction (watermark-based): a (user, day) counter is
    * dropped once the stream's EVENT time has moved `stateTtl` past
    * that key's last event — without a timeout the store would retain
    * one counter for every day ever seen and grow without bound. Event
    * time (not processing time) is the right clock here: it advances
    * only with data (no wall-clock no-data batches spinning just to
    * expire state), survives backfills running days of data in
    * minutes, and bounds the replay guarantee in the stream's own
    * units — a batch replayed while event time is within the TTL is
    * capped exactly; a replay arriving after eviction re-admits at
    * most `maxPerKey` rows for that stale day (bounded, and far older
    * than any at-least-once redelivery window). The watermark is
    * declared here (`wmDelay` of allowed disorder) so callers can't
    * forget it — EventTimeTimeout requires one.
    */
  def rateLimit(events: Dataset[KeyedEvent], maxPerKey: Int = 3,
      stateTtl: String = "7 days", wmDelay: String = "1 hour")
      : Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", wmDelay)
      .groupByKey(e => (e.user_id, e.day))
      .flatMapGroupsWithState[Long, KeyedEvent](OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) { (_, it, state) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          var n = state.getOption.getOrElse(0L)
          val out = Seq.newBuilder[KeyedEvent]
          var lastMs = Long.MinValue
          it.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            lastMs = math.max(lastMs, e.ts.getTime)
            if (n < maxPerKey) { out += e; n += 1 }
          }
          state.update(n)
          // evict stateTtl past this key's last event; the max() guard
          // keeps the target legal (strictly past the watermark) when
          // a very late replay arrives after event time moved on
          state.setTimeoutTimestamp(
            math.max(lastMs, state.getCurrentWatermarkMs() + 1), stateTtl)
          out.result().iterator
        }
      }
  }

  /** [[rateLimit]] end-to-end: stream → keyed counter → parquet sink →
    * read-back. Oracle = the ranked-window SQL twin (first `maxPerKey`
    * per (user, day) by event time).
    */
  def rateLimitViaStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = eventsStream(spark, dir)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"), expr("unix_micros(ts)").as("ts_us"), col("ts"))
      .as[KeyedEvent]
    val out = Files.createTempDirectory("graft_st_rl_out").toString
    val ckpt = Files.createTempDirectory("graft_st_rl_ckpt").toString
    runAvailableNow(rateLimit(ev).toDF(), out, ckpt)
    spark.read.parquet(out)
      .select(col("event_id"), col("user_id"), col("day"),
        col("event_type"))
      .orderBy("event_id")
  }

  /** [[anomalyAlerts]] end-to-end: events stream → stateful prefix
    * scoring → parquet sink → batch read-back. Oracle = the exclusive-
    * prefix window SQL twin.
    */
  def anomalyViaStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = eventsStream(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), expr("unix_micros(ts)").as("ts_us"))
      .as[ScoredEvent]
    val out = Files.createTempDirectory("graft_st_anom_out").toString
    val ckpt = Files.createTempDirectory("graft_st_anom_ckpt").toString
    runAvailableNow(anomalyAlerts(ev).toDF(), out, ckpt)
    spark.read.parquet(out)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("n_prev"), col("z"))
      .orderBy("event_id")
  }

  /** Run an append-mode streaming plan to a parquet sink with
    * `Trigger.AvailableNow` (= the reference's "fetch everything new,
    * then stop" batch loop, with checkpointed offsets instead of a
    * MAX(watermark) probe), blocking until drained.
    */
  /** Streamed maintenance of the aggregate-navigation summary — the
    * ingest-side loop that keeps [[graft.plans.SummaryRewrite]]'s
    * summary fresh while facts STREAM in: each micro-batch folds its
    * own additive partials (SUM/COUNT per dims) into the persisted
    * summary through the staged overwrite, so the summary is correct
    * after every batch, not just at end-of-day. `maxFilesPerTrigger`
    * forces several micro-batches here, proving the accumulation is
    * genuinely incremental (partials of partials — the same rollup
    * algebra as `q_summary_incr`, run N times). Cost per batch is
    * O(batch + dims-product); the fact history is never rescanned.
    * Exact oracle: the final summary must equal DuckDB's one-shot
    * aggregate over everything that streamed through.
    */
  def summaryMaintViaStream(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft_st_summ").toString
    val src = s"$root/src"
    val ckpt = s"$root/ckpt"
    val summary = s"$root/summary"
    Tables(spark, dir, "lineitem")
      .select("l_returnflag", "l_linenumber", "l_quantity",
        "l_extendedprice")
      .repartition(6) // several source files -> several micro-batches
      .write.parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2").parquet(src)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        val sp = batch.sparkSession
        val partial = batch.toDF()
          .groupBy("l_returnflag", "l_linenumber")
          .agg(sum("l_quantity").as("sum_qty"),
            sum("l_extendedprice").as("sum_price"),
            count(lit(1)).as("cnt"))
        val merged =
          if (graft.operators.ParquetIO.exists(sp, summary))
            sp.read.parquet(summary).unionByName(partial)
              .groupBy("l_returnflag", "l_linenumber")
              .agg(sum("sum_qty").as("sum_qty"),
                sum("sum_price").as("sum_price"),
                sum("cnt").as("cnt"))
          else partial
        graft.operators.ParquetIO.overwriteSafe(merged, summary)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(summary)
      .select(col("l_returnflag"), col("l_linenumber"),
        round(col("sum_qty"), 2).as("sum_qty"),
        round(col("sum_price"), 2).as("sum_price"), col("cnt"))
      .orderBy("l_returnflag", "l_linenumber")
  }

  /** Dead-letter routing — the ingest pattern that keeps bad records
    * from either BLOCKING the pipeline or being SILENTLY dropped: each
    * micro-batch is read once, cached, and fanned out to the main sink
    * (rows passing the gate) and the dead-letter sink (failing rows,
    * tagged with the reason) — two appends per batch, no second read
    * of the source. The declared result is the per-sink/per-reason
    * row accounting; the oracle recomputes it from SQL, proving the
    * fan-out is lossless (main + dlq = input, row-for-row by gate).
    * At 100 TB the DLQ is what makes reprocessing failures O(failed
    * rows) instead of a full re-run.
    */
  def dlqViaStream(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft_st_dlq").toString
    val (main, dlq, ckpt) = (s"$root/main", s"$root/dlq", s"$root/ckpt")
    val q = eventsStream(spark, dir)
      .withColumn("dlq_reason",
        when(col("value") < 5, lit("low_value")))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        batch.persist()
        batch.filter(col("dlq_reason").isNull).drop("dlq_reason")
          .write.mode("append").parquet(main)
        batch.filter(col("dlq_reason").isNotNull)
          .select(col("event_id"), col("event_type"), col("dlq_reason"))
          .write.mode("append").parquet(dlq)
        batch.unpersist()
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val mainRows = spark.read.parquet(main)
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(lit("main").as("sink"), lit("kept").as("reason"),
        col("n"), col("sum_value"))
    val dlqRows = spark.read.parquet(dlq)
      .groupBy(col("dlq_reason").as("reason"))
      .agg(count(lit(1)).as("n"))
      .select(lit("dlq").as("sink"), col("reason"), col("n"),
        lit(null).cast("double").as("sum_value"))
    mainRows.unionByName(dlqRows).orderBy("sink", "reason")
  }

  /** Checkpoint-resume law — the operational property a recurring
    * ingest lives on: ONE streaming query resumed run after run, each
    * `AvailableNow` pass processing exactly the files that arrived
    * since the last checkpoint commit and appending to the same sink.
    * Staged here end-to-end: half the events land, the query runs to
    * its sink; the other half lands, the SAME query (same checkpoint,
    * same sink) resumes and processes only the delta. The appended
    * output must converge to the batch answer over everything — that
    * is the oracle — and StreamsSpec additionally pins the
    * incremental-processing side (run 2 leaves run 1's sink files
    * byte-identical and appends exactly the delta's rows). At 100 TB
    * this is what makes re-running the ingest O(new data), not
    * O(history): the checkpoint's file log is the watermark.
    */
  def resumeViaStream(spark: SparkSession, dir: String): DataFrame = {
    val (out, _, _) = resumeStaged(spark, dir)
    spark.read.parquet(out).orderBy("event_id")
  }

  /** Stages the two-arrival resume scenario; returns (sink, src,
    * checkpoint) so the spec can assert on the intermediate states.
    */
  private[graft] def resumeStaged(spark: SparkSession, dir: String,
      afterFirstRun: (String => Unit) = _ => ()): (String, String, String) = {
    val src = Files.createTempDirectory("graft_st_resume_src").toString
    val out = Files.createTempDirectory("graft_st_resume_out").toString
    val ckpt = Files.createTempDirectory("graft_st_resume_ckpt").toString
    val ev = graft.queries.Events.events(spark, dir)
    def gate(df: DataFrame): DataFrame = df
      .filter(col("event_type") === "purchase" && col("value") >= 100)
      .select(col("event_id"), col("user_id"), col("value"))
    def run(): Unit = {
      val schema = spark.read.parquet(src).schema
      runAvailableNow(gate(spark.readStream.schema(schema).parquet(src)),
        out, ckpt)
    }
    ev.filter(col("event_id") % 2 === 0).write.mode("append").parquet(src)
    run()
    afterFirstRun(out)
    ev.filter(col("event_id") % 2 =!= 0).write.mode("append").parquet(src)
    run()
    (out, src, ckpt)
  }

  /** CONTINUOUS REPLICATION: each micro-batch appends to the PRIMARY
    * graftsink table and re-syncs a REPLICA inside the same
    * foreachBatch — [[graft.sources.GraftSink.cloneSync]] copies only
    * that batch's file(s) per trigger (O(delta), never the table),
    * the DR pattern run at ingest cadence instead of nightly.
    * `maxFilesPerTrigger` forces several micro-batches, so the
    * replica passes through several sync rounds; the declared result
    * reads the REPLICA, and the oracle aggregates the raw slice — a
    * sync that dropped, duplicated, or blended versions breaks it.
    * (Batch-side laws — delta counts, idempotence, model-walk
    * equivalence, racing the full maintenance protocol — live in
    * CloneSpec and the soak; this is the streaming composition.)
    */
  def cloneSyncViaStream(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft_st_clonesync").toString
    val src = s"$root/src"
    val primary = s"$root/primary"
    val replica = s"$root/replica"
    val ckpt = s"$root/ckpt"
    val orders = graft.queries.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    orders.repartition(6).write.parquet(src)
    // primary exists empty from birth (v0 manifest, zero files), so
    // the replica can seed before any data streams
    orders.limit(0).write.format("graftsink").mode("overwrite").save(primary)
    graft.sources.GraftSink.cloneSnapshot(spark, primary, replica)
    val schema = spark.read.parquet(src).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2").parquet(src)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        val sp = batch.sparkSession
        batch.toDF().write.format("graftsink").mode("append").save(primary)
        graft.sources.GraftSink.cloneSync(sp, primary, replica)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.format("graftsink").load(replica)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("total_cents"))
      .orderBy("status")
  }

  def runAvailableNow(df: DataFrame, outPath: String,
      checkpoint: String): Unit = {
    val q = df.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Stream-stream interval join: each purchase matches the same user's
    * clicks from the preceding `windowMinutes`. Both sides carry
    * watermarks and the join condition bounds event time in both
    * directions, so the state store holds only rows inside the interval
    * horizon — the constraint that makes a stream-stream join viable at
    * all (unbounded state otherwise). Inner join ⇒ results emit as soon
    * as both sides arrive; no watermark wait.
    */
  def clickAttribution(purchases: DataFrame, clicks: DataFrame,
      windowMinutes: Int = 30): DataFrame = {
    val p = purchases
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"),
        col("value"))
      .withWatermark("p_ts", "1 hour")
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    p.join(c, expr(
      s"""user_id = c_user AND
         |c_ts <= p_ts AND
         |c_ts >= p_ts - interval $windowMinutes minutes""".stripMargin))
      .select(col("event_id"), col("user_id"), col("p_ts"), col("c_ts"),
        col("value"))
  }

  /** LEFT OUTER stream-stream interval join — the semantically hard
    * half of [[clickAttribution]]: an unmatched purchase must emit a
    * null-click row, but only once the watermark PROVES no matching
    * click can still arrive (future clicks have `c_ts > watermark`;
    * the condition needs `c_ts <= p_ts`, so a purchase is final when
    * the join watermark passes its `p_ts`). Until then the row sits in
    * state — correctness at scale is exactly the watermark bound: state
    * holds only the unproven tail, never the stream.
    */
  def clickAttributionOuter(purchases: DataFrame, clicks: DataFrame,
      windowMinutes: Int = 30): DataFrame = {
    val p = purchases
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"),
        col("value"))
      .withWatermark("p_ts", "1 hour")
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    p.join(c, expr(
      s"""user_id = c_user AND
         |c_ts <= p_ts AND
         |c_ts >= p_ts - interval $windowMinutes minutes""".stripMargin),
      "leftOuter")
      .select(col("event_id"), col("user_id"), col("p_ts"), col("c_ts"),
        col("value"))
  }

  /** [[clickAttributionOuter]] end-to-end. Two mechanics the inner
    * variant never needed, both pinned by the gate:
    *
    *  1. Null rows flush on EVICTION, which happens in the batch AFTER
    *     the watermark advances — and AvailableNow stops at the last
    *     data batch. The second run on the same checkpoint processes
    *     zero data but its no-data batch evicts everything the final
    *     watermark proved, without re-emitting matches (state is
    *     checkpointed; restart-safety and finality in one move).
    *  2. The event-time tail is UNPROVABLE by construction — the final
    *     join watermark is min(maxPurchaseTs − 1 h, maxClickTs − 2 h),
    *     and purchases above it are still legitimately waiting. Both
    *     the streamed result and the oracle restrict to p_ts at or
    *     below that bound (less a margin), the provably final region;
    *     comparing the tail would be asserting an answer the semantics
    *     say is not yet known.
    */
  def attributionOuterViaStream(spark: SparkSession, dir: String): DataFrame = {
    val out = Files.createTempDirectory("graft_st_attro_out").toString
    val ckpt = Files.createTempDirectory("graft_st_attro_ckpt").toString
    def run(): Unit = {
      val purchases = eventsStream(spark, dir)
        .filter(col("event_type") === "purchase")
      val clicks = eventsStream(spark, dir)
        .filter(col("event_type") === "click")
      runAvailableNow(clickAttributionOuter(purchases, clicks), out, ckpt)
    }
    run() // data batches: matches emit, tail nulls still in state
    run() // restart: the no-data batch evicts at the final watermark
    // The provable region ends at the JOIN watermark = min over the
    // two sides of (that side's max event time − its delay) — with
    // sparse data the click side can lag far behind max(ts) overall,
    // so the bound must be per-side, minus a safety margin for the
    // strict eviction comparison. The oracle computes the same bound.
    val ev = Tables.eventTime(Tables(spark, dir, "events"))
    def mxOf(t: String): Long = ev.filter(col("event_type") === t)
      .agg(max("ts")).head().getTimestamp(0).getTime
    val wmMs = math.min(mxOf("purchase") - 1L * 3600 * 1000,
      mxOf("click") - 2L * 3600 * 1000)
    val bound = new java.sql.Timestamp(wmMs - 30L * 60 * 1000)
    spark.read.parquet(out)
      .filter(col("p_ts") <= lit(bound))
      .orderBy("event_id", "c_ts")
  }

  /** Streaming incremental upsert: every micro-batch merges into the
    * keyed parquet target through [[graft.operators.Ops.mergeUpsert]] —
    * the reference's watermark-fetch-upsert loop (`__main__.py:80-130`)
    * run continuously, with checkpointed offsets replacing the
    * MAX(watermark) probe. Use `Ops.mergeUpsertPartitioned` semantics
    * by passing `partitionCol` for 100 TB targets.
    */
  def upsertSink(df: DataFrame, targetPath: String, keys: Seq[String],
      checkpoint: String, versionCol: String = "etl_updated_ts",
      partitionCol: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        partitionCol match {
          case Some(pc) => graft.operators.Ops.mergeUpsertPartitioned(
            batch.sparkSession, targetPath, batch.toDF(), keys, pc, versionCol)
          case None => graft.operators.Ops.mergeUpsert(
            batch.sparkSession, targetPath, batch.toDF(), keys, versionCol)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Streaming SCD2 sink: every micro-batch merges into the dimension
    * HISTORY via [[graft.operators.Ops.scd2Merge]] — CDC-style type-2
    * dimension maintenance run continuously. Changed keys close their
    * open row and insert a fresh one per batch; unchanged rows are a
    * no-op, so replaying a batch (restart after checkpoint loss)
    * converges instead of duplicating history.
    */
  def scd2Sink(df: DataFrame, targetPath: String, keys: Seq[String],
      checkpoint: String, versionCol: String = "etl_updated_ts",
      trigger: Trigger = Trigger.AvailableNow()
  ): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Ops.scd2Merge(batch.sparkSession, targetPath,
          batch.toDF(), keys, versionCol)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  // ---- driver-facing queries (batch results of a real streaming run)

  /** `ev_tumbling_hourly` computed through the streaming engine:
    * file-source stream → watermarked windowed agg → complete-mode
    * memory sink (verification harness only — the scale path is
    * [[runAvailableNow]] with append mode; complete+memory exists to
    * surface ALL windows for the oracle, since append withholds windows
    * the final watermark hasn't passed).
    */
  /** The sketch-ingest job run THROUGH the streaming engine: daily
    * Datasketches HLL sketches of user_id per (day, event_type)
    * aggregate in the streaming state store (sketch state merges
    * per-batch — the same mergeability that makes the batch table
    * incremental makes the streaming agg cheap), then the SAME
    * trailing-7-day RANGE-window union as the batch `q_hll_sliding`
    * runs over the streamed sketch rows. HLL union is a per-register
    * max, so estimates are insensitive to arrival order: the streamed
    * result must EQUAL the batch query's estimates, which is the
    * tolerance contract (rel diff 0 vs `q_hll_sliding`). At ingest
    * scale this replaces the daily batch seed job: state is
    * (days-in-watermark × types) sketch rows, never user history.
    */
  def slidingDistinctViaStream(spark: SparkSession,
      dir: String): DataFrame = {
    val name = "st_mem_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = eventsStream(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
      .orderBy(datediff(to_date(col("day")), to_date(lit("1995-01-01"))))
      .rangeBetween(-6, 0)
    val out = spark.table(name)
      .select(col("event_type"), col("day"),
        hll_sketch_estimate(hll_union_agg(col("sk")).over(w))
          .as("approx_users"))
      .orderBy("event_type", "day")
      .localCheckpoint(true)
    spark.catalog.dropTempView(name)
    out
  }

  /** The moment-ingest job run THROUGH the streaming engine: daily
    * (n, Σx, Σx²) partials per (day, event_type) accumulate in the
    * streaming state store — the same plain-addition mergeability
    * that makes the batch moment table incremental makes the
    * streaming aggregate cheap (state is days-in-watermark × types
    * THREE-NUMBER rows, never events) — then the same partial→merge
    * fold as the batch `q_moments_merge` runs over the streamed
    * partials. Unlike the sketch twin this sits under the FULL SQL
    * oracle: the streamed mean/variance must equal DuckDB's to the
    * emitted rounding.
    */
  def momentsViaStream(spark: SparkSession, dir: String): DataFrame = {
    val name = "st_mem_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = eventsStream(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("s1"),
        sum(col("value") * col("value")).as("s2"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val merged = spark.table(name)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_partials"), sum("n").as("n"),
        sum("s1").as("s1"), sum("s2").as("s2"))
    val out = merged
      .select(col("event_type"), col("n_partials"), col("n"),
        round(col("s1") / col("n"), 4).as("mean_value"),
        round((col("s2") - col("s1") * col("s1") / col("n"))
          / (col("n") - 1), 4).as("var_value"))
      .orderBy("event_type")
      .localCheckpoint(true)
    spark.catalog.dropTempView(name)
    out
  }

  /** Streamed QUANTILE-partial ingest — the histogram leg of the
    * sketch-table triad (HLL `st_sliding_distinct`, moments
    * `st_moments`, quantiles here) run THROUGH the streaming engine:
    * the stream maintains per-(event_type, bin) counts over a domain
    * FROZEN before the stream starts (the ingest contract pins
    * (lo, width); re-deriving them per micro-batch would silently
    * change bin meanings mid-stream), and any quantile is a cumulative
    * walk over the bin table afterwards — never an events rescan.
    * Unlike the HLL twin, bin arithmetic is deterministic integer
    * counting on IEEE-identical doubles, so this sits under the FULL
    * SQL oracle: DuckDB rebuilds the same bins and walks the same
    * ceil(q·n) crossing to the same upper bin edge.
    */
  def quantileViaStream(spark: SparkSession, dir: String): DataFrame = {
    val name = "st_mem_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val mm = graft.queries.Events.events(spark, dir)
      .agg(min("value"), max("value")).head
    val lo = mm.getDouble(0)
    val width = (mm.getDouble(1) - lo) / 4095
    val q = eventsStream(spark, dir)
      .groupBy(col("event_type"),
        floor((col("value") - lit(lo)) / lit(width)).as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // single pass over the streamed bins table (one reference to the
    // memory sink — MemoryPlan is not re-instantiable for self-joins):
    // cumulative + total share one partitioned sort, both crossings
    // picked by conditional MIN in one aggregation
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("bin")
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
    val out = spark.table(name).groupBy("event_type", "bin")
      .agg(sum("cnt").as("cnt"))
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n", sum("cnt").over(wAll))
      .groupBy("event_type")
      .agg(max("n").as("n"),
        min(when(col("cum") >= ceil(lit(0.5) * col("n")), col("bin")))
          .as("b50"),
        min(when(col("cum") >= ceil(lit(0.95) * col("n")), col("bin")))
          .as("b95"))
      .select(col("event_type"), col("n"),
        round(lit(lo) + (col("b50") + 1) * lit(width), 2).as("p50_hist"),
        round(lit(lo) + (col("b95") + 1) * lit(width), 2).as("p95_hist"))
      .orderBy("event_type")
      .localCheckpoint(true)
    spark.catalog.dropTempView(name)
    out
  }

  /** Streamed EXACT-distinct maintenance — the bitmap leg of the
    * sketch-table family run THROUGH the engine: the streaming
    * aggregate's state per (day, type) IS the custom
    * [[graft.functions.BitmapDistinct]] buffer (a typed Aggregator is
    * a declarative aggregate, so the state store holds and merges the
    * bitmap bytes across micro-batches like any built-in), and the
    * read-back unions partials by byte-OR. Exact, so unlike the HLL
    * twin (`st_sliding_distinct`) this sits under the FULL
    * count(DISTINCT) oracle.
    */
  def bitmapViaStream(spark: SparkSession, dir: String): DataFrame = {
    val name = "st_mem_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = eventsStream(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(graft.functions.BitmapDistinct.build(col("user_id")).as("bm"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table(name)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_partials"),
        graft.functions.BitmapDistinct.cardinality(
          graft.functions.BitmapDistinct.union(col("bm"))).as("n_users"))
      .orderBy("event_type")
      .localCheckpoint(true)
    spark.catalog.dropTempView(name)
    out
  }

  def tumblingViaStream(spark: SparkSession, dir: String): DataFrame = {
    val name = "st_mem_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = hourlyCounts(eventsStream(spark, dir))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // localCheckpoint pins the (small) result, so the per-run memory
    // sink table can be dropped instead of leaking per invocation
    val out = spark.table(name)
      .select(col("window.start").as("ws"), col("event_type"),
        col("n_events"), col("total_value"))
      .orderBy("ws", "event_type")
      .localCheckpoint(true)
    spark.catalog.dropTempView(name)
    out
  }

  /** Streaming daily leaderboard: the day × user aggregate runs IN the
    * engine (complete mode — window cells update as micro-batches
    * land); the top-3-per-day presentation is the bounded read-back a
    * serving layer does per refresh, over the (days × active users)
    * result table, never the event stream. The state story at scale:
    * windowed-aggregate state is one cell per (day, user) inside the
    * watermark horizon, and the rank step's input is result-sized —
    * the leaderboard query that re-sorts raw events every refresh is
    * the anti-pattern this replaces. Ranks tie-break deterministically
    * (rounded total desc, user asc) so the gate compares exactly
    * against the batch twin oracle.
    */
  def leaderboardViaStream(spark: SparkSession, dir: String): DataFrame = {
    val name = "st_mem_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val byDay = org.apache.spark.sql.expressions.Window
      .partitionBy("day").orderBy(col("total_value").desc, col("user_id"))
    val out = spark.table(name)
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("user_id"), col("n_events"), col("total_value"))
      .withColumn("rank", row_number().over(byDay))
      .filter(col("rank") <= 3)
      .orderBy("day", "rank")
      .localCheckpoint(true)
    spark.catalog.dropTempView(name)
    out
  }

  case class RunningTotal(event_id: Long, user_id: Long, seq: Long,
      total_cents: Long)

  /** Per-user running (sequence, total) through the Spark 4
    * arbitrary-state v2 API: `transformWithState` + a typed
    * [[org.apache.spark.sql.streaming.ValueState]] cell, the
    * RocksDB-backed successor to flatMapGroupsWithState — named state
    * cells with per-cell TTL, timers, and changelog checkpointing, so
    * at 100 TB/day state scales as one (count, cents) pair per ACTIVE
    * user in RocksDB, never heap. Money folds in exact integer cents
    * (BIGINT), so the running value is identical under ANY fold order —
    * no IEEE accumulation-order dependence for the gate to trip on.
    * Events fold in (ts, event_id) order within each micro-batch and
    * the cell carries (n, cents) across batches — the same
    * time-ordered-arrival contract as [[anomalyAlerts]].
    */
  class RunningTotalProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, ScoredEvent, RunningTotal] {
    @transient private var state:
        org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long)]("agg",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ScoredEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[RunningTotal] = {
      var (n, cents) = if (state.exists()) state.get() else (0L, 0L)
      val out = rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).map { e =>
        n += 1
        cents += math.round(e.value * 100)
        RunningTotal(e.event_id, key, n, cents)
      }
      state.update((n, cents))
      out.iterator
    }
  }

  /** [[RunningTotalProcessor]] with batch-computed INITIAL STATE — the
    * operational pattern that makes streaming adoptable on a table
    * with history: a new streaming job must not reprocess 100 TB of
    * past events to warm its per-key state, and it must not start from
    * zero either. `StatefulProcessorWithInitialState` seeds each key's
    * state cell from a batch aggregate ONCE (first micro-batch), then
    * the stream continues exactly where history left off — sequence
    * numbers and totals carry across the batch/stream boundary, which
    * is precisely what the gate checks.
    */
  class BootstrapRunningTotalProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, ScoredEvent, RunningTotal, (Long, Long)] {
    @transient private var state:
        org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long)]("agg",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInitialState(key: Long, initial: (Long, Long),
        timerValues: org.apache.spark.sql.streaming.TimerValues): Unit =
      state.update(initial)

    override def handleInputRows(key: Long, rows: Iterator[ScoredEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[RunningTotal] = {
      var (n, cents) = if (state.exists()) state.get() else (0L, 0L)
      val out = rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).map { e =>
        n += 1
        cents += math.round(e.value * 100)
        RunningTotal(e.event_id, key, n, cents)
      }
      state.update((n, cents))
      out.iterator
    }
  }

  /** [[BootstrapRunningTotalProcessor]] end-to-end: history (events
    * before the cutoff) folds to one (count, cents) pair per user
    * BATCH-side; the stream processes only events from the cutoff on,
    * seeded with that state. Output rows are the streamed region only —
    * their sequence numbers continue the historical count, so the
    * oracle is the FULL-history running window restricted to the
    * streamed rows: any seam at the boundary (restart from zero,
    * double-counted history) shifts every seq/total.
    */
  def runningTotalsBootstrapViaStream(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val cutoff = "TIMESTAMP '2024-01-15 00:00:00'"
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val history = withEventTime(Tables(spark, dir, "events"))
        .filter(expr(s"ts < $cutoff"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
        .as[(Long, Long, Long)]
        .groupByKey(_._1).mapValues(t => (t._2, t._3))
      val stream = eventsStream(spark, dir)
        .filter(expr(s"ts >= $cutoff"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), expr("unix_micros(ts)").as("ts_us"))
        .as[ScoredEvent]
      val out = Files.createTempDirectory("graft_st_boot_out").toString
      val ckpt = Files.createTempDirectory("graft_st_boot_ckpt").toString
      val res = stream.groupByKey(_.user_id)
        .transformWithState(new BootstrapRunningTotalProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append(), history)
      runAvailableNow(res.toDF(), out, ckpt)
      spark.read.parquet(out).orderBy("event_id")
    } finally prev match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None => spark.conf.unset(providerKey)
    }
  }

  /** [[RunningTotalProcessor]] over the events file stream, drained
    * with AvailableNow into parquet and read back — the
    * `transformWithState` declared query (`st_tws_running`). The v2
    * state API requires the RocksDB state store provider; it is set
    * for this query and restored after (the other streaming queries
    * keep the default HDFS-backed provider so both store paths stay
    * exercised).
    */
  def runningTotalsViaStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ev = eventsStream(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), expr("unix_micros(ts)").as("ts_us"))
        .as[ScoredEvent]
      val out = Files.createTempDirectory("graft_st_tws_out").toString
      val ckpt = Files.createTempDirectory("graft_st_tws_ckpt").toString
      val res = ev.groupByKey(_.user_id)
        .transformWithState(new RunningTotalProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append())
      runAvailableNow(res.toDF(), out, ckpt)
      spark.read.parquet(out).orderBy("event_id")
    } finally prev match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None => spark.conf.unset(providerKey)
    }
  }

  /** Streaming ATOMIC multi-table publish: each micro-batch commits its
    * delta AND the incrementally-folded summary as ONE
    * [[graft.operators.Transaction]] — a reader at any moment sees a
    * (deltas, summary) pair from the same transaction, never a summary
    * ahead of or behind its facts. This is the exactly-once serving
    * contract a dashboard needs from a streaming ingest, built from
    * the same one-rename commit the batch side uses; per-batch work is
    * O(batch + summary), the facts history is never rewritten
    * (each delta is its own immutable table version).
    * TransactionSpec's streaming law iterates every committed tx and
    * re-folds its deltas — summary@tx must equal the fold, at EVERY tx,
    * not just the last.
    */
  def txPublishViaStream(spark: SparkSession, dir: String): String = {
    import graft.operators.Transaction
    val root = Files.createTempDirectory("graft_st_txpub").toString
    val src = s"$root/src"
    val ckpt = s"$root/ckpt"
    val txRoot = s"$root/tx"
    withEventTime(Tables(spark, dir, "events"))
      .select(col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .repartition(6) // several source files -> several micro-batches
      .write.parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2").parquet(src)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val partial = batch.groupBy("event_type")
            .agg(count(lit(1)).as("n_events"),
              sum("cents").as("total_cents"))
          val merged =
            if (Transaction.committedTxs(s, txRoot).isEmpty) partial
            else Transaction.read(s, txRoot, "summary")
              .unionByName(partial)
              .groupBy("event_type")
              .agg(sum("n_events").as("n_events"),
                sum("total_cents").as("total_cents"))
          Transaction.publish(s, txRoot, Map(
            "delta" -> batch.toDF(), "summary" -> merged))
          ()
        }
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    txRoot
  }

  /** The declared-query face of [[txPublishViaStream]]: the summary at
    * the LATEST transaction must equal the batch aggregate over
    * everything that streamed through.
    */
  def txPublishSummary(spark: SparkSession, dir: String): DataFrame = {
    val txRoot = txPublishViaStream(spark, dir)
    graft.operators.Transaction.read(spark, txRoot, "summary")
      .orderBy("event_type")
  }

  /** Streaming tail of the engine's own DSv2 sink
    * ([[graft.sources.GraftSinkDataSource]] MicroBatchStream): seed the
    * table with the F orders (manifest v0), drain an AvailableNow run
    * into a parquet log, append the P orders (v1), and drain AGAIN from
    * the same checkpoint — offsets are manifest versions, so the second
    * run reads exactly v1's files (a replay of v0 would double the F
    * counts and break the oracle). The declared face aggregates the
    * drained log; the oracle recomputes from the raw orders table, so
    * exactly-once across the restart is what is actually checked.
    */
  def sinkTailSummary(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft_st_sinktail").toString
    val sink = s"$root/t"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val o = Tables(spark, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    o.filter(col("o_orderstatus") === "F")
      .write.format("graftsink").mode("overwrite").save(sink)   // v0
    def drain(): Unit = {
      val q = spark.readStream.format("graftsink")
        .option("startingVersion", 0).load(sink)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    o.filter(col("o_orderstatus") === "P")
      .write.format("graftsink").mode("append").save(sink)      // v1
    drain()
    spark.read.parquet(out)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)"))
          .as("total_cents"),
        max(to_date(col("o_orderdate")).cast("string")).as("last_day"))
      .orderBy("status")
  }

  /** Rate-limited BACKFILL through the streaming tail
    * (SupportsAdmissionControl + SupportsTriggerAvailableNow on the
    * sink's micro-batch source): without admission control, the first
    * trigger over a big table is the ENTIRE snapshot as one
    * micro-batch — at 100 TB one unschedulable job whose commit the
    * checkpoint cannot subdivide. `maxFilesPerTrigger` makes offsets
    * address INTO the snapshot's stable file list ((version, fileIdx)),
    * so the backfill drains as bounded exactly-once batches and an
    * AvailableNow run still terminates at the head it observed at
    * start. The require() pins the law (the 8-file snapshot MUST
    * split into >= 4 batches under cap 2); the oracle pins that the
    * chunked drain delivered every row exactly once.
    */
  def sinkBackfillSummary(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft_st_backfill").toString
    val sink = s"$root/t"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    Tables(spark, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .repartitionByRange(8, col("o_orderkey"))
      .write.format("graftsink").mode("overwrite").save(sink)
    val q = spark.readStream.format("graftsink")
      .option("startingVersion", 0)
      .option("maxFilesPerTrigger", 2).load(sink)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val bounded = q.recentProgress.count(_.numInputRows > 0)
    require(bounded >= 4, "admission control must split the 8-file " +
      s"snapshot into >= 4 bounded batches, got $bounded")
    spark.read.parquet(out)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)"))
          .as("total_cents"))
      .orderBy("status")
  }

  /** Streamed write INTO the engine's own sink via the full V2
    * streaming-write protocol (GraftStreamingWrite — no foreachBatch):
    * the per-type running aggregate lands in a graftsink table under
    * `complete` mode, each epoch publishing one truncate-manifest
    * version with its epoch id (the exactly-once guard). Two
    * AvailableNow runs around a source append prove the refresh; the
    * declared face reads the final table back, and the oracle
    * recomputes the aggregate from raw events — so epoch replay or
    * double-publish would break the gate.
    */
  def sinkPipeSummary(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft_st_sinkpipe").toString
    val src = s"$root/src"; val dst = s"$root/out"; val ckpt = s"$root/ckpt"
    val ev = withEventTime(Tables(spark, dir, "events"))
      .select(col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
    // two source halves -> two drains, the second sees only new files
    val h1 = ev.filter(col("cents") % 2 === 0)
    val h2 = ev.filter(col("cents") % 2 =!= 0)
    h1.coalesce(2).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    def drain(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), sum("cents").as("total_cents"))
        .writeStream.format("graftsink")
        .option("path", dst)
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    h2.coalesce(2).write.mode("append").parquet(src)
    drain()
    spark.read.format("graftsink").load(dst).orderBy("event_type")
  }

  /** Streaming-state observability through Spark's `statestore` data
    * source: a keyed stateful query (streaming dedup on `event_id`)
    * drains under AvailableNow, then its CHECKPOINTED STATE — not its
    * output — is read back as a DataFrame and audited. This is the
    * on-call question "what is this job actually holding?" answered
    * with a query instead of heap dumps: state keys are first-class
    * rows, so key count, key range, and (at scale) per-partition skew
    * of a 100-TB job's state all come from the same parquet-speed
    * reader, against a LIVE checkpoint, without stopping the job. The
    * gate pins the audit to the batch truth: the dedup operator must
    * hold exactly one state row per distinct event id.
    */
  def stateInspectViaStream(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsStream(spark, dir).select("event_id")
    val out = Files.createTempDirectory("graft_st_insp_out").toString
    val ckpt = Files.createTempDirectory("graft_st_insp_ckpt").toString
    runAvailableNow(ev.dropDuplicates("event_id"), out, ckpt)
    spark.read.format("statestore").load(ckpt)
      .select(col("key.event_id").as("event_id"))
      .agg(count(lit(1)).as("n_state_keys"),
        min("event_id").as("min_key"), max("event_id").as("max_key"))
  }

  /** Stream-stream interval join end-to-end: purchases and clicks split
    * from the events stream, attributed within a 30-minute look-back
    * ([[clickAttribution]]), appended to a parquet sink, read back.
    * Oracle = the batch interval-join SQL twin — the stream must emit
    * exactly the pairs the batch join finds.
    */
  def attributionViaStream(spark: SparkSession, dir: String): DataFrame = {
    val purchases = eventsStream(spark, dir)
      .filter(col("event_type") === "purchase")
    val clicks = eventsStream(spark, dir)
      .filter(col("event_type") === "click")
    val out = Files.createTempDirectory("graft_st_attr_out").toString
    val ckpt = Files.createTempDirectory("graft_st_attr_ckpt").toString
    runAvailableNow(clickAttribution(purchases, clicks), out, ckpt)
    spark.read.parquet(out).orderBy("event_id", "c_ts")
  }

  /** SCD2 merge driven through the streaming engine: the v1 snapshot
    * is seeded batch-side (one-time per corpus), then the v2 delta
    * STREAMS into the dimension history via [[scd2Sink]] and the full
    * history is read back. Oracle = the batch `q_scd2_merge` SQL — the
    * streamed merge must build exactly the history the batch merge
    * builds (and re-running converges, because the merge is
    * idempotent).
    */
  private val scd2Seeds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def scd2ViaStream(spark: SparkSession, dir: String): DataFrame = {
    val path = scd2Seeds.computeIfAbsent(dir, { d =>
      val seed = Tables(spark, d, "orders")
        .filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), col("o_totalprice"))
        .withColumn("etl_updated_ts", lit(1L))
      val p = Files.createTempDirectory("graft_st_scd2").toString + "/dim"
      graft.operators.Ops.scd2Merge(spark, p, seed, Seq("o_orderkey"))
      p
    })
    val schema = Tables(spark, dir, "orders").schema
    val delta = spark.readStream.schema(schema)
      .option("pathGlobFilter", "orders.parquet").parquet(dir)
      .filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"),
        (col("o_totalprice") * 2).as("o_totalprice"))
      .withColumn("etl_updated_ts", lit(2L))
    val ckpt = Files.createTempDirectory("graft_st_scd2_ckpt").toString
    scd2Sink(delta, path, Seq("o_orderkey"), ckpt).awaitTermination()
    spark.read.parquet(path)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy("o_orderkey", "valid_from")
  }

  /** Streaming dedup end-to-end: the events stream unioned with itself
    * (guaranteed duplicates), watermark-deduped on event_id, appended
    * to a parquet sink, read back. Must equal the plain events table —
    * that is the oracle.
    */
  def dedupeViaStream(spark: SparkSession, dir: String): DataFrame = {
    val doubled = eventsStream(spark, dir)
      .unionByName(eventsStream(spark, dir))
    val out = Files.createTempDirectory("graft_st_dedup_out").toString
    val ckpt = Files.createTempDirectory("graft_st_dedup_ckpt").toString
    runAvailableNow(
      dedupe(doubled).select("event_id", "user_id", "event_type", "value"),
      out, ckpt)
    spark.read.parquet(out).orderBy("event_id")
  }

  /** DYNAMIC-gap session windows: the inactivity gap is a per-event
    * EXPRESSION (15 min after a purchase, 30 min otherwise), so session
    * shape adapts to behavior — the fixed-gap `session_window` can't
    * express "purchases close sessions faster". Semantics are interval
    * merging (each event spans [ts, ts+gap), overlapping spans fuse,
    * order-free), which the oracle re-derives relationally: a session
    * boundary is an event at or past the running max of previous
    * events' ends. Append-mode finality handled as in the other
    * append-mode streams (second run flushes, gate restricted to
    * sessions provably closed under the final watermark).
    */
  def dynamicSessionViaStream(spark: SparkSession, dir: String): DataFrame = {
    val out = Files.createTempDirectory("graft_st_dyn_out").toString
    val ckpt = Files.createTempDirectory("graft_st_dyn_ckpt").toString
    def run(): Unit = {
      val ev = eventsStream(spark, dir)
      val gap = when(col("event_type") === "purchase", lit("15 minutes"))
        .otherwise(lit("30 minutes"))
      val plan = ev.withWatermark("ts", "30 minutes")
        .groupBy(session_window(col("ts"), gap), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("total_value"))
        .select(col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"), col("user_id"),
          col("n_events"), col("total_value"))
      runAvailableNow(plan, out, ckpt)
    }
    run()
    run()
    val mx = Tables.eventTime(Tables(spark, dir, "events"))
      .agg(max("ts")).head().getTimestamp(0)
    val bound = new java.sql.Timestamp(mx.getTime - 1L * 3600 * 1000)
    spark.read.parquet(out)
      .filter(col("s_end") <= lit(bound))
      .orderBy("user_id", "s_start")
  }

  /** TWO stateful operators chained in ONE streaming plan (Spark's
    * multiple-stateful-operator support): the self-unioned stream
    * (guaranteed duplicates) dedups within the watermark, and the
    * SURVIVORS feed a tumbling hourly aggregate — dedup state and
    * window state live in the same query, one checkpoint, no
    * intermediate sink. The 100 TB shape this unlocks: ingest pipelines
    * that previously needed two jobs and a durable handoff topic
    * (dedup job → storage → aggregate job) collapse into one
    * exactly-once plan; the handoff becomes an in-plan shuffle. Oracle:
    * the hourly aggregate over DISTINCT events — double-counting any
    * duplicate or dropping any survivor breaks the compare.
    */
  def dedupWindowViaStream(spark: SparkSession, dir: String): DataFrame = {
    val out = Files.createTempDirectory("graft_st_dw_out").toString
    val ckpt = Files.createTempDirectory("graft_st_dw_ckpt").toString
    def run(): Unit = {
      val doubled = eventsStream(spark, dir)
        .unionByName(eventsStream(spark, dir))
      val plan = dedupe(doubled) // stateful op 1: watermark dedup
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("total_value")) // stateful op 2
      runAvailableNow(plan.select(col("window.start").as("ws"),
        col("event_type"), col("n_events"), col("total_value")), out, ckpt)
    }
    // multi-stateful plans must run in APPEND mode, so windows emit on
    // watermark passage: same two mechanics as attributionOuterViaStream
    // — a second run's no-data batch flushes what the final watermark
    // proved, and the gate restricts to provably-final windows
    // (window end at or below max(ts) − 1 h watermark, minus margin)
    run()
    run()
    val mx = Tables.eventTime(Tables(spark, dir, "events"))
      .agg(max("ts")).head().getTimestamp(0)
    val bound = new java.sql.Timestamp(
      mx.getTime - (1L * 3600 + 30L * 60) * 1000) // wm − 30 min margin
    spark.read.parquet(out)
      .filter(col("ws") + expr("interval 1 hour") <= lit(bound))
      .orderBy("ws", "event_type")
  }

  /** Continuous curation: the cleaning gates (quality score, lang-id,
    * deterministic split assignment — all stateless codegen'd
    * projections) applied ON THE STREAM as documents arrive, appended
    * to a parquet sink; the per-(split, lang) report is a batch
    * aggregate over the sink. This is how a 100 TB ingest keeps its
    * corpus clean WITHOUT recurring full-corpus batch passes: the
    * gates run once per document at arrival, and the checkpointed
    * file-source stream is exactly the reference's "fetch everything
    * new" poll loop. Oracle = the same gates as plain SQL over the
    * whole table — stream and batch must agree row-for-row because
    * every gate is a pure function of the document.
    */
  /** Stream-static enrichment join: the event stream joins a static
    * dimension (event_type → reporting category) and aggregates per
    * category. The static side is re-evaluated per micro-batch — the
    * standard continuously-running lookup-enrich shape; Spark plans the
    * tiny dim as a broadcast hash join UNDER the streaming agg, so the
    * stream side never shuffles for the join, only for the (5-group)
    * aggregation. Oracle = the identical batch join/agg in SQL.
    */
  def enrichViaStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dim = Seq(
      ("click", "engagement"), ("view", "engagement"),
      ("signup", "acquisition"), ("purchase", "revenue"),
      ("error", "ops")).toDF("event_type", "category")
    val name = "st_mem_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = eventsStream(spark, dir)
      .join(broadcast(dim), Seq("event_type"))
      .groupBy("category")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table(name)
      .select("category", "n_events", "total_value")
      .orderBy("category")
      .localCheckpoint(true)
    spark.catalog.dropTempView(name)
    out
  }

  def curationViaStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextAnalysis
    val docs = spark.readStream
      .schema(Tables(spark, dir, "documents").schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val gated = docs.select(col("doc_id"), col("n_chars"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.langId(col("text")).as("lang_pred"),
      graft.operators.Curation.splitAssign(col("doc_id"), "split-v1",
        Seq("train" -> 80, "val" -> 10, "test" -> 10)).as("split"))
      .filter(col("quality") >= 0.5 && col("lang_pred") =!= "und")
    val out = Files.createTempDirectory("graft_st_cur_out").toString
    val ckpt = Files.createTempDirectory("graft_st_cur_ckpt").toString
    runAvailableNow(gated, out, ckpt)
    spark.read.parquet(out)
      .groupBy("split", "lang_pred")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("quality"), 3).as("avg_quality"),
        sum("n_chars").as("total_chars"))
      .orderBy("split", "lang_pred")
  }
}
