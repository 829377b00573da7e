package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.Streams
import graft.streaming.Streams.{Session, SessionEvent}

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Minutes → epoch µs, offset a day off epoch 0 (an event at exactly
    * the initial watermark of 0 would be dropped as late).
    */
  private def us(minutes: Double): Long = ((minutes + 1440) * 60 * 1e6).toLong

  test("tumblingViaStream equals the batch tumbling aggregation") {
    val streamed = Streams.tumblingViaStream(spark, sf).collect()
    val batch = graft.queries.Events.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n_events"), col("total_value"))
      .orderBy("ws", "event_type").collect()
    assert(streamed.length == batch.length && streamed.sameElements(batch))
  }

  test("leaderboardViaStream equals the batch daily top-3 twin") {
    val streamed = Streams.leaderboardViaStream(spark, sf).collect()
    val byDay = org.apache.spark.sql.expressions.Window
      .partitionBy("day").orderBy(col("total_value").desc, col("user_id"))
    val batch = graft.queries.Events.events(spark, sf)
      .groupBy(window(col("ts"), "1 day"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("user_id"), col("n_events"), col("total_value"))
      .withColumn("rank", row_number().over(byDay))
      .filter(col("rank") <= 3)
      .orderBy("day", "rank").collect()
    assert(streamed.length == batch.length && streamed.sameElements(batch))
    assert(streamed.groupBy(_.getString(0)).values.forall(_.length <= 3))
  }

  test("runningTotalsViaStream equals the batch running-cents twin") {
    val streamed = Streams.runningTotalsViaStream(spark, sf).collect()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val batch = graft.queries.Events.events(spark, sf)
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .select(col("event_id"), col("user_id"),
        row_number().over(w).cast("long").as("seq"),
        sum("cents").over(w).as("total_cents"))
      .orderBy("event_id").collect()
    assert(streamed.length == batch.length && streamed.sameElements(batch))
  }

  test("initial-state bootstrap: streamed sequence numbers continue the " +
      "batch-computed history, never restart at 1") {
    val rows = Streams.runningTotalsBootstrapViaStream(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    // per user, the FIRST streamed row's seq = historical count + 1
    val firstSeq = rows.groupBy(_._2).map { case (u, rs) =>
      u -> rs.minBy(_._1)._3 }
    val hist = graft.queries.Events.events(spark, sf)
      .filter(expr("ts < TIMESTAMP '2024-01-15 00:00:00'"))
      .groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    firstSeq.foreach { case (u, seq) =>
      assert(seq == hist.getOrElse(u, 0L) + 1,
        s"user $u: first streamed seq $seq vs history ${hist.get(u)}")
    }
    // at least one user genuinely had history (seam exercised)
    assert(firstSeq.values.exists(_ > 1))
  }

  test("transformWithState ValueState carries (n, cents) across batches") {
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Streams.ScoredEvent]
      val name = "st_tws_" + java.util.UUID.randomUUID.toString.take(8)
      val q = in.toDS().groupByKey(_.user_id)
        .transformWithState(new Streams.RunningTotalProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append())
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      def ev(id: Long, uid: Long, tsUs: Long, v: Double) =
        Streams.ScoredEvent(id, uid, "e", v, tsUs)
      try {
        in.addData(ev(1, 7, us(1).toLong, 1.25), ev(2, 7, us(2).toLong, 2.0))
        q.processAllAvailable()
        in.addData(ev(3, 7, us(3).toLong, 0.75), ev(4, 9, us(1).toLong, 5.0))
        q.processAllAvailable()
        val got = spark.table(name)
          .select($"event_id", $"seq", $"total_cents")
          .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
        // user 7's batch-2 row continues from batch-1 state: seq 3,
        // 125 + 200 + 75 cents
        assert(got == Seq((1L, 1L, 125L), (2L, 2L, 325L),
          (3L, 3L, 400L), (4L, 1L, 500L)))
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    } finally prev match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("outer interval join emits null-click rows for unmatched " +
      "purchases and equals the batch left-join twin") {
    val streamed = Streams.attributionOuterViaStream(spark, sf)
    val rows = streamed.collect()
    assert(rows.exists(_.isNullAt(3)),
      "outer semantics unexercised: no null-click purchase in result")
    assert(rows.exists(!_.isNullAt(3)))
    val ev = graft.queries.Tables.eventTime(
      graft.queries.Tables(spark, sf, "events"))
    def mxOf(t: String): Long = ev.filter($"event_type" === t)
      .agg(max("ts")).head().getTimestamp(0).getTime
    val bound = new java.sql.Timestamp(
      math.min(mxOf("purchase") - 1L * 3600 * 1000,
        mxOf("click") - 2L * 3600 * 1000) - 30L * 60 * 1000)
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts".as("p_ts"), $"value")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"))
    val batch = p.join(c, expr(
        "user_id = c_user AND c_ts <= p_ts AND " +
          "c_ts >= p_ts - interval 30 minutes"), "leftOuter")
      .select($"event_id", $"user_id", $"p_ts", $"c_ts", $"value")
      .filter($"p_ts" <= lit(bound))
      .orderBy("event_id", "c_ts").collect()
    assert(rows.length == batch.length && rows.sameElements(batch))
  }

  test("transformWithState event-time timers + MapState: per-type " +
      "counts flush when the watermark passes the inactivity deadline") {
    import org.apache.spark.sql.streaming.{
      ExpiredTimerInfo, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 10L * 60 * 1000
    // per-user MapState[event_type -> count]; each batch re-arms an
    // event-time timer at (max event ts + gap); expiry emits the
    // accumulated per-type counts and clears state
    class FlushProcessor extends StatefulProcessor[
        Long, Streams.ScoredEvent, (Long, String, Long)] {
      @transient private var counts:
          org.apache.spark.sql.streaming.MapState[String, Long] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        counts = getHandle.getMapState[String, Long]("counts",
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      override def handleInputRows(key: Long,
          rows: Iterator[Streams.ScoredEvent],
          timerValues: TimerValues): Iterator[(Long, String, Long)] = {
        var maxTs = Long.MinValue
        rows.foreach { e =>
          val t = e.event_type
          counts.updateValue(t,
            (if (counts.containsKey(t)) counts.getValue(t) else 0L) + 1)
          maxTs = math.max(maxTs, e.ts_us / 1000)
        }
        getHandle.listTimers().foreach(ts =>
          getHandle.deleteTimer(ts.asInstanceOf[Long]))
        getHandle.registerTimer(maxTs + gapMs)
        Iterator.empty
      }
      override def handleExpiredTimer(key: Long, timerValues: TimerValues,
          expiredTimerInfo: ExpiredTimerInfo)
          : Iterator[(Long, String, Long)] = {
        val out = counts.iterator().map { case (t, n) => (key, t, n) }.toSeq
        counts.clear()
        out.iterator
      }
    }
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Streams.ScoredEvent]
      val name = "st_twst_" + java.util.UUID.randomUUID.toString.take(8)
      val q = in.toDS()
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .withWatermark("ts", "0 seconds")
        .as[Streams.ScoredEvent]
        .groupByKey(_.user_id)
        .transformWithState(new FlushProcessor, TimeMode.EventTime(),
          OutputMode.Append())
        .toDF("user_id", "event_type", "n")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      def ev(id: Long, uid: Long, min: Double, t: String) =
        Streams.ScoredEvent(id, uid, t, 1.0, us(min))
      try {
        // user 7: two click batches inside the gap — no flush yet
        in.addData(ev(1, 7, 1, "click"), ev(2, 7, 2, "view"))
        q.processAllAvailable()
        assert(spark.table(name).count() == 0,
          "timer must not fire inside the gap")
        // a much later event for ANOTHER user advances the watermark
        // past user 7's deadline -> user 7 flushes, user 9 stays open
        in.addData(ev(3, 9, 60, "click"))
        q.processAllAvailable()
        in.addData(ev(4, 9, 61, "view")) // one more batch to deliver expiry
        q.processAllAvailable()
        val got = spark.table(name).as[(Long, String, Long)]
          .collect().toSeq.sorted
        assert(got == Seq((7L, "click", 1L), (7L, "view", 1L)),
          s"expected user 7's per-type counts, got $got")
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    } finally prev match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("statestore reader exposes one state row per dedup key") {
    val ev = Streams.eventsStream(spark, sf).select("event_id")
    val out = tmpDir("st_insp_out")
    val ckpt = tmpDir("st_insp_ckpt")
    Streams.runAvailableNow(ev.dropDuplicates("event_id"), out, ckpt)
    val stateKeys = spark.read.format("statestore").load(ckpt)
      .select($"key.event_id".as("event_id"))
    val truth = graft.queries.Tables(spark, sf, "events")
      .select("event_id").distinct()
    assert(stateKeys.count() == truth.count())
    assert(stateKeys.except(truth).isEmpty &&
      truth.except(stateKeys).isEmpty)
  }

  test("dedupeViaStream collapses the self-unioned stream to the table") {
    val got = Streams.dedupeViaStream(spark, sf)
    val want = graft.queries.Tables(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")
    assert(got.count() == want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("sessionize emits on proven gap and on event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val name = "st_sessions_test"
    val q = Streams.sessionize(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // Batch 1: user 1 has two events 10 min apart (one session), then
      // a third 45 min later (gap ≥ 30 min → closes the first session
      // within the batch). User 2 has one open session.
      in.addData(
        SessionEvent(1L, us(0), 1.0), SessionEvent(1L, us(10), 2.0),
        SessionEvent(1L, us(55), 4.0), SessionEvent(2L, us(5), 8.0))
      q.processAllAvailable()
      val afterB1 = spark.table(name).as[Session].collect().toSet
      assert(afterB1 == Set(Session(1L, us(0), us(10), 2L, 3.0)))

      // Batch 2: a much later event advances the watermark past every
      // open session's end + gap → both time out and are emitted.
      in.addData(SessionEvent(3L, us(600), 16.0))
      q.processAllAvailable()
      in.addData(SessionEvent(3L, us(601), 32.0))
      q.processAllAvailable()
      val all = spark.table(name).as[Session].collect().toSet
      assert(all.contains(Session(1L, us(55), us(55), 1L, 4.0)))
      assert(all.contains(Session(2L, us(5), us(5), 1L, 8.0)))
    } finally q.stop()
  }

  test("update mode re-emits only the windows each batch touches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Double)] // event_id-ish, ts_us, value
    val events = in.toDF().toDF("user_id", "ts", "value")
      .withColumn("ts", timestamp_micros(col("ts")))
      .withColumn("event_type", lit("click"))
    val name = "st_update_test"
    val q = Streams.hourlyCounts(events)
      .select(col("window.start").as("ws"), col("n_events"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      in.addData((1L, us(10), 1.0), (1L, us(20), 1.0))
      q.processAllAvailable()
      val afterB1 = spark.table(name).as[(java.sql.Timestamp, Long)]
        .collect().toSeq
      assert(afterB1.map(_._2) == Seq(2L))
      // second batch touches the same window → an updated row for it is
      // appended to the update-mode sink (count now 3)
      in.addData((1L, us(30), 1.0))
      q.processAllAvailable()
      val all = spark.table(name).as[(java.sql.Timestamp, Long)]
        .collect().toSeq
      assert(all.map(_._2).sorted == Seq(2L, 3L))
    } finally q.stop()
  }

  test("anomalyAlerts carries Welford state across batches: prefix " +
      "scores equal the single-batch run") {
    implicit val sqlCtx = spark.sqlContext
    def run(batches: Seq[Seq[Streams.ScoredEvent]]): Seq[(Long, Double)] = {
      val in = MemoryStream[Streams.ScoredEvent]
      val name = "st_anom_" + java.util.UUID.randomUUID.toString.take(8)
      val q = Streams.anomalyAlerts(in.toDS(), minPrev = 3, zThresh = 2.0)
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
        spark.table(name).select($"event_id", $"z")
          .as[(Long, Double)].collect().sortBy(_._1).toSeq
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    }
    // user 1: nine 10.0s establishing a tight baseline with one wild
    // value injected late; user 2: too few priors to ever alert
    val base = (1 to 9).map(i =>
      Streams.ScoredEvent(i, 1L, "click", 10.0 + 0.1 * (i % 3), us(i)))
    val spike = Streams.ScoredEvent(100, 1L, "click", 50.0, us(100))
    val few = (1 to 2).map(i =>
      Streams.ScoredEvent(200 + i, 2L, "click", 99.0, us(i)))
    val oneShot = run(Seq(base ++ Seq(spike) ++ few))
    val split = run(Seq(base.take(4), base.drop(4), Seq(spike) ++ few))
    assert(oneShot.nonEmpty, "the spike must alert")
    assert(oneShot.map(_._1).contains(100L))
    assert(oneShot == split,
      s"state must carry across batches: $oneShot vs $split")
    assert(!oneShot.map(_._1).exists(_ > 200), "user 2 lacks priors")
  }

  test("rateLimit enforces the cap across batches (replays can't exceed it)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.KeyedEvent]
    val name = "st_rl_" + java.util.UUID.randomUUID.toString.take(8)
    val q = Streams.rateLimit(in.toDS(), maxPerKey = 2)
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      def ev(id: Long, d: String) =
        Streams.KeyedEvent(id, 1L, d, "click", us(id),
          new java.sql.Timestamp(us(id) / 1000))
      in.addData(ev(1, "d1"), ev(2, "d1"))
      q.processAllAvailable()
      // cap already reached for (1, d1): a later batch adds nothing
      in.addData(ev(3, "d1"), ev(4, "d2"))
      q.processAllAvailable()
      val got = spark.table(name).select($"event_id")
        .as[Long].collect().toSet
      assert(got == Set(1L, 2L, 4L), s"got $got")
    } finally { q.stop(); spark.catalog.dropTempView(name) }
  }

  test("anomalyViaStream equals the Spark batch prefix-window twin") {
    import org.apache.spark.sql.expressions.Window
    val streamed = Streams.anomalyViaStream(spark, sf)
      .select($"event_id", $"n_prev", $"z")
      .as[(Long, Long, Double)].collect().toSeq
    val pre = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val batch = graft.queries.Events.events(spark, sf)
      .withColumn("n_prev", count("value").over(pre))
      .withColumn("mu", avg("value").over(pre))
      .withColumn("sigma", stddev_samp("value").over(pre))
      .filter(col("n_prev") >= 10 && col("sigma") > 0)
      .withColumn("z",
        floor(abs((col("value") - col("mu")) / col("sigma")) * 1e4) / 1e4)
      .filter(col("z") >= 3.0)
      .select($"event_id", $"n_prev", $"z")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(streamed.nonEmpty && streamed.map(_._1) == batch.map(_._1),
      s"flag sets differ: ${streamed.length} vs ${batch.length}")
    streamed.zip(batch).foreach { case ((id, np, z1), (_, np2, z2)) =>
      assert(np == np2 && math.abs(z1 - z2) <= 1e-3, s"event $id: $z1 vs $z2")
    }
  }

  test("native session_window emits closed sessions in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Double)] // user, ts_us, value
    val events = in.toDF().toDF("user_id", "ts", "value")
      .withColumn("ts", timestamp_micros(col("ts")))
      .withColumn("event_type", lit("click"))
    val name = "st_swin_test"
    val q = graft.streaming.Streams.sessionWindows(events)
      .select(col("user_id"), col("session_window.start").as("s"),
        col("n_events"), col("total_value"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      in.addData((1L, us(0), 1.0), (1L, us(10), 2.0), (2L, us(5), 4.0))
      q.processAllAvailable()
      // nothing closed yet: watermark is only at -20min
      assert(spark.table(name).isEmpty)
      // advance watermark far past every session's end + gap
      in.addData((9L, us(600), 0.0))
      q.processAllAvailable()
      in.addData((9L, us(601), 0.0))
      q.processAllAvailable()
      val got = spark.table(name)
        .select($"user_id", unix_micros($"s"), $"n_events", $"total_value")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got.contains((1L, us(0), 2L, 3.0)), s"got $got")
      assert(got.contains((2L, us(5), 1L, 4.0)), s"got $got")
    } finally q.stop()
  }

  test("sessionize merges an out-of-order cross-batch event, extending start") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val name = "st_sessions_ooo"
    val q = Streams.sessionize(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      in.addData(SessionEvent(1L, us(60), 1.0))
      q.processAllAvailable() // watermark → 30min
      // arrives late but above watermark, 25min before the open session:
      // must merge and pull session_start back to 35min
      in.addData(SessionEvent(1L, us(35), 2.0))
      q.processAllAvailable()
      // flush via a far-future user
      in.addData(SessionEvent(9L, us(5000), 0.0))
      q.processAllAvailable()
      in.addData(SessionEvent(9L, us(5001), 0.0))
      q.processAllAvailable()
      val got = spark.table(name).as[Session]
        .filter($"user_id" === 1L).collect().toSeq
      assert(got == Seq(Session(1L, us(35), us(60), 2L, 3.0)))
    } finally q.stop()
  }

  test("sessionize late path: chained late events merge with the open " +
      "session when an intermediate event bridges the gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val name = "st_sessions_late_chain"
    // 90-min late tolerance > 30-min gap: events a full gap before the
    // open session survive the watermark and take the LATE path
    val q = Streams.sessionize(in.toDS(), watermarkDelay = "90 minutes")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      in.addData(SessionEvent(1L, us(100), 1.0))
      q.processAllAvailable() // open {100,100}, watermark → 10min
      // 65 is ≥ a gap before start=100 → late accumulator; 85 then
      // merges into the open session extending start to 85, which pulls
      // it within a gap of 65 — the batch twin yields ONE session, so
      // the end-of-batch re-check must merge, not close 65 separately
      in.addData(SessionEvent(1L, us(65), 2.0), SessionEvent(1L, us(85), 4.0))
      q.processAllAvailable()
      // flush via a far-future user (timeout fires on the NEXT batch)
      in.addData(SessionEvent(9L, us(5000), 0.0))
      q.processAllAvailable()
      in.addData(SessionEvent(9L, us(5001), 0.0))
      q.processAllAvailable()
      val got = spark.table(name).as[Session]
        .filter($"user_id" === 1L).collect().toSeq
      assert(got == Seq(Session(1L, us(65), us(100), 3L, 7.0)), s"got $got")
    } finally q.stop()
  }

  test("sessionize late path: a bridged session closed MID-BATCH still " +
      "absorbs the late events") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val name = "st_sessions_late_midclose"
    val q = Streams.sessionize(in.toDS(), watermarkDelay = "90 minutes")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      in.addData(SessionEvent(1L, us(100), 1.0))
      q.processAllAvailable() // open {100,100}
      // 65 → late; 85 bridges (cur start pulls to 85, within a gap of
      // 65); 200 closes the open session MID-BATCH — the close must
      // absorb the late pair first: batch twin over {65,85,100,200} is
      // sessions {65..100} and {200}
      in.addData(SessionEvent(1L, us(65), 2.0), SessionEvent(1L, us(85), 4.0),
        SessionEvent(1L, us(200), 8.0))
      q.processAllAvailable()
      val got = spark.table(name).as[Session]
        .filter($"user_id" === 1L).collect().toSeq
      assert(got == Seq(Session(1L, us(65), us(100), 3L, 7.0)), s"got $got")
    } finally q.stop()
  }

  test("sessionize late path: gap-separated late events close as their " +
      "own merged session") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val name = "st_sessions_late_own"
    val q = Streams.sessionize(in.toDS(), watermarkDelay = "120 minutes")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      in.addData(SessionEvent(1L, us(100), 1.0))
      q.processAllAvailable()
      // two late events within a gap of EACH OTHER (30,40) merge into
      // one late session; it stays ≥ a gap from the open session even
      // after 85 extends it down, so it closes on its own — exactly the
      // batch twin's answer for {30,40,85,100}
      in.addData(SessionEvent(1L, us(30), 2.0), SessionEvent(1L, us(40), 3.0),
        SessionEvent(1L, us(85), 4.0))
      q.processAllAvailable()
      val closed = spark.table(name).as[Session]
        .filter($"user_id" === 1L).collect().toSeq
      assert(closed == Seq(Session(1L, us(30), us(40), 2L, 5.0)),
        s"got $closed")
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks within the window") {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[(Long, Long, Long, Double)] // event_id,user,ts_us,value
    val cIn = MemoryStream[(Long, Long)]               // user, ts_us
    def withTs(df: org.apache.spark.sql.DataFrame, tsCol: String) =
      df.withColumn(tsCol, timestamp_micros(col(tsCol)))
    val purchases = withTs(pIn.toDF()
      .toDF("event_id", "user_id", "ts", "value"), "ts")
    val clicks = withTs(cIn.toDF().toDF("user_id", "ts"), "ts")
    val name = "st_attrib_test"
    val q = Streams.clickAttribution(purchases, clicks)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: clicks 5 and 15 min before a purchase at t=20m (both
      // attribute); a click 100 min earlier must not. user 2: click
      // only, no purchase → nothing.
      cIn.addData((1L, us(5)), (1L, us(15)), (1L, us(-80)), (2L, us(3)))
      pIn.addData((100L, 1L, us(20), 9.99))
      q.processAllAvailable()
      val got = spark.table(name)
        .select($"event_id", unix_micros($"c_ts"))
        .as[(Long, Long)].collect().sorted.toSeq
      assert(got == Seq((100L, us(5)), (100L, us(15))))
    } finally q.stop()
  }

  test("upsertSink merges each micro-batch into the keyed target") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double, Long)]
    val base = tmpDir("st_upsert")
    val target = s"$base/prices"
    val q = Streams.upsertSink(
      in.toDF().toDF("date", "price", "etl_updated_ts"),
      target, Seq("date"), s"$base/ckpt",
      trigger = Trigger.ProcessingTime(0))
    try {
      in.addData(("2025-01-01", 95000.0, 1L), ("2025-01-02", 96000.0, 1L))
      q.processAllAvailable()
      assert(spark.read.parquet(target).count() == 2)
      // batch 2: update one key, insert one
      in.addData(("2025-01-02", 96500.0, 2L), ("2025-01-03", 97000.0, 2L))
      q.processAllAvailable()
      val got = spark.read.parquet(target)
        .select("date", "price").as[(String, Double)]
        .collect().sortBy(_._1).toSeq
      assert(got == Seq(("2025-01-01", 95000.0), ("2025-01-02", 96500.0),
        ("2025-01-03", 97000.0)))
    } finally q.stop()
  }

  test("upsertSink restart from checkpoint neither drops nor replays") {
    implicit val sqlCtx = spark.sqlContext
    val base = tmpDir("st_restart")
    val target = s"$base/prices"
    val ckpt = s"$base/ckpt"
    val in1 = MemoryStream[(String, Double, Long)]
    val q1 = Streams.upsertSink(
      in1.toDF().toDF("date", "price", "etl_updated_ts"),
      target, Seq("date"), ckpt, trigger = Trigger.ProcessingTime(0))
    in1.addData(("2025-01-01", 100.0, 1L))
    q1.processAllAvailable()
    q1.stop()
    // restart: a NEW query over the same source against the SAME
    // checkpoint resumes from the committed offset; the sink's merge is
    // idempotent per key+version, so recovery converges even if the
    // engine replays the last uncommitted batch
    in1.addData(("2025-01-01", 101.0, 2L), ("2025-01-02", 200.0, 2L))
    val q2 = Streams.upsertSink(
      in1.toDF().toDF("date", "price", "etl_updated_ts"),
      target, Seq("date"), ckpt, trigger = Trigger.ProcessingTime(0))
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(target)
        .select("date", "price").as[(String, Double)]
        .collect().sortBy(_._1).toSeq
      assert(got == Seq(("2025-01-01", 101.0), ("2025-01-02", 200.0)))
    } finally q2.stop()
  }

  test("scd2Sink builds type-2 history across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double, Long)]
    val base = tmpDir("st_scd2")
    val target = s"$base/dim"
    val q = Streams.scd2Sink(
      in.toDF().toDF("date", "price", "etl_updated_ts"),
      target, Seq("date"), s"$base/ckpt",
      trigger = Trigger.ProcessingTime(0))
    try {
      in.addData(("2025-01-01", 95000.0, 1L), ("2025-01-02", 96000.0, 1L))
      q.processAllAvailable()
      // batch 2: change one key, repeat one unchanged, add one
      in.addData(("2025-01-02", 96500.0, 2L), ("2025-01-01", 95000.0, 2L),
        ("2025-01-03", 97000.0, 2L))
      q.processAllAvailable()
      val got = spark.read.parquet(target)
        .select("date", "price", "valid_from", "valid_to", "is_current")
        .as[(String, Double, Long, Option[Long], Boolean)]
        .collect().toSet
      assert(got == Set(
        ("2025-01-01", 95000.0, 1L, None, true),     // unchanged: stays open
        ("2025-01-02", 96000.0, 1L, Some(2L), false), // closed at v2
        ("2025-01-02", 96500.0, 2L, None, true),
        ("2025-01-03", 97000.0, 2L, None, true)))
    } finally q.stop()
  }

  test("sessionize agrees with the batch lag/running-sum form on sf0.001") {
    val ev = graft.queries.Events.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[SessionEvent]
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val name = "st_sessions_parity"
    val q = Streams.sessionize(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(ev.collect().toSeq)
      q.processAllAvailable()
      // Flush: one far-future event per *new* user advances the watermark
      // past every real session.
      in.addData(SessionEvent(-1L, us(1e9), 0.0))
      q.processAllAvailable()
      in.addData(SessionEvent(-1L, us(1e9 + 1), 0.0))
      q.processAllAvailable()
      val streamed = spark.table(name).as[Session]
        .filter($"user_id" >= 0)
        .select($"user_id", $"session_start_us", $"session_end_us",
          $"n_events", round($"total_value", 6).as("total_value"))
        .orderBy("user_id", "session_start_us").collect()
      val batch = SparkEntry.queries("ev_sessionize")(spark, sf)
        .select($"user_id", unix_micros($"session_start"),
          unix_micros($"session_end"), $"n_events",
          round($"total_value", 6))
        .orderBy("user_id", "session_start").collect()
      assert(streamed.length == batch.length)
      assert(streamed.sameElements(batch))
    } finally q.stop()
  }

  test("streamed daily HLL sketches estimate exactly like the batch " +
      "table (union is order-insensitive register maxima)") {
    val streamed = SparkEntry.queries("st_sliding_distinct")(spark, sf)
      .select($"event_type", $"day", $"approx_users")
      .orderBy("event_type", "day").collect()
    val batch = SparkEntry.queries("q_hll_sliding")(spark, sf)
      .select($"event_type", $"day", $"approx_users")
      .orderBy("event_type", "day").collect()
    assert(streamed.length == batch.length && streamed.nonEmpty)
    assert(streamed.sameElements(batch),
      "streamed sketch estimates drifted from the batch-built table")
  }

  test("checkpoint resume: run 2 appends exactly the delta and leaves " +
      "run 1's sink files byte-identical") {
    var firstFiles: Map[String, (Long, Long)] = Map.empty
    var firstRows = -1L
    val (out, _, _) = Streams.resumeStaged(spark, sf, { sink =>
      firstRows = spark.read.parquet(sink).count()
      firstFiles = listParquet(sink)
    })
    val ev = graft.queries.Events.events(spark, sf)
      .filter(col("event_type") === "purchase" && col("value") >= 100)
    val evenExpected = ev.filter(col("event_id") % 2 === 0).count()
    val allExpected = ev.count()
    assert(firstRows == evenExpected, "run 1 must process the even half")
    assert(spark.read.parquet(out).count() == allExpected,
      "resumed run must converge to the batch answer")
    // incremental side: every file from run 1 still present with the
    // same length and mtime — the resumed run APPENDED, never rewrote
    val after = listParquet(out)
    assert(firstFiles.nonEmpty)
    firstFiles.foreach { case (f, sig) =>
      assert(after.get(f).contains(sig), s"run 2 disturbed run-1 file $f")
    }
    assert(after.size > firstFiles.size, "run 2 appended no files")
  }

  test("merge-on-read CDC apply: replica converges to the recomputed " +
      "state, apply batches read ZERO base bytes, replay is idempotent") {
    val mor = graft.operators.MergeOnRead
    val root = java.nio.file.Files
      .createTempDirectory("graft_cdc_mor").toString
    // base replica: 300 keys at version v0
    val base = (1 to 300).map(k => (k.toLong, k * 10.0)).toDF("k", "v")
    mor.init(base, root)
    // three key-disjoint apply batches (I/U/D), driven as in-memory
    // rows — LocalTableScan, so the ONLY file bytes the apply could
    // read are base bytes, which is exactly what the gate forbids
    val batches = Seq(
      // seq 1: delete 1..50, upsert 51..80 (v*100), insert 301..320
      (Seq.tabulate(50)(i => i + 1L) ++ (51L to 80L),            // tombstones
        (51L to 80L).map(k => (k, k * 100.0)) ++
          (301L to 320L).map(k => (k, k * 1.0))),                // appends
      // seq 2: delete 81..100, upsert 301..310 (late re-update of a
      // seq-1 insert — the sequence rule must keep ONLY the new row)
      ((81L to 100L) ++ (301L to 310L),
        (301L to 310L).map(k => (k, k * 2.0))),
      // seq 3: delete 51..60 (keys upserted at seq 1 — tombstone must
      // mask the seq-1 version too)
      ((51L to 60L), Seq.empty[(Long, Double)]))
    def fileBytesRead(): Long =
      org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics
        .get("file").getLong("bytesRead")
    val before = fileBytesRead()
    batches.zipWithIndex.foreach { case ((dels, ups), i) =>
      val seq = i + 1L
      mor.deleteKeysAt(spark, root, dels.toDF("k"), seq)
      if (ups.nonEmpty) mor.appendRowsAt(spark, root, ups.toDF("k", "v"), seq)
    }
    val applyBytes = fileBytesRead() - before
    // the 100 TB law this query exists to prove: apply cost tracks the
    // BATCH, never the replica — no base file is opened at all (the
    // copy-on-write twin's anti-join + rewrite reads the whole base
    // every batch). Round 14's integrity stamp re-reads each batch's
    // just-written payload files ONCE to fold their _checksums
    // sidecar (the landed-byte discipline replication runs under), so
    // the bound is the batch dirs' own payload bytes — still O(batch),
    // provably not the base (which this gate pins separately below).
    def walkBytes(dir: String): Long = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(dir))
        .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    }
    val sideBytes = walkBytes(s"$root/deletes") + walkBytes(s"$root/updates")
    assert(sideBytes > 0L, "the apply must have written batch dirs")
    assert(applyBytes <= sideBytes * 3 / 2 + 8192,
      s"apply batches read $applyBytes file bytes vs $sideBytes batch " +
        "payload bytes; merge-on-read apply may re-read only what it " +
        "wrote (the sidecar stamp), never the base")
    // convergence: view == recomputed expected state
    def viewMap(): Map[Long, Double] =
      mor.readCurrentSeq(spark, root, "k").as[(Long, Double)]
        .collect().toMap
    val expected =
      ((101L to 300L).map(k => (k, k * 10.0)) ++      // untouched base
        (61L to 80L).map(k => (k, k * 100.0)) ++       // seq-1 upserts minus seq-3 deletes
        (311L to 320L).map(k => (k, k * 1.0)) ++       // seq-1 inserts not re-updated
        (301L to 310L).map(k => (k, k * 2.0))).toMap   // seq-2 re-updates win
    assert(viewMap() == expected)
    // replay idempotence: re-applying batch 2 (checkpoint recovery)
    // overwrites the same seq-named dirs with identical content
    mor.deleteKeysAt(spark, root,
      ((81L to 100L) ++ (301L to 310L)).toDF("k"), 2L)
    mor.appendRowsAt(spark, root,
      (301L to 310L).map(k => (k, k * 2.0)).toDF("k", "v"), 2L)
    assert(viewMap() == expected, "batch replay changed the view")
    // compaction folds to a plain scan and preserves the view exactly
    mor.compactSeq(spark, root, "k")
    assert(viewMap() == expected, "compaction changed the view")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/deletes")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$root/updates")),
      "compaction must clear the side dirs")
  }

  test("streaming merge-on-read CDC apply (the declared st_cdc_apply_mor " +
      "shape): per-trigger file reads are bounded by the FEED, never " +
      "the base — and the replica converges") {
    // the declared query's exact apply wiring — readStream over a
    // 3-file feed, foreachBatch { deleteKeysAt + appendRowsAt } — but
    // with a base 100x the feed, so the byte accounting separates the
    // two: a copy-on-write apply would read the base (anti join) every
    // batch, tripling the floor this gate sets
    val mor = graft.operators.MergeOnRead
    val root = java.nio.file.Files
      .createTempDirectory("graft_cdc_mor_stream").toString
    val (feedDir, tgt, ckpt) = (s"$root/feed", s"$root/target",
      s"$root/ckpt")
    val base = spark.range(100000L)
      .select(col("id").as("k"), (col("id") * 2.0).as("v"))
    mor.init(base, tgt)
    val baseBytes = new java.io.File(s"$tgt/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    // 3 key-disjoint batches: delete 0..99, upsert 100..199, insert
    // 100000..100099
    Seq(
      (0L until 100L).map(k => (k, "D", null.asInstanceOf[java.lang.Double])),
      (100L until 200L).map(k => (k, "U", java.lang.Double.valueOf(k * 7.0))),
      (100000L until 100100L).map(k =>
        (k, "I", java.lang.Double.valueOf(k * 1.0)))
    ).zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("k", "op", "new_v").coalesce(1)
        .write.parquet(s"$feedDir/b$i")
    }
    val feedBytes = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(feedDir))
        .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    }
    def fileBytesRead(): Long =
      org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics
        .get("file").getLong("bytesRead")
    val feed = spark.readStream
      .schema(spark.read.parquet(s"$feedDir/b0").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$feedDir/b*")
    val before = fileBytesRead()
    val q = feed.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val seq = batchId + 1
        mor.deleteKeysAt(spark, tgt,
          b.filter(col("op") =!= "I").select("k"), seq)
        mor.appendRowsAt(spark, tgt,
          b.filter(col("op") =!= "D")
            .select(col("k"), col("new_v").as("v")), seq)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamBytes = fileBytesRead() - before
    // the stream reads each feed file a bounded number of times (the
    // source once, each foreachBatch body twice) plus checkpoint
    // metadata; it must never read the 100x-larger base. Allow a wide
    // constant on the feed side — the gate is the BASE bound.
    assert(streamBytes < baseBytes / 2,
      s"stream apply read $streamBytes bytes vs base $baseBytes — " +
        "the merge-on-read apply must not scan the base")
    assert(streamBytes < 20 * feedBytes + 1000000,
      s"stream apply read $streamBytes bytes vs feed $feedBytes")
    // convergence: view == expected
    val view = mor.readCurrentSeq(spark, tgt, "k")
    assert(view.count() === 100000L - 100L + 100L)
    assert(view.filter(col("k") === 150L).head.getDouble(1) === 150 * 7.0)
    assert(view.filter(col("k") < 100L).count() === 0L)
    assert(view.filter(col("k") >= 100000L).count() === 100L)
  }

  test("autoCompact bounds the MOR read path across 50 delete " +
      "triggers with no manual compact: backlog stays under the " +
      "threshold, reads stay flat") {
    // the round-10 cadence rule as an enforced loop: 50 streamed
    // delete triggers, each foreachBatch calling autoCompact FIRST
    // (the st_cdc_apply_mor wiring) with a deliberately small
    // threshold so the flip point is reached many times at spec
    // scale. Without autoCompact the tombstone relation grows
    // monotonically for 50 triggers and every read joins against all
    // of it; with it, the backlog (and so the read-side join input)
    // is bounded by threshold + one batch, forever.
    val mor = graft.operators.MergeOnRead
    val root = java.nio.file.Files
      .createTempDirectory("graft_mor_autocompact").toString
    val (feedDir, tgt, ckpt) = (s"$root/feed", s"$root/target",
      s"$root/ckpt")
    mor.init(spark.range(10000L)
      .select(col("id").as("k"), (col("id") * 2.0).as("v")), tgt)
    // 50 key-disjoint delete batches: trigger i kills [i*100,(i+1)*100)
    (0 until 50).foreach { i =>
      (i * 100L until (i + 1) * 100L).map(k => (k, "D"))
        .toDF("k", "op").coalesce(1).write.parquet(f"$feedDir/b$i%02d")
    }
    val thresholdBytes = 16L << 10 // ~8-10 tombstone files
    val compactions = new java.util.concurrent.atomic.AtomicInteger(0)
    val readTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val feed = spark.readStream
      .schema(spark.read.parquet(s"$feedDir/b00").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$feedDir/b*")
    val q = feed.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, batchId: Long) =>
        if (mor.autoCompact(spark, tgt, "k", thresholdBytes,
            horizonSeq = batchId))
          compactions.incrementAndGet()
        mor.deleteKeysAt(spark, tgt, b.select("k"), batchId + 1)
        val t0 = System.nanoTime()
        mor.readCurrentSeq(spark, tgt, "k").count()
        readTimes.synchronized { readTimes += (System.nanoTime() - t0) / 1e9 }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(readTimes.size == 50, s"expected 50 triggers, saw ${readTimes.size}")
    assert(compactions.get() >= 2,
      s"the small threshold must fire autoCompact repeatedly across " +
        s"50 triggers (fired ${compactions.get()} times)")
    // BOUNDED BACKLOG — the structural guarantee behind flat read
    // latency: whatever the trigger count, on-disk tombstones never
    // exceed threshold + the batches since the last fire check
    val delDir = new java.io.File(s"$tgt/deletes")
    val backlog = Option(delDir.listFiles()).toSeq.flatten
      .flatMap(d => Option(d.listFiles()).toSeq.flatten)
      .map(_.length).sum
    assert(backlog < thresholdBytes * 3,
      s"tombstone backlog $backlog must stay bounded near the " +
        s"$thresholdBytes threshold — autoCompact is not holding the line")
    // FLAT LATENCY: late reads must not degrade vs early ones. Wide
    // noise margin (4x on medians of 10) — without compaction the
    // join side grows 50x, with it the bound is structural.
    val (early, late) = (readTimes.take(10).sorted, readTimes.takeRight(10).sorted)
    val (me, ml) = (early(early.size / 2), late(late.size / 2))
    assert(ml <= me * 4 + 0.25,
      f"read latency grew early=$me%.3fs late=$ml%.3fs across 50 " +
        "delete triggers — the cadence rule is not bounding the read path")
    // convergence: 50 x 100 deleted keys leave exactly the top half
    val view = mor.readCurrentSeq(spark, tgt, "k")
    assert(view.count() == 5000L)
    assert(view.agg(min("k")).head.getLong(0) == 5000L)
  }

  private def listParquet(dirPath: String): Map[String, (Long, Long)] = {
    val d = new java.io.File(dirPath)
    d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
  }
}
