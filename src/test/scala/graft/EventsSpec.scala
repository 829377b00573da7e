package graft

import org.apache.spark.sql.functions._

import graft.queries.Events

class EventsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("events ts arrives as microsecond TimestampType") {
    val ev = Events.events(spark, sf)
    assert(ev.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(ev.count() > 0)
  }

  test("eventTime normalizes every physical ts type to the same instant") {
    import spark.implicits._
    import graft.queries.Tables
    // one instant, three generator encodings: nanos-as-long,
    // TIMESTAMP_NTZ micros, and already-LTZ timestamp — all must land
    // on the identical UTC TimestampType value
    val micros = 1500000123456789L
    val asLong = Seq(micros * 1000L).toDF("ts")
    // LTZ→NTZ cast keeps the session-local (UTC) wall clock — the
    // same reading the generator's naive micros column carries
    val asNtz = Seq(micros).toDF("us")
      .select(expr("timestamp_micros(us)").cast("timestamp_ntz").as("ts"))
    val asLtz = Seq(micros).toDF("us")
      .select(expr("timestamp_micros(us)").as("ts"))
    assert(asNtz.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    val got = Seq(asLong, asNtz, asLtz).map { df =>
      val out = Tables.eventTime(df)
      assert(out.schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType)
      out.select(expr("unix_micros(ts)")).as[Long].head()
    }
    assert(got.forall(_ == micros), s"instants diverged: $got")
  }

  test("lag-based sessionize and native session_window agree") {
    val byLag = SparkEntry.queries("ev_sessionize")(spark, sf)
      .select(col("user_id"), col("session_start"), col("n_events"),
        col("total_value"))
    val byWindow = SparkEntry.queries("ev_session_window")(spark, sf)
      .select(col("user_id"), col("session_start"), col("n_events"),
        col("total_value"))
    assert(byLag.count() === byWindow.count())
    assert(byLag.except(byWindow).isEmpty && byWindow.except(byLag).isEmpty)
  }

  test("tumbling windows partition every event exactly once") {
    val ev = Events.events(spark, sf)
    val total = ev.count()
    val windowed = SparkEntry.queries("ev_tumbling_hourly")(spark, sf)
    assert(windowed.agg(sum("n_events")).head.getLong(0) === total)
  }

  test("asof click gap is non-negative and null iff no prior click") {
    val out = SparkEntry.queries("ev_asof_click")(spark, sf)
    assert(out.filter(col("gap_s") < 0).count() === 0)
    assert(out.filter(col("last_click_ts").isNull =!= col("gap_s").isNull)
      .count() === 0)
  }

  test("value bands cover all in-range events exactly once") {
    val ev = Events.events(spark, sf)
    val inRange = ev.filter(col("value") >= 0 && col("value") < 1000).count()
    val banded = SparkEntry.queries("ev_value_bands")(spark, sf)
    assert(banded.agg(sum("n_events")).head.getLong(0) === inRange)
  }

  test("json props parse for every event") {
    val parsed = SparkEntry.queries("ev_json_props")(spark, sf)
    val total = Events.events(spark, sf).count()
    assert(parsed.agg(sum("n_events")).head.getLong(0) === total)
    assert(parsed.filter(col("avg_k").isNull).count() === 0)
  }

  test("multi-touch attribution conserves credit: total credited value " +
      "equals the value of every touched purchase") {
    val credited = SparkEntry.queries("ev_multi_touch")(spark, sf)
      .agg(sum("credited_value")).head.getDouble(0)
    // the same interval join, aggregated purchase-side: each touched
    // purchase contributes its full value exactly once
    val ev = Events.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"), col("value"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val touched = p.join(c, col("user_id") === col("c_user")
        && col("c_ts") <= col("p_ts")
        && col("c_ts") >= col("p_ts") - expr("interval 30 minutes"),
        "left_semi")
      .agg(sum("value")).head.getDouble(0)
    // per-click 2-dp rounding perturbs each credit by <0.005
    assert(math.abs(credited - touched) < 0.01 *
      SparkEntry.queries("ev_multi_touch")(spark, sf).count(),
      s"credited $credited vs touched $touched")
  }

  test("ev_cusum: deviation path is zero-mean by construction and " +
      "the picked day attains it within the type's own span") {
    import spark.implicits._
    val out = SparkEntry.queries("ev_cusum")(spark, sf)
    val rows = out.select("event_type", "change_day", "max_abs_dev",
      "n_days", "total").collect()
    assert(rows.nonEmpty)
    // recompute the full path per type and check: S_n == 0 (the scaled
    // path ends exactly at zero — no drift can hide in float error),
    // and the reported max equals the true max |S_k|
    val daily = Events.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .select("event_type", "day", "c")
      .as[(String, java.sql.Date, Long)].collect()
      .groupBy(_._1)
    rows.foreach { r =>
      val tp = r.getString(0)
      val path = daily(tp).sortBy(_._2.toString)
      val n = path.length.toLong
      val total = path.map(_._3).sum
      var cum = 0L
      val devs = path.zipWithIndex.map { case ((_, _, c), i) =>
        cum += c
        math.abs(n * cum - (i + 1) * total)
      }
      assert(n * cum - n * total == 0L) // S_n = n·T − n·T
      assert(devs.max == r.getLong(2), s"max dev mismatch for $tp")
      assert(r.getLong(3) == n && r.getLong(4) == total)
    }
  }

  test("ev_pattern_match histogram partitions the user population") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val hist = SparkEntry.queries("ev_pattern_match")(spark, sf)
      .select("n_matches", "n_users")
      .as[(Long, Long)].collect()
    val nUsers = Events.events(spark, sf)
      .select("user_id").distinct().count()
    assert(hist.map(_._2).sum === nUsers,
      "every user appears in exactly one histogram bucket")
    assert(hist.map(_._1).distinct.length === hist.length)
    assert(hist.forall(_._1 >= 0))
  }

  test("ev_ewma: Q20 fixed-point laws on a constant series") {
    import spark.implicits._
    // one event of $100.00/day for 25 days: daily cents = 10000.
    // Day 1 (support 1): floor(10000 · 2^19 / 2^20) = 5000 (= c/2).
    // Day ≥ 20 (full 20-day support): floor(10000 · (2^20−1) / 2^20)
    //   = 9999 (= c−1 — the truncated geometric sum, exactly).
    val dir = tmpDir("graft_ewma")
    (0 until 25).map { d =>
      (d.toLong,
        java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"),
        1L, "click", 100.00, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("ev_ewma")(spark, dir)
      .select("day", "ewma_cents", "n_days")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.length == 25)
    assert(out.head == (("2024-01-01", 5000L, 1L)))
    assert(out.last == (("2024-01-25", 9999L, 20L)))
    // day d carries floor(c − c/2^d): strictly increasing while the
    // tail term c/2^d ≥ 1 (through day 14 for c = 10000), then flat
    // at c−1
    val vals = out.map(_._2)
    assert(vals.take(14).sliding(2).forall(p => p(0) < p(1)))
    assert(vals.drop(13).forall(_ == 9999L))
  }
}
