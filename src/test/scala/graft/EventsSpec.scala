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
}
