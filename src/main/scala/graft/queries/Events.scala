package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Event-stream analytics over the `events` table, batch side (the
  * Structured Streaming twins live in [[graft.streaming.Streams]]).
  * The reference's closest analogue is its poll-loop + watermark
  * incremental restart (SURVEY §2.10) — these queries are the windowed/
  * sessionized/as-of surface a warehouse consumer runs over an event
  * table.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS); Spark reads it as nanos
  * LongType (`nanosAsLong`, see Tables.configure), so every query first
  * converts to a microsecond TimestampType — identical to DuckDB's
  * ns→us cast, so oracles compare exactly.
  */
object Events {

  /** The events table with `ts` as a proper TimestampType (UTC, µs). */
  def events(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Tumbling 1-hour windows per event type: the canonical streaming agg
    * shape, run batch. At scale: partial aggregation map-side, shuffle
    * carries only (window, type) groups — ~720 × 5 rows per month.
    */
  private def tumbling(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n_events"), col("total_value"))
      .orderBy("ws", "event_type")

  /** Sliding 1-hour windows every 15 minutes (SURVEY §2.10 window
    * surface beyond tumbling): each event lands in exactly 4
    * overlapping windows. Catalyst plans `window()` with a slide as one
    * Expand (4 rows per event) into a single hash agg — partial
    * aggregation still happens map-side, so the shuffle carries
    * (window, type) groups, not events ×4.
    */
  private def sliding(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n_events"), col("total_value"))
      .orderBy("ws", "event_type")

  /** DuckDB twin: materialize the 4 window starts per event via
    * time_bucket minus k×15min (both engines align buckets to the
    * epoch, so starts agree exactly).
    */
  private val slidingSql =
    """SELECT ws, event_type, count(*) AS n_events,
      |  round(sum(value), 2) AS total_value
      |FROM (
      |  SELECT time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP))
      |      - t.k * INTERVAL 15 MINUTE AS ws,
      |    event_type, value
      |  FROM events, unnest([0, 1, 2, 3]) AS t(k))
      |GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin

  /** Shared with the streaming twin `st_tumbling_hourly` ([[Streaming]])
    * — one oracle text, so the two queries cannot drift apart.
    */
  private[queries] val tumblingSql =
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws, event_type,
      |  count(*) AS n_events, round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin

  /** Sessionization, explicit form: lag → gap≥30min flags → running sum
    * = session ordinal → grouped agg. One shuffle on user_id; both
    * windows and the final agg reuse the same partitioning.
    */
  private def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = 30L * 60 * 1000 * 1000
    events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") >= gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .orderBy("user_id", "session_seq")
  }

  private val sessionizeSql =
    """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL OR
      |      epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
      |    THEN 1 ELSE 0 END AS new_session
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |numbered AS (
      |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |    AS session_seq
      |  FROM flagged)
      |SELECT user_id, session_seq, min(ts) AS session_start,
      |  max(ts) AS session_end, count(*) AS n_events,
      |  round(sum(value), 2) AS total_value
      |FROM numbered GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** Sessionization, native form: Spark's `session_window` (gap-merge
    * semantics: a new session starts when the gap is >= 30 min — same
    * rule as the lag form above; the two queries must agree).
    */
  private def sessionWindow(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start")

  private val sessionWindowSql =
    """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL OR
      |      epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
      |    THEN 1 ELSE 0 END AS new_session
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |numbered AS (
      |  SELECT *, sum(new_session) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM flagged)
      |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
      |  round(sum(value), 2) AS total_value
      |FROM numbered GROUP BY user_id, session_seq
      |ORDER BY user_id, session_start""".stripMargin

  /** As-of join: each purchase picks up the user's latest click at or
    * before it (the transactions⋈price_usd date-join shape from SURVEY
    * §2.3, on the events fixture). Uses [[Joins.asofJoinLast]] — one
    * shuffle, no range join.
    */
  private def asofClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("ts").as("click_ts"))
    Joins.asofJoinLast(purchases, clicks, Seq("user_id"),
        leftTs = "ts", rightTs = "ts", valueCols = Seq("click_ts"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_click_ts").as("last_click_ts"),
        round((unix_micros(col("ts")) -
          unix_micros(col("asof_click_ts"))) / 1e6, 3).as("gap_s"))
      .orderBy("event_id")
  }

  private val asofClickSql =
    """SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
      |  CAST(c.ts AS TIMESTAMP) AS last_click_ts,
      |  round((epoch_us(CAST(p.ts AS TIMESTAMP))
      |    - epoch_us(CAST(c.ts AS TIMESTAMP))) / 1e6, 3) AS gap_s
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin

  /** Range join against a tiny in-memory band dimension — broadcast
    * nested-loop by construction (4 rows), never a shuffle.
    */
  private def valueBands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("low", 0.0, 10.0), ("mid", 10.0, 50.0),
      ("high", 50.0, 150.0), ("whale", 150.0, 1000.0))
      .toDF("band", "lo", "hi")
    events(spark, dir)
      .join(broadcast(bands),
        col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("band")
  }

  private val valueBandsSql =
    """SELECT b.band, count(*) AS n_events, round(sum(e.value), 2) AS total_value
      |FROM events e JOIN (VALUES ('low', 0.0, 10.0), ('mid', 10.0, 50.0),
      |  ('high', 50.0, 150.0), ('whale', 150.0, 1000.0)) b(band, lo, hi)
      |  ON e.value >= b.lo AND e.value < b.hi
      |GROUP BY b.band ORDER BY b.band""".stripMargin

  /** JSON prop extraction (SURVEY §2.8 F6): `props` is a JSON string;
    * `get_json_object` stays inside codegen — no UDF.
    */
  private def jsonProps(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), round(avg("k"), 4).as("avg_k"),
        max("k").as("max_k"))
      .orderBy("event_type")

  private val jsonPropsSql =
    """SELECT event_type, count(*) AS n_events,
      |  round(avg(CAST(props->>'$.k' AS INTEGER)), 4) AS avg_k,
      |  max(CAST(props->>'$.k' AS INTEGER)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("ev_tumbling_hourly", tumbling, Some(tumblingSql)),
    NamedQuery("ev_sliding_windows", sliding, Some(slidingSql)),
    NamedQuery("ev_sessionize", sessionize, Some(sessionizeSql)),
    NamedQuery("ev_session_window", sessionWindow, Some(sessionWindowSql)),
    NamedQuery("ev_asof_click", asofClick, Some(asofClickSql)),
    NamedQuery("ev_value_bands", valueBands, Some(valueBandsSql)),
    NamedQuery("ev_json_props", jsonProps, Some(jsonPropsSql)))
}
