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
  * `events.ts` normalizes to a session-zone (UTC) TimestampType via
  * [[Tables.eventTime]], whichever physical type the generator wrote
  * (TIMESTAMP(NANOS)-as-long or plain micros) — identical to DuckDB's
  * native read of the same file, so oracles compare exactly.
  */
object Events {

  /** The events table with `ts` as a proper TimestampType (UTC, µs). */
  def events(spark: SparkSession, dir: String): DataFrame =
    Tables.eventTime(Tables(spark, dir, "events"))

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

  /** The same purchase ⋈ last-click as-of join through the NATIVE
    * whole-operator path ([[Joins.asofJoinMerge]] → custom logical
    * node → injected planner strategy → sort-merge `AsOfJoinExec`),
    * sharing `ev_asof_click`'s DuckDB ASOF oracle — the two
    * implementations (union-window composition vs native merge) must
    * produce identical rows. At scale the native form shuffles each
    * side separately (clicks never carry purchase columns through the
    * exchange) and merges with O(1) state instead of window buffering.
    */
  private def asofNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("ts").as("click_ts"))
    Joins.asofJoinMerge(purchases, clicks, Seq("user_id"),
        leftTs = "ts", rightTs = "ts", valueCols = Seq("click_ts"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_click_ts").as("last_click_ts"),
        round((unix_micros(col("ts")) -
          unix_micros(col("asof_click_ts"))) / 1e6, 3).as("gap_s"))
      .orderBy("event_id")
  }

  /** Tolerance-bounded as-of join (pandas `merge_asof(tolerance=…)`
    * parity): the latest click counts only if it happened within 10
    * minutes of the purchase — older matches null out, exactly like a
    * quote gone stale. Pure composition: the same single-shuffle
    * [[Joins.asofJoinLast]], with the matched timestamp surfaced as a
    * value column and the tolerance applied as a post-projection — no
    * new operator, no extra exchange.
    */
  private def asofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val tolUs = 10L * 60 * 1000000
    val ev = events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("ts").as("click_ts"))
    val stale = unix_micros(col("ts")) -
      unix_micros(col("asof_click_ts")) > tolUs
    Joins.asofJoinLast(purchases, clicks, Seq("user_id"),
        leftTs = "ts", rightTs = "ts", valueCols = Seq("click_ts"))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(stale, lit(null)).otherwise(col("asof_click_ts"))
          .as("click_in_tol"),
        (col("asof_click_ts").isNotNull && !stale).as("attributed"))
      .orderBy("event_id")
  }

  private val asofToleranceSql =
    """SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
      |  CASE WHEN epoch_us(CAST(p.ts AS TIMESTAMP))
      |      - epoch_us(CAST(c.ts AS TIMESTAMP)) <= 600000000
      |    THEN CAST(c.ts AS TIMESTAMP) END AS click_in_tol,
      |  coalesce(epoch_us(CAST(p.ts AS TIMESTAMP))
      |      - epoch_us(CAST(c.ts AS TIMESTAMP)) <= 600000000, FALSE)
      |    AS attributed
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

  /** VARIANT ingestion — Spark 4's semi-structured type under the
    * exact gate: a nested JSON payload (synthesized from the event
    * columns, so the oracle can recompute the answer relationally)
    * parses ONCE to `VariantType` (`parse_json` — binary-encoded,
    * no per-access re-parse like repeated `get_json_object` string
    * scans) and typed paths extract with `variant_get`. The gate
    * proves the round-trip is lossless: doubles survive
    * to_json → parse_json → variant_get bit-exactly (shortest-repr
    * serialization), strings and ints likewise, and nested-path
    * extraction agrees with the flat columns the payload came from.
    * At 100 TB this is the ingest pattern for schemaless event
    * payloads: parse at the edge, keep VARIANT in the table, extract
    * typed columns at query time without a string in sight.
    */
  private def variantExtract(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("payload", to_json(struct(
        col("event_type").as("t"),
        col("value").as("v"),
        struct(col("user_id").as("id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
          .as("u"))))
      .withColumn("var", parse_json(col("payload")))
      .select(
        variant_get(col("var"), "$.t", "string").as("t"),
        variant_get(col("var"), "$.v", "double").as("v"),
        variant_get(col("var"), "$.u.id", "bigint").as("uid"),
        variant_get(col("var"), "$.u.k", "int").as("k"))
      .groupBy("t")
      .agg(count(lit(1)).as("n_events"),
        round(sum("v"), 2).as("total_value"),
        countDistinct("uid").as("n_users"),
        max("k").as("max_k"))
      .orderBy("t")

  private val variantExtractSql =
    """SELECT event_type AS t, count(*) AS n_events,
      |  round(sum(value), 2) AS total_value,
      |  count(DISTINCT user_id) AS n_users,
      |  max(CAST(props->>'$.k' AS INTEGER)) AS max_k
      |FROM events GROUP BY event_type ORDER BY t""".stripMargin

  /** Conversion funnel signup → click → purchase with strict temporal
    * order per user: a click counts only at-or-after the user's first
    * signup, a purchase only at-or-after the first qualifying click.
    *
    * Three stacked running-`min` windows over ONE partitioning
    * (user_id, ordered by ts): each stage's "first qualifying ts" is a
    * running min conditioned on the previous stage's column, so the
    * whole funnel is a single shuffle — no per-stage self-joins (the
    * naive form is k joins of the event table against itself). The
    * per-user flags then collapse in an ordinary two-level agg.
    */
  private def funnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_type")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("s1",
        min(when(col("event_type") === "signup", col("ts"))).over(w))
      .withColumn("c1", min(when(
        col("event_type") === "click" && col("s1").isNotNull,
        col("ts"))).over(w))
      .withColumn("p1", min(when(
        col("event_type") === "purchase" && col("c1").isNotNull,
        col("ts"))).over(w))
      .groupBy("user_id")
      .agg(max(col("s1").isNotNull).as("r1"),
        max(col("c1").isNotNull).as("r2"),
        max(col("p1").isNotNull).as("r3"))
      .agg(sum(when(col("r1"), 1L).otherwise(0L)).as("n_signup"),
        sum(when(col("r2"), 1L).otherwise(0L)).as("n_signup_click"),
        sum(when(col("r3"), 1L).otherwise(0L)).as("n_funnel_complete"))
  }

  private val funnelSql =
    """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events),
      |w1 AS (SELECT *, min(CASE WHEN event_type = 'signup' THEN ts END)
      |    OVER win AS s1
      |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_type
      |    ROWS UNBOUNDED PRECEDING)),
      |w2 AS (SELECT *, min(CASE WHEN event_type = 'click'
      |      AND s1 IS NOT NULL THEN ts END) OVER win AS c1
      |  FROM w1 WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_type
      |    ROWS UNBOUNDED PRECEDING)),
      |w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase'
      |      AND c1 IS NOT NULL THEN ts END) OVER win AS p1
      |  FROM w2 WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_type
      |    ROWS UNBOUNDED PRECEDING)),
      |u AS (SELECT user_id, max(s1 IS NOT NULL) AS r1,
      |    max(c1 IS NOT NULL) AS r2, max(p1 IS NOT NULL) AS r3
      |  FROM w3 GROUP BY user_id)
      |SELECT count(*) FILTER (WHERE r1) AS n_signup,
      |  count(*) FILTER (WHERE r2) AS n_signup_click,
      |  count(*) FILTER (WHERE r3) AS n_funnel_complete
      |FROM u""".stripMargin

  /** Daily cohort retention: cohort = a user's first active day; one
    * cell per (cohort, day-offset) counting distinct returning users.
    * The cohort day is a running window min (shuffle on user_id), the
    * distinct collapses (user, cohort, offset) before the final small
    * agg — at scale the wide shuffle carries one row per user-day, not
    * per event.
    */
  private def retention(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .withColumn("cohort", min("d").over(byUser))
      .select(col("user_id"), col("cohort"),
        datediff(col("d"), col("cohort")).cast("bigint").as("day_offset"))
      .distinct()
      .groupBy("cohort", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort", "day_offset")
  }

  private val retentionSql =
    """WITH f AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
      |  FROM events),
      |c AS (SELECT user_id, d,
      |    min(d) OVER (PARTITION BY user_id) AS cohort FROM f)
      |SELECT cohort, datediff('day', cohort, d) AS day_offset,
      |  count(DISTINCT user_id) AS n_users
      |FROM c GROUP BY cohort, day_offset
      |ORDER BY cohort, day_offset""".stripMargin

  /** Click-within-view attribution: every click inside the 1-hour
    * window opened by the same user's view events — a point-in-interval
    * join where BOTH sides grow with the data (contrast
    * `ev_value_bands`, whose interval side is a 4-row broadcast dim).
    * Uses [[Joins.pointInIntervalJoin]]: intervals replicate per
    * covered time bucket, the join is EQUI on (user, bucket) — one hash
    * shuffle instead of a quadratic theta-join, the 100 TB path.
    */
  private def clickInView(spark: SparkSession, dir: String): DataFrame = {
    val hourUs = 60L * 60 * 1000 * 1000
    val ev = events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("c_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("v_us"))
      .withColumn("v_end", col("v_us") + hourUs)
    Joins.pointInIntervalJoin(clicks, views, Seq("user_id"),
        pointCol = "c_us", startCol = "v_us", endCol = "v_end",
        bucketWidth = hourUs)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("click_id")).as("n_clicks"))
      .orderBy("user_id")
  }

  private val clickInViewSql =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events)
      |SELECT c.user_id, count(*) AS n_pairs,
      |  count(DISTINCT c.event_id) AS n_clicks
      |FROM (SELECT * FROM e WHERE event_type = 'click') c
      |JOIN (SELECT * FROM e WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id
      | AND c.us >= v.us AND c.us <= v.us + 3600000000
      |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin

  /** Path analysis: the 10 most common consecutive 3-event sequences.
    * One window shuffle on user_id (two `lead`s share the exchange),
    * then a partial+final count and a TakeOrderedAndProject top-k — the
    * grouped row count is |event_type|³ max, never corpus-sized.
    */
  private def topPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead("event_type", 1).over(w))
      .withColumn("e3", lead("event_type", 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(" > ", col("event_type"), col("e2"), col("e3"))
        .as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(10)
  }

  private val topPathsSql =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |    CAST(ts AS TIMESTAMP) AS ts FROM events),
      |seq AS (SELECT event_type AS e1,
      |    lead(event_type, 1) OVER win AS e2,
      |    lead(event_type, 2) OVER win AS e3
      |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT e1 || ' > ' || e2 || ' > ' || e3 AS path, count(*) AS n
      |FROM seq WHERE e3 IS NOT NULL
      |GROUP BY path ORDER BY n DESC, path LIMIT 10""".stripMargin

  /** Gap-filled hourly series with last-observation-carried-forward:
    * the time-series completion step every downstream model/report
    * needs (the zero-fill twin is `q_date_spine`; LOCF carries the
    * last KNOWN value instead). The fact table first shrinks to the
    * (hour, type) aggregate — calendar-bounded — so the spine
    * cross-join, the left join, and the per-type ordered fill all run
    * on relations sized by the calendar, never by event count; hours
    * with no observation emit n_events=0, is_gap=true, and the carried
    * value (NULL before a type's first observation, identically in
    * both engines).
    */
  private def locf(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val hourly = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("hour_value"))
    val spine = hourly.agg(min("h").as("lo"), max("h").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("h"))
      .crossJoin(ev.select("event_type").distinct())
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(hourly, Seq("h", "event_type"), "left")
      .withColumn("is_gap", col("n_events").isNull)
      .withColumn("filled_value",
        last(col("hour_value"), ignoreNulls = true).over(w))
      .select(col("h"), col("event_type"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("filled_value"), col("is_gap"))
      .orderBy("h", "event_type")
  }

  private val locfSql =
    """WITH agg AS (
      |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type,
      |    count(*) AS n_events, round(sum(value), 2) AS hour_value
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT unnest(generate_series(min(h), max(h),
      |    INTERVAL 1 HOUR)) AS h FROM agg),
      |spine AS (SELECT b.h, t.event_type FROM b,
      |  (SELECT DISTINCT event_type FROM events) t),
      |j AS (SELECT spine.h, spine.event_type, agg.n_events, agg.hour_value
      |      FROM spine LEFT JOIN agg
      |        ON spine.h = agg.h AND spine.event_type = agg.event_type)
      |SELECT h, event_type, coalesce(n_events, 0) AS n_events,
      |  last_value(hour_value IGNORE NULLS) OVER (
      |    PARTITION BY event_type ORDER BY h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
      |  n_events IS NULL AS is_gap
      |FROM j ORDER BY h, event_type""".stripMargin

  /** Linear interpolation across series gaps — LOCF's companion for
    * numeric series where a carried value biases downstream models
    * (a sensor that reported 10 then 20 across a 3-hour gap most
    * plausibly passed through ~13.3 and ~16.7, not 10-10): each
    * missing hour takes prev + (next − prev) · elapsed/gap between
    * its nearest observed neighbours. Same calendar-bounded spine
    * discipline as `ev_locf` (every window input is (hour, type)
    * rows, never events); the four neighbour lookups (prev/next
    * value and hour) share ONE event_type partitioning. Leading and
    * trailing gaps have only one neighbour and stay NULL — identical
    * convention in both engines. The interpolated value is emitted
    * RAW (no rounding): both engines compute the same IEEE double
    * from the same inputs with the same operation order, while
    * rounding it could split them at shortest-repr half boundaries.
    */
  private def interpolate(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val hourly = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(round(sum("value"), 2).as("hour_value"))
    val spine = hourly.agg(min("h").as("lo"), max("h").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("h"))
      .crossJoin(ev.select("event_type").distinct())
    val wPrev = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(0, Window.unboundedFollowing)
    def secs(c: org.apache.spark.sql.Column) =
      unix_timestamp(c).cast("double")
    spine.join(hourly, Seq("h", "event_type"), "left")
      .withColumn("pv", last(col("hour_value"), ignoreNulls = true)
        .over(wPrev))
      .withColumn("ph", last(when(col("hour_value").isNotNull, col("h")),
        ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("hour_value"), ignoreNulls = true)
        .over(wNext))
      .withColumn("nh", first(when(col("hour_value").isNotNull, col("h")),
        ignoreNulls = true).over(wNext))
      .withColumn("value_interp",
        when(col("hour_value").isNotNull, col("hour_value"))
          .otherwise(col("pv") + (col("nv") - col("pv"))
            * ((secs(col("h")) - secs(col("ph")))
              / (secs(col("nh")) - secs(col("ph"))))))
      .select(col("h"), col("event_type"), col("value_interp"),
        col("hour_value").isNull.as("is_gap"))
      .orderBy("h", "event_type")
  }

  private val interpolateSql =
    """WITH agg AS (
      |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type,
      |    round(sum(value), 2) AS hour_value
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT unnest(generate_series(min(h), max(h),
      |    INTERVAL 1 HOUR)) AS h FROM agg),
      |spine AS (SELECT b.h, t.event_type FROM b,
      |  (SELECT DISTINCT event_type FROM events) t),
      |j AS (SELECT spine.h, spine.event_type, agg.hour_value
      |      FROM spine LEFT JOIN agg
      |        ON spine.h = agg.h AND spine.event_type = agg.event_type),
      |n AS (SELECT h, event_type, hour_value,
      |  last_value(hour_value IGNORE NULLS) OVER wp AS pv,
      |  last_value(CASE WHEN hour_value IS NOT NULL THEN h END
      |    IGNORE NULLS) OVER wp AS ph,
      |  first_value(hour_value IGNORE NULLS) OVER wn AS nv,
      |  first_value(CASE WHEN hour_value IS NOT NULL THEN h END
      |    IGNORE NULLS) OVER wn AS nh
      |  FROM j WINDOW
      |    wp AS (PARTITION BY event_type ORDER BY h
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    wn AS (PARTITION BY event_type ORDER BY h
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT h, event_type,
      |  CASE WHEN hour_value IS NOT NULL THEN hour_value
      |       ELSE pv + (nv - pv)
      |         * ((CAST(epoch(h) AS DOUBLE) - CAST(epoch(ph) AS DOUBLE))
      |           / (CAST(epoch(nh) AS DOUBLE) - CAST(epoch(ph) AS DOUBLE)))
      |  END AS value_interp,
      |  hour_value IS NULL AS is_gap
      |FROM n ORDER BY h, event_type""".stripMargin

  /** Multi-touch linear attribution — the batch companion to the
    * streamed LAST-touch `st_click_attribution`: every click within
    * the 30-minute look-back of a purchase earns an equal 1/n share
    * of its value, reported as credited revenue per click event.
    * Credit is CONSERVED by construction (Σ credit = Σ value of
    * touched purchases — the invariant attribution must keep,
    * law-pinned in EventsSpec). Same interval equi-join shape as the
    * attribution stream (user equi-key + time band, never a pure
    * range join); the per-purchase touch count is one window over the
    * joined pairs, which are bounded by the look-back, not the event
    * history.
    */
  private def multiTouch(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"), col("value"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
        col("ts").as("c_ts"))
    val pairs = p.join(c, col("user_id") === col("c_user")
      && col("c_ts") <= col("p_ts")
      && col("c_ts") >= col("p_ts") - expr("interval 30 minutes"))
    val perPurchase = Window.partitionBy("p_id")
    pairs
      .withColumn("n_touch", count(lit(1)).over(perPurchase))
      .groupBy("c_id")
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value") / col("n_touch")), 2).as("credited_value"))
      .orderBy("c_id")
  }

  private val multiTouchSql =
    """WITH p AS (
      |  SELECT event_id AS p_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts,
      |    value
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id AS c_user, event_id AS c_id,
      |    CAST(ts AS TIMESTAMP) AS c_ts
      |  FROM events WHERE event_type = 'click'),
      |pairs AS (
      |  SELECT p.p_id, p.value, c.c_id
      |  FROM p JOIN c ON p.user_id = c.c_user
      |    AND c.c_ts <= p.p_ts
      |    AND c.c_ts >= p.p_ts - INTERVAL 30 MINUTE),
      |t AS (SELECT *, count(*) OVER (PARTITION BY p_id) AS n_touch
      |  FROM pairs)
      |SELECT c_id, count(*) AS n_purchases,
      |  round(sum(value / n_touch), 2) AS credited_value
      |FROM t GROUP BY c_id ORDER BY c_id""".stripMargin

  /** Time-weighted average value (TWAP — the quote-series aggregate a
    * price warehouse actually wants: a value that held for an hour
    * counts 3600× one that held a second): each observation is
    * weighted by its holding duration (until the next observation of
    * the same type; the last one has no duration and drops out, the
    * standard TWAP convention). One window shuffle on event_type for
    * the lead, folding straight into the grouped sum — the same
    * exchange serves both.
    */
  private def twap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .withColumn("dur",
        (unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
          .cast("double"))
      .filter(col("dur").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_obs"),
        round(sum(col("value") * col("dur")) / sum(col("dur")), 4)
          .as("twap"),
        round(avg("value"), 4).as("plain_avg"))
      .orderBy("event_type")
  }

  private val twapSql =
    """WITH d AS (
      |  SELECT event_type, value,
      |    CAST(epoch_us(lead(CAST(ts AS TIMESTAMP), 1) OVER (
      |        PARTITION BY event_type ORDER BY CAST(ts AS TIMESTAMP),
      |        event_id)
      |      - CAST(ts AS TIMESTAMP)) AS DOUBLE) AS dur
      |  FROM events)
      |SELECT event_type, count(*) AS n_obs,
      |  round(sum(value * dur) / sum(dur), 4) AS twap,
      |  round(avg(value), 4) AS plain_avg
      |FROM d WHERE dur IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Per-user event-transition matrix (first-order Markov counts):
    * P(next event type | current) from each user's time-ordered
    * stream — the navigation-analytics staple behind "what do users
    * do after X". One per-user lead() window (the same user-keyed
    * exchange every sessionization query pays), then counts shuffle
    * on the (from, to) pair — 5×5 here, type-domain-bounded at any
    * scale. Probabilities are floor-scaled ratios (round-half drift);
    * ties in simultaneous events are broken by event_id, matching the
    * oracle's window ORDER BY exactly.
    */
  private def transitions(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = events(spark, dir)
      .withColumn("to_type", lead("event_type", 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = org.apache.spark.sql.expressions.Window
      .partitionBy("from_type")
    pairs
      .withColumn("row_total", sum("n").over(totals))
      .select(col("from_type"), col("to_type"), col("n"),
        (floor(col("n") / col("row_total") * 1000000) / 1000000)
          .as("p"))
      .orderBy("from_type", "to_type")
  }

  private val transitionsSql =
    """WITH s AS (
      |  SELECT user_id, event_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
      |  FROM events),
      |p AS (SELECT event_type AS from_type, to_type, count(*) AS n
      |  FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  floor(n / (sum(n) OVER (PARTITION BY from_type)) * 1000000)
      |    / 1000000 AS p
      |FROM p ORDER BY from_type, to_type""".stripMargin

  /** CUSUM change-point detection — where did each event type's daily
    * volume shift level? The classic cumulative-sum statistic: with
    * daily counts c₁..cₙ (total T), the scaled deviation path
    * Sₖ = n·Σᵢ≤ₖcᵢ − k·T is exactly zero-mean, and its extreme |Sₖ|
    * marks the most likely level-shift boundary. Everything stays in
    * BIGINT — the path is integer by construction (no mean subtraction
    * in doubles), so argmax and magnitude are bit-identical across
    * engines; ties break to the earliest day. The fact fold is one
    * shuffle into calendar-sized (type, day) groups; the cumulative
    * walk and both totals ride ONE event_type partitioning over the
    * daily relation (≤ types × days rows — entity-sized, the
    * Analytics-module rule for global windows). At 100 TB this is the
    * monitoring query that pages the ingest on-call.
    */
  private def cusum(spark: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy("event_type")
    val walk = byType.orderBy("day")
    val daily = events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    daily
      .withColumn("cum", sum("c").over(
        walk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("k", row_number().over(walk))
      .withColumn("n_days", count(lit(1)).over(byType))
      .withColumn("total", sum("c").over(byType))
      .withColumn("dev",
        abs(col("n_days") * col("cum") - col("k") * col("total")))
      .withColumn("pick",
        row_number().over(byType.orderBy(col("dev").desc, col("day"))))
      .filter(col("pick") === 1)
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("change_day"),
        col("dev").as("max_abs_dev"), col("n_days"), col("total"))
      .orderBy("event_type")
  }

  private val cusumSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |walk AS (
      |  SELECT event_type, day, c,
      |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY day) AS BIGINT) AS k,
      |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
      |      AS n_days,
      |    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT)
      |      AS total
      |  FROM daily),
      |dev AS (SELECT *, abs(n_days * cum - k * total) AS dev FROM walk),
      |pick AS (SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY dev DESC, day) AS pick FROM dev)
      |SELECT event_type, strftime(day, '%Y-%m-%d') AS change_day,
      |  dev AS max_abs_dev, n_days, total
      |FROM pick WHERE pick = 1 ORDER BY event_type""".stripMargin

  /** Lag-feature matrix — the feature-engineering pass in front of
    * every tabular/sequence model: per (user, active day), the
    * trailing-activity features a trainer consumes (previous active
    * day's count, gap since it, calendar-true 7-day rolling totals).
    * ALL features ride ONE user_id partitioning over the (user, day)
    * relation: the row-frame lag/gap and the RANGE-frame 7-day windows
    * share the same sort — one shuffle, one sort, four features (the
    * rolling frame is RANGE over the integer day index, so calendar
    * gaps are handled by the frame itself — a ROWS frame would
    * silently count 7 ACTIVE days, a classic leakage-adjacent bug).
    * Everything is integer arithmetic end to end — counts, day
    * indices, gaps — so the gate compares exactly, no rounding needed.
    * At 100 TB the per-day pre-aggregate (this plan's first fold) is
    * what keeps the window input user-day-sized, never event-sized.
    */
  private def lagFeatures(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("x")
    val roll7 = byUser.rangeBetween(-6, 0)
    events(spark, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("x",
        datediff(col("day"), lit("2024-01-01")).cast("long"))
      .withColumn("n_lag1", lag("n", 1).over(byUser))
      .withColumn("gap_days", col("x") - lag("x", 1).over(byUser))
      .withColumn("roll7_n", sum("n").over(roll7))
      .withColumn("active_in_7", count(lit(1)).over(roll7))
      .select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n"), col("n_lag1"), col("gap_days"), col("roll7_n"),
        col("active_in_7"))
      .orderBy("user_id", "day")
  }

  private val lagFeaturesSql =
    """WITH ud AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n,
      |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2, 4)
      |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, n,
      |  lag(n, 1) OVER w AS n_lag1,
      |  x - lag(x, 1) OVER w AS gap_days,
      |  CAST(sum(n) OVER r AS BIGINT) AS roll7_n,
      |  CAST(count(*) OVER r AS BIGINT) AS active_in_7
      |FROM ud
      |WINDOW w AS (PARTITION BY user_id ORDER BY x),
      |  r AS (PARTITION BY user_id ORDER BY x
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, day""".stripMargin

  /** Exponentially-weighted trailing value per event type — EWMA with
    * α = 1/2 (half-life one day), the smoothing every monitoring /
    * forecasting stack runs (pandas `ewm`, Prometheus-style decay) but
    * in arithmetic the hash gate can compare EXACTLY. The trick:
    * α = 1/2 makes every weight a power of two, so the whole fold
    * lives in Q20 fixed point — for anchor day d,
    * N_d = Σ_{k=0..19} cents_{d−k} · 2^(19−k) is a BIGINT (weights are
    * left-shifts, inputs are integer cents), and the estimate is one
    * integer division N_d div 2^20 = Σ cents_{d−k} · 2^−(k+1) floored
    * to whole cents — bit-identical in any engine, where the float
    * recurrence s_d = x_d/2 + s_{d−1}/2 would drift by summation
    * order. Support truncates at 20 days (weight < 1e−6 beyond —
    * below one cent for any daily total under $10k).
    *
    * Scale shape: the fact table folds ONCE into the calendar-sized
    * daily relation (types × days); the 20-day support is an explicit
    * bounded-range self-join of that tiny relation (≤20× fan-out of
    * calendar rows, never of events) — the same
    * global-windows-only-over-pre-aggregates rule as `q_moving_avg`,
    * chosen over a RANGE window because the weight depends on the
    * anchor−source gap, which a windowed SUM of a precomputed column
    * cannot express without 2^day factors that overflow past day 43.
    */
  private def ewma(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val anchors = daily.select(col("event_type"), col("day").as("d"))
    val sources = daily.select(col("event_type"),
      col("day").as("src_day"), col("cents"))
    anchors.join(sources, "event_type")
      .filter(datediff(col("d"), col("src_day")).between(0, 19))
      .withColumn("w",
        expr("shiftleft(1L, 19 - datediff(d, src_day))"))
      .groupBy(col("event_type"), col("d"))
      .agg(sum(col("cents") * col("w")).as("n_fixed"),
        count(lit(1)).as("n_days"))
      .select(col("event_type"),
        date_format(col("d"), "yyyy-MM-dd").as("day"),
        expr("n_fixed div 1048576").as("ewma_cents"), col("n_days"))
      .orderBy("event_type", "day")
  }

  private val ewmaSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM events GROUP BY 1, 2)
      |SELECT a.event_type, strftime(a.day, '%Y-%m-%d') AS day,
      |  CAST(sum(b.cents * (CAST(1 AS BIGINT)
      |      << (19 - date_diff('day', b.day, a.day)))) AS BIGINT)
      |    // 1048576 AS ewma_cents,
      |  CAST(count(*) AS BIGINT) AS n_days
      |FROM daily a JOIN daily b
      |  ON a.event_type = b.event_type
      |  AND date_diff('day', b.day, a.day) BETWEEN 0 AND 19
      |GROUP BY a.event_type, a.day
      |ORDER BY a.event_type, day""".stripMargin

  /** Sequence-pattern matching over per-user event TAPES — the
    * MATCH_RECOGNIZE gap (Spark has no row-pattern clause): each
    * user's time-ordered event-type initials concatenate into one
    * string (initials are unique across this domain: c/s/e/v/p), and
    * "view, then click, then purchase, with no error in between"
    * becomes the regex `v[^e]*?c[^e]*?p` counted per tape. LAZY
    * quantifiers on BOTH sides — greedy `[^e]*` could jump a later
    * 'c' after backtracking, and while both engines implement Perl
    * leftmost semantics, the lazy form makes the match extents
    * obviously canonical (earliest continuation, non-overlapping
    * scan). Result is the matches-per-user histogram. Scale: one
    * user-keyed sort-aggregate builds tapes (bounded by per-user
    * activity — sessionize first if users are unbounded); the regex
    * runs once per tape inside codegen; the histogram is
    * value-bounded.
    */
  private def patternMatch(spark: SparkSession, dir: String): DataFrame = {
    val tape = events(spark, dir)
      .groupBy("user_id")
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("ch")))),
        x => x.getField("ch"))).as("tape"))
    tape
      .withColumn("n_matches",
        size(expr("regexp_extract_all(tape, 'v[^e]*?c[^e]*?p', 0)"))
          .cast("long"))
      .groupBy("n_matches")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("n_matches")
  }

  private val patternMatchSql =
    """WITH tape AS (
      |  SELECT user_id,
      |    string_agg(substr(event_type, 1, 1), ''
      |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS tape
      |  FROM events GROUP BY user_id),
      |m AS (SELECT user_id,
      |    CAST(len(regexp_extract_all(tape, 'v[^e]*?c[^e]*?p'))
      |      AS BIGINT) AS n_matches
      |  FROM tape)
      |SELECT n_matches, CAST(count(*) AS BIGINT) AS n_users
      |FROM m GROUP BY n_matches ORDER BY n_matches""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("ev_pattern_match", patternMatch, Some(patternMatchSql)),
    NamedQuery("ev_ewma", ewma, Some(ewmaSql)),
    NamedQuery("ev_lag_features", lagFeatures, Some(lagFeaturesSql)),
    NamedQuery("ev_cusum", cusum, Some(cusumSql)),
    NamedQuery("ev_transitions", transitions, Some(transitionsSql)),
    NamedQuery("ev_twap", twap, Some(twapSql)),
    NamedQuery("ev_locf", locf, Some(locfSql)),
    NamedQuery("ev_interpolate", interpolate, Some(interpolateSql)),
    NamedQuery("ev_multi_touch", multiTouch, Some(multiTouchSql)),
    NamedQuery("ev_funnel", funnel, Some(funnelSql)),
    NamedQuery("ev_retention", retention, Some(retentionSql)),
    NamedQuery("ev_click_in_view", clickInView, Some(clickInViewSql)),
    NamedQuery("ev_top_paths", topPaths, Some(topPathsSql)),
    NamedQuery("ev_tumbling_hourly", tumbling, Some(tumblingSql)),
    NamedQuery("ev_sliding_windows", sliding, Some(slidingSql)),
    NamedQuery("ev_sessionize", sessionize, Some(sessionizeSql)),
    NamedQuery("ev_session_window", sessionWindow, Some(sessionWindowSql)),
    NamedQuery("ev_asof_click", asofClick, Some(asofClickSql)),
    NamedQuery("ev_asof_native", asofNative, Some(asofClickSql)),
    NamedQuery("ev_asof_tolerance", asofTolerance, Some(asofToleranceSql)),
    NamedQuery("ev_value_bands", valueBands, Some(valueBandsSql)),
    NamedQuery("ev_json_props", jsonProps, Some(jsonPropsSql)),
    NamedQuery("ev_variant_extract", variantExtract,
      Some(variantExtractSql)))
}
