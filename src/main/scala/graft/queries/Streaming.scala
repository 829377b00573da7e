package graft.queries

import graft.functions.TextAnalysis
import graft.streaming.Streams

/** Driver-facing queries that execute through the Structured Streaming
  * engine end-to-end (file-source stream → stateful transform → sink →
  * batch read-back), so the correctness gate exercises the streaming
  * path itself — each has a plain-SQL oracle because the streamed
  * result must equal its batch twin.
  */
object Streaming {

  /** Batch twin of the sink streaming tail: everything drained across
    * both AvailableNow runs must equal the raw F∪P order slice —
    * a replayed version would double its counts.
    */
  private val sinkTailSql =
    """SELECT o_orderstatus AS status, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents,
      |  CAST(max(CAST(o_orderdate AS DATE)) AS VARCHAR) AS last_day
      |FROM orders WHERE o_orderstatus IN ('F', 'P')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** The rate-limited backfill must deliver the FULL table exactly
    * once, however many bounded batches the cap split it into.
    */
  private val sinkBackfillSql =
    """SELECT o_orderstatus AS status, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Batch twin of the streamed-into-sink aggregate: the final sink
    * table under complete mode must BE the full-events aggregate —
    * an epoch replay or a stale version surviving would break it.
    */
  private val sinkPipeSql =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Batch twin of the streaming daily leaderboard: same day × user
    * aggregate, same deterministic tie-break (rounded total desc, user
    * asc), top 3 per day.
    */
  private val leaderboardSql =
    """WITH agg AS (
      |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
      |      AS day, user_id,
      |    count(*) AS n_events, round(sum(value), 2) AS total_value
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER (PARTITION BY day
      |    ORDER BY total_value DESC, user_id) AS rank FROM agg)
      |SELECT strftime(day, '%Y-%m-%d') AS day, user_id, n_events,
      |  total_value, rank
      |FROM r WHERE rank <= 3 ORDER BY day, rank""".stripMargin

  /** Batch twin of the dynamic-gap sessions: interval merging as a
    * running-max-of-ends boundary flag + cumulative session id, then
    * per-session aggregates; restricted to sessions provably closed
    * under the final watermark (end <= max(ts) − 1 h).
    */
  private val dynamicSessionSql =
    """WITH e AS (SELECT user_id, value, CAST(ts AS TIMESTAMP) AS ts,
      |    CASE WHEN event_type = 'purchase' THEN INTERVAL 15 MINUTE
      |      ELSE INTERVAL 30 MINUTE END AS gap FROM events),
      |x AS (SELECT *, ts + gap AS e_end FROM e),
      |f AS (SELECT *, CASE WHEN max(e_end) OVER w IS NULL
      |      OR ts >= max(e_end) OVER w THEN 1 ELSE 0 END AS new_s
      |  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS UNBOUNDED PRECEDING) AS sid FROM f),
      |g AS (SELECT user_id, min(ts) AS s_start, max(e_end) AS s_end,
      |    count(*) AS n_events, round(sum(value), 2) AS total_value
      |  FROM s GROUP BY user_id, sid),
      |mx AS (SELECT max(ts) - INTERVAL 1 HOUR AS m FROM e)
      |SELECT s_start, s_end, user_id, n_events, total_value FROM g
      |WHERE s_end <= (SELECT m FROM mx)
      |ORDER BY user_id, s_start""".stripMargin

  /** Batch twin of the chained dedup→window plan: hourly aggregate over
    * DISTINCT events, restricted to provably-final windows (window end
    * at or below max(ts) − 1 h watermark − 30 min margin).
    */
  private val dedupWindowSql =
    """WITH d AS (SELECT DISTINCT event_id, event_type, value,
      |    CAST(ts AS TIMESTAMP) AS ts FROM events),
      |mx AS (SELECT max(ts) - INTERVAL 90 MINUTE AS m FROM d)
      |SELECT date_trunc('hour', ts) AS ws, event_type,
      |  count(*) AS n_events, round(sum(value), 2) AS total_value
      |FROM d
      |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= (SELECT m FROM mx)
      |GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin

  /** Batch twin of the transformWithState running totals: same
    * (ts, event_id) fold order, money in exact integer cents so the
    * running value is fold-order-independent.
    */
  private val twsRunningSql =
    """SELECT event_id, user_id,
      |  row_number() OVER w AS seq,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w
      |    AS BIGINT) AS total_cents
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Batch truth for the state-store audit: the streaming dedup must
    * hold exactly one state row per distinct event id.
    */
  private val stateInspectSql =
    """SELECT count(DISTINCT event_id) AS n_state_keys,
      |  min(event_id) AS min_key, max(event_id) AS max_key
      |FROM events""".stripMargin

  /** Batch truth for the streamed transactional publish: the summary at
    * the latest committed transaction equals the one-shot aggregate.
    */
  private val txPublishSql =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Full-history running totals restricted to the streamed (post-
    * cutoff) region: sequence numbers must continue the historical
    * count across the batch/stream seam.
    */
  private val twsBootstrapSql =
    """WITH e AS (SELECT event_id, user_id, value,
      |    CAST(ts AS TIMESTAMP) AS ts FROM events),
      |w AS (SELECT event_id, user_id, ts,
      |    row_number() OVER win AS seq,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER win
      |      AS BIGINT) AS total_cents
      |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id, seq, total_cents FROM w
      |WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
      |ORDER BY event_id""".stripMargin

  private val dedupSql =
    """SELECT event_id, user_id, event_type, value
      |FROM events ORDER BY event_id""".stripMargin

  /** Batch twin of the stream-stream interval join: every purchase
    * paired with the same user's clicks in the preceding 30 minutes.
    * Timestamps are compared at µs (the CAST truncates ns → µs exactly
    * like the Spark-side `ts div 1000`).
    */
  private val attributionSql =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, value,
      |    CAST(ts AS TIMESTAMP) AS ts
      |  FROM events)
      |SELECT p.event_id, p.user_id, p.ts AS p_ts, c.ts AS c_ts, p.value
      |FROM e p JOIN e c
      |  ON p.user_id = c.user_id
      | AND p.event_type = 'purchase' AND c.event_type = 'click'
      | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
      |ORDER BY p.event_id, c.ts""".stripMargin

  /** Batch twin of the LEFT OUTER interval join, restricted to the
    * provably-final region (`p_ts <= max(ts) − 3 h` — see
    * `Streams.attributionOuterViaStream` for why the watermark tail is
    * excluded on BOTH sides).
    */
  private val attributionOuterSql =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, value,
      |    CAST(ts AS TIMESTAMP) AS ts
      |  FROM events),
      |mx AS (SELECT least(
      |    (SELECT max(ts) FROM e WHERE event_type = 'purchase')
      |      - INTERVAL 1 HOUR,
      |    (SELECT max(ts) FROM e WHERE event_type = 'click')
      |      - INTERVAL 2 HOUR) - INTERVAL 30 MINUTE AS m)
      |SELECT p.event_id, p.user_id, p.ts AS p_ts, c.ts AS c_ts, p.value
      |FROM e p LEFT JOIN e c
      |  ON p.user_id = c.user_id
      | AND c.event_type = 'click'
      | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
      |WHERE p.event_type = 'purchase'
      |  AND p.ts <= (SELECT m FROM mx)
      |ORDER BY p.event_id, c.ts""".stripMargin

  /** Batch twin of the streamed curation gates: every gate is a pure
    * function of the document, so the stream over the same corpus must
    * agree row-for-row — the oracle recomputes quality, lang-id, and
    * the deterministic split in plain SQL and aggregates identically.
    */
  private val curationSql = {
    val sets = TextAnalysis.langStopwords.map { case (l, ws) =>
      l -> ws.map(w => s"'$w'").mkString("[", ",", "]")
    }
    val scores = sets.map { case (l, arr) =>
      s"len(list_intersect(toks, $arr)) AS s_$l"
    }.mkString(",\n    ")
    val langs = sets.map(_._1)
    val m = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
    val bucket = "CAST(('0x' || substr(md5('split-v1:' || " +
      "CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
    s"""WITH base AS (
       |  SELECT doc_id, n_chars,
       |    list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS toks,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |      ELSE len(string_split_regex(lower(trim(text)), '\\s+')) END AS n_tokens,
       |    CASE WHEN length(text) = 0 THEN 0.0
       |      ELSE (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE
       |        / length(text) END AS praw,
       |    $bucket AS bucket
       |  FROM documents),
       |enriched AS (
       |  SELECT doc_id, n_chars, bucket, n_tokens, praw,
       |    CASE WHEN len(toks) = 0 THEN 0.0
       |      ELSE len(list_intersect(toks,
       |        ['the','a','an','and','or','of','to','in','is','it']))::DOUBLE
       |        / len(toks) END AS sraw,
       |    $scores
       |  FROM base),
       |scored AS (
       |  SELECT doc_id, n_chars, bucket,
       |    floor((least(n_tokens::DOUBLE / 100.0, 1.0::DOUBLE) * 0.4::DOUBLE
       |      + (1.0::DOUBLE - praw) * 0.3::DOUBLE
       |      + sraw * 0.3::DOUBLE) * 10000) / 10000 AS quality,
       |    $m AS m,
       |    CASE WHEN $m = 0 THEN 'und' $cases ELSE 'und' END AS lang_pred
       |  FROM enriched)
       |SELECT
       |  CASE WHEN bucket < 80 THEN 'train'
       |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
       |  lang_pred, count(*) AS n_docs,
       |  round(avg(quality), 3) AS avg_quality,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM scored
       |WHERE quality >= 0.5 AND lang_pred <> 'und'
       |GROUP BY 1, 2 ORDER BY split, lang_pred""".stripMargin
  }

  /** Batch twin of the stream-static enrichment join. */
  private val enrichSql =
    """SELECT b.category, count(*) AS n_events,
      |  round(sum(e.value), 2) AS total_value
      |FROM events e JOIN (VALUES ('click', 'engagement'),
      |  ('view', 'engagement'), ('signup', 'acquisition'),
      |  ('purchase', 'revenue'), ('error', 'ops')) b(event_type, category)
      |  ON e.event_type = b.event_type
      |GROUP BY b.category ORDER BY b.category""".stripMargin

  /** Batch twin of the streamed prefix anomaly scorer: per-user
    * exclusive-prefix moments in (ts, event_id) order. The stream's
    * Welford fold and the window aggregate see the same value sequence
    * in the same order; z is floor-truncated identically on both
    * sides.
    */
  private val anomalySql =
    """WITH w AS (
      |  SELECT event_id, user_id, event_type, value,
      |    count(value) OVER pre AS n_prev,
      |    avg(value) OVER pre AS mu,
      |    stddev_samp(value) OVER pre AS sigma
      |  FROM events
      |  WINDOW pre AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT event_id, user_id, event_type, value, n_prev,
      |  floor(abs((value - mu) / sigma) * 1e4) / 1e4 AS z
      |FROM w
      |WHERE n_prev >= 10 AND sigma > 0
      |  AND floor(abs((value - mu) / sigma) * 1e4) / 1e4 >= 3.0
      |ORDER BY event_id""".stripMargin

  /** Batch twin of the streamed rate limiter: the first 3 events per
    * (user, day) in (ts, event_id) order.
    */
  private val rateLimitSql =
    """SELECT event_id, user_id, day, event_type FROM (
      |  SELECT event_id, user_id,
      |    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day, event_type,
      |    row_number() OVER (
      |      PARTITION BY user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')
      |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rk
      |  FROM events)
      |WHERE rk <= 3 ORDER BY event_id""".stripMargin

  /** Batch twin of the streamed histogram-quantile ingest: identical
    * frozen-domain binning and ceil(q·n) cumulative crossing in
    * DuckDB — bin arithmetic is deterministic, so the streamed sketch
    * is fully oracle-checked (the approximation error itself is the
    * quantile family's construction bound, pinned for
    * `q_quantile_merge` in tolerance_check).
    */
  private val quantileStreamSql =
    """WITH dom AS (SELECT min(value) AS lo,
      |    (max(value) - min(value)) / 4095 AS w FROM events),
      |b AS (SELECT event_type, floor((value - lo) / w) AS bin,
      |    count(*) AS cnt
      |  FROM events, dom GROUP BY 1, 2),
      |c AS (SELECT event_type, bin, cnt,
      |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
      |    sum(cnt) OVER (PARTITION BY event_type) AS n
      |  FROM b),
      |sel AS (SELECT event_type, max(n) AS n,
      |    min(CASE WHEN cum >= ceil(0.5 * n) THEN bin END) AS b50,
      |    min(CASE WHEN cum >= ceil(0.95 * n) THEN bin END) AS b95
      |  FROM c GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n,
      |  round(lo + (b50 + 1) * w, 2) AS p50_hist,
      |  round(lo + (b95 + 1) * w, 2) AS p95_hist
      |FROM sel, dom ORDER BY event_type""".stripMargin

  /** Batch twin of the resumed incremental ingest: the two resumed
    * AvailableNow passes must append, between them, exactly the rows
    * the one-shot batch filter finds over the full events table.
    */
  private val resumeSql =
    """SELECT event_id, user_id, value FROM events
      |WHERE event_type = 'purchase' AND value >= 100
      |ORDER BY event_id""".stripMargin

  /** Batch twin of the streamed summary maintenance: the incrementally
    * folded summary must equal the one-shot aggregate.
    */
  private val summaryMaintSql =
    """SELECT l_returnflag, l_linenumber,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_price,
      |  count(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag, l_linenumber
      |ORDER BY l_returnflag, l_linenumber""".stripMargin

  /** Batch twin of the dead-letter fan-out: per-sink/per-reason row
    * accounting must be lossless (main + dlq = input).
    */
  private val dlqSql =
    """SELECT 'dlq' AS sink, 'low_value' AS reason,
      |  count(*) AS n, CAST(NULL AS DOUBLE) AS sum_value
      |FROM events WHERE value < 5
      |UNION ALL
      |SELECT 'main', 'kept', count(*), round(sum(value), 2)
      |FROM events WHERE value >= 5
      |ORDER BY sink, reason""".stripMargin

  private val bitmapStreamSql =
    """SELECT event_type,
      |  CAST(count(DISTINCT strftime(CAST(ts AS TIMESTAMP),
      |    '%Y-%m-%d')) AS BIGINT) AS n_partials,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Batch twin of the per-trigger replicated table: the replica must
    * hold exactly the full order slice — a sync that dropped a batch,
    * copied one twice, or blended two source versions breaks it.
    */
  private val cloneSyncStSql =
    """SELECT o_orderstatus AS status, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("st_clone_sync", Streams.cloneSyncViaStream,
      Some(cloneSyncStSql)),
    NamedQuery("st_dlq", Streams.dlqViaStream, Some(dlqSql)),
    NamedQuery("st_summary_maint", Streams.summaryMaintViaStream,
      Some(summaryMaintSql)),
    NamedQuery("st_resume", Streams.resumeViaStream, Some(resumeSql)),
    NamedQuery("st_quantile", Streams.quantileViaStream,
      Some(quantileStreamSql)),
    NamedQuery("st_rate_limit", Streams.rateLimitViaStream,
      Some(rateLimitSql)),
    NamedQuery("st_anomaly", Streams.anomalyViaStream, Some(anomalySql)),
    NamedQuery("st_enrich", Streams.enrichViaStream, Some(enrichSql)),
    NamedQuery("st_curation", Streams.curationViaStream, Some(curationSql)),
    NamedQuery("st_tumbling_hourly", Streams.tumblingViaStream,
      Some(Events.tumblingSql)),
    NamedQuery("st_leaderboard", Streams.leaderboardViaStream,
      Some(leaderboardSql)),
    NamedQuery("st_tws_running", Streams.runningTotalsViaStream,
      Some(twsRunningSql)),
    NamedQuery("st_state_inspect", Streams.stateInspectViaStream,
      Some(stateInspectSql)),
    NamedQuery("st_attr_outer", Streams.attributionOuterViaStream,
      Some(attributionOuterSql)),
    NamedQuery("st_dedup_window", Streams.dedupWindowViaStream,
      Some(dedupWindowSql)),
    NamedQuery("st_session_dynamic", Streams.dynamicSessionViaStream,
      Some(dynamicSessionSql)),
    NamedQuery("st_tws_bootstrap", Streams.runningTotalsBootstrapViaStream,
      Some(twsBootstrapSql)),
    NamedQuery("st_tx_publish", Streams.txPublishSummary,
      Some(txPublishSql)),
    NamedQuery("st_sink_tail", Streams.sinkTailSummary,
      Some(sinkTailSql)),
    NamedQuery("st_sink_backfill", Streams.sinkBackfillSummary,
      Some(sinkBackfillSql)),
    NamedQuery("st_sink_pipe", Streams.sinkPipeSummary,
      Some(sinkPipeSql)),
    NamedQuery("st_dedup_events", Streams.dedupeViaStream, Some(dedupSql)),
    NamedQuery("st_click_attribution", Streams.attributionViaStream,
      Some(attributionSql)),
    NamedQuery("st_scd2_merge", Streams.scd2ViaStream,
      Some(Scale.scd2MergeSql)),
    NamedQuery("st_moments", Streams.momentsViaStream,
      Some(Scale.momentsMergeSql)),
    NamedQuery("st_bitmap", Streams.bitmapViaStream,
      Some(bitmapStreamSql)),
    // no SQL oracle (sketch estimates aren't SQL-expressible);
    // ToleranceCheck pins the streamed estimates ≡ q_hll_sliding's
    NamedQuery("st_sliding_distinct", Streams.slidingDistinctViaStream,
      None))
}
