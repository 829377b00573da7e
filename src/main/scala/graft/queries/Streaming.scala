package graft.queries

import graft.streaming.Streams

/** Driver-facing queries that execute through the Structured Streaming
  * engine end-to-end (file-source stream → stateful transform → sink →
  * batch read-back), so the correctness gate exercises the streaming
  * path itself — each has a plain-SQL oracle because the streamed
  * result must equal its batch twin.
  */
object Streaming {

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

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("st_tumbling_hourly", Streams.tumblingViaStream,
      Some(Events.tumblingSql)),
    NamedQuery("st_dedup_events", Streams.dedupeViaStream, Some(dedupSql)),
    NamedQuery("st_click_attribution", Streams.attributionViaStream,
      Some(attributionSql)),
    NamedQuery("st_scd2_merge", Streams.scd2ViaStream,
      Some(Scale.scd2MergeSql)))
}
