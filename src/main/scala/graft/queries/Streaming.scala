package graft.queries

import graft.streaming.Streams

/** Driver-facing queries that execute through the Structured Streaming
  * engine end-to-end (file-source stream → stateful transform → sink →
  * batch read-back), so the correctness gate exercises the streaming
  * path itself — each has a plain-SQL oracle because the streamed
  * result must equal its batch twin.
  */
object Streaming {

  private val tumblingSql =
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws, event_type,
      |  count(*) AS n_events, round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin

  private val dedupSql =
    """SELECT event_id, user_id, event_type, value
      |FROM events ORDER BY event_id""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("st_tumbling_hourly", Streams.tumblingViaStream,
      Some(tumblingSql)),
    NamedQuery("st_dedup_events", Streams.dedupeViaStream, Some(dedupSql)))
}
