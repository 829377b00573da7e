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

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("st_tumbling_hourly", Streams.tumblingViaStream,
      Some(Events.tumblingSql)),
    NamedQuery("st_dedup_events", Streams.dedupeViaStream, Some(dedupSql)))
}
