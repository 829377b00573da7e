package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

import graft.model.TableSpec

/** Connection settings for the live Dune REST tier. Credentials come
  * from configuration/environment ONLY — the reference hardcodes its
  * API key in source (`utils/utils.py`, documented by location in
  * SURVEY §0 and deliberately not reproduced); here a missing key is a
  * loud construction-time error, never a baked-in default.
  *
  * @param baseUrl API root (production `https://api.dune.com`; specs
  *                point it at an in-process localhost stub — the
  *                protocol is identical either way)
  * @param pollIntervalMillis wait between result polls (reference
  *                           default 5 s, `dune_extractor.py:27-36`)
  * @param maxWaitMillis total polling budget before TimeoutException
  *                      (reference default 300 s,
  *                      `dune_extractor.py:69-86`)
  */
final case class DuneRestConfig(
    baseUrl: String,
    apiKey: String,
    pollIntervalMillis: Long = 5000L,
    maxWaitMillis: Long = 300000L)

object DuneRestConfig {
  /** Environment resolution: `DUNE_API_KEY` (required),
    * `DUNE_API_BASE_URL` (optional override for stubs/proxies).
    */
  def fromEnv(env: String => Option[String] = sys.env.get): DuneRestConfig =
    DuneRestConfig(
      baseUrl = env("DUNE_API_BASE_URL").getOrElse("https://api.dune.com"),
      apiKey = env("DUNE_API_KEY").getOrElse(sys.error(
        "DUNE_API_KEY is not set; the Dune REST tier takes credentials " +
          "from the environment only")))
}

/** The query failed server-side (`state = QUERY_STATE_FAILED`). */
final class DuneQueryFailedException(message: String)
  extends RuntimeException(s"Query execution failed: $message")

/** Polling exceeded [[DuneRestConfig.maxWaitMillis]]. */
final class DunePollTimeoutException(maxWaitMillis: Long)
  extends RuntimeException(
    s"Query polling timed out after ${maxWaitMillis / 1000} seconds")

/** Live REST client for the Dune execute+poll protocol — the driver-side
  * HTTP tier behind the [[Source]] seam (reference:
  * `dune_extractor.py:44-107`).
  *
  *  - `executeQuery` POSTs `/api/v1/query/{id}/execute` with the
  *    `X-Dune-API-Key` header; an optional watermark ships as the
  *    `{"query_parameters": {"date": ...}}` body — the server-side
  *    delta filter (`dune_extractor.py:57-59`).
  *  - `pollResults` GETs `/api/v1/execution/{id}/results` every
  *    `pollIntervalMillis` until `QUERY_STATE_COMPLETED` (returns
  *    `result.rows`), `QUERY_STATE_FAILED` (raises with the server's
  *    error message), or the `maxWaitMillis` budget lapses (raises
  *    timeout — checked BEFORE each request, like the reference's
  *    loop-top check at `dune_extractor.py:84-86`).
  *
  * The client is driver-side by design: the reference's protocol
  * materializes the full result in one response, so this tier is for
  * control-plane-sized pulls (the five warehouse queries). The
  * fixture-replay [[DuneDataSource]] DSv2 connector is the scale path —
  * partitioned scan, pushed filters — and shares the same seam.
  */
class DuneRestClient(config: DuneRestConfig,
    sleeper: Long => Unit = Thread.sleep,
    clock: () => Long = () => System.currentTimeMillis()) {
  private val mapper = new ObjectMapper()
  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(30)).build()

  private def request(builder: HttpRequest.Builder): String = {
    val req = builder
      .header("X-Dune-API-Key", config.apiKey)
      .header("Content-Type", "application/json")
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2) throw new java.io.IOException(
      s"Dune API ${req.uri()} returned HTTP ${resp.statusCode()}: " +
        resp.body().take(200))
    resp.body()
  }

  /** Returns the execution id for polling. */
  def executeQuery(queryId: Long, dateParameter: Option[String]): String = {
    val payload = dateParameter.fold("{}") { d =>
      s"""{"query_parameters": {"date": ${graft.Json.quote(d)}}}"""
    }
    val body = request(HttpRequest.newBuilder()
      .uri(URI.create(s"${config.baseUrl}/api/v1/query/$queryId/execute"))
      .POST(HttpRequest.BodyPublishers.ofString(payload)))
    val node = mapper.readTree(body)
    Option(node.get("execution_id")).map(_.asText()).getOrElse(
      sys.error(s"Dune execute response carries no execution_id: " +
        body.take(200)))
  }

  /** Polls to completion; returns each result row re-serialized as its
    * own JSON object string (one line per row, ready for a schema-d
    * Spark JSON read).
    */
  def pollResults(executionId: String): Seq[String] = {
    val uri = URI.create(
      s"${config.baseUrl}/api/v1/execution/$executionId/results")
    val start = clock()
    while (true) {
      if (clock() - start > config.maxWaitMillis)
        throw new DunePollTimeoutException(config.maxWaitMillis)
      val node = mapper.readTree(request(HttpRequest.newBuilder().uri(uri).GET()))
      Option(node.get("state")).map(_.asText()).getOrElse("") match {
        case "QUERY_STATE_COMPLETED" =>
          val rows = node.get("result").get("rows")
          return rows.elements().asScala.map(mapper.writeValueAsString).toSeq
        case "QUERY_STATE_FAILED" =>
          throw new DuneQueryFailedException(
            Option(node.get("error")).map(_.asText())
              .getOrElse("Unknown error"))
        case _ => sleeper(config.pollIntervalMillis)
      }
    }
    Nil // unreachable
  }
}

/** [[Source]] over the live REST client: execute with the watermark as
  * the server-side `date` parameter, poll, and parse the rows under the
  * spec's declared schema (schema inference only when none is declared
  * — the same declared-StructType policy as the DSv2 connector). The
  * watermark predicate is re-applied client-side so the pipeline's
  * delta contract holds even against a server that ignored the
  * parameter.
  */
class RestDuneSource(client: DuneRestClient) extends Source {
  override def fetch(spark: SparkSession, spec: TableSpec,
      watermark: Option[Any]): DataFrame = {
    val executionId =
      client.executeQuery(spec.queryId, watermark.map(String.valueOf))
    val rows = client.pollResults(executionId)
    val ds = spark.createDataset(rows)(Encoders.STRING)
    val reader = spark.read
    val df = spec.sourceSchema.fold(reader)(reader.schema).json(ds)
    Source.applyWatermark(df, spec, watermark)
  }
}
