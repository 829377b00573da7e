package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.types._

import graft.model.TableSpec
import graft.sources.{DunePollTimeoutException, DuneQueryFailedException, DuneRestClient, DuneRestConfig, RestDuneSource}

/** Drives the live REST tier against an in-process localhost stub —
  * zero egress; the full execute→poll protocol
  * (`dune_extractor.py:44-107`) exercised over real HTTP.
  */
class DuneRestClientSpec extends SparkSpec {

  /** One-shot stub server: `handler` maps (method, path, body) to
    * (status, responseBody); every request is recorded.
    */
  private def withStub[A](
      handler: (String, String, String) => (Int, String))(
      f: (String, mutable.Buffer[(String, String, Map[String, String])]) => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val seen = mutable.Buffer.empty[(String, String, Map[String, String])]
    server.createContext("/", { (ex: HttpExchange) =>
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      seen.synchronized {
        seen += ((ex.getRequestMethod, ex.getRequestURI.getPath,
          Map("X-Dune-API-Key" ->
            Option(ex.getRequestHeaders.getFirst("X-Dune-API-Key"))
              .getOrElse(""))))
      }
      val (status, resp) = handler(ex.getRequestMethod,
        ex.getRequestURI.getPath, body)
      val bytes = resp.getBytes("UTF-8")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", seen)
    finally server.stop(0)
  }

  private def cfg(base: String) = DuneRestConfig(
    baseUrl = base, apiKey = "test-key-from-config",
    pollIntervalMillis = 10L, maxWaitMillis = 2000L)

  test("execute + poll: PENDING/EXECUTING rounds then COMPLETED rows") {
    val polls = new AtomicInteger(0)
    withStub {
      case ("POST", "/api/v1/query/2177266/execute", body) =>
        assert(body === "{}", s"no-watermark execute must send {}: $body")
        (200, """{"execution_id": "01HTEST"}""")
      case ("GET", "/api/v1/execution/01HTEST/results", _) =>
        polls.incrementAndGet() match {
          case 1 => (200, """{"state": "QUERY_STATE_PENDING"}""")
          case 2 => (200, """{"state": "QUERY_STATE_EXECUTING"}""")
          case _ => (200,
            """{"state": "QUERY_STATE_COMPLETED", "result": {"rows": [
              |{"hash": "h1", "height": 1},
              |{"hash": "h2", "height": 2}]}}""".stripMargin)
        }
      case (m, p, _) => fail(s"unexpected request $m $p")
    } { (base, seen) =>
      val client = new DuneRestClient(cfg(base))
      val id = client.executeQuery(2177266L, None)
      assert(id === "01HTEST")
      val rows = client.pollResults(id)
      assert(polls.get() === 3, "the client must keep polling through " +
        "non-terminal states")
      assert(rows.size === 2)
      assert(rows.head.contains("\"hash\"") && rows.head.contains("h1"))
      // every request carried the configured API key header
      assert(seen.nonEmpty &&
        seen.forall(_._3("X-Dune-API-Key") == "test-key-from-config"))
    }
  }

  test("watermark ships as the server-side date query parameter") {
    withStub {
      case ("POST", "/api/v1/query/5816212/execute", body) =>
        assert(body ===
          """{"query_parameters": {"date": "2024-01-31"}}""", body)
        (200, """{"execution_id": "E2"}""")
      case ("GET", _, _) => (200,
        """{"state": "QUERY_STATE_COMPLETED", "result": {"rows": []}}""")
      case (m, p, _) => fail(s"unexpected request $m $p")
    } { (base, _) =>
      val client = new DuneRestClient(cfg(base))
      client.pollResults(client.executeQuery(5816212L, Some("2024-01-31")))
    }
  }

  test("QUERY_STATE_FAILED raises with the server's error message") {
    withStub {
      case ("POST", _, _) => (200, """{"execution_id": "E3"}""")
      case ("GET", _, _) => (200,
        """{"state": "QUERY_STATE_FAILED", "error": "syntax error at line 3"}""")
      case (m, p, _) => fail(s"unexpected request $m $p")
    } { (base, _) =>
      val client = new DuneRestClient(cfg(base))
      val e = intercept[DuneQueryFailedException] {
        client.pollResults(client.executeQuery(1L, None))
      }
      assert(e.getMessage.contains("syntax error at line 3"))
    }
  }

  test("polling times out after max_wait_time against a stuck query") {
    withStub {
      case ("POST", _, _) => (200, """{"execution_id": "E4"}""")
      case ("GET", _, _) => (200, """{"state": "QUERY_STATE_PENDING"}""")
      case (m, p, _) => fail(s"unexpected request $m $p")
    } { (base, _) =>
      // injected clock: each poll "advances" 100 ms, budget 250 ms —
      // the timeout fires at the loop top like the reference's check,
      // without real sleeps
      val t = new AtomicInteger(0)
      val client = new DuneRestClient(
        cfg(base).copy(maxWaitMillis = 250L),
        sleeper = _ => (),
        clock = () => t.getAndAdd(100).toLong)
      val e = intercept[DunePollTimeoutException] {
        client.pollResults(client.executeQuery(1L, None))
      }
      assert(e.getMessage.contains("timed out"))
    }
  }

  test("non-2xx responses raise instead of parsing garbage") {
    withStub {
      case ("POST", _, _) => (401, """{"error": "invalid API key"}""")
    } { (base, _) =>
      val client = new DuneRestClient(cfg(base))
      val e = intercept[java.io.IOException] {
        client.executeQuery(1L, None)
      }
      assert(e.getMessage.contains("401"))
    }
  }

  test("RestDuneSource: rows parse under the declared schema and the " +
    "watermark re-applies client-side") {
    withStub {
      case ("POST", "/api/v1/query/2177266/execute", body) =>
        assert(body.contains("\"date\": \"5\""), body)
        (200, """{"execution_id": "E5"}""")
      case ("GET", _, _) => (200,
        // the stub IGNORES the parameter and returns a stale row too —
        // the source's client-side watermark filter must drop it
        """{"state": "QUERY_STATE_COMPLETED", "result": {"rows": [
          |{"hash": "a", "height": 5},
          |{"hash": "b", "height": 6},
          |{"hash": "c", "height": 7}]}}""".stripMargin)
      case (m, p, _) => fail(s"unexpected request $m $p")
    } { (base, _) =>
      val spec = TableSpec(
        jobName = "bitcoin_block", queryId = 2177266L,
        targetTable = "bitcoin.block", pKeys = Seq("hash"),
        renames = Seq("hash" -> "hash", "height" -> "height"),
        watermarkCol = Some("height"),
        sourceSchema = Some(StructType(Seq(
          StructField("hash", StringType),
          StructField("height", LongType)))))
      val source = new RestDuneSource(new DuneRestClient(cfg(base)))
      val df = source.fetch(spark, spec, watermark = Some(5L))
      assert(df.schema === spec.sourceSchema.get)
      import spark.implicits._
      assert(df.select("hash").as[String].collect().toSet === Set("b", "c"))
    }
  }

  test("DuneRestConfig.fromEnv: missing key fails loudly; base URL " +
    "override is honored") {
    val e = intercept[RuntimeException] {
      DuneRestConfig.fromEnv(_ => None)
    }
    assert(e.getMessage.contains("DUNE_API_KEY"))
    val c = DuneRestConfig.fromEnv(Map(
      "DUNE_API_KEY" -> "k", "DUNE_API_BASE_URL" -> "http://stub").get)
    assert(c.baseUrl === "http://stub" && c.apiKey === "k")
    assert(DuneRestConfig.fromEnv(Map("DUNE_API_KEY" -> "k").get)
      .baseUrl === "https://api.dune.com")
  }
}
