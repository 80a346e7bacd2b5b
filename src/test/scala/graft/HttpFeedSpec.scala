package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.keyset.HttpRecordFeed

/** HTTP transport for the keyset source against a local stub server:
  * paging, retry with backoff on 5xx and on success=false envelopes
  * (reference: src/ingest/fetch_neso.py:17-35), and the full DSv2 read
  * path over real HTTP.
  */
class HttpFeedSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  /** Stub feed endpoint: N records with the reference's CKAN-style envelope.
    * `failFirst` makes the first k requests fail with HTTP 500 and
    * `softFailFirst` with a success=false body — both must be retried away.
    */
  private class StubServer(n: Long, failFirst: Int = 0, softFailFirst: Int = 0) {
    val requests = new AtomicInteger(0)
    private val hardFails = new AtomicInteger(failFirst)
    private val softFails = new AtomicInteger(softFailFirst)
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }

    server.createContext("/api", (ex: HttpExchange) => {
      requests.incrementAndGet()
      if (hardFails.getAndDecrement() > 0) respond(ex, 500, "boom")
      else if (softFails.getAndDecrement() > 0)
        respond(ex, 200, """{"success": false, "error": "try later"}""")
      else {
        val path = ex.getRequestURI.getPath
        if (path.endsWith("/max_id"))
          respond(ex, 200, s"""{"success": true, "result": $n}""")
        else {
          val params = Option(ex.getRequestURI.getQuery).getOrElse("")
            .split("&").filter(_.contains("=")).map { kv =>
              val Array(k, v) = kv.split("=", 2); k -> v
            }.toMap
          val after = params.getOrElse("after_id", "0").toLong
          val limit = params.getOrElse("limit", "1000").toInt
          val recs = ((after + 1) to math.min(after + limit, n)).map(i =>
            s"""{"id": $i, "ts_us": ${i * 1000000L}, "payload": "p$i", "value": ${i * 0.5}}""")
          respond(ex, 200,
            s"""{"success": true, "result": {"records": [${recs.mkString(",")}]}}""")
        }
      }
    })
    server.start()
    val url: String = s"http://127.0.0.1:${server.getAddress.getPort}/api"
    def stop(): Unit = server.stop(0)
  }

  test("HttpRecordFeed pages by keyset and reads max_id") {
    val srv = new StubServer(25)
    try {
      val feed = new HttpRecordFeed(srv.url)
      assert(feed.maxId() == 25L)
      val page = feed.fetchPage(afterId = 10, limit = 5)
      assert(page.map(_.id) == Seq(11L, 12L, 13L, 14L, 15L))
      assert(page.head.payload == "p11" && page.head.value == 5.5)
      assert(feed.fetchPage(afterId = 25, limit = 5).isEmpty)
    } finally srv.stop()
  }

  test("retries 5xx and success=false with backoff, then succeeds") {
    val srv = new StubServer(5, failFirst = 2, softFailFirst = 1)
    try {
      val feed = new HttpRecordFeed(srv.url, maxRetries = 5, backoffBaseMs = 1)
      assert(feed.maxId() == 5L) // 3 failed attempts retried away
      assert(srv.requests.get() == 4)
    } finally srv.stop()
  }

  test("gives up after maxRetries and propagates the failure") {
    val srv = new StubServer(5, failFirst = 100)
    try {
      val feed = new HttpRecordFeed(srv.url, maxRetries = 3, backoffBaseMs = 1)
      val e = intercept[java.io.IOException](feed.maxId())
      assert(e.getMessage.contains("after 3 attempts"))
      assert(srv.requests.get() == 3)
    } finally srv.stop()
  }

  test("DSv2 batch read over real HTTP: url option, parallel windows, pushdown") {
    val srv = new StubServer(537, failFirst = 1) // one flaky request en route
    try {
      val df = spark.read.format("graft.sources.keyset.KeysetSource")
        .option("url", srv.url).option("batchSize", 50).option("numPartitions", 4)
        .load()
      assert(df.count() == 537)
      assert(df.agg(min("id"), max("id")).as[(Long, Long)].head() == ((1L, 537L)))
      assert(df.select("id").distinct().count() == 537)
      // pushdown still applies through the HTTP transport
      assert(spark.read.format("graft.sources.keyset.KeysetSource")
        .option("url", srv.url).option("batchSize", 50).load()
        .filter(col("id") > 500).count() == 37)
    } finally srv.stop()
  }
}
