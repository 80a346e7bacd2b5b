package graft.sources.keyset

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import com.fasterxml.jackson.databind.ObjectMapper

/** HTTP transport for the keyset source — the production half of S1.
  *
  * Mirrors the reference's retrying fetch (src/ingest/fetch_neso.py:17-35):
  * GET with a request timeout, up to `maxRetries` attempts with exponential
  * backoff (base * 2^attempt), and a `success` flag in the JSON envelope that
  * must be true or the attempt counts as failed. Page shape follows the
  * reference's CKAN-style envelope (fetch_neso.py:42-60):
  *
  * {{{ {"success": true, "result": {"records": [
  *      {"id": 1, "ts_us": 1700000000000000, "payload": "...", "value": 1.5},
  *      ...]}} }}}
  *
  * The keyset contract is carried in query params: `?after_id=N&limit=M`,
  * records ascending by id (fetch_neso.py:66-71's WHERE _id > cursor ORDER BY
  * _id LIMIT n).
  *
  * Serializable so executor tasks can construct their own client: the
  * HttpClient itself is per-JVM (@transient lazy), only the coordinates ship.
  * Each Spark task pages through its own disjoint keyset window, so parallel
  * ingest needs no coordination beyond the id ranges.
  */
class HttpRecordFeed(
    baseUrl: String,
    timeoutMs: Long = 60000,
    maxRetries: Int = 5,
    backoffBaseMs: Long = 200) extends RecordFeed {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofMillis(timeoutMs)).build()
  @transient private lazy val mapper = new ObjectMapper()

  override def fetchPage(afterId: Long, limit: Int): Seq[FeedRecord] = {
    val node = getJson(s"$baseUrl/records?after_id=$afterId&limit=$limit")
    val recs = node.path("result").path("records")
    (0 until recs.size()).map { i =>
      val r = recs.get(i)
      FeedRecord(
        r.path("id").asLong(),
        r.path("ts_us").asLong(),
        if (r.path("payload").isNull) null else r.path("payload").asText(),
        r.path("value").asDouble())
    }
  }

  override def maxId(): Long = getJson(s"$baseUrl/max_id").path("result").asLong(0L)

  /** GET with retry: non-2xx, transport errors, and success=false all retry
    * with exponential backoff; the last failure propagates (fetch_neso.py:
    * retry loop re-raises after the final attempt).
    */
  private def getJson(url: String): com.fasterxml.jackson.databind.JsonNode = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < maxRetries) {
      try {
        val req = HttpRequest.newBuilder(URI.create(url))
          .timeout(Duration.ofMillis(timeoutMs)).GET().build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 != 2)
          throw new java.io.IOException(s"HTTP ${resp.statusCode()} from $url")
        val node = mapper.readTree(resp.body())
        if (!node.path("success").asBoolean(false))
          throw new java.io.IOException(s"success=false from $url")
        return node
      } catch {
        case e: InterruptedException => throw e
        case e: Throwable =>
          lastErr = e
          attempt += 1
          if (attempt < maxRetries) Thread.sleep(backoffBaseMs << (attempt - 1))
      }
    }
    throw new java.io.IOException(
      s"keyset feed GET failed after $maxRetries attempts: $url", lastErr)
  }
}
