package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.sources.keyset.{FeedRecord, FeedRegistry, RecordFeed}

/** The DSv2 keyset source under the oracle gate: a feed standing in for the
  * remote API is built from the `events` table (driver-side materialization
  * — the feed IS the external system here, not engine data flow), then the
  * query reads through `spark.read.format(KeysetSource)` with an `id >
  * cursor` predicate that Catalyst pushes into the source, and the oracle
  * checks the result against the same rows read relationally.
  */
object SourceQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Serializable feed over a sorted in-memory snapshot of events. */
  private final class EventsFeed(rows: Array[FeedRecord]) extends RecordFeed {
    override def fetchPage(afterId: Long, limit: Int): Seq[FeedRecord] = {
      // binary search the keyset start, then one contiguous page
      var lo = 0
      var hi = rows.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (rows(mid).id <= afterId) lo = mid + 1 else hi = mid
      }
      rows.slice(lo, math.min(lo + limit, rows.length)).toSeq
    }
    override def maxId(): Long = if (rows.isEmpty) 0L else rows.last.id
  }

  /** The keyset cursor q51 reads behind, and the cap on the simulated feed:
    * only the queried window (id > cursor) is snapshotted to the driver, and
    * an overflow past the cap fails loudly instead of OOMing the driver or
    * silently truncating the oracle comparison.
    */
  private val Cursor = 5000L
  private val FeedCap = 1 << 20

  val queries: Map[String, Q] = Map(
    "q51_dsv2_keyset_scan" -> ((s, dir) => {
      val snapshot = Tables.events(s, dir)
        .filter(col("event_id") > Cursor) // feed only the window under test
        .select(
          col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"),
          col("event_type"), col("value"))
        .orderBy("event_id")
        .limit(FeedCap)
        .collect()
        .map(r => FeedRecord(r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      require(snapshot.length < FeedCap,
        s"q51 feed snapshot hit the $FeedCap-row cap; raise it or shrink the window")
      FeedRegistry.register(s"events:$dir", new EventsFeed(snapshot))
      s.read.format("graft.sources.keyset.KeysetSource")
        .option("feed", s"events:$dir")
        .option("batchSize", 500)
        .option("numPartitions", 8)
        .load()
        .filter(col("id") > Cursor) // pushed into the source as the keyset cursor
        .select(col("id"), col("ts").cast("timestamp_ntz").as("ts"),
          col("payload"), col("value"))
        .orderBy("id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q51_dsv2_keyset_scan" ->
      """SELECT event_id AS id, ts, event_type AS payload, value
          FROM events WHERE event_id > 5000 ORDER BY id""".replaceAll("\\s+", " ")
  )
}
