package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.keyset.{FeedRecord, FeedRegistry, RecordFeed}
import graft.streaming.Streaming

/** The whole incremental story end-to-end, Spark-native: DSv2 keyset
  * source (checkpointed cursor offsets) → per-micro-batch keep-last dedup →
  * idempotent MERGE sink → metrics — the reference's scheduled pipeline
  * (§3.1) as one streaming graph.
  */
class StreamingE2ESpec extends AnyFunSuite with SparkFixture {

  private class GrowFeed extends RecordFeed {
    @volatile var max = 30L
    override def fetchPage(afterId: Long, limit: Int): Seq[FeedRecord] =
      ((afterId + 1) to math.min(afterId + limit, max)).map { i =>
        // ids re-keyed mod 10 downstream → duplicates for dedup to resolve
        FeedRecord(i, i * 1000000L, s"k${i % 10}", i.toDouble)
      }
    override def maxId(): Long = max
  }

  test("keyset source -> dedup -> merge sink: incremental, deduped, idempotent") {
    val feed = new GrowFeed
    FeedRegistry.register("e2e", feed)
    val dir = java.nio.file.Files.createTempDirectory("graft_e2e").toString

    def runOnce(): Unit = {
      val events = spark.readStream
        .format("graft.sources.keyset.KeysetSource")
        .option("feed", "e2e").option("batchSize", 7).load()
        .select(col("payload").as("key"), col("ts"), col("value"))
      val q = Streaming.incrementalMergeSink(
        events, keyCol = "key", orderCol = "ts",
        sinkPath = s"$dir/sink", metricsPath = s"$dir/metrics",
        checkpointDir = s"$dir/ckpt", trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }

    runOnce()
    val after1 = spark.read.parquet(s"$dir/sink")
    assert(after1.count() == 10) // 30 records, 10 keys, keep-last per key
    // keep-last: key k9 last seen at id 29 → value 29.0
    assert(after1.filter(col("key") === "k9").head().getDouble(2) == 29.0)

    feed.max = 45 // 15 new records arrive
    runOnce()
    val after2 = spark.read.parquet(s"$dir/sink").orderBy("key")
    assert(after2.count() == 10) // same keys, updated values
    // k0 last seen at id 40 within the new batch → value 40.0
    assert(after2.filter(col("key") === "k0").head().getDouble(2) == 40.0)

    // no new data: run is a no-op (idempotent sink, no duplicate metrics rows
    // with rows_upserted > 0)
    runOnce()
    assert(spark.read.parquet(s"$dir/sink").count() == 10)
    val metrics = spark.read.parquet(s"$dir/metrics")
    assert(metrics.filter(col("rows_upserted") > 0).count() == 2)
  }
}
