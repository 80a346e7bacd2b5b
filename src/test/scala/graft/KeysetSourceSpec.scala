package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.keyset.{FeedRecord, FeedRegistry, RecordFeed}

/** DSv2 keyset source: parallel batch read, Catalyst filter pushdown to the
  * feed cursor, and streaming with keyset offsets.
  */
class KeysetSourceSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  /** Growable in-memory feed that records the smallest cursor it was asked
    * for (observes pushdown).
    */
  private class MemFeed(initial: Long) extends RecordFeed {
    @volatile var max = initial
    val minAskedCursor = new AtomicLong(Long.MaxValue)
    def grow(to: Long): Unit = max = to
    override def fetchPage(afterId: Long, limit: Int): Seq[FeedRecord] = {
      minAskedCursor.getAndUpdate(m => math.min(m, afterId))
      ((afterId + 1) to math.min(afterId + limit, max)).map(i =>
        FeedRecord(i, i * 1000000L, s"p$i", i * 0.5))
    }
    override def maxId(): Long = max
  }

  private val fmt = "graft.sources.keyset.KeysetSource"

  test("batch read returns every record across partitioned keyset windows") {
    FeedRegistry.register("t1", new MemFeed(2345))
    val df = spark.read.format(fmt)
      .option("feed", "t1").option("batchSize", 100).option("numPartitions", 7).load()
    assert(df.count() == 2345)
    assert(df.agg(min("id"), max("id")).as[(Long, Long)].head() == ((1L, 2345L)))
    assert(df.select("id").distinct().count() == 2345)
    val row = df.filter(col("id") === 10).head()
    assert(row.getString(row.fieldIndex("payload")) == "p10")
  }

  test("id > cursor filter is pushed down to the feed") {
    val feed = new MemFeed(1000)
    FeedRegistry.register("t2", feed)
    val df = spark.read.format(fmt)
      .option("feed", "t2").option("batchSize", 100).load()
      .filter(col("id") > 800)
    assert(df.count() == 200)
    // the feed was never asked for anything below the pushed cursor
    assert(feed.minAskedCursor.get() >= 800L)
  }

  test("streaming: keyset offsets give incremental exactly-once micro-batches") {
    val feed = new MemFeed(50)
    FeedRegistry.register("t3", feed)
    val dir = java.nio.file.Files.createTempDirectory("graft_keyset").toString
    def runOnce(): Unit = {
      val q = spark.readStream.format(fmt)
        .option("feed", "t3").option("batchSize", 10).load()
        .writeStream.format("parquet")
        .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(s"$dir/out").count() == 50)
    feed.grow(80) // 30 new records arrive
    runOnce()
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == 80) // no re-read, no loss
    assert(out.select("id").distinct().count() == 80)
  }
}
