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

  private class ScriptedFeed extends RecordFeed {
    @volatile var records: Vector[FeedRecord] = Vector.empty
    override def fetchPage(afterId: Long, limit: Int): Seq[FeedRecord] =
      records.filter(_.id > afterId).sortBy(_.id).take(limit)
    override def maxId(): Long = if (records.isEmpty) 0L else records.map(_.id).max
  }

  test("micro-batches through the PARTITIONED sink equal the batch upsert; untouched buckets byte-identical") {
    import scala.jdk.CollectionConverters._
    import java.nio.file.{Files, Paths}
    val Buckets = 8
    val feed = new ScriptedFeed
    FeedRegistry.register("e2ep", feed)
    val dir = Files.createTempDirectory("graft_e2e_part").toString
    val sinkPath = s"$dir/sink"

    def rec(i: Long, key: String) = FeedRecord(i, i * 1000000L, key, i.toDouble)

    def runOnce(): Unit = {
      val events = spark.readStream
        .format("graft.sources.keyset.KeysetSource")
        .option("feed", "e2ep").option("batchSize", 7).load()
        .select(col("payload").as("key"), col("ts"), col("value"))
      Streaming.incrementalMergeSink(
        events, keyCol = "key", orderCol = "ts",
        sinkPath = sinkPath, metricsPath = s"$dir/metrics",
        checkpointDir = s"$dir/ckpt", trigger = Trigger.AvailableNow(),
        sinkBuckets = Buckets).awaitTermination()
    }

    // per-bucket file snapshot: (name, size, mtime) per p_bucket=* directory
    def snapshot(): Map[String, Set[(String, Long, Long)]] =
      Files.list(Paths.get(sinkPath)).iterator().asScala
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("p_bucket="))
        .map(d => d.getFileName.toString -> Files.list(d).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map { f =>
            val at = Files.readAttributes(f, classOf[java.nio.file.attribute.BasicFileAttributes])
            (f.getFileName.toString, at.size(), at.lastModifiedTime().toMillis)
          }.toSet).toMap

    // two "hourly" runs over all 10 keys
    feed.records = (1L to 30L).map(i => rec(i, s"k${i % 10}")).toVector
    runOnce()
    feed.records = feed.records ++ (31L to 45L).map(i => rec(i, s"k${i % 10}"))
    runOnce()

    // third run delivers records for ONE key only — its bucket must be the
    // only directory whose files change (partition-pruned MERGE per batch)
    val before = snapshot()
    feed.records = feed.records ++ (46L to 50L).map(i => rec(i, "k3"))
    runOnce()
    val after = snapshot()
    val touched = spark.range(1)
      .select(pmod(xxhash64(lit("k3")), lit(Buckets)).cast("int")).head().getInt(0)
    assert(before.keys == after.keys)
    before.foreach { case (d, files) =>
      if (d == s"p_bucket=$touched") assert(after(d) != files, s"$d must be rewritten")
      else assert(after(d) == files, s"$d files must be byte-identical (not rewritten)")
    }

    // the streamed sink equals one BATCH upsertPartitioned of the keep-last
    // dedup over every record ever fed — the reference's hourly loop and the
    // one-shot batch agree end-to-end
    import spark.implicits._
    val allRows = feed.records.map(r => (r.payload, r.tsMicros, r.value))
      .toDF("key", "us", "value")
      .select(col("key"), timestamp_micros(col("us")).as("ts"), col("value"))
    val batchDedup = graft.operators.Dedup.keepFirstBy(
      allRows, Seq("key"), Seq(col("ts").desc, col("key").desc))
    graft.sources.Merge.upsertPartitioned(
      spark, batchDedup, s"$dir/batch_sink", Seq("key"), numBuckets = Buckets)
    val streamed = spark.read.parquet(sinkPath)
      .select("key", "ts", "value", "p_bucket").as[(String, java.sql.Timestamp, Double, Int)]
      .collect().sortBy(_._1)
    val batch = spark.read.parquet(s"$dir/batch_sink")
      .select("key", "ts", "value", "p_bucket").as[(String, java.sql.Timestamp, Double, Int)]
      .collect().sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq)
  }
}
