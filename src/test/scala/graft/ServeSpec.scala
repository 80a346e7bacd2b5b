package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{Merge, VersionedCache}
import graft.streaming.RunMetricsListener

/** Serving-layer utilities: version-probe cache (K1) and streaming run
  * metrics (S8 streaming equivalent).
  */
class ServeSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("VersionedCache reloads only when the version probe moves") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cache").toString
    val path = s"$dir/t"
    Merge.upsertToPath(spark, Seq((1L, "a")).toDF("_id", "v"), path, Seq("_id"))
    val cache = VersionedCache.onMaxKey(spark, path, "_id")
    assert(cache.get().count() == 1)
    assert(cache.get().count() == 1)
    assert(cache.loads == 1) // second get: version unchanged → no reload
    Merge.upsertToPath(spark, Seq((2L, "b")).toDF("_id", "v"), path, Seq("_id"))
    assert(cache.get().count() == 2) // max(_id) moved → reload
    assert(cache.loads == 2)
    cache.invalidate()
    assert(cache.get().count() == 2)
    assert(cache.loads == 3)
  }

  test("RunMetricsListener records start/progress rows to the metrics table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_listener").toString
    val listener = new RunMetricsListener(spark, s"$dir/metrics")
    spark.streams.addListener(listener)
    try {
      val mem = MemoryStream[Long]
      mem.addData(1L, 2L, 3L)
      val q = mem.toDF().writeStream.format("noop").start()
      q.processAllAvailable()
      q.stop()
      q.awaitTermination()
      // listener events are delivered async — poll until metrics readable
      def readMetrics() =
        try { listener.flush(); Some(spark.read.parquet(s"$dir/metrics")) }
        catch { case _: Exception => None }
      var metrics = readMetrics()
      var tries = 0
      while (tries < 50 && metrics.isEmpty) {
        Thread.sleep(100); metrics = readMetrics(); tries += 1
      }
      assert(metrics.isDefined)
      assert(metrics.get.count() >= 1)
      assert(metrics.get.filter(col("success")).count() == metrics.get.count())
    } finally spark.streams.removeListener(listener)
  }
}
