package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Pipeline, Scheduler}

/** Interval scheduler semantics (reference: src/scheduler/job.py:10-34):
  * immediate first run, fixed interval, failures don't cancel the schedule,
  * stop() halts cleanly — plus a scheduled end-to-end pipeline loop into the
  * partition-pruned sink.
  */
class SchedulerSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("first run immediate, recurring, stop halts") {
    val runs = new AtomicInteger(0)
    val h = Scheduler.start(intervalMs = 40, name = "t1")(() => { runs.incrementAndGet(); () })
    assert(h.awaitRuns(3, timeoutMs = 5000), "expected >= 3 runs")
    h.stop()
    Thread.sleep(150)
    val afterStop = runs.get()
    Thread.sleep(150)
    assert(runs.get() == afterStop, "runs continued after stop()")
  }

  test("a failing run is counted and does not cancel the schedule") {
    val runs = new AtomicInteger(0)
    val h = Scheduler.start(intervalMs = 30, name = "t2")(() => {
      if (runs.incrementAndGet() == 1) throw new RuntimeException("transient")
    })
    assert(h.awaitRuns(3, timeoutMs = 5000))
    h.stop()
    assert(h.errors == 1, s"expected exactly the one seeded failure, got ${h.errors}")
  }

  test("scheduled runPipeline loop: incremental batches converge in the partitioned sink") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sched").toString
    val sink = s"$dir/sink"
    val metrics = s"$dir/metrics"
    // two landing batches, keyed by _id; batch 2 overlaps batch 1 (rerun-safe)
    val batches = Seq(1L to 40L, 30L to 60L).map(r =>
      r.map(i => (i.toString, f"2024-01-01T${i / 60}%02d:${i % 60}%02d:00", i.toDouble))
        .toDF("_id", "DATETIME", "GAS")) // distinct DATETIMEs: keep-last dedup keys on it
    val cursor = new AtomicInteger(0)
    val h = Scheduler.start(intervalMs = 50, name = "pipe")(() => {
      val i = cursor.getAndIncrement()
      if (i < batches.length)
        Pipeline.runPipeline(spark, batches(i), sink, metrics, sinkBuckets = 4)
    })
    assert(h.awaitRuns(3, timeoutMs = 60000)) // both batches + one idle tick
    h.stop()
    val ids = spark.read.parquet(sink).select("_id").as[Long].collect().sorted
    assert(ids.toSeq == (1L to 60L), s"sink diverged: ${ids.length} rows")
    assert(spark.read.parquet(metrics).count() >= 2) // one run-history row per run
  }

  test("scheduled runs leave no persisted storage residue (release discipline)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sched_leak").toString
    val before = spark.sparkContext.getPersistentRDDs.size
    // several back-to-back runs — each transform persists two frames
    // internally; runPipeline must release them after the sink write
    for (i <- 1 to 3) {
      val batch = (1L to 30L)
        .map(j => (j.toString, f"2024-01-0$i%dT${j / 60}%02d:${j % 60}%02d:00", j.toDouble))
        .toDF("_id", "DATETIME", "GAS")
      Pipeline.runPipeline(spark, batch, s"$dir/sink", s"$dir/metrics", sinkBuckets = 4)
    }
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "a scheduler-shaped loop must not accrete persisted frames across runs")
  }
}
