package graft.pipeline

import java.util.concurrent.{Executors, ScheduledFuture, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/** Recurring-run orchestration — the reference's background interval
  * scheduler (src/scheduler/job.py:10-34: BackgroundScheduler, interval
  * trigger, `next_run_time=now` so the first run is immediate) as a driver
  * utility around any runnable pipeline step.
  *
  * A resident Structured Streaming query with `Trigger.ProcessingTime` is
  * the stream-native equivalent ([[graft.streaming.Streaming]]); this
  * utility covers the reference's actual shape — a batch pipeline re-run on
  * a wall-clock interval against one long-lived SparkSession (cluster form:
  * scheduled `spark-submit` / Airflow task; the run body is identical).
  *
  * A failing run is logged and does NOT cancel the schedule (APScheduler
  * semantics — job.py's errors surface per run, the interval persists).
  * Overlapping runs are prevented: fixed-delay execution, next run starts
  * `interval` after the previous one finishes.
  */
object Scheduler {

  final class Handle private[Scheduler] (
      future: ScheduledFuture[_],
      exec: java.util.concurrent.ScheduledExecutorService,
      runsCounter: AtomicLong,
      errsCounter: AtomicLong) {
    def runs: Long = runsCounter.get()
    def errors: Long = errsCounter.get()
    /** Cancel the schedule; a run already in flight completes. */
    def stop(): Unit = {
      future.cancel(false)
      exec.shutdown()
    }
    def awaitRuns(n: Long, timeoutMs: Long): Boolean = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (runsCounter.get() < n && System.nanoTime() < deadline) Thread.sleep(10)
      runsCounter.get() >= n
    }
  }

  /** Run `job` now and then every `intervalMs`, off the calling thread. */
  def start(intervalMs: Long, name: String = "pipeline_job")(job: () => Unit): Handle = {
    val exec = Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, s"graft-scheduler-$name")
      t.setDaemon(true)
      t
    })
    val runs = new AtomicLong(0)
    val errs = new AtomicLong(0)
    val fut = exec.scheduleWithFixedDelay(() => {
      try job()
      catch {
        case e: Throwable =>
          errs.incrementAndGet()
          System.err.println(s"[scheduler:$name] run failed: ${e.getMessage}")
      } finally runs.incrementAndGet()
    }, 0, intervalMs, TimeUnit.MILLISECONDS)
    new Handle(fut, exec, runs, errs)
  }
}
