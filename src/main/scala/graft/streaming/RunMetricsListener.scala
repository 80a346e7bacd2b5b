package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable.ArrayBuffer

/** S8/M2 streaming equivalent: per-progress run metrics captured via
  * `StreamingQueryListener` (the reference's `pipeline_run_tracker`
  * decorator re-expressed as Spark's native observability hook;
  * reference src/serve/run_history.py:11-60).
  *
  * Rows are buffered driver-side and flushed to an append-only parquet
  * metrics table — same shape as the batch pipeline's run history.
  */
final class RunMetricsListener(spark: SparkSession, metricsPath: String)
    extends StreamingQueryListener {

  private val buf = ArrayBuffer.empty[(String, Long, Long, String, Boolean, String)]

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    synchronized { buf += ((e.id.toString, -1L, 0L, e.timestamp, true, null)) }

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    synchronized {
      buf += ((e.progress.id.toString, e.progress.batchId,
        e.progress.numInputRows, e.progress.timestamp, true, null))
    }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    val err = e.exception.orNull
    synchronized { buf += ((e.id.toString, -2L, 0L, "", err == null, err)) }
    flush()
  }

  /** Append buffered rows to the metrics table and clear the buffer. */
  def flush(): Unit = {
    val rows = synchronized { val r = buf.toList; buf.clear(); r }
    if (rows.nonEmpty) {
      import spark.implicits._
      graft.sources.Merge.appendMetrics(
        rows.toDF("query_id", "batch_id", "input_rows", "event_ts", "success", "error_message"),
        metricsPath)
    }
  }
}
