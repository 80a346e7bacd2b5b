package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-stage decomposition of a single query's warm execution — the
  * measurement half of the optimization loop (guide §1: decide whether
  * time goes to shuffle, compute, or scheduling BEFORE changing anything).
  *
  * Usage: Profile <sfDir> <queryName> [reps=2]
  * Runs the query `reps` times (first pays codegen/JIT); prints, for the
  * LAST rep only: every job with its stages, per-stage wall duration,
  * task count, shuffle read/write bytes, input bytes, and the job group
  * description. Stage wall time here is submission→completion (includes
  * scheduling), which is what the bench actually pays.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionTuning.tuned(SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(var name: String = "", var sub: Long = 0, var done: Long = 0,
                  var tasks: Int = 0, var shufR: Long = 0, var shufW: Long = 0,
                  var in: Long = 0, var cpuMs: Long = 0)
    val stages = mutable.LinkedHashMap.empty[Int, St]
    val jobs = mutable.LinkedHashMap.empty[Int, (String, Seq[Int], Long, Long)]
    var collecting = false
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = if (collecting) {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs(j.jobId) = (desc, j.stageIds, j.time, 0L)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = if (collecting) {
        jobs.get(j.jobId).foreach { case (d, s, t0, _) => jobs(j.jobId) = (d, s, t0, j.time) }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = if (collecting) {
        val i = s.stageInfo
        val st = stages.getOrElseUpdate(i.stageId, St())
        st.name = i.name.takeWhile(_ != '\n')
        st.sub = i.submissionTime.getOrElse(0L)
        st.done = i.completionTime.getOrElse(0L)
        st.tasks = i.numTasks
        st.shufR = i.taskMetrics.shuffleReadMetrics.totalBytesRead
        st.shufW = i.taskMetrics.shuffleWriteMetrics.bytesWritten
        st.in = i.taskMetrics.inputMetrics.bytesRead
        st.cpuMs = i.taskMetrics.executorCpuTime / 1000000L
      }
    }
    spark.sparkContext.addSparkListener(listener)

    for (i <- 1 to reps) {
      if (i == reps) { stages.clear(); jobs.clear(); collecting = true }
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name rep$i: $t%.2f s")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      graft.sources.Scratch.reap()
    }
    collecting = false
    Thread.sleep(300) // let listener drain
    println(f"[profile] ${"job"}%-5s ${"ms"}%7s  description")
    jobs.foreach { case (id, (desc, _, t0, t1)) =>
      println(f"[profile] J$id%-4d ${t1 - t0}%7d  ${desc.take(90)}")
    }
    println(f"[profile] ${"stage"}%-6s ${"wallMs"}%7s ${"cpuMs"}%7s ${"tasks"}%5s ${"inMB"}%7s ${"shRMB"}%7s ${"shWMB"}%7s  name")
    var totW = 0L
    stages.toSeq.sortBy(_._1).foreach { case (id, s) =>
      val w = s.done - s.sub
      totW += w
      println(f"[profile] S$id%-5d $w%7d ${s.cpuMs}%7d ${s.tasks}%5d ${s.in / 1048576.0}%7.1f ${s.shufR / 1048576.0}%7.1f ${s.shufW / 1048576.0}%7.1f  ${s.name.take(60)}")
    }
    println(f"[profile] total stage wall: $totW ms over ${stages.size} stages, ${jobs.size} jobs")
    spark.stop()
  }
}
