package graft.tools

import org.apache.spark.sql.SparkSession

/** Repeat-runner for individual queries: cold-vs-warm profiling without the
  * full bench sweep. Usage: BenchOne <sfDir> <reps> <queryName>...
  * Prints per-rep seconds; rep 1 includes first-touch costs (parquet footers,
  * codegen, JIT) that the steady-state bench methodology excludes.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = graft.SessionTuning.tuned(SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // storage-partitioned joins on from session start (not flipped
      // mid-sweep by the first SPJ query): Tx scans report their bucket
      // layout, and same-layout joins/aggs plan shuffle-free
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names; i <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[bench1] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // same per-rep hygiene as Bench: reap what the execution left persisted
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      graft.sources.Scratch.reap()
    }
    spark.stop()
  }
}
