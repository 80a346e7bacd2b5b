package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark: one JSON line with per-query steady-state seconds.
  *
  * Methodology (recorded in BASELINE.md): every table is scanned once up
  * front (parquet footers, page cache, reader JIT), then each query runs
  * TWICE and the second run is reported. Run 1 pays per-query codegen +
  * classloading, a fixed JVM cost that vanishes over a long-lived cluster
  * session; run 2 is the steady-state number a 1000-executor deployment
  * would see. r01 reported single cold runs, so r01→r02 deltas mix the
  * methodology change with real plan changes — BenchOne reproduces either.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts is TIMESTAMP(NANOS)
      .config("spark.sql.ansi.enabled", "false") // reference semantics: lenient casts, x/0→inf
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: session init paid once; every table scanned fully so no query
    // is charged for first-touch parquet/OS-cache costs.
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings"))
      try spark.read.parquet(s"$sfDir/$t.parquet")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // noop sink: forces full evaluation of every output column (a bare
      // count() would let Catalyst prune most of the query away).
      def once(): Double = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
      once() // run 1: codegen + classloading
      name -> once() // run 2: steady state
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","methodology":"tables-warmed; per-query second-of-two runs (steady state)"}""")
    spark.stop()
  }
}
