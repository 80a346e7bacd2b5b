package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: component-level timing probes (current target: q35 stages). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
    time("warm docs")(docs.count())
    for (i <- 1 to 2) {
      time(s"simhashAgg r$i") {
        graft.operators.TextDedup
          .simhashAgg(docs, "doc_id", "split(trim(text), '\\\\s+')").count()
      }
      time(s"pairs-from-materialized r$i") {
        val sim = graft.operators.TextDedup
          .simhashAgg(docs, "doc_id", "split(trim(text), '\\\\s+')")
          .persist()
        sim.count()
        val n = graft.operators.TextDedup
          .simhashPairs(sim, "doc_id", "simhash", maxHamming = 6).count()
        sim.unpersist()
        n
      }
    }
    spark.stop()
  }
}
