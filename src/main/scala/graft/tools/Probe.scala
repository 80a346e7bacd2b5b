package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: component-level timing probes
  * (current target: capped containment cost decomposition on the
  * replicated probe corpus, where every replica-set shingle sits exactly
  * at the df cap — the adversarial worst case for the dial).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(8)
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
    val base = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val big = (0 until mult).map { r =>
      base.select((col("doc_id") + lit(r * 1000000L)).as("doc_id"),
        concat(col("text"), lit(s" replica$r")).as("text"))
    }.reduce(_ unionByName _)
      .unionByName(base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + lit(mult * 1000000L)).as("doc_id"),
          expr("substring(text, 15)").as("text")))
    val hashed = big
      .withColumn("toks", graft.functions.Text.tokens(col("text")))
      .withColumn("shash", graft.operators.TextDedup.shingleHashes("toks", 3))
      .select("doc_id", "shash")
    time("full capped containment")(graft.operators.TextDedup.containmentPairs(
      hashed, "doc_id", "shash", threshold = 0.9, maxShingleDf = 8L).count())
    spark.stop()
  }
}
