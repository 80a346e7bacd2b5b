package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for dev-loop experiments (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    for (t <- Seq("events", "orders", "lineitem", "embeddings", "documents", "region")) {
      val df = spark.read.parquet(s"$sf/$t.parquet")
      println(s"== $t: ${df.schema.simpleString}")
    }
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
    ev.select(min($"ts"), max($"ts")).show(truncate = false)
    ev.select(date_trunc("month", $"ts"),
      timestamp_seconds(floor(unix_timestamp($"ts") / 1800L) * 1800L)).show(3, truncate = false)
    ev.select(date_trunc("month", $"ts")).printSchema()
    spark.stop()
  }
}
