package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: component-level timing probes
  * (current target: semDedup 16x parallelism pathology).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(16)
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
    val embBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val embBig = (0 until mult).map(r =>
      embBase.select((col("vec_id") + lit(r * 1000000L)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    val cents = embBase.filter(col("vec_id") < 16)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_emb"))
    time("warm")(embBig.count())
    for (coalesce <- Seq("true", "false"); i <- 1 to 2) {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", coalesce)
      time(s"semDedup coalesce=$coalesce r$i") {
        graft.operators.Similarity
          .semDedup(embBig, "vec_id", "embedding", cents, 0.999)
          .filter(!col("keep")).count()
      }
    }
    spark.stop()
  }
}
