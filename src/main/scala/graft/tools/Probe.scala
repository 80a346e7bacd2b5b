package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Pq

/** Dev scratch: component-level timing probes
  * (current target: q145 PQ recall-dial cost decomposition).
  */
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
    val Dim = 64
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    time("warm")(e.count())
    time("warm2")(e.count())
    val fpv = transform(col("embedding"), x => floor(x.cast("double") * 1e7).cast("long"))
    val fp = e.select(col("vec_id"), fpv.as("v"))
    val probes = fp.filter(col("vec_id") % 29 === 0)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val ext = graft.operators.Analytics.topKPerGroupNative(
      fp.crossJoin(broadcast(probes)).filter(col("vec_id") =!= col("probe_id"))
        .withColumn("d", Pq.l2sqFp(col("v"), col("pv")))
        .select("probe_id", "vec_id", "d"),
      Seq("probe_id"), Seq(("d", false), ("vec_id", false)), 10)
      .select("probe_id", "vec_id")
    time("ext (exact topk)")(ext.count())
    time("ext again")(ext.count())
    val t0 = System.nanoTime()
    val cbs = Pq.trainCodebooksMultiLocalized(
      e, "vec_id", "embedding", Seq((2, 8), (4, 8), (8, 16), (16, 32)), Dim, iters = 1)
    println(f"[probe] fused train+collect: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    val cbsingle = Pq.localized(Pq.trainCodebooks(e, "vec_id", "embedding", 16, Dim, 32, 1))
    println(f"[probe] single train m16 k32: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    def branch(m: Int, k: Int, cb: org.apache.spark.sql.DataFrame) = {
      val codes = Pq.encode(e, "vec_id", "embedding", cb, m, Dim)
      val probesSv = Pq.subVectorsFp(
        e.filter(col("vec_id") % 29 === 0).select(col("vec_id").as("probe_id"), col("embedding")),
        "probe_id", "embedding", m, Dim)
      Pq.adcTopKPerProbe(codes, "vec_id", cb, probesSv, 10).select("probe_id", "vec_id")
    }
    time("branch m2k8 adct")(branch(2, 8, cbs(0)).count())
    time("branch m16k32 adct")(branch(16, 32, cbs(3)).count())
    val adct = branch(16, 32, cbs(3))
    val hits = ext.join(adct, Seq("probe_id", "vec_id"))
    val full = ext.agg(count(lit(1)).as("n_exact"))
      .crossJoin(adct.agg(count(lit(1)).as("n_adc")))
      .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
    time("one full audit branch")(full.count())
    time("one full audit branch again")(full.count())
  }
}
