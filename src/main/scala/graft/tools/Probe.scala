package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: component-level timing probes
  * (current target: q161 winnow-overlap and q168 dup-spans stage
  * decomposition — where do 15 s go on a 6k-doc corpus?).
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
    val base = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val aug = base
      .unionByName(base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), expr("substring(text, 15)").as("text")))
      .unionByName(base.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 200000).as("doc_id"), col("text")))

    // warm the parquet
    time("warm scan")(aug.count())
    time("warm scan 2")(aug.count())

    // --- q161 decomposition ---
    val grams = aug.select(col("doc_id"),
      posexplode(graft.functions.Text.wordNgrams(graft.functions.Text.tokens(col("text")), 5))
        .as(Seq("pos", "gram")))
    time("gram explode (no hash)")(grams.count())
    val hashed = grams.select(col("doc_id"), col("pos"),
      conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long").as("h"))
    time("gram explode + md5")(hashed.select(sum(col("h"))).count())
    val fp = graft.operators.Winnow.fingerprints(aug, "doc_id", "text", k = 5, w = 4)
    time("fingerprints")(fp.count())
    time("fingerprints again")(fp.count())
    val ov = graft.operators.Winnow.overlapPairs(fp, "doc_id", maxDf = 8)
    time("overlapPairs on computed fp")(ov.count())
    time("q161 full")(graft.operators.Winnow.overlapPairs(
      graft.operators.Winnow.fingerprints(aug, "doc_id", "text", k = 5, w = 4),
      "doc_id", maxDf = 8).filter(col("n_shared") >= 2).count())

    // --- q168 decomposition ---
    val sh = aug.withColumn("toks", graft.functions.Text.tokens(col("text")))
      .withColumn("shash", graft.operators.TextDedup.shingleHashes("toks", 3))
      .select("doc_id", "shash")
    time("shingles")(sh.count())
    val cand = graft.operators.TextDedup.minhashLshCandidates(
      sh, "doc_id", "shash", k = 8, bandRows = 2)
    time("lsh candidates")(cand.count())
    val runs = graft.operators.Winnow.longestSharedRuns(aug, "doc_id", "text", cand, k = 5)
    time("longestSharedRuns")(runs.count())
  }
}
