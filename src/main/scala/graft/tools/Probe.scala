package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: component-level timing probes
  * (current target: prefix-filter similarity join cost decomposition on
  * the replicated probe corpus, where every replica set makes its
  * members' PREFIXES collide — the adversarial worst case for prefix
  * filtering).
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
    // prefix-join decomposition (q176 shape)
    locally {
      import org.apache.spark.sql.expressions.Window
      val (tNum, tDen) = (7, 10)
      val docs = hashed.filter(size(col("shash")) > 0)
        .select(col("doc_id").as("doc"), col("shash").as("__hs"))
      val exploded = docs
        .select(col("doc"), size(col("__hs")).as("n"), explode(col("__hs")).as("h"))
        .repartition(col("h"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("exploded postings")(exploded.count())
      val rank = exploded.groupBy("h").agg(count(lit(1)).as("__df"))
        .withColumn("rank", row_number().over(Window.orderBy(col("__df"), col("h"))))
        .select("h", "rank")
      time("vocab rank")(rank.count())
      val prefix = exploded.join(rank, "h")
        .withColumn("__rn",
          row_number().over(Window.partitionBy(col("doc")).orderBy(col("rank"))))
        .filter(col("__rn") <= col("n") - expr(s"(($tNum * n) + ${tDen - 1}) div $tDen") + 1)
        .select(col("doc"), col("n"), col("__rn").as("pos"), col("h"))
        .repartition(col("h"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("prefix postings")(prefix.count())
      val cand = prefix.as("pa")
        .join(prefix.as("pb"),
          col("pa.h") === col("pb.h") && col("pa.doc") < col("pb.doc") &&
            col("pa.n") * tDen >= col("pb.n") * tNum &&
            col("pb.n") * tDen >= col("pa.n") * tNum)
        .select(col("pa.doc").as("doc_a"), col("pb.doc").as("doc_b"),
          col("pa.n").as("na"), col("pb.n").as("nb"),
          (least(col("pa.n") - col("pa.pos"), col("pb.n") - col("pb.pos")) + 1).as("__bound"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(max(col("__bound")).as("__ub"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("candidates (length filter, pre-positional)")(cand.count())
      val candPos = cand
        .filter(col("__ub") * (tNum + tDen) >= lit(tNum) * (col("na") + col("nb")))
        .select("doc_a", "doc_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("candidates (after positional filter)")(candPos.count())
      val docsArr = hashed.filter(size(col("shash")) > 0)
        .select(col("doc_id").as("doc"), col("shash").as("__hs"))
      val ha = docsArr.select(col("doc").as("doc_a"), col("__hs").as("__ha"))
      val hb = docsArr.select(col("doc").as("doc_b"), col("__hs").as("__hb"))
      time("verify (array intersect)")(candPos.join(ha, "doc_a").join(hb, "doc_b")
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("__ha"), col("__hb"))).as("common"),
          size(col("__ha")).as("na"), size(col("__hb")).as("nb"))
        .filter(lit(tDen) * col("common") >= lit(tNum) * (col("na") + col("nb") - col("common")))
        .count())
      time("end-to-end operator")(graft.operators.TextDedup
        .prefixFilterJaccardPairs(hashed, "doc_id", "shash", tNum, tDen).count())
    }
    spark.stop()
  }
}
