package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketed-table co-located join: both sides bucketed on the join key →
  * sort-merge join with ZERO exchanges (the SCALE.md claim that bucketing
  * elides the fact⋈fact shuffle, demonstrated rather than asserted).
  */
class BucketingSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("join of two tables bucketed on the key plans no Exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    try {
      (1L to 1000L).map(i => (i, s"o$i")).toDF("k", "ov")
        .write.bucketBy(8, "k").sortBy("k").saveAsTable("b_orders")
      (1L to 3000L).map(i => (i % 1000 + 1, s"l$i")).toDF("k", "lv")
        .write.bucketBy(8, "k").sortBy("k").saveAsTable("b_lines")

      // disable auto-broadcast so the join would otherwise shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("b_orders").join(spark.table("b_lines"), "k")
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"))
        assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
        assert(joined.count() == 3000)
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lines")
    }
  }

  test("repartition-on-bucket-key landing writes exactly ONE file per bucket") {
    // The q240/q241 landing discipline: repartition(nb, key) uses the same
    // murmur3-hash-mod-nb as bucketBy's bucket assignment, so each writer
    // task owns exactly one bucket. Without it a write from k input
    // partitions emits up to k files PER bucket and the read side must
    // merge several sorted runs per bucket (ScaleProbe's bktjoin family
    // measured the join paying for that merge).
    val nb = 8
    spark.sql("DROP TABLE IF EXISTS b_onefile")
    try {
      (1L to 4000L).map(i => (i, s"v$i")).toDF("k", "v")
        .repartition(16) // simulate a many-partition upstream
        .repartition(nb, col("k"))
        .write.bucketBy(nb, "k").sortBy("k").saveAsTable("b_onefile")
      val loc = java.net.URI.create(
        spark.sql("DESCRIBE TABLE EXTENDED b_onefile")
          .filter(col("col_name") === "Location")
          .head().getString(1)).getPath
      val files = new java.io.File(loc).listFiles()
        .filter(f => f.getName.startsWith("part-"))
      assert(files.length == nb,
        s"expected $nb bucket files, got ${files.length}: ${files.map(_.getName).mkString(", ")}")
      // and every bucket id 0..nb-1 appears exactly once (bucket id is
      // encoded as _00000_ in the file name)
      val bucketIds = files.map(_.getName).map { n =>
        "_(\\d{5})\\.".r.findFirstMatchIn(n).map(_.group(1).toInt)
          .getOrElse(fail(s"no bucket id in $n"))
      }.toSet
      assert(bucketIds == (0 until nb).toSet)
    } finally spark.sql("DROP TABLE IF EXISTS b_onefile")
  }
}
