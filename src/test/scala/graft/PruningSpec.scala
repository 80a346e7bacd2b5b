package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Partition pruning on a hive-partitioned layout: a partition-column
  * filter never touches the other partitions' files (the 100 TB data-
  * skipping primitive, demonstrated on the physical plan).
  */
class PruningSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("partition-column filter prunes to one partition directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    Seq((1L, "click", 1.0), (2L, "view", 2.0), (3L, "click", 3.0), (4L, "error", 4.0))
      .toDF("id", "event_type", "value")
      .write.partitionBy("event_type").parquet(s"$dir/t")

    val q = spark.read.parquet(s"$dir/t").filter(col("event_type") === "click")
    assert(q.count() == 2)
    val scan = q.queryExecution.executedPlan.collectLeaves().head
    val meta = scan.toString
    // the scan carries the partition filter, and the data filter set stays
    // empty — pruning happened at planning, not at read time
    assert(meta.contains("PartitionFilters") && meta.contains("event_type"),
      s"expected partition filter in scan:\n$meta")
    // the physical scan selected exactly the matching partition's files
    val files = q.queryExecution.executedPlan.collectLeaves().head match {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.toPartitionArray.map(_.filePath.toString)
      case other => fail(s"unexpected leaf: $other")
    }
    assert(files.nonEmpty && files.forall(_.contains("event_type=click")),
      s"expected only click partition files, got: ${files.toSeq}")
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    // fact partitioned by day; dim maps day → label, filter selects one label
    (1L to 2000L).map(i => (i, (i % 10).toInt, i * 1.0)).toDF("id", "day", "v")
      .write.partitionBy("day").parquet(s"$dir/fact")
    (0 until 10).map(d => (d, if (d == 3) "hot" else "cold")).toDF("day", "label")
      .toDF("day", "label").write.parquet(s"$dir/dim")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    try {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("label") === "hot")
      val q = fact.join(dim, "day")
      assert(q.count() == 200) // day 3 only
      // the fact scan must carry a dynamic pruning predicate on the
      // partition column — the dim filter reached the fact's file listing
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"expected dynamic partition pruning in plan:\n$plan")
    } finally
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
  }

  test("runtime bloom-filter join: selective dim side injects a fact pre-filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    (1L to 200000L).map(i => (i % 5000, i * 1.0)).toDF("k", "v")
      .write.parquet(s"$dir/fact")
    (1L to 5000L).map(i => (i, s"d$i")).toDF("k", "name")
      .write.parquet(s"$dir/dim")
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force SMJ so the filter matters
    val saved = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("name") === "d42")
      val q = fact.join(dim, "k")
      assert(q.count() == 40)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"expected a runtime bloom filter on the fact scan:\n$plan")
    } finally saved.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None) => spark.conf.unset(c)
    }
  }
}
