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
}
