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
}
