package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join splitting, demonstrated rather than asserted (SCALE.md
  * names it the first line of defense before `Analytics.saltedJoin`): a
  * deliberately skewed sort-merge join must show `skew=true` partitions in
  * the final adaptive plan, with output identical to the unskewed-path
  * result.
  */
class SkewJoinSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("AQE splits a skewed SMJ partition (skew=true in the final plan)") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 95% of the left rows share one hot key; right side is uniform
      val left = spark.range(0, 200000)
        .select(
          when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
          concat(lit("padpadpadpadpadpadpadpad-"), col("id")).as("payload"))
      val right = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("rv"))
      val joined = left.join(right, "k")
      // execute THIS Dataset's QueryExecution — AQE finalizes the plan at
      // runtime, so an unexecuted plan never shows skew splits
      assert(joined.collect().length == 200000, "every left row matches one right key")
      val adaptive = joined.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }
      assert(adaptive.isDefined, "expected an adaptive plan")
      val finalPlan = adaptive.get.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE to mark the hot partition skewed, got:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
