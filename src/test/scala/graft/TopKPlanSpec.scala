package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics
import graft.plans.TopKPerGroupExec

/** The custom TopKPerGroup Catalyst operator: result parity with the
  * window idiom, heap semantics on ties and small groups, and the
  * physical shape (partial/final pair, groups×k exchange, exchange
  * ELIDED when the child already clusters by the group key).
  */
class TopKPlanSpec extends AnyFunSuite with SparkFixture with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("matches the window row_number formulation on skewed random data") {
    val df = (1 to 5000).map { i =>
      val g = (i * 2654435761L % 37).toInt // skewed-ish group sizes
      (g, (i * 48271 % 1000), i.toLong)
    }.toDF("g", "v", "id")
    val native = Analytics.topKPerGroupNative(
      df, Seq("g"), Seq(("v", true), ("id", false)), 3)
    val window = Analytics.topKPerGroup(
      df, Seq("g"), Seq(col("v").desc, col("id").asc), 3)
    assert(sortedRows(native) === sortedRows(window))
  }

  test("ties resolve by the unique tiebreaker, groups smaller than k pass through") {
    val df = Seq(
      ("a", 10, 1L), ("a", 10, 2L), ("a", 10, 3L), // all-tied group
      ("b", 5, 4L), //                                 singleton group
      ("c", 7, 5L), ("c", 9, 6L)).toDF("g", "v", "id")
    val out = Analytics.topKPerGroupNative(
      df, Seq("g"), Seq(("v", true), ("id", false)), 2)
      .orderBy("g", "id").collect().map(r => (r.getString(0), r.getLong(2)))
    assert(out.toSeq === Seq(("a", 1L), ("a", 2L), ("b", 4L), ("c", 5L), ("c", 6L)))
  }

  test("plans as partial+final exec pair with one exchange between") {
    val df = (1 to 100).map(i => (i % 7, i)).toDF("g", "v")
      .withColumn("id", col("v").cast("long"))
    val out = Analytics.topKPerGroupNative(
      df, Seq("g"), Seq(("v", true), ("id", false)), 2)
    out.collect() // finalize any adaptive plan
    val plan = out.queryExecution.executedPlan
    val topks = collect(plan) { case e: TopKPerGroupExec => e }
    assert(topks.map(_.partial).sorted === Seq(false, true))
    val shuffles = collect(plan) { case s: ShuffleExchangeExec => s }
    assert(shuffles.size === 1)
  }

  test("exchange is elided when the input already clusters by the group key") {
    val df = (1 to 100).map(i => (i % 7, i)).toDF("g", "v")
      .withColumn("id", col("v").cast("long"))
      .repartition(col("g"))
    val out = Analytics.topKPerGroupNative(
      df, Seq("g"), Seq(("v", true), ("id", false)), 2)
    out.collect()
    val shuffles = collect(out.queryExecution.executedPlan) {
      case s: ShuffleExchangeExec => s
    }
    // only the explicit repartition's own exchange — none added for top-k
    assert(shuffles.size === 1)
  }

  test("registered via GraftExtensions: SQL-visible functions and strategy coexist") {
    // the lazy per-session registration path (plain session) is what the
    // other tests exercise; here just confirm the strategy is present
    assert(spark.experimental.extraStrategies
      .contains(graft.plans.TopKPerGroupStrategy))
  }
}
