package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error bounds of the q50 sketches against exact answers (the q50/q61+q66
  * accuracy-vs-scale contract): HLL++ within a few relative standard
  * deviations of the exact distinct count, approx_percentile within its
  * rank-error guarantee of the exact order statistics.
  */
class SketchBoundsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // skewed synthetic workload: 40k rows, ~7.3k distinct keys, lognormal-ish values
  private lazy val df = (1 to 40000).map { i =>
    val key = (i * 2654435761L % 7321).toInt
    val value = math.exp((i % 97) / 20.0) * 100.0
    (key, value)
  }.toDF("k", "v")

  test("approx_count_distinct(rsd=0.01) is within 5 rsd of the exact count") {
    val (approx, exact) = df
      .agg(approx_count_distinct(col("k"), rsd = 0.01), countDistinct(col("k")))
      .as[(Long, Long)].head()
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr <= 0.05, s"HLL++ rel err $relErr (approx=$approx exact=$exact)")
  }

  test("percentile_approx(acc=10000) lands within its rank-error window") {
    val n = df.count()
    val eps = 1.0 / 10000 // rank error bound for accuracy=10000
    for (q <- Seq(0.5, 0.99)) {
      val approx = df
        .agg(percentile_approx(col("v"), lit(q), lit(10000))).as[Double].head()
      // exact order statistics at the edges of the allowed rank window
      val loRank = math.max((q - 2 * eps) * n, 0.0)
      val hiRank = math.min((q + 2 * eps) * n, n.toDouble)
      val (lo, hi) = df
        .agg(
          expr(s"percentile(v, ${loRank / n})"),
          expr(s"percentile(v, ${hiRank / n})"))
        .as[(Double, Double)].head()
      assert(approx >= lo && approx <= hi,
        s"q=$q approx=$approx outside rank window [$lo, $hi]")
    }
  }
}
