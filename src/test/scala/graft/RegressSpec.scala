package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Regress

/** Exact Gram-matrix least squares: known fits come out as exact
  * rationals, perfect lines get R² = 1 exactly, constant-x groups
  * degenerate to den = 0 instead of dividing by zero.
  */
class RegressSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("perfect line y = 2x + 1 fits exactly with R^2 = 1") {
    val df = Seq(("a", 0L, 1L), ("a", 1L, 3L), ("a", 2L, 5L)).toDF("g", "x", "y")
    val r = Regress.linearFitExact(df, col("g"), col("x"), col("y")).head()
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Long]("slope_num") == 12L && r.getAs[Long]("den") == 6L)
    assert(r.getAs[Long]("intercept_num") == 6L)
    assert(r.getAs[java.math.BigDecimal]("r2_num").longValueExact == 144L)
    assert(r.getAs[java.math.BigDecimal]("r2_den").longValueExact == 144L)
  }

  test("noisy fit is the exact textbook rational; constant x degenerates to den=0") {
    // (0,0),(1,1),(2,1): slope = 1/2, intercept = 1/6, R^2 = 3/4
    val df = Seq(("n", 0L, 0L), ("n", 1L, 1L), ("n", 2L, 1L),
      ("c", 7L, 1L), ("c", 7L, 5L)).toDF("g", "x", "y")
    val rows = Regress.linearFitExact(df, col("g"), col("x"), col("y"))
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    val n = rows("n")
    assert(n.getAs[Long]("slope_num") * 2 == n.getAs[Long]("den"))
    assert(n.getAs[Long]("intercept_num") * 6 == n.getAs[Long]("den"))
    val r2n = n.getAs[java.math.BigDecimal]("r2_num").longValueExact
    val r2d = n.getAs[java.math.BigDecimal]("r2_den").longValueExact
    assert(r2n * 4 == r2d * 3)
    assert(rows("c").getAs[Long]("den") == 0L)
  }

  test("pearsonPairsFp: perfect +/- correlation hits the grid ends, constant signal is NULL") {
    val df = (1L to 50L).map(i => (i, 2 * i, 100 - i, 7L)).toDF("a", "b", "c", "k")
    val rows = Regress.pearsonPairsFp(df, Seq(
      "a" -> col("a"), "b" -> col("b"), "c" -> col("c"), "k" -> col("k")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(rows(("a", "b")).getAs[Long]("r_fp") == 10000L)
    assert(rows(("a", "c")).getAs[Long]("r_fp") == -10000L)
    assert(rows(("a", "k")).isNullAt(rows(("a", "k")).fieldIndex("r_fp")))
    assert(rows.size == 6)
  }

  test("fit is partitioning-invariant (map-side combine, no order terms)") {
    val pts = (1L to 100L).map(i => ("g", i, 3 * i + (i % 7)))
    val one = Regress.linearFitExact(
      pts.toDF("g", "x", "y").repartition(1), col("g"), col("x"), col("y")).head()
    val many = Regress.linearFitExact(
      pts.toDF("g", "x", "y").repartition(13), col("g"), col("x"), col("y")).head()
    assert(one.getAs[Long]("slope_num") == many.getAs[Long]("slope_num"))
    assert(one.getAs[Long]("den") == many.getAs[Long]("den"))
    assert(one.getAs[java.math.BigDecimal]("r2_num") == many.getAs[java.math.BigDecimal]("r2_num"))
  }
}
