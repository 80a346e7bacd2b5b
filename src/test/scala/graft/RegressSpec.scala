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

  /** Reference isqrt (floor of the exact square root) for expected values. */
  private def isqrtL(x: Long): Long = {
    val r0 = math.sqrt(x.toDouble).floor.toLong
    val r1 = if ((r0 + 1) * (r0 + 1) <= x) r0 + 1 else r0
    if (r1 * r1 > x) r1 - 1 else r1
  }

  test("perfect lines pin r_fp to the grid ends") {
    val df = Seq(("a", 0L, 1L), ("a", 1L, 3L), ("a", 2L, 5L),
      ("d", 0L, 9L), ("d", 1L, 7L), ("d", 2L, 5L)).toDF("g", "x", "y")
    val rows = Regress.linearFitExact(df, col("g"), col("x"), col("y"))
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    val a = rows("a")
    assert(a.getAs[Long]("n") == 3L)
    assert(a.getAs[Long]("slope_num") == 12L && a.getAs[Long]("den") == 6L)
    assert(a.getAs[Long]("intercept_num") == 6L)
    assert(a.getAs[Long]("r_fp") == 10000L)
    assert(rows("d").getAs[Long]("r_fp") == -10000L)
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
    assert(rows("c").getAs[Long]("den") == 0L)
    assert(rows("c").isNullAt(rows("c").fieldIndex("r_fp")),
      "constant x must yield NULL r_fp, not divide by zero")
  }

  test("noisy fit r_fp equals the isqrt-grid reference value") {
    val pts = (1L to 100L).map(i => (i, 3 * i + (i % 7)))
    val df = pts.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val r = Regress.linearFitExact(df, col("g"), col("x"), col("y")).head()
    val n = pts.size.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    val syyC = n * syy - sy * sy
    val expected = num.sign * math.min(10000L,
      (10000L * num.abs) / (isqrtL(den) * isqrtL(syyC)))
    assert(r.getAs[Long]("r_fp") == expected)
    assert(expected > 9900L && expected < 10000L, s"r_fp=$expected should be near 1")
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
    assert(one.getAs[Long]("r_fp") == many.getAs[Long]("r_fp"))
  }
}
