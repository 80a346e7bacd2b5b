package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

/** Pins the exact fixed-point EWMA behind q170: the closed-form
  * power-of-two fold, lag truncation, and per-key isolation.
  */
class EwmaSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def run(rows: (Long, Long, Long)*) = // (user, seq->ts order, vfp)
    Analytics.ewmaFp(
      rows.toDF("user_id", "tsk", "vfp")
        .withColumn("ts", col("tsk")), // integer ts stands in for the sort key
      key = "user_id", ts = "ts", tieBreak = "tsk", vfpCol = "vfp")
      .orderBy("user_id", "tsk")
      .collect().map(_.getAs[Long]("ewma_fp")).toSeq

  test("closed form: (Σ x_p·2^p) div (2^m − 1), newest weighted highest") {
    // x = 10, 40 -> row1: 10; row2: (10 + 2·40) div 3 = 30
    // row3 x=100 -> (10 + 2·40 + 4·100) div 7 = 490 div 7 = 70
    assert(run((1L, 1L, 10L), (1L, 2L, 40L), (1L, 3L, 100L)) == Seq(10L, 30L, 70L))
  }

  test("constant series is a fixed point (no floor drift)") {
    val out = run((1 to 40).map(i => (1L, i.toLong, 7L)): _*)
    assert(out.forall(_ == 7L))
  }

  test("truncation at 16 lags: old history stops influencing") {
    // 16 large values then 16 small: by row 32 only small values remain
    val rows = (1 to 16).map(i => (1L, i.toLong, 1000000L)) ++
      (17 to 32).map(i => (1L, i.toLong, 4L))
    assert(run(rows: _*).last == 4L)
  }

  test("keys are independent") {
    val out = run((1L, 1L, 100L), (2L, 1L, 8L))
    assert(out == Seq(100L, 8L))
  }

  test("negative weighted sums divide sign-safely (== DuckDB floored //)") {
    // row2: s = -10 + 2·(-40) = -90, d = 3 -> sign-safe -(90 div 3) = -30.
    // A floored // gives -30 too; bare Spark div on (-91,3) would give -30
    // while // gives -31 — pin a non-exact case: x = -11, -40:
    // s = -11 - 80 = -91, d = 3 -> sign-safe -(91 div 3) = -30... and
    // DuckDB -91 // 3 = -31. The repo convention is sign-safe on BOTH
    // sides (oracle mirrors the CASE), so Spark must emit -30 here.
    assert(run((1L, 1L, -10L), (1L, 2L, -40L)) == Seq(-10L, -30L))
    assert(run((2L, 1L, -11L), (2L, 2L, -40L)) == Seq(-11L, -30L))
  }
}
