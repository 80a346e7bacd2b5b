package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent exact aggregates for cross-engine verification.
  *
  * Double `sum`/`avg` depend on accumulation order, which differs between any
  * two engines (and between runs at different parallelism) — so results can
  * never hash-match an oracle bit-for-bit. Summing in DECIMAL is exact and
  * associative; casting the exact decimal back to double is a single
  * deterministic IEEE rounding. The oracle SQL mirrors the same construction
  * (`CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE)`).
  *
  * Scale note: decimal partial aggregation is still map-side combinable — one
  * shuffle of 128-bit accumulators, no extra pass; cost vs a double sum is a
  * constant factor on the agg, not on the scan.
  */
object Exact {

  /** Exact sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast("decimal(30,10)")).cast("double")

  /** Exact sum of a product of two doubles (revenue-style), as double.
    * The per-row product is IEEE double (identical in any engine); only the
    * accumulation is decimalized.
    */
  def dsumProduct(a: Column, b: Column): Column =
    sum((a * b).cast("decimal(30,10)")).cast("double")

  /** Order-independent mean: exact decimal sum / non-null count. */
  def davg(c: Column): Column = dsum(c) / count(c)
}
