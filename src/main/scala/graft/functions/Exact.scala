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

  /** Like [[dsum]] but at decimal scale 4 — for money-magnitude columns.
    *
    * Why a lower scale: engines convert the final DECIMAL to double by
    * scaled-int division, which is only correctly rounded while the scaled
    * integer fits in 2^53. At scale 10 a ~1e9 sum scales to ~1e19 and the
    * oracle's conversion drifts by an ulp; at scale 4 sums up to ~1e11 stay
    * exact. Money values carry ≤4 true decimal digits, so the per-row
    * rounding at scale 4 is unambiguous.
    */
  def dsum4(c: Column): Column = sum(c.cast("decimal(30,4)")).cast("double")

  /** Exact sum of a product of two doubles (revenue-style), as double.
    * The per-row product is IEEE double (identical in any engine); only the
    * accumulation is decimalized. Scale 4: see [[dsum4]].
    */
  def dsumProduct(a: Column, b: Column): Column =
    sum((a * b).cast("decimal(30,4)")).cast("double")

  /** Order-independent mean: exact decimal sum / non-null count. */
  def davg(c: Column): Column = dsum(c) / count(c)
}
