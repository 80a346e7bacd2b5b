package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact one-pass linear regression via the Gram sums — the distributed
  * "linear probe" a corpus-curation loop fits over quality signals (does
  * token count track document length? does quality drift with recency?)
  * without any iterative solver: for y = a·x + b per group, the normal
  * equations reduce to integer Cramer's rule over five sums
  * (n, Σx, Σy, Σx², Σxy), all map-side combined in ONE aggregation.
  *
  * Scale shape: the corpus contributes a single partial-aggregated pass —
  * no iteration, no driver round-trips, |groups| result rows. This is the
  * 100 TB way to fit per-source trend lines: the shuffle carries five
  * longs per group, never rows.
  *
  * Determinism: results are exact RATIONALS (numerator/denominator int64
  * pairs over the shared determinant), not float quotients — bit-identical
  * in any engine, so the whole fit sits under the cross-engine oracle
  * gate. R² is the exact rational (num², den·(n·Σy²−(Σy)²)) carried in
  * decimal(38,0) because the squares exceed int64.
  */
object Regress {

  /** Per-group exact least-squares fit of `y` on `x` (both integral).
    * Returns (grp, n, slope_num, den, intercept_num, r2_num, r2_den):
    * slope = slope_num/den, intercept = intercept_num/den,
    * R² = r2_num/r2_den; den = 0 marks a degenerate group (constant x).
    */
  def linearFitExact(df: DataFrame, group: Column, x: Column, y: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    df.select(group.as("grp"), x.cast("long").as("x"), y.cast("long").as("y"))
      .groupBy("grp")
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      .select(
        col("grp"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("den"),
        (col("sy") * col("sxx") - col("sx") * col("sxy")).as("intercept_num"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("syy_c"))
      .select(
        col("grp"), col("n"), col("slope_num"), col("den"), col("intercept_num"),
        (col("slope_num").cast(d38) * col("slope_num").cast(d38)).as("r2_num"),
        (col("den").cast(d38) * col("syy_c").cast(d38)).as("r2_den"))
  }
}
