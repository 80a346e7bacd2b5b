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
  * gate. Goodness of fit rides the same isqrt fixed-point convention as
  * [[pearsonPairsFp]] (r on the 10⁻⁴ grid), because the exact R² rational
  * (num², den·syy_c) exceeds int64 and decimal128 outputs are not
  * digestible by a typed cross-engine hash.
  */
object Regress {

  /** Pairwise Pearson correlation of k integral signals, fixed-point on
    * the 10⁻⁴ grid — the redundancy audit over quality signals (two
    * signals with |r| ≈ 1 gate the same documents; a filter stack wants
    * decorrelated signals). One aggregation computes all k + k(k+1)/2
    * sums map-side combined; each pair row is then pure arithmetic:
    * num = n·Σxy − Σx·Σy, sx = isqrt(n·Σx² − (Σx)²), and
    * r_fp = sign(num)·(10⁴·|num|) div (sx·sy) — truncation toward zero on
    * NON-NEGATIVE operands, so the quotient is engine-identical (floor vs
    * trunc never diverges). sx·sy = 0 (a constant signal) yields NULL.
    *
    * Not mathematically floor(10⁴·r): the denominator is
    * isqrt(dx)·isqrt(dy), not isqrt(dx·dy) (whose product overflows
    * int64) — off by at most ~2·10⁻⁴·r and clamped to [−10⁴, 10⁴] (the
    * floor'd denominator underestimates, so perfect correlation would
    * otherwise read 10⁴+ε), and every engine computes the SAME integers,
    * which is the contract that matters under the oracle gate. Callers
    * bound the sums' magnitude; with a fixed-target sample (n ≈ 400,
    * signals < 2¹⁶) everything stays far inside int64.
    *
    * Returns (x_name, y_name, n, num, sx, sy, r_fp) per unordered pair.
    */
  def pearsonPairsFp(df: DataFrame, feats: Seq[(String, Column)]): DataFrame = {
    require(feats.size >= 2 && feats.size <= 8, s"need 2..8 signals, got ${feats.size}")
    val names = feats.map(_._1)
    require(names.distinct == names, "signal names must be unique")
    val named = df.select(feats.map { case (nm, c) => c.cast("long").as(nm) }: _*)
    val aggs = (names.map(nm => sum(col(nm)).as(s"s_$nm")) ++
      (for { (a, i) <- names.zipWithIndex; (b, j) <- names.zipWithIndex if i <= j }
        yield sum(col(a) * col(b)).as(s"s_${a}_$b"))).toList
    val g = named.agg(count(lit(1)).as("n"), aggs: _*)
    val pairRows = for {
      (a, i) <- names.zipWithIndex; (b, j) <- names.zipWithIndex if i < j
    } yield struct(
      lit(a).as("x_name"), lit(b).as("y_name"), col("n").as("n"),
      (col("n") * col(s"s_${a}_$b") - col(s"s_$a") * col(s"s_$b")).as("num"),
      Sampling.isqrt(col("n") * col(s"s_${a}_$a") - col(s"s_$a") * col(s"s_$a")).as("sx"),
      Sampling.isqrt(col("n") * col(s"s_${b}_$b") - col(s"s_$b") * col(s"s_$b")).as("sy"))
    g.select(inline(array(pairRows: _*)))
      .withColumn("r_fp",
        when(col("sx") * col("sy") === 0, lit(null).cast("long"))
          .otherwise(signum(col("num")).cast("long") *
            least(expr("(10000 * abs(num)) div (sx * sy)"), lit(10000L))))
  }

  /** Per-group exact least-squares fit of `y` on `x` (both integral).
    * Returns (grp, n, slope_num, den, intercept_num, r_fp):
    * slope = slope_num/den, intercept = intercept_num/den; den = 0 marks
    * a degenerate group (constant x). r_fp is the Pearson r of the fit on
    * the 10⁻⁴ grid via the [[pearsonPairsFp]] convention —
    * sign(num)·(10⁴·|num|) div (isqrt(den)·isqrt(syy_c)), clamped to
    * ±10⁴, NULL when either signal is constant; R² ≈ (r_fp/10⁴)². All
    * int64 (the exact R² rational would need 128 bits; a typed
    * cross-engine hash cannot digest decimal128, so the isqrt grid is the
    * checkable form). Numeric domain (the Gram-sum limit, NOT a
    * rows-at-scale claim): every Gram term — n·Σx², n·Σxy, (Σx)², ΣxΣy —
    * is bounded by n²·max(|x|,|y|)² and must stay < 2⁶³, and the centered
    * moments den/syy_c feed [[Sampling.isqrt]], whose 3-step correction
    * is exact only for inputs < 2⁵² — so the binding constraint is
    * n·max(|x|,|y|) < 2²⁶ ≈ 6.7·10⁷ (e.g. n ≲ 6·10³ groups rows at
    * |x|,|y| < 10⁴, or n ≲ 6·10⁵ at |x|,|y| < 10²), plus
    * 10⁴·|num| < 2⁶³ which is implied by it. Callers fitting over more
    * rows per group must pre-aggregate x into coarser units first; the
    * in-repo callers (per-day/per-bucket fits, ≤ a few hundred rows per
    * group) sit far inside the domain.
    */
  def linearFitExact(df: DataFrame, group: Column, x: Column, y: Column): DataFrame = {
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
      .withColumn("__sx", Sampling.isqrt(col("den")))
      .withColumn("__sy", Sampling.isqrt(col("syy_c")))
      .select(
        col("grp"), col("n"), col("slope_num"), col("den"), col("intercept_num"),
        when(col("__sx") * col("__sy") === 0, lit(null).cast("long"))
          .otherwise(signum(col("slope_num")).cast("long") *
            least(expr("(10000 * abs(slope_num)) div (__sx * __sy)"), lit(10000L)))
          .as("r_fp"))
  }
}
