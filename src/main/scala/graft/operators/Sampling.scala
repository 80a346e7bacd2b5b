package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the reproducible alternative to
  * RNG sampling for corpus downsampling and data-mix rebalancing (per-
  * source/language rates when assembling a training mix).
  *
  * A row is kept iff md5(key) mod 10000 < rate·10000: no RNG state, so the
  * sample is identical across runs, engines, partitionings and cluster
  * sizes, membership is stable under incremental reprocessing (a doc's
  * fate never changes when the corpus around it grows), and the SAME
  * predicate is expressible in any engine with md5 — which is what puts it
  * under the cross-engine oracle gate, unlike `df.sample`/`sampleBy`
  * (engine-specific RNG). Pure codegen'd filter: pushes below joins,
  * no shuffle.
  */
object Sampling {

  /** Uniform bucket in [0, 10000) from the row key (md5-derived). */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 10000

  /** Keep ~`rate` of rows, deterministically by key. */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    df.filter(hashBucket(key) < math.round(rate * 10000).toInt)
  }

  /** [[hashSample]] with the rate DERIVED from a fixed ABSOLUTE row target:
    * threshold = min(10000, 10000·target/n) on the 10⁻⁴ grid (pure integer
    * arithmetic — one driver-side 1-row count, bounded by contract), then
    * the same md5-bucket membership filter.
    *
    * Why absolute, not fractional: a fixed-FRACTION sample keeps any
    * quadratic downstream term (e.g. an exact-truth pair join's Σdf²)
    * growing as p²·N² under corpus growth; a fixed-size sample pins the
    * audited slice — and therefore the audit's cost — CONSTANT as the
    * corpus scales 8×/16×/32×. The derived threshold is reproducible in
    * any engine (same count, same integer division), keeping the sampled
    * slice identical cross-engine; within one corpus the sample stays
    * deterministic and growth-stable in the keys it retains (a kept doc
    * only ever leaves because the corpus grew and the rate tightened).
    */
  def hashSampleTarget(df: DataFrame, key: Column, targetRows: Long): DataFrame = {
    require(targetRows > 0)
    val n = df.count()
    val threshold = math.min(10000L, 10000L * targetRows / math.max(n, 1L))
    df.filter(hashBucket(key) < lit(threshold))
  }

  /** Soft (quality-weighted) sampling: each row's keep probability is its
    * own `weightFp` — an INTEGER in [0, 10000] computed row-side (e.g. a
    * quality score on the 10⁴ grid), compared against the md5 bucket of
    * `salt:key`. Deterministic and growth-stable exactly like
    * [[hashSample]]; the salt decorrelates the draw from other hash-based
    * decisions on the same key (split assignment, uniform sampling), so a
    * doc's sampling fate is independent of its split. Pure codegen'd
    * filter — pushes below joins, no shuffle, no RNG state.
    */
  def weightedHashSample(
      df: DataFrame, key: Column, weightFp: Column, salt: String = "wq"): DataFrame =
    // The clamp DOCUMENTS the contract range, it does not change behavior:
    // the bucket is always in [0, 10000), so a weight above 10000 keeps
    // everything and a negative weight drops everything, clamped or not.
    // Out-of-range weights are config errors a caller should surface with
    // [[auditWeightRange]] (a row-level require can't run driver-side).
    // A NULL weight means "no score" and drops the row, made explicit here
    // via coalesce(0) rather than left to three-valued NULL-comparison
    // semantics.
    df.filter(hashBucket(concat(lit(s"$salt:"), key.cast("string")))
      < least(greatest(coalesce(weightFp, lit(0)), lit(0)), lit(10000)))

  /** Companion audit for [[weightedHashSample]]: counts of NULL / negative /
    * above-grid weights (each silently drop-all or keep-all in the sample
    * itself). A pipeline runs this 1-row check beside the sample and fails
    * or alerts when a count is nonzero — surfacing the config errors the
    * sample's pure-filter shape cannot (one map-side-combined aggregate,
    * no shuffle of the data).
    */
  def auditWeightRange(df: DataFrame, weightFp: Column): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      count_if(weightFp.isNull).as("n_null_weight"),
      count_if(weightFp < 0).as("n_negative_weight"),
      count_if(weightFp > 10000).as("n_above_grid"))

  /** Repeat-factor data mixing — the upsampling side of mix assembly:
    * weight w per stratum means every row appears floor(w) times plus one
    * extra copy kept with probability frac(w). The fractional keep is
    * decided by md5(key:copy), so the mix is deterministic across
    * engines/runs/cluster sizes and stable under corpus growth, exactly
    * like [[hashSample]]. floor/ceil/threshold are computed DRIVER-side
    * into integer literals (one codegen'd CASE each) — no runtime float
    * arithmetic whose rounding could diverge between engines.
    *
    * Scale shape: explode multiplies rows map-side (no shuffle); the copy
    * index rides along so downstream shuffles spread duplicated keys.
    * Weights above `maxWeight` are refused — a fat weight on a fat
    * stratum silently multiplying the corpus is a config error, not a
    * plan.
    */
  def epochMix(
      df: DataFrame,
      key: Column,
      stratum: Column,
      weights: Map[String, Double],
      default: Double,
      maxWeight: Double = 8.0): DataFrame = {
    require((default +: weights.values.toSeq).forall(w => w >= 0 && w <= maxWeight),
      s"epoch weights must be in [0, $maxWeight]")
    def cases(f: Double => Long): Column =
      weights.foldLeft(lit(f(default))) { case (acc, (s, w)) =>
        when(stratum === s, lit(f(w))).otherwise(acc)
      }
    val nFull = cases(w => math.floor(w).toLong)
    val nTotal = cases(w => math.ceil(w).toLong)
    val fracThreshold = cases(w => math.round((w - math.floor(w)) * 10000))
    df.withColumn("copy_idx",
        explode(sequence(lit(0L), greatest(nTotal - 1L, lit(0L)))))
      .filter(col("copy_idx") < nFull ||
        hashBucket(concat(key.cast("string"), lit(":"), col("copy_idx"))) < fracThreshold)
  }

  /** Deterministic dataset split (train/val/test): labels with cumulative
    * fractions over the same md5 bucket as [[hashSample]]. The LAST label
    * absorbs the remainder, so fractions must sum to < 1 exclusive of it.
    * A row's split never changes as the corpus grows, and adding a new
    * split at the tail never moves existing rows — the properties an
    * eval-contamination audit depends on.
    */
  def assignSplit(key: Column, fractions: Seq[(String, Double)], last: String): Column = {
    require(fractions.nonEmpty || last.nonEmpty)
    require(fractions.map(_._2).sum <= 1.0 + 1e-9)
    val thresholds = fractions
      .scanLeft(("", 0L)) { case ((_, cum), (label, f)) =>
        (label, cum + math.round(f * 10000))
      }
      .drop(1)
    val bucket = hashBucket(key)
    thresholds.foldRight(lit(last)) { case ((label, cumThreshold), acc) =>
      when(bucket < cumThreshold, lit(label)).otherwise(acc)
    }
  }

  /** Per-GROUP fixed-target sampling — [[hashSampleTarget]] generalized to
    * one absolute target per group (semantic cluster, language, shard)
    * with the thresholds derived IN THE PLAN: one windowed count per
    * group partition, then the same integer-grid rate and md5 membership.
    * No driver-side count per group, no collect — the calibration rides
    * the same single exchange that groups the rows, so the op works
    * unchanged whether there are 16 clusters or 16 million.
    *
    * The balancing half of cluster-balanced corpus assembly (SemDeDup-
    * style pipelines sample a fixed budget per embedding cluster so
    * over-represented regions of embedding space don't dominate the mix).
    */
  def balancedSampleByGroup(
      df: DataFrame, group: Column, key: Column, targetRows: Long): DataFrame = {
    require(targetRows > 0)
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__n", count(lit(1)).over(Window.partitionBy(group)))
      .withColumn("__th",
        least(lit(10000L), expr(s"(10000 * $targetRows) div __n")))
      .filter(hashBucket(key) < col("__th"))
      .drop("__n", "__th")
  }

  /** Exact integer square root: floor(√x) for 0 ≤ x < 2^52. The libm
    * `sqrt` result can land one off after `floor` when x sits next to a
    * perfect square, so the candidate is corrected by ±1 with pure int64
    * comparisons — the SAME three-step formula any SQL engine reproduces,
    * which is what makes √-shaped weights (temperature sampling) oracle-
    * checkable where raw doubles wouldn't be.
    */
  def isqrt(x: Column): Column = {
    val r0 = floor(sqrt(x.cast("double"))).cast("long")
    r0 + when((r0 + 1) * (r0 + 1) <= x, 1L).otherwise(0L) -
      when(r0 * r0 > x, 1L).otherwise(0L)
  }

  /** Temperature-scaled (α = 1/2) mixture calibration — the multilingual
    * α-sampling of Conneau & Lample 2019 / mT5, in exact integer
    * arithmetic: stratum s gets sampling mass ∝ n_s^α, flattening the
    * head and lifting under-resourced strata. With α = 1/2 the weight is
    * w_s = isqrt(n_s · 10^6) (≈ √n_s on a 10⁻³ grid), the per-stratum doc
    * target is the floor-division allocation of `targetRows`, and the keep
    * threshold is the [[hashSampleTarget]] integer-grid rate — every step
    * int64, so the whole calibration (and the realized sample) is engine-
    * reproducible. Returns one row per stratum:
    * (stratum, n_rows, w_fp, target_rows, threshold).
    *
    * Scale shape: the stratum table is |strata| rows (broadcast); the
    * corpus contributes one map-side-combined count. Floor allocation
    * under-fills by at most |strata| rows — a bias audit, not a bug.
    */
  def temperatureTargets(
      df: DataFrame, stratum: Column, targetRows: Long): DataFrame = {
    require(targetRows > 0)
    val counts = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("w_fp", isqrt(col("n_rows") * 1000000L))
    val tot = counts.agg(sum(col("w_fp")).as("__sw"))
    counts.crossJoin(broadcast(tot))
      .withColumn("target_rows",
        expr(s"($targetRows * w_fp) div __sw"))
      .withColumn("threshold",
        least(lit(10000L), expr("(10000 * target_rows) div n_rows")))
      .drop("__sw")
  }

  /** Per-stratum rates (e.g. language → keep fraction), `default` for
    * strata not listed. One codegen'd CASE over the stratum column.
    */
  def stratifiedHashSample(
      df: DataFrame,
      key: Column,
      stratum: Column,
      rates: Map[String, Double],
      default: Double): DataFrame = {
    require((default +: rates.values.toSeq).forall(r => r >= 0 && r <= 1))
    val threshold = rates.foldLeft(lit(math.round(default * 10000).toInt)) {
      case (acc, (s, r)) => when(stratum === s, lit(math.round(r * 10000).toInt)).otherwise(acc)
    }
    df.filter(hashBucket(key) < threshold)
  }
}
