package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Percentage-consistency repair, null handling, and the data-quality summary.
  *
  * Reference semantics:
  *  - P3-P5/P7/P14 (src/transform/transform.py:139-182): for each fuel column f
  *    with a twin `f_perc`, recompute `calc = f / GENERATION * 100`; where
  *    `|calc - f_perc| > tolerance` replace the stored percentage with the
  *    recomputed one. Float division by 0.0 yields ±Infinity and null
  *    propagates — identical in Polars and Spark doubles. A null comparison in
  *    the `when` predicate is falsy → keeps the raw value, matching Polars.
  *  - P8-P10 (src/transform/transform.py:186-200): count rows with ANY null,
  *    drop rows with null key columns, fill remaining float nulls with 0.0.
  *  - S10 (src/transform/transform.py:223-233): 2-column literal summary table.
  *
  * Scale note: repair + null handling are pure per-row projections/filters —
  * no shuffle, fused into one codegen stage. The quality *counts* are separate
  * actions; at scale compute them in one pass with a single `agg` of
  * conditional sums (see [[inconsistencyCounts]]) rather than one job per fuel.
  */
object Quality {

  val DefaultTolerance = 1.0

  /** `f / g * 100` with IEEE float semantics for g == 0 (±Infinity, NaN for
    * 0/0) — matching Polars. Spark's non-ANSI `/` returns NULL on a zero
    * denominator, so the IEEE cases are synthesized explicitly.
    */
  private[operators] def ieeeDivPct(f: Column, g: Column): Column =
    when(g === 0.0,
      when(f > 0.0, lit(Double.PositiveInfinity))
        .when(f < 0.0, lit(Double.NegativeInfinity))
        .when(f === 0.0, lit(Double.NaN))) // f null → null, like division
      .otherwise(f / g * lit(100.0))

  /** P3-P5 + P14: repair `_perc` columns inconsistent with fuel/GENERATION*100. */
  def repairPercentages(
      df: DataFrame,
      fuels: Seq[String] = graft.schema.Schemas.repairableFuels,
      tolerance: Double = DefaultTolerance): DataFrame = {
    val present = df.columns.toSet
    val repairable = fuels.filter(f => present(f) && present(f + "_perc") && present("GENERATION"))
    // One select, not N withColumns: single projection node over the 34-col row.
    val out = df.columns.map { c =>
      repairable.find(f => c == f + "_perc") match {
        case Some(f) =>
          val calc = ieeeDivPct(col(f), col("GENERATION"))
          // NaN guard: Polars' `NaN > tol` is false (keeps raw) but Spark
          // and DuckDB order NaN above every double — make the Polars
          // behavior explicit so all three engines agree.
          when(isnan(calc), col(c))
            .when(abs(calc - col(c)) > tolerance, calc)
            .otherwise(col(c)).as(c)
        case None => col(c)
      }
    }
    df.select(out.toIndexedSeq: _*)
  }

  /** P7 as a single job: per-fuel count of rows whose stored percentage deviates
    * beyond tolerance. One scan + one partial-aggregating `agg` instead of the
    * reference's one filter-count pass per fuel.
    */
  def inconsistencyCounts(
      df: DataFrame,
      fuels: Seq[String] = graft.schema.Schemas.repairableFuels,
      tolerance: Double = DefaultTolerance): Map[String, Long] = {
    val present = df.columns.toSet
    val repairable = fuels.filter(f => present(f) && present(f + "_perc") && present("GENERATION"))
    if (repairable.isEmpty) return Map.empty
    val aggs = repairable.map { f =>
      val calc = ieeeDivPct(col(f), col("GENERATION"))
      sum(when(isnan(calc), 0L)
        .when(abs(calc - col(f + "_perc")) > tolerance, 1L).otherwise(0L)).as(f)
    }
    val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
    repairable.zipWithIndex.map { case (f, i) =>
      f -> (if (row.isNullAt(i)) 0L else row.getLong(i))
    }.toMap
  }

  /** P8: count of rows where any column is null (horizontal OR). */
  def anyNullCount(df: DataFrame): Long =
    df.filter(df.columns.map(col(_).isNull).reduce(_ || _)).count()

  /** P9+P10: drop rows with null keys, then fill float-typed nulls with 0.0. */
  def handleMissing(df: DataFrame, keyCols: Seq[String] = Seq("_id", "DATETIME")): DataFrame = {
    val keys = keyCols.filter(df.columns.contains(_))
    val dropped = if (keys.nonEmpty) df.na.drop(keys) else df
    val floatCols = dropped.schema.fields
      .filter(_.dataType == DoubleType).map(_.name).toIndexedSeq
    if (floatCols.isEmpty) dropped else dropped.na.fill(0.0, floatCols)
  }

  /** Dead-letter routing: tag every row with the FIRST violated rule's
    * name ("ok" when none) — the ingest-quarantine split a pipeline runs
    * before the sink, so malformed rows land in a dead-letter table WITH
    * a reason instead of silently vanishing in a filter. Rules are
    * (name, isViolated) pairs evaluated in order (first match wins —
    * deterministic reason codes when a row breaks several rules). One
    * codegen'd CASE chain per row: pushes anywhere a filter does, and
    * the quarantine table is `filter(dl_reason != 'ok')` with zero extra
    * passes.
    */
  def deadLetterTag(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty)
    require(rules.map(_._1).distinct == rules.map(_._1), "rule names must be unique")
    require(!rules.exists(_._1 == "ok"), "'ok' is the reserved clean tag")
    df.withColumn("dl_reason",
      coalesce(rules.map { case (n, c) => when(c, lit(n)) } :+ lit("ok"): _*))
  }

  /** Declarative expectation-suite audit in ONE aggregation pass: each
    * rule is (name, isViolated); unlike deadLetterTag's first-match row
    * routing, EVERY rule counts EVERY row it rejects (a row violating
    * three rules appears in three totals — suite semantics, not
    * quarantine semantics). One wide aggregate over one scan computes
    * per-rule violation counts and the smallest offending id (all
    * map-side combinable — the shuffle carries 2·rules+1 numbers per
    * partition regardless of data size), then `stack` unpivots the wide
    * row into the per-rule report with an exact ppm pass rate
    * (int64 floored division; counts are non-negative so Spark `div`
    * == DuckDB `//`). At 100 TB this is a single bandwidth-bound scan;
    * adding a rule adds two accumulators, never a pass.
    */
  def expectationReport(
      df: DataFrame,
      idCol: Column,
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty)
    require(rules.map(_._1).distinct == rules.map(_._1), "rule names must be unique")
    // names are spliced into stack()'s SQL string and accumulator aliases
    require(rules.forall(_._1.matches("[A-Za-z0-9_]+")),
      s"rule names must be [A-Za-z0-9_]+, got: ${rules.map(_._1).mkString(", ")}")
    val aggs = count(lit(1)).as("__n") +: rules.flatMap { case (name, bad) =>
      val v = coalesce(bad, lit(false)) // a null predicate is "not violated"
      Seq(count_if(v).as(s"__v_$name"), min(when(v, idCol)).as(s"__m_$name"))
    }
    val wide = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    val stacked = rules.map { case (n, _) => s"'$n', __v_$n, __m_$n" }.mkString(", ")
    wide
      .select(col("__n"), expr(
        s"stack(${rules.size}, $stacked) AS (rule, n_violations, min_offender)"))
      .select(col("rule"), col("n_violations"), col("min_offender"),
        col("__n").as("n_rows"),
        // empty input: a NULL pass rate on both engines (Spark div would
        // yield NULL here but DuckDB's `//` ERRORS on zero — guard both
        // sides explicitly so the cross-engine contract is the guard,
        // not two engines' coincident zero behavior)
        when(col("__n") === 0, lit(null).cast("long"))
          .otherwise(expr("((__n - n_violations) * 1000000) div __n"))
          .as("pass_ppm"))
  }

  /** S10: the literal-rows quality summary table. */
  def qualitySummary(
      spark: SparkSession,
      totalRaw: Long,
      totalClean: Long,
      issues: Seq[(String, Long)]): DataFrame = {
    import spark.implicits._
    (Seq("Total raw records" -> totalRaw, "Total clean records" -> totalClean) ++ issues)
      .toDF("Check", "Count")
  }

  /** All pre-dedup quality statistics in ONE aggregation pass (scale: one
    * scan instead of one job per metric — the reference runs a separate
    * filter-count per fuel plus two null scans).
    *
    * Valid on the typed, pre-repair frame: repair never changes the null
    * pattern (a null calc or null raw keeps the raw value), so any-null and
    * key-null counts equal their post-repair values.
    */
  final case class TransformStats(
      totalRaw: Long,
      anyNullRows: Long,
      nullKeyRows: Long,
      inconsistencies: Map[String, Long])

  def transformStats(
      typed: DataFrame,
      keyCols: Seq[String] = Seq("_id", "DATETIME"),
      fuels: Seq[String] = graft.schema.Schemas.repairableFuels,
      tolerance: Double = DefaultTolerance): TransformStats = {
    val present = typed.columns.toSet
    val repairable = fuels.filter(f => present(f) && present(f + "_perc") && present("GENERATION"))
    val keys = keyCols.filter(present)
    val anyNull = typed.columns.map(col(_).isNull).reduce(_ || _)
    val keyNull =
      if (keys.isEmpty) lit(false) else keys.map(col(_).isNull).reduce(_ || _)
    val aggs =
      Seq(count(lit(1)).as("__total"),
        sum(when(anyNull, 1L).otherwise(0L)).as("__anynull"),
        sum(when(keyNull, 1L).otherwise(0L)).as("__keynull")) ++
      repairable.map { f =>
        val calc = ieeeDivPct(col(f), col("GENERATION"))
        sum(when(isnan(calc), 0L)
          .when(abs(calc - col(f + "_perc")) > tolerance, 1L).otherwise(0L)).as(f)
      }
    val row = typed.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
    def l(i: Int) = if (row.isNullAt(i)) 0L else row.getLong(i)
    TransformStats(l(0), l(1), l(2),
      repairable.zipWithIndex.map { case (f, i) => f -> l(i + 3) }.toMap)
  }
}
