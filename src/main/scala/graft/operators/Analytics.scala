package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-table / windowed analytics operators — the engine surface beyond
  * reference parity (SURVEY.md §2.8, §7.4). The reference itself has zero
  * joins; these are the operators a user of its *data* would reach for at
  * scale, expressed so Catalyst picks the right physical join.
  *
  * Scale notes (100 TB design):
  *  - Dimension joins (`region`/`nation`/`supplier`/`customer`) must be
  *    broadcast — callers pass dims through [[dim]] so the plan never
  *    shuffles the fact side for them.
  *  - Fact⋈fact (`lineitem⋈orders`) is left to sort-merge + AQE (skew
  *    handling, runtime shuffle coalescing) — no hint, because at 100 TB a
  *    broadcast is impossible and SMJ on the join key is the right plan.
  *  - Top-k per group is the window `row_number <= k` idiom: one shuffle on
  *    the partition keys, map-side-combinable nothing — but rank truncation
  *    happens before any further join, keeping downstream data tiny.
  */
object Analytics {

  /** Mark a dimension table broadcast-able. */
  def dim(df: DataFrame): DataFrame = broadcast(df)

  /** Top-k rows per group via the custom [[graft.plans.TopKPerGroupPlan]]
    * operator (partial bounded heaps → groups×k-row exchange → final
    * heaps) instead of the window `row_number <= k` idiom, which sorts the
    * ENTIRE input behind a full-data exchange. `orderSpec` is (column,
    * descending?) and must define a total order (tie-break with a unique
    * id) for deterministic output. Registers the planner strategy on the
    * session if absent, so plain sessions (driver's Verify/Bench) work
    * without `withExtensions`. The window-idiom [[topKPerGroup]] below is
    * the built-in formulation it replaces; both are kept so the plans and
    * results can be compared (TopKPlanSpec).
    */
  def topKPerGroupNative(
      df: DataFrame,
      groupCols: Seq[String],
      orderSpec: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
    import org.apache.spark.sql.graftshim.DatasetShim
    import graft.plans.{TopKPerGroupPlan, TopKPerGroupStrategy}
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    val analyzed = DatasetShim.analyzed(df)
    def attr(n: String) = analyzed.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val order = orderSpec.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    DatasetShim.ofRows(spark,
      TopKPerGroupPlan(groupCols.map(attr), order, k, analyzed))
  }

  /** O5: stable positional slice rows (start, end] in `sortCols` order
    * (reference semantics: DataFrame.slice for a display page).
    *
    * Scale shape: `orderBy.limit(end)` plans as TakeOrderedAndProject —
    * every partition keeps its own top-`end`, a single merge keeps the
    * global top-`end` — so the full input is never globally sorted and no
    * task ever holds more than `end` rows. The row_number window that then
    * numbers the slice runs over those ≤ `end` rows only. Cost is bounded
    * by the PAGE position, not the table: the right plan for the UI-page
    * semantics O5 serves. (A slice deep enough that `end` itself is huge is
    * a different operator — keyset pagination, S2 — and that is how the
    * reference pages too.)
    *
    * `sortCols` must be a total order (include a unique tiebreaker) or the
    * slice boundary between equal keys is nondeterministic.
    */
  def stableSlice(df: DataFrame, sortCols: Seq[Column], start: Int, end: Int): DataFrame = {
    require(start >= 0 && end >= start, s"bad slice bounds ($start, $end]")
    val outCols = df.columns.map(col).toSeq
    val w = Window.orderBy(sortCols: _*) // bounded: ≤ end rows reach it
    df.orderBy(sortCols: _*).limit(end)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > start)
      .select(outCols: _*)
  }

  /** Top k rows per group, deterministic: `orderCols` must include a
    * unique tiebreaker. One shuffle on `partitionCols`.
    */
  def topKPerGroup(
      df: DataFrame,
      partitionCols: Seq[String],
      orderCols: Seq[Column],
      k: Int): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Band (range) join: all (left, right) pairs with
    * |leftTs − rightTs| <= maxGap, composed scale-correctly as an
    * interval-bucketed equi-join — both sides bucket by
    * floor(ts / maxGap), the left probes its own and both neighbor
    * buckets, and the exact predicate filters the candidates. Candidate
    * volume is O(rows × density per bucket) instead of the cross join a
    * naive inequality join plans; all three bucket probes are one shuffle
    * (the explode happens before the exchange).
    */
  /** Exponentially-weighted moving average in EXACT fixed point — the
    * dashboard smoothing op (the reference's resample averages are the
    * box-filter cousin) made engine-reproducible where float EWMA never
    * is: α = 1/2 with the window truncated at `lags` rows, so the weights
    * are powers of two and the whole estimate is one int64 fold.
    *
    * With the frame's m ≤ lags values ordered oldest→newest and weight
    * 2^p for the p-th (newest highest), the normalized EWMA collapses to
    * `(Σ x_p·2^p) div (2^m − 1)` — pure integer, no float accumulation
    * order to diverge. Magnitude: |x| ≤ 10^9 fp units keeps the fold
    * under 2^53 at lags=16. The final division is sign-safe (divide the
    * magnitude, re-apply the sign) so a negative weighted sum computes
    * the same value as DuckDB's floored `//` — Spark's bare `div`
    * truncates toward zero and would diverge by one fp unit there.
    *
    * Scale shape: one per-key window (hash-partition by key, sort within)
    * + a codegen'd per-row fold over ≤ `lags` elements; nothing global.
    */
  def ewmaFp(
      df: DataFrame, key: String, ts: String, tieBreak: String,
      vfpCol: String, lags: Int = 16): DataFrame = {
    require(lags >= 1 && lags <= 32, s"lags must be in [1,32], got $lags")
    val w = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
      .rowsBetween(-(lags - 1), Window.currentRow)
    df.withColumn("__lst", collect_list(col(vfpCol)).over(w))
      .withColumn("__f", aggregate(col("__lst"),
        struct(lit(1L).as("w"), lit(0L).as("s")),
        (acc, x) => struct(
          (acc.getField("w") * 2).as("w"),
          (acc.getField("s") + x * acc.getField("w")).as("s"))))
      .withColumn("ewma_fp", expr(
        "CASE WHEN __f.s < 0 THEN -((-__f.s) div (__f.w - 1)) " +
          "ELSE __f.s div (__f.w - 1) END"))
      .drop("__lst", "__f")
  }

  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      maxGapSeconds: Long,
      extraCond: Column = lit(true)): DataFrame = {
    val gapUs = maxGapSeconds * 1000000L
    def us(c: Column) = unix_micros(c.cast("timestamp"))
    val l = left
      .withColumn("__lus", us(col(leftTs)))
      .withColumn("__b", explode(array(
        floor(col("__lus") / gapUs) - 1,
        floor(col("__lus") / gapUs),
        floor(col("__lus") / gapUs) + 1)))
    val r = right
      .withColumn("__rus", us(col(rightTs)))
      .withColumn("__b", floor(col("__rus") / gapUs))
    l.join(r, Seq("__b"))
      .filter(abs(col("__lus") - col("__rus")) <= gapUs && extraCond)
      .drop("__b", "__lus", "__rus")
  }

  /** Skew-mitigating salted equi-join: the big (skewed) side gets a
    * deterministic per-row salt in [0, salts); the small side is replicated
    * once per salt value; the join runs on (key, salt). A hot key's rows
    * spread over `salts` reducers instead of one straggler task. Result is
    * row-identical to the plain join (inner/left semantics preserved).
    *
    * At 100 TB prefer AQE's automatic skew-join splitting first
    * (`spark.sql.adaptive.skewJoin.enabled`, on by default); explicit
    * salting is for the cases AQE can't split — e.g. a skewed aggregation
    * feeding the join, or sort-merge buckets beyond the split threshold.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Skew-SPLIT join — the differentiated alternative to [[saltedJoin]]:
    * instead of salting every key (which multiplies the small side by
    * `salts` for the 99% of keys that never needed it), one cheap
    * map-side-combined count pass finds the ACTUAL heavy keys
    * (n ≥ heavyThreshold — heavy keys are few by definition, so the key
    * list broadcasts), then the join runs twice: the heavy keys'
    * dimension rows broadcast (their fact rows never shuffle at all —
    * the hot key's whole problem), the light keys take the normal
    * shuffle join, and the union is row-identical to the plain join
    * (which is exactly what the q191 oracle checks). This is the shape
    * AQE's skew-join mitigation approximates at runtime, made explicit
    * and deterministic.
    */
  def skewSplitJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      heavyThreshold: Long): DataFrame = {
    require(heavyThreshold >= 1)
    val heavy = big.groupBy(key).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= heavyThreshold).select(key)
    val bigHeavy = big.join(broadcast(heavy), Seq(key), "left_semi")
    val bigLight = big.join(broadcast(heavy), Seq(key), "left_anti")
    val smallHeavy = small.join(broadcast(heavy), Seq(key), "left_semi")
    bigHeavy.join(broadcast(smallHeavy), Seq(key))
      .unionByName(bigLight.join(small, Seq(key)))
  }

  /** AS-OF join: for every left row, the single latest right row with
    * `rightTs <= leftTs` within the same `key` (the time-series point
    * lookup Spark has no built-in operator for).
    *
    * Spark-first composition — no range join, no per-row subquery: tag and
    * union both sides, then one window pass per key ordered by (ts, side)
    * carries the most recent right payload forward (`last_value IGNORE
    * NULLS`), and left rows read it off. ONE shuffle on the key, linear in
    * rows — at 100 TB this beats a range join's quadratic bucket blowup
    * and is the standard streaming-warehouse formulation. Right rows tied
    * on (key, ts) are resolved by `rightTieBreak` descending first.
    *
    * Output: all left columns plus `asofCols` from the matched right row
    * (null when no right row precedes the left row).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      asofCols: Seq[String],
      rightTieBreak: String): DataFrame = {
    import org.apache.spark.sql.types.StructType
    // dedup right per (key, ts): keep highest tiebreak — makes ties
    // deterministic in both this and the oracle's ASOF formulation
    val rightDedup = Dedup.keepFirstBy(
      right, Seq(key, rightTs), Seq(col(rightTieBreak).desc))
    // struct-pack each side so the union is collision-free by construction
    val leftStruct = StructType(left.schema.fields)
    val rightStruct = StructType(asofCols.map(c => rightDedup.schema(c)).toArray)
    val leftSide = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"),
      lit(1).as("__side"), // left sorts AFTER right at equal ts → <= semantics
      struct(left.columns.map(col).toIndexedSeq: _*).as("__l"),
      lit(null).cast(rightStruct).as("__r"))
    val rightSide = rightDedup.select(
      col(key).as("__k"), col(rightTs).as("__ts"),
      lit(0).as("__side"),
      lit(null).cast(leftStruct).as("__l"),
      struct(asofCols.map(col).toIndexedSeq: _*).as("__r"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftSide.unionByName(rightSide)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(c => col(s"__l.$c").as(c)) ++
        asofCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event (per `keyCol`, ordered by `tsCol` then `tieCol`) exceeds
    * `gapSeconds`. Adds a `session_id` column (0-based per key).
    *
    * Single shuffle on `keyCol`; both windows share the same partitioning so
    * Catalyst plans one exchange + one sort.
    */
  def sessionize(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    // Microsecond precision: second-truncating functions would misclassify
    // gaps that straddle the threshold by <1s (oracle uses epoch_us too).
    def micros(c: Column) = unix_micros(c.cast("timestamp"))
    val gap = micros(col(tsCol)) - micros(lag(col(tsCol), 1).over(w))
    val newSession = when(gap.isNull || gap > gapSeconds * 1000000L, 1L).otherwise(0L)
    df.withColumn("__new", newSession)
      .withColumn("session_id", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("__new")
  }
}
