package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, IntegerType, FloatType}

/** Time-bucketed resampling (downsample) and date-range filtering.
  *
  * Reference semantics:
  *  - A4 (src/app/utils/helpers.py:31-46): `group_by_dynamic(DATETIME,
  *    every=interval).agg(col("*").mean()).sort(DATETIME)` with intervals
  *    30m/1h/1d/1mo/1y (conf/config.json:11). Polars bins are left-closed and
  *    labelled by bin START — matching both `window().start` and `date_trunc`.
  *    The mean covers every other column, including `_id` — quirk preserved
  *    (we average every NUMERIC column).
  *  - P11 (src/app/utils/helpers.py:49-59): `is_between(start, end)` inclusive
  *    on both ends — Spark `between` is also inclusive-inclusive.
  *  - Composition order (src/app/streamlit_app.py:92-93): resample FIRST, then
  *    date-filter on the bucket labels. A bucket whose start falls outside the
  *    range is excluded even if raw rows fall inside — preserved by
  *    [[resampleThenFilter]].
  *
  * Scale note: fixed-width buckets are a pure expression → the groupBy is one
  * hash shuffle with map-side partial aggregation; bucket count is tiny
  * relative to input so the reduce side is cheap. Calendar buckets (`1mo`/`1y`)
  * use `date_trunc` because Spark's `window()` rejects month/year durations.
  */
object Resample {

  /** Bucket-start expression for an interval key: 30m/1h/1d/1mo/1y. */
  def bucketStart(dt: Column, every: String): Column = every match {
    // Epoch arithmetic for fixed widths: codegen-friendly, NTZ-safe, and
    // identical to Polars' left-closed bin-start labelling.
    case "30m" => timestamp_seconds(floor(unix_timestamp(dt) / 1800L) * 1800L)
    case "1h"  => date_trunc("hour", dt)
    case "1d"  => date_trunc("day", dt)
    case "1mo" => date_trunc("month", dt)
    case "1y"  => date_trunc("year", dt)
    case other => throw new IllegalArgumentException(s"unsupported interval: $other")
  }

  private val numericTypes = Set[org.apache.spark.sql.types.DataType](
    DoubleType, LongType, IntegerType, FloatType)

  /** A4: tumbling-bucket mean of every numeric column, sorted by bucket. */
  def downsample(df: DataFrame, dtCol: String, every: String): DataFrame = {
    val valueCols = df.schema.fields
      .filter(f => f.name != dtCol && numericTypes(f.dataType))
      .map(_.name).toIndexedSeq
    require(valueCols.nonEmpty, "no numeric columns to aggregate")
    val aggs = valueCols.map(c => avg(col(c)).as(c))
    df.groupBy(bucketStart(col(dtCol), every).as(dtCol))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col(dtCol))
  }

  /** P11: inclusive-inclusive timestamp range filter. */
  def filterByDate(df: DataFrame, dtCol: String, start: String, end: String): DataFrame =
    df.filter(col(dtCol).between(lit(start).cast("timestamp"), lit(end).cast("timestamp")))

  /** §3.2 read-path composition: resample THEN filter on bucket labels. */
  def resampleThenFilter(
      df: DataFrame, dtCol: String, every: String, start: String, end: String): DataFrame =
    filterByDate(downsample(df, dtCol, every), dtCol, start, end)

  /** Densify a bucketed frame: the complete left-closed bucket axis from
    * the frame's min to max bucket, empty buckets present with NULL
    * aggregates (callers zero-fill counts as their semantics demand) —
    * dashboards and window models need the time axis dense, and a missing
    * bucket is informative (an outage), not skippable.
    *
    * Scale shape: the axis is `range-width / bucket-width` rows built from
    * a 1-row bounds aggregate — thousands of rows for years of data — so
    * the completion join broadcasts the axis; the bucketed frame is
    * already aggregated (tiny relative to raw input).
    */
  def gapFill(buckets: DataFrame, dtCol: String, every: String): DataFrame = {
    val step = every match {
      case "30m" => "interval 30 minutes"
      case "1h"  => "interval 1 hour"
      case "1d"  => "interval 1 day"
      case "1mo" => "interval 1 month"
      case "1y"  => "interval 1 year"
      case other => throw new IllegalArgumentException(s"unsupported interval: $other")
    }
    val axis = buckets
      .agg(min(col(dtCol)).as("__lo"), max(col(dtCol)).as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"), expr(step))).as(dtCol))
    // left-outer build side must be the right: the bucketed frame (already
    // aggregated, tiny) broadcasts; the axis streams
    axis.join(broadcast(buckets), Seq(dtCol), "left").orderBy(col(dtCol))
  }

  /** Settlement-grid completeness audit: the reference's feed is
    * half-hourly energy data (native interval "30m",
    * src/app/utils/helpers.py:33-38) fetched incrementally by keyset
    * pagination (src/ingest/fetch_neso.py:42-78) — the failure mode an
    * operator actually watches for is a day with MISSING settlement
    * periods (a fetch died mid-page, the upstream republished a partial
    * day). Per day: row count, distinct slots present out of
    * `slotsPerDay`, missing-slot count, and the first missing slot id
    * (NULL when complete) — enough to target a backfill at day + slot.
    *
    * Scale shape: slot is a pure expression, one map-side-combined
    * groupBy(day); the expected grid is synthesized per day with
    * `sequence`, never joined against a calendar table. Exact integers
    * throughout.
    */
  def completenessAudit(df: DataFrame, ts: Column, slotsPerDay: Int = 48): DataFrame = {
    require(slotsPerDay >= 1 && slotsPerDay <= 1440 && 1440 % slotsPerDay == 0,
      s"slotsPerDay must divide 1440, got $slotsPerDay")
    val minutesPerSlot = 1440 / slotsPerDay
    df.select(to_date(ts).as("day"),
        floor((hour(ts) * 60 + minute(ts)) / lit(minutesPerSlot)).cast("int").as("slot"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_rows"), collect_set(col("slot")).as("__slots"))
      .select(col("day"), col("n_rows"),
        size(col("__slots")).as("n_present"),
        (lit(slotsPerDay) - size(col("__slots"))).as("n_missing"),
        array_min(array_except(
          sequence(lit(0), lit(slotsPerDay - 1)), col("__slots"))).as("first_missing_slot"))
  }
}
