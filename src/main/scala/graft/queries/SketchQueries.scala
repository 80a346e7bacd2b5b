package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Resample}
import graft.sources.Tables

/** Calendar-interval resampling over the multi-year `orders` table plus
  * sketch-based approximate aggregates.
  *
  * q50 has NO oracle entry on purpose: HLL++ and KLL/GK quantile sketches
  * are engine-specific algorithms, so cross-engine hash-matching is
  * impossible by construction — the driver records the weaker rows-only
  * check. Its exact companions ARE oracle-checked (q61 percentiles, q66
  * count/countDistinct) and SketchBoundsSpec pins the sketch error against
  * exact answers. The capability matters at 100 TB: approx_count_distinct
  * is one pass + constant memory vs countDistinct's expand-shuffle, and
  * approx_percentile avoids a full sort.
  */
object SketchQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // A4 calendar path over years of data: monthly + yearly buckets from
    // date_trunc (Spark's window() rejects month/year durations).
    "q49_resample_calendar" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      orders
        .groupBy(
          Resample.bucketStart(col("o_orderdate"), "1y").cast("timestamp_ntz").as("year"),
          Resample.bucketStart(col("o_orderdate"), "1mo").cast("timestamp_ntz").as("month"))
        .agg(
          count(lit(1)).as("n_orders"),
          graft.functions.Exact.dsum4(col("o_totalprice")).as("revenue"))
        .orderBy("month")
    }),
    // EXACT percentiles (sort-based `percentile`, type-7 interpolation —
    // the same definition as DuckDB's quantile_cont, so values hash-match).
    // The exact/approx pair q61/q50 is the accuracy-vs-scale tradeoff:
    // exact sorts per group; approx streams one sketch per group.
    "q61_exact_percentiles" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.9)").as("p90"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy("o_orderpriority")
    }),
    // Sketches ONLY: HLL++ distinct customers + order-price quantiles per
    // priority. Every exact column lives in q66 under the real oracle; what
    // remains here is genuinely engine-specific (rows-only check), and
    // SketchBoundsSpec pins the sketch error against the exact values.
    "q50_approx_stats" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          approx_count_distinct(col("o_custkey"), rsd = 0.01).as("approx_customers"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("p50_price"),
          percentile_approx(col("o_totalprice"), lit(0.99), lit(10000)).as("p99_price"))
        .orderBy("o_orderpriority")
    }),
    // The exact companion to q50, oracle-checked: per-priority cardinalities
    // the sketches approximate. countDistinct is the expand-shuffle whose
    // cost q50's one-pass constant-memory HLL++ avoids at 100 TB.
    "q66_exact_distinct" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_customers"))
        .orderBy("o_orderpriority")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q49_resample_calendar" ->
      """SELECT CAST(date_trunc('year', o_orderdate) AS TIMESTAMP) AS year,
          CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
          count(*) AS n_orders,
          CAST(sum(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS revenue
          FROM orders GROUP BY 1, 2 ORDER BY month""".replaceAll("\\s+", " "),
    "q61_exact_percentiles" ->
      """SELECT o_orderpriority,
          quantile_cont(o_totalprice, 0.5) AS p50,
          quantile_cont(o_totalprice, 0.9) AS p90,
          min(o_totalprice) AS lo, max(o_totalprice) AS hi
          FROM orders GROUP BY o_orderpriority
          ORDER BY o_orderpriority""".replaceAll("\\s+", " "),
    "q66_exact_distinct" ->
      """SELECT o_orderpriority, count(*) AS n,
          count(DISTINCT o_custkey) AS n_customers
          FROM orders GROUP BY o_orderpriority
          ORDER BY o_orderpriority""".replaceAll("\\s+", " ")
    // q50 intentionally omitted (sketch values are engine-specific)
  )
}
