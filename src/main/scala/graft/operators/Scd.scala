package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history built from a changelog — the
  * warehouse-side companion of the keyed idempotent upsert sink
  * ([[graft.sources.Merge]]): where the reference's upsert keeps only the
  * LATEST row per key (`src/db/upsert.py` semantics), SCD2 keeps every
  * state a key has passed through as a `[valid_from, valid_to)` interval,
  * which is what point-in-time (as-of) joins against dimension history
  * need.
  *
  * Construction: order each key's changelog by (ts, tieBreak), keep rows
  * whose state differs from the previous row (gaps-and-islands collapse of
  * consecutive equal states — null-safe, so a null state is a real state),
  * then number the surviving segments and close each with the next
  * segment's start. The open segment (valid_to null) is the current row,
  * exactly the row the upsert sink would hold.
  *
  * Scale shape: two window passes over the same (key) partitioning — one
  * exchange, per-key work linear in that key's changelog; no global sort,
  * no driver state. Re-running on a grown changelog only appends/extends
  * segments (the collapse is prefix-stable), so the history can be
  * maintained incrementally through the partitioned upsert.
  */
object Scd {

  /** @param tieBreak total-orders rows at equal `ts` (e.g. the event id). */
  def scd2(
      df: DataFrame, key: String, ts: String, tieBreak: String,
      state: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    val heads = df
      .withColumn("__prev", lag(col(state), 1).over(w))
      .withColumn("__first", row_number().over(w) === 1)
      // null-safe inequality: first row of the key, or state changed
      .filter(col("__first") || !(col("__prev") <=> col(state)))
    val ws = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    heads.select(
        col(key),
        row_number().over(ws).as("version"),
        col(state).as("state"),
        col(ts).as("valid_from"),
        lead(col(ts), 1).over(ws).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time join — the consumer side of [[scd2]]: each fact row
    * picks the dimension state that was valid AT ITS OWN timestamp
    * (`valid_from <= ts < valid_to`, open segment unbounded). Left join:
    * facts predating the key's first version keep NULL state — a real
    * answer ("no dimension state existed yet"), not a dropped row.
    *
    * Scale shape: an equi-join on the dimension KEY with the interval
    * predicate folded into the join condition — the shuffle is keyed by
    * the dimension key, and each fact row meets only its key's version
    * rows (bounded by versions-per-key, not history size). Intervals are
    * disjoint per key by construction, so the join preserves fact
    * cardinality exactly — which the oracle hash verifies.
    */
  def pitJoin(
      fact: DataFrame, factKey: String, factTs: String,
      history: DataFrame, histKey: String): DataFrame = {
    val h = history.select(
      col(histKey).as("__hk"), col("version"), col("state"),
      col("valid_from"), col("valid_to"))
    fact.join(h,
      col(factKey) === col("__hk") &&
        col("valid_from") <= col(factTs) &&
        (col("valid_to").isNull || col(factTs) < col("valid_to")),
      "left")
      .drop("__hk", "valid_from", "valid_to")
  }
}
