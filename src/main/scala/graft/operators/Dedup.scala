package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keep-last deduplication — the reference's most distinctive operator.
  *
  * Reference semantics (src/transform/transform.py:206-220, proven by
  * tests/test_transform.py:162-204):
  *  - D1: among duplicate `_id`s keep the row with the LATEST `DATETIME`.
  *  - D2: among duplicate `DATETIME`s keep the row with the HIGHEST `_id`.
  *  - D3: D1 then D2, sequentially — order matters (the composed expected
  *    output in the reference test depends on it).
  *
  * NOT `dropDuplicates` (keeps an arbitrary row). The Spark idiom is a window
  * `row_number` per key ordered descending by the preference column.
  *
  * Scale note: each pass is ONE hash-partition shuffle on the dedup key. At
  * 100 TB the key (`_id`) is high-cardinality and near-uniform so there is no
  * skew; AQE handles stragglers. When the upstream data is already
  * hash-partitioned/bucketed by the key (e.g. a bucketed bronze table), Catalyst
  * elides the exchange entirely — keep dedup keyed on the table's bucket column.
  */
object Dedup {

  /** Keep exactly one row per `keys` group: the first under `ordering`
    * (descending "preference" columns → keep-last semantics). Pass unique
    * tiebreaker columns in `ordering` for deterministic output.
    */
  def keepFirstBy(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*).orderBy(ordering.toIndexedSeq: _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** D1: unique `_id`, keep latest `DATETIME`. */
  def keepLastById(df: DataFrame, id: String = "_id", dt: String = "DATETIME"): DataFrame =
    keepFirstBy(df, Seq(id), Seq(col(dt).desc))

  /** D2: unique `DATETIME`, keep highest `_id`. */
  def keepLastByDatetime(df: DataFrame, id: String = "_id", dt: String = "DATETIME"): DataFrame =
    keepFirstBy(df, Seq(dt), Seq(col(id).desc))

  /** D3: composed two-pass dedup (order is semantic — D1 before D2). */
  def dedupKeepLast(df: DataFrame, id: String = "_id", dt: String = "DATETIME"): DataFrame =
    keepLastByDatetime(keepLastById(df, id, dt), id, dt)
}
