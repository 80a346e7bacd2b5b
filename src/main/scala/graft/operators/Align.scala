package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema alignment: coerce an arbitrary incoming frame to a canonical schema —
  * missing columns added as typed nulls, extra columns dropped, output column
  * order = schema order.
  *
  * Reference semantics: src/transform/transform.py:91-118 (`_align_schema`):
  * `with_columns(lit(None).alias(c))` for missing then `select(cs.by_name(...))`.
  *
  * Scale note: this is pure projection — zero shuffle, fully fused into the scan
  * stage by Catalyst, and the `select` enables column pruning of dropped extras
  * all the way down to the parquet reader.
  */
object Align {

  /** Keep only `target`'s columns, adding typed nulls for the missing ones. */
  def alignSchema(df: DataFrame, target: StructType): DataFrame = {
    val existing = df.columns.toSet
    val cols = target.fields.map { f =>
      if (existing(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** P1 variant: projection by name-set, `require_all=False` — intersect the
    * requested names with what's actually present (reference:
    * src/transform/transform.py:116, src/app/components/charts.py:22).
    */
  def selectPresent(df: DataFrame, names: Seq[String]): DataFrame = {
    val existing = df.columns.toSet
    df.select(names.filter(existing).map(col).toIndexedSeq: _*)
  }

  /** P14: drop columns by suffix (reference: src/transform/transform.py:180,
    * `df.drop(cs.ends_with("_diff","_calc"))`).
    */
  def dropBySuffix(df: DataFrame, suffixes: String*): DataFrame =
    df.drop(df.columns.filter(c => suffixes.exists(c.endsWith)).toIndexedSeq: _*)
}
