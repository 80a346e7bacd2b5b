package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wide→long unpivot for serving/charting.
  *
  * Reference semantics (src/app/components/charts.py:22-23, 55-58):
  * `df.unpivot(index=dt_col, variable_name="Fuel", value_name="value")` over
  * the fuel (or `_perc`) columns; preceded by an explicit projection (P1) and
  * optionally a derived column (P6: `CARBON = GENERATION - ZERO_CARBON`,
  * charts.py:91).
  *
  * Spark mapping: the built-in `Dataset.unpivot` (Spark ≥3.4) — a generator
  * (`Expand`) node, zero shuffle, output rows = input rows × value-column
  * count. Scale note: unpivot multiplies row count; at 100 TB always project
  * to the needed columns first (Catalyst prunes, but being explicit keeps the
  * Expand narrow) and filter BEFORE unpivoting when the predicate is on id
  * columns.
  */
object Reshape {

  /** R1: unpivot `valueCols` into (variable, value) long format keyed by `ids`. */
  def unpivot(
      df: DataFrame,
      ids: Seq[String],
      valueCols: Seq[String],
      variableName: String = "Fuel",
      valueName: String = "value"): DataFrame =
    df.unpivot(
      ids.map(col).toArray,
      valueCols.map(col).toArray,
      variableName,
      valueName)

  /** P6: derived chart column CARBON = GENERATION − ZERO_CARBON. */
  def withCarbon(df: DataFrame): DataFrame =
    df.withColumn("CARBON", col("GENERATION") - col("ZERO_CARBON"))
}
