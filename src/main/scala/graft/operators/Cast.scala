package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Lenient type coercion for the stringly-typed landing zone.
  *
  * Reference semantics (src/transform/transform.py:121-137):
  *  - C1: `str.strptime(Datetime, "%Y-%m-%dT%H:%M:%S", strict=False)` — null on
  *    malformed input (proven by tests/test_transform.py:74-77).
  *  - C2: `cast(Float64, strict=False)` — null on non-numeric
  *    (tests/test_transform.py:79-82); ints widen to double.
  *  - O1: result sorted by the timestamp column (transform.py:131).
  *
  * Spark mapping: `to_timestamp` / non-ANSI `cast` both return null on failure
  * (this engine runs with `spark.sql.ansi.enabled=false`), so no UDF is needed
  * and the whole stage stays inside whole-stage codegen.
  */
object Cast {

  val IsoFormat = "yyyy-MM-dd'T'HH:mm:ss"

  /** C1: lenient string→timestamp parse; null on malformed. */
  def parseTimestamp(df: DataFrame, colName: String, fmt: String = IsoFormat): DataFrame =
    df.withColumn(colName, to_timestamp(col(colName), fmt))

  /** C2: lenient →double cast for each named column; null on non-numeric. */
  def castNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    val present = cols.filter(df.columns.contains(_)).toSet
    // Single select instead of chained withColumn: one projection node, keeps
    // the analyzer cost linear in column count (34-wide table).
    df.select(df.columns.map { c =>
      if (present(c)) col(c).cast(DoubleType).as(c) else col(c)
    }.toIndexedSeq: _*)
  }

  /** C1+C2+O1 composed, mirroring `_parse_and_cast`. */
  def parseAndCast(df: DataFrame, dtCol: String, numericCols: Seq[String]): DataFrame =
    castNumeric(parseTimestamp(df, dtCol), numericCols).orderBy(col(dtCol))
}
