package graft.sources.tx

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The table format's bucket transform as a catalog V2 FUNCTION — the
  * piece that turns the recorded bucket layout into a STORAGE-PARTITIONED
  * JOIN: [[TxScan]] reports `KeyGroupedPartitioning(bucket(n, keys...))`
  * (one partition per kept bucket, keyed by bucket id), Spark resolves
  * the `bucket` transform through the owning [[TxCatalog]]'s
  * FunctionCatalog surface to THIS function, and two Tx tables with the
  * same layout (same bucket-key types, same nBuckets) then sort-merge
  * scan-to-join with ZERO Exchange on either side — at 100 TB the
  * difference between a co-located fact⋈fact join and reshuffling both
  * facts. Mixed layouts are Spark's business: different nBuckets or key
  * types make the two TransformExpressions non-equivalent and
  * EnsureRequirements falls back to the normal shuffle plan (sound,
  * never wrong — the report is advisory).
  *
  * The bound function computes EXACTLY the writers' hash —
  * `pmod(xxhash64(keys...), n)` (XxHash64 seed 42 over the typed key
  * columns, `Tx.bucketOf`) — so the one case where Spark ever EVALUATES
  * it (shuffling a non-Tx side into the Tx layout under
  * `spark.sql.sources.v2.bucketing.shuffle.enabled`) lands rows in the
  * same buckets the format would. Spark binds it with the transform's
  * argument shape: `(numBuckets INT, key1, key2, ...)`.
  *
  * `canonicalName` carries the KEY TYPES: the SPJ compatibility check
  * compares canonical names (plus the transforms' numBuckets), and the
  * format's hash is type-sensitive — an int-keyed and a long-keyed table
  * must never be declared co-partitioned even when their values align.
  */
object TxBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, keys...) — graft-tx bucket id: " +
      "pmod(xxhash64(keys...), numBuckets)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2 &&
      inputType.fields.head.dataType == IntegerType,
      s"graft-tx bucket: expected (numBuckets INT, key, ...), got " +
        inputType.simpleString)
    new TxBucketBound(inputType.fields.tail.map(_.dataType).toSeq)
  }
}

class TxBucketBound(keyTypes: Seq[DataType])
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] =
    (IntegerType +: keyTypes).toArray
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String =
    s"graft-tx.bucket(${keyTypes.map(_.catalogString).mkString(",")})"
  override def isResultNullable: Boolean = false

  // the writers' exact expression, bound over (slot 1..k of the input
  // row); XxHash64's eval is stateless, so one instance serves all rows
  @transient private lazy val hash =
    new org.apache.spark.sql.catalyst.expressions.XxHash64(
      keyTypes.zipWithIndex.map { case (dt, i) =>
        org.apache.spark.sql.catalyst.expressions.BoundReference(
          i + 1, dt, nullable = true)
      })

  override def produceResult(input: InternalRow): Integer = {
    val nb = input.getInt(0)
    val h = hash.eval(input).asInstanceOf[Long]
    (((h % nb) + nb) % nb).toInt
  }
}
