package graft.sources.tx

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sources.Tx

/** Micro-batch stream whose OFFSET IS a [[graft.sources.Tx]] table's
  * version — the keyset source's offset discipline
  * ([[graft.sources.keyset.KeysetSource]]) applied to manifests instead
  * of row ids. `latestOffset` probes the newest committed version; each
  * micro-batch covers a `(fromVersion, toVersion]` span and emits ONE
  * row describing it. The row is a WAKE-UP, not the data: a change-feed
  * consumer's foreachBatch reacts by folding the span — and because
  * [[graft.operators.Mv.followChanges]] keeps its own cursor in the
  * downstream manifest, the offsets here only decide when to bother.
  * A wiped checkpoint replays spans; the cursor no-ops them — the
  * cursor, not the checkpoint, is the truth (spec-pinned).
  *
  * Usage: `spark.readStream.format("graft.sources.tx.TxTicks")
  *   .option("path", tableDir).load()` — schema
  * (from_version, to_version). Probing cost is one directory listing of
  * `_v/` per trigger; no data file is touched until a consumer reacts.
  */
class TxTicks extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TxTicks.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "TxTicks: option(\"path\", <txTableDir>) is required")
    new TxTicksTable(path)
  }
}

object TxTicks {
  val Schema: StructType = StructType(Seq(
    StructField("from_version", LongType, nullable = false),
    StructField("to_version", LongType, nullable = false)))
}

class TxTicksTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"tx-ticks($path)"
  override def schema(): StructType = TxTicks.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = TxTicks.Schema
        override def description(): String = s"TxTicksScan($path)"
        override def toMicroBatchStream(
            checkpointLocation: String): MicroBatchStream =
          new TxTicksStream(path)
      }
    }
}

case class TxVersionOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

object TxVersionOffset {
  private val Shape = """\s*\{\s*"version"\s*:\s*(\d+)\s*\}\s*""".r

  /** Strict parse of a checkpointed offset. A malformed offset means a
    * corrupted checkpoint — fail LOUDLY with the file's actual content
    * instead of silently defaulting to version 0 and replaying from
    * scratch (harmless where a downstream cursor no-ops replays, but a
    * silent full replay is still the wrong default for a consumer
    * without one).
    */
  def parse(json: String, source: String): Long = json match {
    case Shape(v) => v.toLong
    case _ => throw new IllegalArgumentException(
      s"$source: malformed checkpoint offset '$json' — expected " +
        """{"version":N}; the checkpoint is corrupted and must be """ +
        "repaired or wiped deliberately, not silently replayed from 0")
  }
}

class TxTicksStream(path: String)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def newest(): Long = Tx.latest(path).map(_.version).getOrElse(0L)

  // Trigger.AvailableNow pins the target version at prepare time: the
  // run drains up to it and stops, even if more commits land meanwhile
  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(newest())

  override def initialOffset(): Offset = TxVersionOffset(0L)

  override def latestOffset(): Offset =
    TxVersionOffset(availableNowCap.getOrElse(newest()))

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset =
    latestOffset()

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset =
    TxVersionOffset(TxVersionOffset.parse(json, "TxTicks"))

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[TxVersionOffset].version
    val hi = end.asInstanceOf[TxVersionOffset].version
    if (hi <= lo) Array.empty else Array(TxTickPartition(lo, hi))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          p: InputPartition): PartitionReader[InternalRow] = {
        val t = p.asInstanceOf[TxTickPartition]
        new PartitionReader[InternalRow] {
          private var done = false
          override def next(): Boolean =
            if (done) false else { done = true; true }
          override def get(): InternalRow = InternalRow(t.from, t.to)
          override def close(): Unit = ()
        }
      }
    }

  override def commit(end: Offset): Unit = () // the cursor is the truth
  override def stop(): Unit = ()
}

case class TxTickPartition(from: Long, to: Long) extends InputPartition
