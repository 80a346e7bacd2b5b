package graft.sources.tx

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.Tx

/** METADATA TABLES — the format's introspection surface as plain SQL,
  * resolved by [[TxCatalog]] the way every real table format exposes
  * them (Iceberg's `db.table.history`, Delta's DESCRIBE HISTORY):
  *
  * {{{
  *   SELECT version, committed_at, operation FROM tx.events.history
  *   SELECT bucket, file, bytes            FROM tx.events.files
  * }}}
  *
  * Both are METADATA-sized and served as a [[LocalScan]] — the rows are
  * computed on the driver from the manifests (history: one manifest
  * read per live version; files: one directory listing per bucket of
  * the LATEST snapshot) and handed to Spark as a local relation, the
  * honest plan for data that is O(versions)/O(files) regardless of the
  * table's data size. The reference's run-history probe
  * (/root/reference/src/serve/load.py latest-run lookup) is this shape:
  * "what landed, when" answered without touching table data.
  *
  * `history` serves, per live (non-vacuumed) version: the commit's
  * wall-clock stamp ([[Tx.CommitTsKey]] — null for manifests written
  * before stamping existed), the operation that published it
  * ([[Tx.CommitOpKey]]), the bucket count, and the total data bytes
  * when the manifest records every bucket's size (null otherwise —
  * absent beats a misleading partial sum).
  */
object TxMetaTables {

  /** Metadata-table name suffixes the catalog resolves. */
  val Names: Set[String] = Set("history", "files")

  def forName(name: String, tablePath: String): Table = name match {
    case "history" => new TxHistoryTable(tablePath)
    case "files" => new TxFilesTable(tablePath)
    case other => throw new IllegalArgumentException(
      s"graft-tx: unknown metadata table '$other' " +
        s"(supported: ${Names.toSeq.sorted.mkString(", ")})")
  }

  private[tx] abstract class LocalTable(
      tableName: String, tableSchema: StructType) extends Table
      with SupportsRead {
    def computeRows(): Array[InternalRow]
    override def name(): String = tableName
    override def schema(): StructType = tableSchema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(
        options: CaseInsensitiveStringMap): ScanBuilder = { () =>
      new Scan with LocalScan {
        // computed at scan build (analysis) time — one consistent view
        override val rows: Array[InternalRow] = computeRows()
        override def readSchema(): StructType = tableSchema
        override def description(): String = tableName
      }
    }
  }

  val HistorySchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("committed_at", TimestampType, nullable = true),
    StructField("operation", StringType, nullable = true),
    StructField("n_buckets", IntegerType, nullable = false),
    StructField("total_bytes", LongType, nullable = true)))

  val FilesSchema: StructType = StructType(Seq(
    StructField("bucket", IntegerType, nullable = false),
    StructField("file", StringType, nullable = false),
    StructField("bytes", LongType, nullable = false)))
}

class TxHistoryTable(path: String) extends TxMetaTables.LocalTable(
    s"graft-tx-history($path)", TxMetaTables.HistorySchema) {
  override def computeRows(): Array[InternalRow] =
    Tx.versions(path).flatMap { v =>
      // a concurrent vacuum may retire a manifest mid-listing — skip,
      // like latestMeta does; history reports what is still live
      try {
        val snap = Tx.snapshot(path, v)
        val tsMicros: Option[java.lang.Long] = snap.meta.get(Tx.CommitTsKey)
          .flatMap(_.toLongOption).map(ms => java.lang.Long.valueOf(ms * 1000L))
        val op = snap.meta.get(Tx.CommitOpKey)
        val bytes: Option[java.lang.Long] =
          if (snap.dirs.keySet.subsetOf(snap.sizes.keySet))
            Some(java.lang.Long.valueOf(snap.sizes.values.sum))
          else None // some bucket predates size stamping: no partial sums
        Some(new GenericInternalRow(Array[Any](
          v,
          tsMicros.orNull,
          op.map(UTF8String.fromString).orNull,
          // the LAYOUT bucket count the manifest records — not the count
          // of populated bucket dirs, which a sparse table understates
          // and which would hide a rebucket from the history
          snap.nBuckets,
          bytes.orNull)): InternalRow)
      } catch { case _: java.nio.file.NoSuchFileException => None }
    }.toArray
}

class TxFilesTable(path: String) extends TxMetaTables.LocalTable(
    s"graft-tx-files($path)", TxMetaTables.FilesSchema) {
  override def computeRows(): Array[InternalRow] = {
    val snap = Tx.latest(path).getOrElse(throw new IllegalStateException(
      s"graft-tx: no committed version in $path"))
    snap.dirs.toSeq.sortBy(_._1).flatMap { case (b, rel) =>
      val files = TxBucketFiles.of(s"$path/$rel", Nil)
      files.sortBy(_.getName).map(f =>
        new GenericInternalRow(Array[Any](
          b, UTF8String.fromString(s"$rel/${f.getName}"),
          f.length())): InternalRow)
    }.toArray
  }
}
