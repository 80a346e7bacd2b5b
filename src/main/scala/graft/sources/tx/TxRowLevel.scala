package graft.sources.tx

import org.apache.hadoop.mapreduce.RecordWriter
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sources.Tx

/** Row-level SQL — `UPDATE`, `MERGE INTO`, and expression-`DELETE` —
  * for [[graft.sources.Tx]] tables, as a DELTA-based
  * [[RowLevelOperation]]:
  *
  * {{{
  *   spark.sql("UPDATE tx.events SET value = value * 2 WHERE ...")
  *   spark.sql("""MERGE INTO tx.events t USING updates s
  *                ON t.event_id = s.event_id
  *                WHEN MATCHED THEN UPDATE SET *
  *                WHEN NOT MATCHED THEN INSERT *""")
  *   spark.sql("DELETE FROM tx.events WHERE event_id % 7 = 0")
  * }}}
  *
  * The reference's whole load path IS this statement (`ON CONFLICT DO
  * UPDATE`, /root/reference/src/serve/load.py:30-48) — here it lands as
  * the format's native commit. Why DELTA (not group-based replace)
  * fits this format exactly: the merge keys ARE the row ids
  * ([[SupportsDelta.rowId]]), so no file/position lineage metadata is
  * needed — Spark scans the table through the NORMAL pruned
  * [[TxScanBuilder]], computes inserted/updated/deleted rows, and the
  * staged delta commits through [[Tx.commitDelta]]: touched buckets =
  * upsert buckets ∪ delete buckets, each rewritten as
  * (existing ∖ deletes) ⊎ upserts, ONE manifest CAS. Updates are
  * represented as delete+insert pairs
  * (`representUpdateAsDeleteAndInsert`), so a key-CHANGING update is
  * automatically its old key's delete plus its new key's insert —
  * no special casing.
  *
  * Isolation, honestly scoped: the statement's delta is computed
  * against the snapshot its scan pinned; the commit's CAS retry applies
  * that delta on the NEWEST snapshot (write-level lost updates are
  * impossible, as always), but a concurrent commit BETWEEN scan and
  * publish is not re-validated against the statement's predicate —
  * optimistic snapshot semantics, same family as the side API's
  * re-derive, stated rather than hidden.
  */
class TxRowLevelBuilder(
    path: String, tableSchema: StructType, info: RowLevelOperationInfo)
    extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new TxRowLevelOperation(path, tableSchema, info.command())
}

class TxRowLevelOperation(
    path: String, tableSchema: StructType,
    cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"graft-tx-$cmd($path)"

  /** The candidate-row scan is the ordinary pruned Tx scan: a MERGE
    * whose ON clause narrows by a zone-mapped column opens only the
    * matching buckets.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TxScanBuilder(path, -1L, tableSchema,
      options.getBoolean("vectorized", true))

  /** The merge keys are the row identity — no lineage metadata. */
  override def rowId(): Array[NamedReference] =
    Tx.latest(path).flatMap(_.meta.get(Tx.KeysKey))
      .getOrElse(throw new IllegalStateException(
        s"graft-tx: $path has no recorded merge keys — row-level SQL " +
          "needs a table with pinned keys (createTable or a first " +
          "data commit)"))
      .split(",").map(Expressions.column)

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new TxDeltaWrite(path, info)
    }
}

class TxDeltaWrite(path: String, info: LogicalWriteInfo) extends DeltaWrite {
  override def toBatch: DeltaBatchWrite =
    new TxDeltaBatchWrite(path, info.schema(),
      info.rowIdSchema().orElseThrow(() => new IllegalStateException(
        "graft-tx: delta write without a rowId schema")),
      Option(info.options().get("commitSeam")))
  override def description(): String = s"graft-tx-delta($path)"
}

/** One staged file per side per task; absent sides stage nothing. */
case class TxDeltaMsg(upFile: Option[String], delFile: Option[String])
    extends WriterCommitMessage

class TxDeltaBatchWrite(
    path: String, rowSchema: StructType, idSchema: StructType,
    seam: Option[String])
    extends DeltaBatchWrite {

  private val stagingDir = s"$path/data/w-${java.util.UUID.randomUUID()}"

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory =
    TxDeltaWriterFactory(stagingDir, rowSchema.json, idSchema.json)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    try {
      val ups = messages.collect { case TxDeltaMsg(Some(f), _) => f }.toSeq
      val dels = messages.collect { case TxDeltaMsg(_, Some(f)) => f }.toSeq
      val snap = Tx.latest(path).getOrElse(throw new IllegalStateException(
        s"graft-tx: cannot apply a delta to $path — no committed version"))
      val keys = snap.meta.get(Tx.KeysKey).map(_.split(",").toSeq)
        .getOrElse(throw new IllegalStateException(
          s"graft-tx: $path has no recorded merge keys"))
      val bucketKeys = snap.meta.get(Tx.BucketKeysKey)
        .map(_.split(",").toSeq).getOrElse(Nil)
      val statsCols = snap.meta.get(Tx.StatsColsKey)
        .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
      def readOr(schema: StructType, files: Seq[String]) =
        if (files.isEmpty) spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else spark.read.schema(schema).parquet(files: _*)
      val beforeCas: () => Unit =
        seam.map(id => () => TxWriteSeams.run(id)).getOrElse(() => ())
      // a pure DELETE's delta carries no data columns (rowSchema is
      // empty) — its vacuous upsert side must still be TABLE-shaped for
      // the commit's schema and key checks to resolve
      val upSchema =
        if (rowSchema.isEmpty)
          snap.meta.get(Tx.SchemaKey)
            .map(org.apache.spark.sql.types.DataType.fromJson(_)
              .asInstanceOf[StructType])
            .getOrElse(throw new IllegalStateException(
              s"graft-tx: $path has no recorded schema"))
        else rowSchema
      Tx.commitDelta(spark, path,
        upserts = readOr(upSchema, ups),
        deleteKeys = readOr(idSchema, dels),
        keys = keys, nBuckets = snap.nBuckets, beforeCas = beforeCas,
        bucketKeys = bucketKeys, statsCols = statsCols)
      ()
    } finally Tx.deleteRecursive(java.nio.file.Paths.get(stagingDir))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    Tx.deleteRecursive(java.nio.file.Paths.get(stagingDir))
}

case class TxDeltaWriterFactory(
    stagingDir: String, rowSchemaJson: String, idSchemaJson: String)
    extends DeltaWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new TxDeltaWriter(stagingDir, rowSchemaJson, idSchemaJson,
      partitionId, taskId)
}

/** Streams the delta's two sides into (lazily-opened) staged parquet:
  * full rows for inserts/reinserts, rowId rows for deletes. With
  * `representUpdateAsDeleteAndInsert` the update() hook never fires,
  * but it is implemented anyway (delete + insert) rather than left
  * to throw.
  */
class TxDeltaWriter(
    stagingDir: String, rowSchemaJson: String, idSchemaJson: String,
    partitionId: Int, taskId: Long)
    extends DeltaWriter[InternalRow] {

  private val rowSchema =
    DataType.fromJson(rowSchemaJson).asInstanceOf[StructType]
  private val idSchema =
    DataType.fromJson(idSchemaJson).asInstanceOf[StructType]
  private val upFile = s"$stagingDir/up-$partitionId-$taskId.parquet"
  private val delFile = s"$stagingDir/del-$partitionId-$taskId.parquet"

  private var upWriter: RecordWriter[Void, InternalRow] = _
  private var delWriter: RecordWriter[Void, InternalRow] = _

  override def insert(row: InternalRow): Unit = {
    if (upWriter == null) upWriter = TxParquetStage.open(upFile, rowSchema)
    upWriter.write(null, row)
  }

  override def reinsert(metadata: InternalRow, row: InternalRow): Unit =
    insert(row)

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    if (delWriter == null) delWriter = TxParquetStage.open(delFile, idSchema)
    delWriter.write(null, id)
  }

  override def update(
      metadata: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    delete(metadata, id)
    insert(row)
  }

  override def commit(): WriterCommitMessage = {
    if (upWriter != null) upWriter.close(null)
    if (delWriter != null) delWriter.close(null)
    TxDeltaMsg(
      if (upWriter != null) Some(upFile) else None,
      if (delWriter != null) Some(delFile) else None)
  }

  override def abort(): Unit = {
    try { if (upWriter != null) upWriter.close(null) }
    catch { case scala.util.control.NonFatal(_) => () }
    try { if (delWriter != null) delWriter.close(null) }
    catch { case scala.util.control.NonFatal(_) => () }
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(upFile))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(delFile))
    ()
  }

  override def close(): Unit = ()
}
