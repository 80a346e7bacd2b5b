package graft.sources.tx

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.hadoop.mapreduce.RecordWriter
import org.apache.parquet.hadoop.ParquetOutputFormat
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sources.Tx

/** DataSource V2 WRITE path for [[graft.sources.Tx]] tables — the half
  * that makes the format's commits reachable from idiomatic Spark:
  *
  * {{{
  *   batch.write.format("graft-tx").mode("append").save(path)    // MERGE
  *   batch.write.format("graft-tx").mode("overwrite").save(path) // REPLACE
  *   df.writeTo("tx.events").append()            // via the SQL catalog
  * }}}
  *
  * The reference's load path (/root/reference/src/serve/load.py:14-51)
  * is exactly this write — an `ON CONFLICT` upsert per batch — which
  * until now required the side API (`Tx.commitMerge`).
  *
  * Shape: a STAGED BatchWrite. Each task streams its partition's rows
  * into one parquet file under `data/w-<uuid>/` through Spark's own
  * `ParquetWriteSupport` (full type fidelity — nested columns included),
  * and its commit message names the file, so a zombie task's orphan file
  * is simply never read (the driver consumes only message-named files;
  * [[Tx.vacuum]]'s age gate sweeps leaked staging like any crash
  * debris). `commit()` then runs the NORMAL merge machinery over the
  * staged batch — bucket-scoped rewrite, zone-map stats, CAS retry with
  * disjoint rebase — so the published version is byte-for-byte what
  * `Tx.commitMerge` would have produced (spec-pinned), and the table's
  * recorded properties (merge keys, bucket keys, nBuckets, stats
  * columns) are READ FROM THE MANIFEST rather than re-supplied: a drifted
  * `option("keys", ...)` is rejected, exactly like a drifted side-API
  * call. `mode("overwrite")` maps to SupportsTruncate →
  * [[Tx.commitOverwrite]] (an empty batch truncates).
  *
  * Bootstrap: the DSv2 path writes to EXISTING tables (created by
  * [[Tx.createTable]], the SQL catalog's CREATE TABLE, or a first
  * side-API commit) — `save()` on a fresh path has no recorded schema to
  * resolve the relation against, and the named error says exactly that.
  */
class TxWriteBuilder(
    path: String, version: Long, info: LogicalWriteInfo)
    extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsOverwrite {

  require(version < 0,
    "graft-tx: cannot write through a time-travel read " +
      "(option(\"version\", ...) pins a historical snapshot)")

  private var truncateAll = false
  private var replaceFilters: Option[Array[org.apache.spark.sql.sources.Filter]] = None

  override def truncate(): WriteBuilder = { truncateAll = true; this }

  /** `df.writeTo(t).overwrite(cond)` — REPLACE WHERE: the condition's
    * source filters scope the overwrite ([[Tx.commitReplaceWhere]]: one
    * CAS removes matching rows and inserts the batch, with the batch
    * required to satisfy the condition). A literal-true condition IS
    * truncate. Conditions Spark cannot translate to source filters
    * never reach here (its own named error); [[canOverwrite]] rejects
    * translated shapes this sink can't express.
    */
  override def canOverwrite(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    filters.forall(TxDeleteFilters.translatable)

  override def overwrite(
      filters: Array[org.apache.spark.sql.sources.Filter]): WriteBuilder = {
    if (filters.forall(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue]))
      truncateAll = true
    else {
      require(filters.forall(TxDeleteFilters.translatable),
        s"graft-tx: cannot express overwrite condition " +
          s"${filters.mkString("[", ", ", "]")} — use a filter-shaped " +
          "condition, or DELETE + append")
      replaceFilters = Some(filters)
    }
    this
  }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new TxBatchWrite(path, info.schema(), info.options(), truncateAll,
        replaceFilters)
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      require(!truncateAll && replaceFilters.isEmpty,
        "graft-tx: streaming writes append (merge); complete-mode " +
          "overwrite / replace-where are not supported")
      new TxStreamingWrite(path, info.schema(), info.options(),
        info.queryId())
    }
    override def description(): String =
      s"graft-tx-write($path${if (truncateAll) ", truncate" else ""}" +
        replaceFilters.map(_.mkString(", replaceWhere=[", ", ", "]"))
          .getOrElse("") + ")"
  }
}

/** STREAMING writes — `df.writeStream.format("graft-tx").start(path)`:
  * every micro-batch is one atomic MERGE commit stamped with its epoch
  * id in the manifest, so a replayed epoch — a restart from an older
  * checkpoint, a duplicate driver — is a NO-OP even across interleaved
  * non-stream commits: the stamp is re-checked INSIDE the CAS loop
  * (the `Streaming.txMergeSink` discipline behind the standard API, so
  * any streaming query lands exactly-once without writing a
  * foreachBatch). Task staging and commit machinery are the batch
  * write's; only the epoch stamp differs.
  *
  * The stamp is keyed by the streaming QUERY id (`stream_epoch_<id>`),
  * because epoch ids are checkpoint-relative while the stamp is
  * durable: a globally-keyed stamp would silently DROP new data after
  * an operator wiped the checkpoint (the fresh lineage restarts at
  * epoch 0, forever ≤ the old stamp). Keyed per lineage: same-lineage
  * replays no-op exactly; a NEW lineage re-merges what it replays —
  * harmless, a MERGE of identical rows is content-idempotent — and
  * its new data always lands.
  */
class TxStreamingWrite(
    path: String, querySchema: StructType,
    options: CaseInsensitiveStringMap, queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private val stampKey = s"stream_epoch_$queryId"

  private val stagingBase =
    s"$path/data/w-${java.util.UUID.randomUUID()}"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming
        .StreamingDataWriterFactory =
    TxStreamingWriterFactory(stagingBase, querySchema.json)

  override def commit(
      epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val staging = s"$stagingBase-e$epochId"
    try {
      val files = messages.collect { case TxFileMsg(f) => f }.toSeq
      val snap = Tx.latest(path).getOrElse(throw new IllegalStateException(
        s"graft-tx: cannot stream into $path — no committed version; " +
          "create the table first (Tx.createTable, CREATE TABLE, or a " +
          "first Tx.commitMerge)"))
      val keys = snap.meta.get(Tx.KeysKey).map(_.split(",").toSeq)
        .orElse(Option(options.get("keys"))
          .map(_.split(",").toSeq.filter(_.nonEmpty)))
        .getOrElse(throw new IllegalStateException(
          s"graft-tx: $path has no recorded merge keys and the writer " +
            "passed no option(\"keys\", \"a,b\")"))
      val bucketKeys = snap.meta.get(Tx.BucketKeysKey)
        .map(_.split(",").toSeq).getOrElse(Nil)
      val statsCols = snap.meta.get(Tx.StatsColsKey)
        .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
      val batch =
        if (files.isEmpty) spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], querySchema)
        else spark.read.schema(querySchema).parquet(files: _*)
      // exactly-once rides the manifest stamp, re-checked INSIDE the
      // CAS loop — a replayed epoch (or a concurrent duplicate driver)
      // sees stamp >= epochId and aborts instead of merging twice
      val already = Tx.latestMeta(path, stampKey)
        .exists(_.toLong >= epochId)
      if (!already)
        Tx.commitMerge(spark, path, batch, keys, snap.nBuckets,
          meta = Map(stampKey -> epochId.toString),
          bucketKeys = bucketKeys, statsCols = statsCols,
          abortIf = s => s.meta.get(stampKey)
            .exists(_.toLong >= epochId))
      ()
    } finally Tx.deleteRecursive(java.nio.file.Paths.get(staging))
  }

  override def abort(
      epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    Tx.deleteRecursive(java.nio.file.Paths.get(s"$stagingBase-e$epochId"))
}

case class TxStreamingWriterFactory(stagingBase: String, schemaJson: String)
    extends org.apache.spark.sql.connector.write.streaming
      .StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new TxDataWriter(s"$stagingBase-e$epochId", schemaJson,
      partitionId, taskId)
}

/** One staged file per task attempt; the message names what landed. */
case class TxFileMsg(file: String) extends WriterCommitMessage

class TxBatchWrite(
    path: String, querySchema: StructType,
    options: CaseInsensitiveStringMap, truncateAll: Boolean,
    replaceFilters: Option[Array[org.apache.spark.sql.sources.Filter]] = None)
    extends BatchWrite {

  // staged under data/ so a crash's leak is ordinary vacuum-age debris
  private val stagingDir =
    s"$path/data/w-${java.util.UUID.randomUUID()}"

  // test seam: a registered hook runs between commit planning and the
  // CAS publish, so a spec can inject a racing commit deterministically
  private val seam = Option(options.get("commitSeam"))

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    TxWriterFactory(stagingDir, querySchema.json)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    try {
      val files = messages.collect { case TxFileMsg(f) => f }.toSeq
      val snap = Tx.latest(path).getOrElse(throw new IllegalStateException(
        s"graft-tx: cannot write to $path — no committed version; " +
          "create the table first (Tx.createTable, the SQL catalog's " +
          "CREATE TABLE, or a first Tx.commitMerge)"))
      // the table's properties drive the commit; writer options may
      // only SUPPLY what an old manifest lacks, never override (the
      // commit machinery rejects drift with its own named errors)
      val keys = snap.meta.get(Tx.KeysKey).map(_.split(",").toSeq)
        .orElse(Option(options.get("keys"))
          .map(_.split(",").toSeq.filter(_.nonEmpty)))
        .getOrElse(throw new IllegalStateException(
          s"graft-tx: $path has no recorded merge keys and the writer " +
            "passed no option(\"keys\", \"a,b\")"))
      val bucketKeys = snap.meta.get(Tx.BucketKeysKey)
        .map(_.split(",").toSeq).getOrElse(Nil)
      val statsCols = snap.meta.get(Tx.StatsColsKey)
        .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
      val batch =
        if (files.isEmpty) spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], querySchema)
        else spark.read.schema(querySchema).parquet(files: _*)
      val beforeCas: () => Unit =
        seam.map(id => () => TxWriteSeams.run(id)).getOrElse(() => ())
      if (truncateAll)
        Tx.commitOverwrite(spark, path, batch, keys, snap.nBuckets,
          beforeCas = beforeCas, bucketKeys = bucketKeys,
          statsCols = statsCols)
      else replaceFilters match {
        case Some(fs) =>
          // REPLACE WHERE: the same filters that scope the condition
          // also zone-prune the touched set — re-derived against the
          // CURRENT snapshot on every CAS attempt inside the commit
          val cond = fs.map(TxDeleteFilters.toColumn)
            .reduceOption(_ && _)
            .getOrElse(org.apache.spark.sql.functions.lit(true))
          val touch = (snapOpt: Option[Tx.Snapshot]) => snapOpt.map { sp =>
            fs.flatMap(TxPrune.keptFor(sp, _))
              .foldLeft(sp.dirs.keySet)(_ intersect _)
          }.getOrElse(Set.empty[Int])
          Tx.commitReplaceWhere(spark, path, batch, keys, cond, touch,
            snap.nBuckets, beforeCas = beforeCas, bucketKeys = bucketKeys,
            statsCols = statsCols)
        case None =>
          Tx.commitMerge(spark, path, batch, keys, snap.nBuckets,
            beforeCas = beforeCas, bucketKeys = bucketKeys,
            statsCols = statsCols)
      }
    } finally Tx.deleteRecursive(java.nio.file.Paths.get(stagingDir))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    Tx.deleteRecursive(java.nio.file.Paths.get(stagingDir))
}

/** Deterministic-race test seam registry: a spec registers a hook under
  * an id and passes `option("commitSeam", id)` — the hook fires inside
  * the commit's CAS loop, between planning and publish.
  */
object TxWriteSeams {
  private val seams =
    new java.util.concurrent.ConcurrentHashMap[String, () => Unit]()
  def register(id: String)(f: () => Unit): Unit = seams.put(id, f)
  def clear(id: String): Unit = { seams.remove(id); () }
  private[tx] def run(id: String): Unit = {
    val f = seams.get(id)
    if (f != null) f()
  }
}

case class TxWriterFactory(stagingDir: String, schemaJson: String)
    extends DataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TxDataWriter(stagingDir, schemaJson, partitionId, taskId)
}

/** Shared staging-parquet machinery: one file, streamed InternalRows,
  * Spark's own ParquetWriteSupport (instantiated reflectively from the
  * conf key like any Spark write) — full Catalyst type fidelity.
  */
private[tx] object TxParquetStage {
  def open(file: String, schema: StructType): RecordWriter[Void, InternalRow] = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(file).getParent)
    val conf = new Configuration()
    conf.set("parquet.write.support.class",
      "org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport")
    // the requested Catalyst schema rides the same stable conf key the
    // write support reads it from (ParquetWriteSupport.setSchema)
    conf.set("org.apache.spark.sql.parquet.row.attributes", schema.json)
    conf.set("spark.sql.parquet.writeLegacyFormat", "false")
    conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    conf.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.caseSensitive", "false")
    new ParquetOutputFormat[InternalRow]().getRecordWriter(
      conf, new HPath(file), CompressionCodecName.SNAPPY)
  }
}

class TxDataWriter(
    stagingDir: String, schemaJson: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  private val file = s"$stagingDir/part-$partitionId-$taskId.parquet"
  private val writer = TxParquetStage.open(file, schema)

  override def write(row: InternalRow): Unit = writer.write(null, row)

  override def commit(): WriterCommitMessage = {
    writer.close(null)
    TxFileMsg(file)
  }

  override def abort(): Unit = {
    try writer.close(null)
    catch { case scala.util.control.NonFatal(_) => () }
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(file))
    ()
  }

  override def close(): Unit = ()
}
