package graft.sources.tx

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{DataType, StructType}
import graft.sources.Tx

/** PLAIN streaming read of a Tx table — the Delta-shaped
  *
  * {{{
  *   spark.readStream.format("graft-tx").load(path)   // no readChangeFeed
  * }}}
  *
  * — so a Tx table is a streaming SOURCE in its own right: the first
  * micro-batch is the FULL SNAPSHOT pinned at stream start, every later
  * batch carries the rows new commits INSERTED, and exactly-once is the
  * checkpoint's (offsets are table versions plus a snapshot-done bit).
  * Modifying commits are a correctness decision the CONSUMER must make,
  * exactly like Delta: by default an update or delete in the span is a
  * NAMED error (an append-only consumer silently missing a retraction
  * would be wrong forever); `option("ignoreChanges", true)` opts into
  * relaxed semantics — updated rows are re-emitted (downstream must
  * tolerate re-delivery), deletes are skipped. Consumers who need the
  * real change stream use `option("readChangeFeed", true)` — this
  * source is for append-mostly tables feeding append-shaped pipelines.
  *
  * `option("startingVersion", v)` skips the snapshot and emits inserts
  * FROM commit v INCLUSIVE — Delta's identically-named option keeps its
  * meaning (v = 1 serves the whole first commit, diffed against the
  * empty table; v > 1 needs v-1 live to diff against, named error
  * otherwise; v = latest+1 waits for future commits);
  * `option("maxVersionsPerTrigger", n)` bounds a batch's commit span.
  * The schema is pinned at stream start (a mid-stream addColumn's new
  * column is projected away until restart); a consumer that outsleeps
  * retention gets the named re-bootstrap error. Cost shape: the
  * snapshot batch is one task per bucket; every change batch is the
  * bucket-local zero-exchange diff ([[TxDiffReader]]) of exactly the
  * changed buckets — O(churn), never O(table).
  */
class TxTableStream(
    path: String, pinnedVersion: Long,
    required: StructType, tableSchema: StructType,
    startingVersion: Option[Long], maxVersionsPerTrigger: Option[Long],
    ignoreChanges: Boolean, maxDiffBytes: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  maxVersionsPerTrigger.foreach(m => require(m > 0,
    s"graft-tx: maxVersionsPerTrigger must be positive, got $m"))

  private def newest(): Long = Tx.latest(path).map(_.version).getOrElse(0L)

  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(newest())

  override def initialOffset(): Offset = startingVersion match {
    case Some(v) =>
      // INCLUSIVE, Delta's contract: the first batch carries commit v's
      // OWN inserts (a Delta migrant's startingVersion keeps meaning).
      // Emitting them means diffing v against v-1, so v-1 must still be
      // live — except v == 1, which diffs against the empty table
      // ([[planInputPartitions]] synthesizes the empty base for lo 0).
      // v may also be one PAST the newest commit (an empty stream that
      // waits for future commits), again Delta's behavior.
      val vs = Tx.versions(path)
      require(v >= 1, s"graft-tx: startingVersion must be >= 1, got $v")
      require(vs.nonEmpty,
        s"graft-tx: cannot stream $path — no committed version")
      require(v <= vs.last + 1,
        s"graft-tx: startingVersion $v is beyond the next commit of " +
          s"$path (latest: v${vs.last})")
      require(if (v == 1) vs.head == 1 else vs.contains(v - 1),
        s"graft-tx: startingVersion is INCLUSIVE — emitting commit $v's " +
          s"own rows needs v${v - 1} live to diff against, but $path " +
          s"keeps ${vs.head}..${vs.last}. Omit startingVersion for a " +
          s"snapshot bootstrap, or start at ${vs.head + 1}")
      TxTableOffset(v - 1, snapshotDone = true)
    case None => TxTableOffset(pinnedVersion, snapshotDone = false)
  }

  override def latestOffset(): Offset =
    TxTableOffset(availableNowCap.getOrElse(newest()), snapshotDone = true)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[TxTableOffset]
    if (!s.snapshotDone) TxTableOffset(s.version, snapshotDone = true)
    else {
      val hi = availableNowCap.getOrElse(newest())
      TxTableOffset(maxVersionsPerTrigger
        .map(m => math.min(hi, s.version + m)).getOrElse(hi)
        .max(s.version), snapshotDone = true)
    }
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset =
    TxTableOffset.parse(json, "graft-tx table stream")

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TxTableOffset]
    val e = end.asInstanceOf[TxTableOffset]
    if (!s.snapshotDone) {
      // the snapshot batch: every bucket of the PINNED version (planned
      // from ITS manifest, so a checkpoint replay after restart reads
      // the same snapshot even though the table moved on)
      require(e.version == s.version,
        s"graft-tx: snapshot batch must close at its own version, got " +
          s"${s.version} -> ${e.version}")
      // a replayed snapshot batch whose pinned version was vacuumed
      // must get the NAMED retired-version error, not a raw
      // NoSuchFileException (same resolution the batch scan uses)
      val snap = TxSource.snapshotAt(path, s.version)
      // request PHYSICAL names (renamed columns live in files under
      // their birth name); positions stay the logical projection's
      val reqPhys = Tx.physSchema(required, tableSchema)
      // merge-key schema (physical names) rides only to tombstoned
      // buckets — their snapshot rows must drop deletion-vector keys
      lazy val keyPhysJson = snap.meta.get(Tx.KeysKey)
        .map(_.split(",").toSeq).map(ks => Tx.physSchema(
          StructType(ks.map(k =>
            tableSchema(tableSchema.fieldIndex(k)))), tableSchema).json)
        .getOrElse("")
      // carry the REAL bucket id: TxBucketPartition always implements
      // HasPartitionKey, and although Spark 4.1's partitioning matcher
      // only consults batch scans today, a default -1 here would be a
      // latent wrong-partition-key trap if streaming ever does
      snap.dirs.toSeq.sortBy(_._1).map { case (b, rel) =>
        val tb = snap.tombs.getOrElse(b, Nil).map(t => s"$path/$t")
        TxBucketPartition(s"$path/$rel", reqPhys.json,
          bucket = b, tombs = tb,
          keysJson = if (tb.nonEmpty) keyPhysJson else ""): InputPartition
      }.toArray
    } else {
      val lo = s.version
      val hi = e.version
      if (hi <= lo) return Array.empty
      // lo == 0 is the inclusive startingVersion=1 start: commit 1's
      // rows are the diff against a synthetic EMPTY base snapshot
      val vs = Tx.versions(path).filter(v => v >= math.max(lo, 1L) && v <= hi)
      require(vs.headOption.contains(math.max(lo, 1L)) &&
        vs.lastOption.contains(hi),
        s"graft-tx: table-stream span [$lo, $hi] is not fully live in " +
          s"$path (kept: ${vs.mkString(",")}) — the consumer fell " +
          "behind retention and must re-bootstrap")
      val keys = Tx.snapshot(path, hi).meta.get(Tx.KeysKey)
        .map(_.split(",").toSeq)
        .getOrElse(throw new IllegalStateException(
          s"graft-tx: $path has no recorded merge keys"))
      val snaps = {
        val real = vs.map(Tx.snapshot(path, _))
        if (lo == 0L)
          Tx.Snapshot(0L, real.head.nBuckets, Map.empty) +: real
        else real
      }
      snaps.sliding(2).flatMap { case Seq(a, b) =>
        TxChangesScan.spanPartitionsUnder(path, a, b, tableSchema, keys,
          emitPre = false, maxDiffBytes, stampVersion = None)
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    TxTableStreamReaderFactory(required.json, ignoreChanges)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Offset = the newest version already emitted, plus whether the
  * initial snapshot batch has been served (false only before the very
  * first batch of a snapshot-bootstrapped stream).
  */
case class TxTableOffset(version: Long, snapshotDone: Boolean)
    extends Offset {
  override def json(): String =
    s"""{"version":$version,"snapshot":$snapshotDone}"""
}

object TxTableOffset {
  private val Shape =
    """\s*\{\s*"version"\s*:\s*(\d+)\s*,\s*"snapshot"\s*:\s*(true|false)\s*\}\s*""".r

  /** Strict parse — a malformed checkpoint offset fails LOUDLY (the
    * [[TxVersionOffset]] discipline).
    */
  def parse(json: String, source: String): TxTableOffset = json match {
    case Shape(v, s) => TxTableOffset(v.toLong, s.toBoolean)
    case _ => throw new IllegalArgumentException(
      s"$source: malformed checkpoint offset '$json' — expected " +
        """{"version":N,"snapshot":B}; the checkpoint is corrupted """ +
        "and must be repaired or wiped deliberately, not silently " +
        "replayed from 0")
  }
}

/** Dispatches the stream's two batch shapes: snapshot buckets decode
  * through the vectorized reader (row-iterated — nested columns
  * included); change spans run the bucket-local diff and then
  * class-filter + project ([[TxStreamChangeReader]]).
  */
case class TxTableStreamReaderFactory(
    requiredJson: String, ignoreChanges: Boolean)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case part: TxBucketPartition if part.tombs.nonEmpty =>
        // snapshot bucket with deletion vectors: same filtering row
        // reader the batch scan uses (ranges are Nil on the stream path)
        new TxTombstoneRowReader(part.dir,
          DataType.fromJson(part.schemaJson).asInstanceOf[StructType],
          Nil, part.tombs,
          DataType.fromJson(part.keysJson).asInstanceOf[StructType])
      case part: TxBucketPartition =>
        new TxColumnarRowReader(part.dir,
          DataType.fromJson(part.schemaJson).asInstanceOf[StructType])
      case part: TxDiffPartition =>
        new TxStreamChangeReader(part,
          DataType.fromJson(requiredJson).asInstanceOf[StructType],
          ignoreChanges)
      case other => throw new IllegalStateException(
        s"graft-tx: unexpected stream partition ${other.getClass.getName}")
    }
}

/** Row iteration over the vectorized bucket reader — the always-correct
  * row surface (nested columns, evolution nulls) for contexts that
  * can't take ColumnarBatches directly.
  */
class TxColumnarRowReader(dir: String, schema: StructType)
    extends PartitionReader[InternalRow] {
  private val inner = new TxBucketColumnarReader(dir, schema)
  private var rows: java.util.Iterator[InternalRow] = _
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (rows == null || !rows.hasNext) {
      if (!inner.next()) return false
      rows = inner.get().rowIterator()
    }
    current = rows.next()
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = inner.close()
}

/** One changed bucket's diff, reduced to the PLAIN streaming contract:
  * inserts flow; an update or delete is a NAMED error unless
  * `ignoreChanges` relaxed it (updates re-emit their post row, deletes
  * drop). Output rows carry only the stream's required columns.
  */
class TxStreamChangeReader(
    part: TxDiffPartition, required: StructType, ignoreChanges: Boolean)
    extends PartitionReader[InternalRow] {

  private val inner = new TxDiffReader(part)
  private val full =
    DataType.fromJson(part.schemaJson).asInstanceOf[StructType]
  private val idx = required.fields.map(f => full.fieldIndex(f.name))
  private val changeAt = full.length // _change rides after the table cols
  private var current: InternalRow = _

  private def project(r: InternalRow): InternalRow =
    new GenericInternalRow(idx.map(i =>
      if (r.isNullAt(i)) null else r.get(i, full(i).dataType)): Array[Any])

  override def next(): Boolean = {
    while (inner.next()) {
      val r = inner.get()
      r.getUTF8String(changeAt).toString match {
        case "insert" => current = project(r); return true
        case "update" if ignoreChanges =>
          current = project(r); return true // post row, re-delivery
        case "delete" if ignoreChanges => () // dropped, documented
        case other => throw new IllegalStateException(
          s"graft-tx: the table stream found a '$other' in the commit " +
            "span — a plain streaming read is append-only. Either " +
            "option(\"ignoreChanges\", true) (updates re-emit, deletes " +
            "drop — downstream must tolerate re-delivery), or consume " +
            "the real change stream: option(\"readChangeFeed\", true)")
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = inner.close()
}
