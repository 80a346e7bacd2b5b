package graft.sources.tx

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sources.Tx

/** The change data feed as a FIRST-CLASS streaming source —
  *
  * {{{
  *   spark.readStream.format("graft-tx")
  *     .option("readChangeFeed", true)        // no from/to: streaming
  *     .option("emitPre", true)               // retraction pairs
  *     .load(path)                            // rows + _change + _commit_version
  * }}}
  *
  * — so ANY streaming query consumes change rows, not just the Mv
  * follows that ride the wake-up-shaped [[TxTicks]]. OFFSETS ARE TABLE
  * VERSIONS (the keyset offset discipline on manifests); each
  * micro-batch covers a `(fromVersion, toVersion]` span and plans the
  * bucket-local [[TxDiffPartition]]s of every ADJACENT COMMIT PAIR in
  * the span, each row stamped `_commit_version` — so whatever the
  * trigger batching, the streamed rows are EXACTLY
  * [[Tx.changesStamped]] over the covered span (spec-pinned), one scan
  * stage, zero exchange, O(total churn).
  *
  * Semantics and scope:
  *  - `startingVersion` is INCLUSIVE, Delta's contract: the feed starts
  *    with commit v's OWN changes (v = 1 emits the first commit's rows
  *    as inserts, diffed against a synthetic empty base; v > 1 needs
  *    v-1 live to diff against — named error otherwise). When omitted,
  *    changes are emitted AFTER the oldest live version — the stream
  *    carries no initial snapshot; bootstrap consumers load it
  *    separately (the [[graft.operators.Mv.followChanges]] discipline).
  *  - Exactly-once is the CHECKPOINT's (offsets are versions; Spark
  *    replays an uncommitted batch after a crash) — consumers folding
  *    into non-idempotent state should keep a cursor like
  *    `followChangesStream` does; consumers writing idempotent sinks
  *    need nothing.
  *  - The stream serves the schema RESOLVED AT START; a mid-stream
  *    addColumn's extra column is projected away until restart (only
  *    additive evolution exists, so this is always well-defined).
  *  - A consumer that outsleeps retention gets the named re-bootstrap
  *    error, never a silently coarser feed.
  */
class TxChangesStreamTable(
    path: String, emitPre: Boolean, stamped: StructType,
    options: CaseInsensitiveStringMap) extends Table with SupportsRead {

  override def name(): String = s"graft-tx-cdf-stream($path)"
  override def schema(): StructType = stamped
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = stamped
        override def description(): String = s"TxChangesStreamScan($path)"
        override def toMicroBatchStream(
            checkpointLocation: String): MicroBatchStream = {
          def longOpt(name: String): Option[Long] =
            Option(options.get(name)).map(v => v.toLongOption.getOrElse(
              throw new IllegalArgumentException(
                s"graft-tx: option($name) takes a numeric Tx version, " +
                  s"got '$v'")))
          // startingTimestamp resolves to the EARLIEST commit at or
          // after it (Tx.versionAtOrAfter — Delta's inclusive rule),
          // then rides the same startingVersion contract
          val sv = longOpt("startingVersion")
          val st = Option(options.get("startingTimestamp"))
          require(sv.isEmpty || st.isEmpty,
            "graft-tx: option(\"startingVersion\") and " +
              "option(\"startingTimestamp\") are exclusive — pin the " +
              "start one way")
          new TxChangesStream(path, emitPre,
            StructType(stamped.fields.dropRight(2)), // table schema
            st.map(t => Tx.versionAtOrAfter(
              path, TxSource.parseTsMillis(t))).orElse(sv),
            longOpt("maxVersionsPerTrigger"),
            TxChanges.maxDiffBytesOf(options))
        }
      }
    }
}

class TxChangesStream(
    path: String, emitPre: Boolean, tableSchema: StructType,
    startingVersion: Option[Long], maxVersionsPerTrigger: Option[Long],
    maxDiffBytes: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  maxVersionsPerTrigger.foreach(m => require(m > 0,
    s"graft-tx: maxVersionsPerTrigger must be positive, got $m"))

  private def newest(): Long = Tx.latest(path).map(_.version).getOrElse(0L)

  // Trigger.AvailableNow pins the drain target at prepare time
  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(newest())

  override def initialOffset(): Offset = {
    val vs = Tx.versions(path)
    require(vs.nonEmpty,
      s"graft-tx: cannot stream the change feed of $path — no committed " +
        "version")
    val v0 = startingVersion match {
      case None => vs.head // default: changes AFTER the oldest live version
      case Some(v) =>
        // INCLUSIVE, Delta's contract: the feed starts with commit v's
        // OWN changes (v = 1 emits the first commit's rows as inserts,
        // diffed against a synthetic empty base; v > 1 needs v-1 live)
        require(v >= 1, s"graft-tx: startingVersion must be >= 1, got $v")
        require(v <= vs.last + 1,
          s"graft-tx: startingVersion $v is beyond the next commit of " +
            s"$path (latest: v${vs.last})")
        require(if (v == 1) vs.head == 1 else vs.contains(v - 1),
          s"graft-tx: startingVersion is INCLUSIVE — emitting commit " +
            s"$v's own changes needs v${v - 1} live to diff against, " +
            s"but $path keeps ${vs.head}..${vs.last}. Omit " +
            s"startingVersion to start after the oldest live version, " +
            s"or start at ${vs.head + 1}")
        v - 1
    }
    TxVersionOffset(v0)
  }

  override def latestOffset(): Offset =
    TxVersionOffset(availableNowCap.getOrElse(newest()))

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val lo = start.asInstanceOf[TxVersionOffset].version
    val hi = availableNowCap.getOrElse(newest())
    TxVersionOffset(maxVersionsPerTrigger
      .map(m => math.min(hi, lo + m)).getOrElse(hi).max(lo))
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset =
    TxVersionOffset(TxVersionOffset.parse(json, "graft-tx change stream"))

  /** One [[TxDiffPartition]] set per ADJACENT live-version pair in the
    * span — version-stamped, so stream rows == [[Tx.changesStamped]]
    * regardless of how triggers batch the versions.
    */
  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[TxVersionOffset].version
    val hi = end.asInstanceOf[TxVersionOffset].version
    if (hi <= lo) return Array.empty
    // lo == 0 is the inclusive startingVersion=1 start: commit 1's
    // changes are the diff against a synthetic EMPTY base snapshot
    val vs = Tx.versions(path).filter(v => v >= math.max(lo, 1L) && v <= hi)
    require(vs.headOption.contains(math.max(lo, 1L)) &&
      vs.lastOption.contains(hi),
      s"graft-tx: change-stream span [$lo, $hi] is not fully live in " +
        s"$path (kept: ${vs.mkString(",")}) — the consumer fell behind " +
        "retention and must re-bootstrap")
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
        emitPre, maxDiffBytes, stampVersion = Some(b.version))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    TxChangesScan.readerFactory

  override def commit(end: Offset): Unit = () // offsets live in the checkpoint
  override def stop(): Unit = ()
}
