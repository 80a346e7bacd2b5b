package graft.sources.tx

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.Tx

/** The change data feed as a DataSource V2 read —
  *
  * {{{
  *   spark.read.format("graft-tx")
  *     .option("readChangeFeed", true)
  *     .option("fromVersion", a).option("toVersion", b)
  *     .load(path)                       // rows + _change, SQL-ready
  * }}}
  *
  * — with a BETTER distribution shape than the programmatic
  * [[Tx.changes]]: that one diffs via a full-outer join, which SHUFFLES
  * both sides on the merge keys; here each changed bucket diffs
  * BUCKET-LOCALLY in its own task (both versions of a bucket hold the
  * same key partition by construction — rows never migrate buckets), so
  * the whole feed is one scan stage with ZERO exchange. The old side of
  * a bucket is held in the task's heap — the same order of memory the
  * bucket-scoped rewrite that produced it needed, which is what
  * `nBuckets` sizes (honest scope: a bucket must fit in a task).
  *
  * Semantics are [[Tx.changes]]' exactly (spec-pinned row-for-row):
  * net endpoint diff, unchanged re-landed rows compared out with
  * Spark's null-safe/NaN-aware equality, updates as post rows or
  * pre/post pairs (`option("emitPre", true)`), both sides read under
  * the NEWER schema so evolution serves nulls.
  */
object TxChanges {
  def feedSchema(table: StructType): StructType =
    StructType(table.fields :+
      StructField("_change", StringType, nullable = false))
}

class TxChangesTable(
    path: String, fromV: Long, toV: Long, emitPre: Boolean,
    feedSchema: StructType) extends Table with SupportsRead {

  override def name(): String = s"graft-tx-cdf($path v$fromV..v$toV)"
  override def schema(): StructType = feedSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        new TxChangesScan(path, fromV, toV, emitPre, feedSchema)
    }
}

class TxChangesScan(
    path: String, fromV: Long, toV: Long, emitPre: Boolean,
    feedSchema: StructType) extends Scan with Batch {

  // resolve both endpoints ONCE, with changes()'s own error wording for
  // retired/nonexistent versions (delegate the validation to it cheaply
  // by resolving the same snapshots it would)
  require(fromV < toV,
    s"graft-tx: readChangeFeed needs fromVersion < toVersion, " +
      s"got $fromV, $toV")
  private def resolve(v: Long) =
    try TxSource.snapshotAt(path, v)
    catch {
      case e: IllegalStateException => throw new IllegalStateException(
        e.getMessage + " — a change-feed consumer this far behind " +
          "retention must re-bootstrap")
    }
  private val a = resolve(fromV)
  private val b = resolve(toV)
  private val keys = b.meta.get(Tx.KeysKey).map(_.split(",").toSeq)
    .getOrElse(throw new IllegalStateException(
      s"graft-tx: $path has no recorded merge keys (no data commit yet)"))

  override def readSchema(): StructType = feedSchema
  override def description(): String = {
    val changed = (a.dirs.keySet ++ b.dirs.keySet)
      .count(k => a.dirs.get(k) != b.dirs.get(k))
    s"TxChangesScan($path v$fromV..v$toV, changedBuckets=$changed, " +
      s"emitPre=$emitPre)"
  }
  override def toBatch: Batch = this

  /** One partition per CHANGED bucket — the manifest diff names them;
    * untouched buckets are never opened, and the diff itself needs no
    * exchange because a bucket's key partition is version-stable.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val changed = (a.dirs.keySet ++ b.dirs.keySet)
      .filter(k => a.dirs.get(k) != b.dirs.get(k))
    changed.toSeq.sorted.map { k =>
      TxDiffPartition(
        a.dirs.get(k).map(rel => s"$path/$rel").getOrElse(""),
        b.dirs.get(k).map(rel => s"$path/$rel").getOrElse(""),
        StructType(feedSchema.fields.dropRight(1)).json, // table schema
        keys, emitPre): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          p: InputPartition): PartitionReader[InternalRow] =
        new TxDiffReader(p.asInstanceOf[TxDiffPartition])
    }
}

/** One changed bucket: the two versions' directories ("" = the bucket
  * has no data in that version), the table schema, and the merge keys.
  */
case class TxDiffPartition(
    oldDir: String, newDir: String, schemaJson: String,
    keys: Seq[String], emitPre: Boolean) extends InputPartition

/** Bucket-local diff: the OLD side loads into a hash map keyed by the
  * merge keys, the NEW side streams against it — inserts and updates
  * emit as encountered, survivors of the map emit as deletes. Equality
  * over non-key columns matches Spark's `<=>`: null-safe, NaN == NaN,
  * -0.0 == 0.0, binary by content.
  */
class TxDiffReader(part: TxDiffPartition)
    extends PartitionReader[InternalRow] {

  private val schema =
    DataType.fromJson(part.schemaJson).asInstanceOf[StructType]
  private val n = schema.length
  private val keyIdx = part.keys.map(schema.fieldIndex).toArray
  private val nonKeyIdx =
    (0 until n).filterNot(keyIdx.contains).toArray

  /** Spark-`<=>` value semantics for both map keys and change compare:
    * doubles/floats normalize -0.0 and equate NaNs; byte arrays wrap
    * for content equality/hash.
    */
  private def norm(v: Any): Any = v match {
    case d: Double =>
      if (d.isNaN) java.lang.Double.valueOf(Double.NaN)
      else if (d == 0.0) java.lang.Double.valueOf(0.0) else d
    case f: Float =>
      if (f.isNaN) java.lang.Float.valueOf(Float.NaN)
      else if (f == 0.0f) java.lang.Float.valueOf(0.0f) else f
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case other => other
  }

  private def keyOf(r: InternalRow): Seq[Any] =
    keyIdx.toSeq.map(i => norm(r.get(i, schema(i).dataType)))

  private def sameNonKeys(x: InternalRow, y: InternalRow): Boolean =
    nonKeyIdx.forall { i =>
      val dt = schema(i).dataType
      val a = if (x.isNullAt(i)) null else norm(x.get(i, dt))
      val b = if (y.isNullAt(i)) null else norm(y.get(i, dt))
      a == b || (a != null && a.equals(b))
    }

  private def readAll(dir: String): Iterator[InternalRow] =
    if (dir.isEmpty) Iterator.empty
    else new Iterator[InternalRow] {
      private val r = new TxBucketReader(dir, schema)
      private var nextReady = r.next()
      override def hasNext: Boolean = nextReady
      override def next(): InternalRow = {
        val row = r.get().copy() // the reader reuses nothing, but be safe
        nextReady = r.next()
        if (!nextReady) r.close()
        row
      }
    }

  // the old side in task heap — the same order of memory the bucket
  // rewrite that produced it needed (nBuckets is the sizing dial)
  private val oldRows: java.util.HashMap[Seq[Any], InternalRow] = {
    val m = new java.util.HashMap[Seq[Any], InternalRow]()
    readAll(part.oldDir).foreach(r => m.put(keyOf(r), r))
    m
  }

  private def out(r: InternalRow, label: String): InternalRow = {
    val vals = new Array[Any](n + 1)
    var i = 0
    while (i < n) {
      vals(i) = if (r.isNullAt(i)) null else r.get(i, schema(i).dataType)
      i += 1
    }
    vals(n) = UTF8String.fromString(label)
    new GenericInternalRow(vals)
  }

  private val newSide = readAll(part.newDir)
  private var deletes: Iterator[InternalRow] = _
  private var pending: InternalRow = _ // second row of a pre/post pair
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (pending != null) { current = pending; pending = null; return true }
    while (newSide.hasNext) {
      val nr = newSide.next()
      val k = keyOf(nr)
      val or = oldRows.remove(k)
      if (or == null) { current = out(nr, "insert"); return true }
      if (!sameNonKeys(or, nr)) {
        if (part.emitPre) {
          current = out(nr, "update_post")
          pending = out(or, "update_pre")
        } else current = out(nr, "update")
        return true
      } // unchanged re-landed row: compared out
    }
    if (deletes == null) {
      deletes = {
        import scala.jdk.CollectionConverters._
        oldRows.values().iterator().asScala
      }
    }
    if (deletes.hasNext) { current = out(deletes.next(), "delete"); true }
    else false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
