package graft.sources.keyset

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{Filter, GreaterThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 keyset-paginated source — the reference's incremental
  * HTTP ingest (fetch pages `WHERE id > cursor ORDER BY id LIMIT n`;
  * reference src/ingest/fetch_neso.py:42-97) expressed Spark-natively:
  *
  *  - BATCH read: the id range is split into per-partition keyset windows,
  *    each task pages through its own window — parallel ingest instead of
  *    the reference's serial page loop.
  *  - The reference's hand-written `WHERE _id > cursor` pushdown becomes a
  *    real Catalyst pushdown: `SupportsPushDownFilters` accepts
  *    `GreaterThan(id, v)` and the feed is asked only for ids beyond it.
  *  - MICRO-BATCH streaming: the resume cursor IS the source offset —
  *    `latestOffset` probes the feed's max id and each micro-batch reads
  *    `(start, end]`, giving checkpointed exactly-once without the
  *    self-healing max(_id) probe the reference re-derives per run.
  *
  * Transport is pluggable via [[RecordFeed]] — the engine sees only
  * "ordered pages of records after a cursor". `option("url", ...)`
  * constructs a retrying [[HttpRecordFeed]] per task (production);
  * `option("feed", name)` resolves a registered in-memory feed (tests).
  *
  * Usage: `spark.read.format("graft.sources.keyset.KeysetSource")
  *   .option("url", "http://host/api").option("batchSize", 1000).load()`
  * (same for `readStream`).
  */
class KeysetSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = KeysetSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KeysetTable(
      FeedRef(
        properties.getOrDefault("feed", ""),
        properties.getOrDefault("url", "")),
      properties.getOrDefault("batchSize", "1000").toInt,
      properties.getOrDefault("numPartitions", "8").toInt)
}

object KeysetSource {
  /** The landing schema every page row maps to. */
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("payload", StringType, nullable = true),
    StructField("value", DoubleType, nullable = true)))
}

/** One record from the remote feed. */
case class FeedRecord(id: Long, tsMicros: Long, payload: String, value: Double)

/** Pluggable transport: ordered keyset pages after a cursor. */
trait RecordFeed extends Serializable {
  /** Records with id > afterId, ascending, at most limit. */
  def fetchPage(afterId: Long, limit: Int): Seq[FeedRecord]
  /** Current max id (0 when empty) — the streaming latest offset probe. */
  def maxId(): Long
}

/** Named registry so executor tasks can resolve the feed from a string
  * option (single-JVM local mode; a production build would construct an
  * HTTP client from connection options instead).
  */
/** How a task obtains its transport: a registered in-memory feed (tests,
  * single-JVM), or an HTTP endpoint constructed from the `url` option —
  * each executor builds its own [[HttpRecordFeed]] client from the
  * coordinates, nothing is serialized but strings.
  */
case class FeedRef(feedName: String, url: String) {
  def resolve(): RecordFeed =
    if (url.nonEmpty) new HttpRecordFeed(url) else FeedRegistry.get(feedName)
  def label: String = if (url.nonEmpty) url else feedName
}

object FeedRegistry {
  private val feeds = new java.util.concurrent.ConcurrentHashMap[String, RecordFeed]()
  def register(name: String, feed: RecordFeed): Unit = feeds.put(name, feed)
  def get(name: String): RecordFeed =
    Option(feeds.get(name)).getOrElse(
      throw new IllegalArgumentException(s"no RecordFeed registered as '$name'"))
}

class KeysetTable(ref: FeedRef, batchSize: Int, numPartitions: Int)
    extends Table with SupportsRead {

  override def name(): String = s"keyset(${ref.label})"
  override def schema(): StructType = KeysetSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KeysetScanBuilder(ref, batchSize, numPartitions)
}

class KeysetScanBuilder(ref: FeedRef, batchSize: Int, numPartitions: Int)
    extends ScanBuilder with SupportsPushDownFilters {

  private var cursor: Long = 0L
  private var unsupported: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (pushed, rest) = filters.partition {
      case GreaterThan("id", v: Long) => true
      case GreaterThan("id", v: Int) => true
      case _ => false
    }
    pushed.foreach {
      case GreaterThan("id", v: Long) => cursor = math.max(cursor, v)
      case GreaterThan("id", v: Int) => cursor = math.max(cursor, v.toLong)
      case _ =>
    }
    unsupported = rest
    rest // Spark re-evaluates the rest; pushed ones are handled by the feed
  }

  override def pushedFilters(): Array[Filter] =
    if (cursor > 0) Array(GreaterThan("id", cursor)) else Array.empty

  override def build(): Scan = new KeysetScan(ref, batchSize, numPartitions, cursor)
}

class KeysetScan(ref: FeedRef, batchSize: Int, numPartitions: Int, cursor: Long)
    extends Scan {
  override def readSchema(): StructType = KeysetSource.Schema
  override def description(): String = s"KeysetScan(feed=${ref.label}, cursor>$cursor)"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      // split (cursor, maxId] into contiguous keyset windows — each task
      // pages independently; ranges are disjoint so no coordination needed
      val max = ref.resolve().maxId()
      if (max <= cursor) Array.empty
      else {
        val span = max - cursor
        val n = math.min(numPartitions.toLong, span).toInt
        val step = span / n
        (0 until n).map { i =>
          val lo = cursor + i * step
          val hi = if (i == n - 1) max else cursor + (i + 1) * step
          KeysetRange(lo, hi): InputPartition
        }.toArray
      }
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new KeysetReaderFactory(ref, batchSize)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KeysetMicroBatchStream(ref, batchSize, numPartitions)
}

/** A keyset window (lo, hi] read by one task. */
case class KeysetRange(lo: Long, hi: Long) extends InputPartition

class KeysetReaderFactory(ref: FeedRef, batchSize: Int) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val range = partition.asInstanceOf[KeysetRange]
    new PartitionReader[InternalRow] {
      private val feed = ref.resolve()
      private var cursor = range.lo
      private var page: Iterator[FeedRecord] = Iterator.empty
      private var current: FeedRecord = _
      private var exhausted = false

      override def next(): Boolean = {
        while (!page.hasNext && !exhausted) {
          val fetched = feed.fetchPage(cursor, batchSize)
            .takeWhile(_.id <= range.hi) // stay inside this task's window
          if (fetched.isEmpty) exhausted = true
          else {
            cursor = fetched.last.id // keyset advance (fetch_neso.py:84)
            if (cursor >= range.hi) exhausted = true
            page = fetched.iterator
          }
        }
        if (page.hasNext) { current = page.next(); true } else false
      }

      override def get(): InternalRow =
        InternalRow(current.id, current.tsMicros,
          UTF8String.fromString(current.payload), current.value)

      override def close(): Unit = ()
    }
  }
}

/** Streaming offset = the keyset cursor. */
case class KeysetOffset(lastId: Long) extends Offset {
  override def json(): String = s"""{"lastId":$lastId}"""
}

class KeysetMicroBatchStream(ref: FeedRef, batchSize: Int, numPartitions: Int)
    extends MicroBatchStream {

  private def feed = ref.resolve()

  override def initialOffset(): Offset = KeysetOffset(0L)
  override def latestOffset(): Offset = KeysetOffset(feed.maxId())

  override def deserializeOffset(json: String): Offset =
    KeysetOffset("""\d+""".r.findFirstIn(json).map(_.toLong).getOrElse(0L))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[KeysetOffset].lastId
    val hi = end.asInstanceOf[KeysetOffset].lastId
    if (hi <= lo) Array.empty else Array(KeysetRange(lo, hi))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KeysetReaderFactory(ref, batchSize)

  override def commit(end: Offset): Unit = () // nothing to ack upstream
  override def stop(): Unit = ()
}
