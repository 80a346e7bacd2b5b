package graft.sources.tx

import java.util
import scala.jdk.CollectionConverters._
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.example.data.Group
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.Tx

/** DataSource V2 read path for [[graft.sources.Tx]] tables — the piece
  * that makes the format reachable from IDIOMATIC Spark: a plain
  *
  * {{{
  *   spark.read.format("graft-tx").load(path)
  *     .filter($"p_day" between (lo, hi))
  * }}}
  *
  * now consults the manifest's zone maps, because Catalyst pushes the
  * range/equality predicates into the ScanBuilder
  * (`SupportsPushDownFilters`) and scan planning keeps ONE
  * InputPartition per bucket whose zone can intersect — the same
  * pruning `Tx.readRange` does behind its side API, under the standard
  * read surface. The reference's dashboard read is exactly this
  * filter-on-scan shape (/root/reference/src/app/utils/helpers.py:49-59
  * over data_loader.py:32); without this class a user writing it over a
  * Tx table silently lost the skipping.
  *
  * Division of labor, exactly the zone-map contract:
  *  - PRUNING is advisory and planning-time: pushed filters narrow the
  *    bucket set via the manifest (one manifest read, no file listing,
  *    no footers — at 100 TB the unkept buckets' directories are never
  *    opened). `pushFilters` returns EVERY filter as a residual, so
  *    Spark re-applies the exact predicates over whatever is served —
  *    a mistyped bound or a stat-less bucket can never change results.
  *  - PROJECTION is exact: `SupportsPushDownRequiredColumns` narrows the
  *    decoded column set (and a count(*)-style empty projection is
  *    served from footer row counts without materializing any column).
  *  - TIME TRAVEL via `option("version", v)` — the scan pins that
  *    manifest, so a concurrent commit can't shear a running query.
  *
  * The per-task reader decodes the bucket's immutable parquet files with
  * Spark's OWN vectorized reader into ColumnarBatches under the MANIFEST
  * schema (files written before an [[Tx.addColumn]] lack the evolved
  * column and serve nulls — same rule as `Tx.read`; arrays/structs ride
  * the reader's nested support, so embedding tables read through this
  * surface too). A parquet-mr row fallback remains behind
  * `option("vectorized", false)` — flat primitives only, named error on
  * nested — and serves the pushed COUNT(*) / empty-projection shapes
  * from footer row counts. Batch read only — streaming consumers use
  * [[graft.operators.Mv.followChanges]] over the change feed instead,
  * which is version-incremental rather than scan-shaped.
  */
class TxSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-tx"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (TxSource.isStreamingFeed(options))
      TxChanges.stampedSchema(
        TxSource.schemaAt(TxSource.pathOf(options), -1L))
    else if (TxSource.isChangeFeed(options))
      TxChanges.feedSchema(
        TxSource.schemaAt(TxSource.pathOf(options),
          options.get("toVersion").toLong))
    else
      TxSource.schemaAt(TxSource.pathOf(options), TxSource.versionOf(options))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    if (TxSource.isStreamingFeed(opts))
      new TxChangesStreamTable(TxSource.pathOf(opts),
        opts.getBoolean("emitPre", false), schema, opts)
    else if (TxSource.isChangeFeed(opts))
      new TxChangesTable(TxSource.pathOf(opts),
        opts.get("fromVersion").toLong, opts.get("toVersion").toLong,
        opts.getBoolean("emitPre", false), schema)
    else
      new TxTableV2(TxSource.pathOf(opts), TxSource.versionOf(opts), schema)
  }
}

object TxSource {
  private[tx] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft-tx: exactly one table path is required — " +
        "spark.read.format(\"graft-tx\").load(<tableDir>)")
    p
  }

  /** The pinned version: explicit `option("version", v)`, or
    * `option("timestampAsOf", t)` resolved through the manifests' commit
    * stamps ([[Tx.versionAt]] — `TIMESTAMP AS OF` semantics: newest
    * version committed at or before t), or -1 (latest). Exclusive —
    * pinning both is a caller bug.
    */
  private[tx] def versionOf(options: CaseInsensitiveStringMap): Long = {
    val v = Option(options.get("version"))
    val ts = Option(options.get("timestampAsOf"))
    require(v.isEmpty || ts.isEmpty,
      "graft-tx: option(\"version\") and option(\"timestampAsOf\") are " +
        "exclusive — pin the snapshot one way")
    ts match {
      case Some(t) => Tx.versionAt(pathOf(options), parseTsMillis(t))
      case None => v.map(_.toLong).getOrElse(-1L)
    }
  }

  /** Epoch millis of a timestampAsOf value: bare digits = epoch millis,
    * else an ISO instant (`2026-01-01T00:00:00Z`), else a plain datetime
    * taken as UTC (the repo-wide session zone) — named error otherwise.
    */
  private[tx] def parseTsMillis(s: String): Long =
    s.toLongOption.getOrElse {
      try java.time.Instant.parse(s).toEpochMilli
      catch {
        case _: java.time.format.DateTimeParseException =>
          try java.time.LocalDateTime.parse(s.trim.replace(' ', 'T'))
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
          catch {
            case _: java.time.format.DateTimeParseException =>
              throw new IllegalArgumentException(
                s"graft-tx: cannot parse timestampAsOf '$s' — pass epoch " +
                  "millis, an ISO instant (2026-01-01T00:00:00Z), or a " +
                  "UTC datetime (2026-01-01 00:00:00)")
          }
      }
    }

  /** `option("readChangeFeed", true)` + from/to versions switches the
    * source from snapshot reads to the batch CDF ([[TxChangesTable]]);
    * with NEITHER bound it is the STREAMING feed
    * ([[TxChangesStreamTable]] — offsets are versions, rows are
    * `_commit_version`-stamped). Exactly one bound is a caller bug.
    */
  private[tx] def isChangeFeed(options: CaseInsensitiveStringMap): Boolean = {
    val on = options.getBoolean("readChangeFeed", false)
    if (on) {
      require((options.get("fromVersion") != null) ==
        (options.get("toVersion") != null),
        "graft-tx: readChangeFeed takes BOTH option(\"fromVersion\", a) " +
          "and option(\"toVersion\", b) (batch), or NEITHER (streaming)")
      require(options.get("version") == null &&
        options.get("timestampAsOf") == null,
        "graft-tx: readChangeFeed and version/timestampAsOf time travel " +
          "are exclusive")
    }
    on
  }

  private[tx] def isStreamingFeed(options: CaseInsensitiveStringMap): Boolean =
    isChangeFeed(options) && options.get("fromVersion") == null

  private[tx] def snapshotAt(path: String, version: Long): Tx.Snapshot =
    if (version >= 0)
      try Tx.snapshot(path, version)
      catch {
        case _: java.nio.file.NoSuchFileException =>
          val vs = Tx.versions(path)
          throw new IllegalStateException(
            s"graft-tx: version $version does not exist in $path " +
              s"(committed: ${vs.headOption.getOrElse("none")}.." +
              s"${vs.lastOption.getOrElse("none")}) — older versions may " +
              "have been retired by vacuum")
      }
    else Tx.latest(path).getOrElse(throw new IllegalStateException(
      s"graft-tx: no committed version in $path"))

  private[tx] def schemaAt(path: String, version: Long): StructType = {
    val snap = snapshotAt(path, version)
    val st = snap.meta.get(Tx.SchemaKey)
      .map(DataType.fromJson(_).asInstanceOf[StructType])
      .getOrElse(throw new IllegalStateException(
        s"graft-tx: $path v${snap.version} has no recorded schema " +
          "(no data commit yet)"))
    // the merge keys are non-nullable BY INVARIANT (every commit
    // rejects NULL keys before any file lands) — report that, so
    // row-level SQL's row-id attributes pass Spark's nullability check
    val keys = snap.meta.get(Tx.KeysKey)
      .map(_.split(",").toSet).getOrElse(Set.empty)
    StructType(st.fields.map(f =>
      if (keys.contains(f.name)) f.copy(nullable = false) else f))
  }
}

class TxTableV2(path: String, version: Long, tableSchema: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.TruncatableTable {

  override def name(): String =
    s"graft-tx($path${if (version >= 0) s"@v$version" else ""})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.STREAMING_WRITE)

  /** `TRUNCATE TABLE tx.t` — an empty overwrite: every bucket drops in
    * one manifest CAS, schema and properties carry forward, earlier
    * snapshots stay readable until vacuum.
    */
  override def truncateTable(): Boolean = {
    require(version < 0,
      "graft-tx: cannot TRUNCATE through a time-travel read")
    val spark = org.apache.spark.sql.SparkSession.active
    val schema = Tx.schemaOf(path).getOrElse(tableSchema)
    val keys = Tx.latest(path).flatMap(_.meta.get(Tx.KeysKey))
      .map(_.split(",").toSeq)
      .getOrElse(throw new IllegalStateException(
        s"graft-tx: $path has no recorded merge keys"))
    Tx.commitOverwrite(spark, path,
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
      keys, Tx.latest(path).map(_.nBuckets).getOrElse(16))
    true
  }

  /** The recorded table properties, for `SHOW TBLPROPERTIES` and
    * friends — read straight off the manifest meta.
    */
  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    Tx.latest(path).foreach { snap =>
      m.put("nbuckets", snap.nBuckets.toString)
      snap.meta.get(Tx.KeysKey).foreach(m.put("keys", _))
      snap.meta.get(Tx.BucketKeysKey).foreach(m.put("bucketkeys", _))
      snap.meta.get(Tx.StatsColsKey).foreach(m.put("statscols", _))
      snap.meta.get(Tx.FileSortKey).foreach(m.put("filesortcols", _))
      snap.meta.get(Tx.MaxRowsFileKey).foreach(m.put("maxrowsperfile", _))
      snap.meta.foreach { case (k, v) =>
        if (k.startsWith(Tx.ConstraintPrefix))
          m.put("constraint." + k.stripPrefix(Tx.ConstraintPrefix), v)
        else if (k.startsWith(Tx.NonNullPrefix))
          m.put("nonnull." + k.stripPrefix(Tx.NonNullPrefix), v)
      }
      m.put("version", snap.version.toString)
    }
    m
  }

  /** `DELETE FROM tx.t WHERE <filter-shaped condition>` — the format's
    * right-to-be-forgotten path from pure SQL: the condition's filters
    * select victim KEYS through the pruned DSv2 scan (a time-range
    * delete opens only its range's buckets), and [[Tx.commitDelete]]
    * rewrites exactly the touched buckets in one manifest CAS. Earlier
    * snapshots stay auditable until vacuum — deletion is effective-at-
    * a-version, the GDPR shape. Conditions that don't translate to
    * source filters (expressions, subqueries) are rejected by Spark via
    * [[canDeleteWhere]] with its standard error.
    */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    version < 0 && filters.forall(TxDeleteFilters.translatable)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(version < 0,
      "graft-tx: cannot DELETE through a time-travel read")
    val spark = org.apache.spark.sql.SparkSession.active
    val snap = Tx.latest(path).getOrElse(throw new IllegalStateException(
      s"graft-tx: cannot delete from $path — no committed version"))
    val keys = snap.meta.get(Tx.KeysKey).map(_.split(",").toSeq)
      .getOrElse(throw new IllegalStateException(
        s"graft-tx: $path has no recorded merge keys"))
    val bucketKeys = snap.meta.get(Tx.BucketKeysKey)
      .map(_.split(",").toSeq).getOrElse(Nil)
    val cond = filters.map(TxDeleteFilters.toColumn)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    // victim keys through the PRUNED scan: a range delete's key scan
    // opens only the range's buckets
    val victims = spark.read.format("graft-tx").load(path)
      .filter(cond)
      .select(keys.map(org.apache.spark.sql.functions.col): _*)
    Tx.commitDelete(spark, path, victims, keys, snap.nBuckets,
      bucketKeys = bucketKeys)
    ()
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TxScanBuilder(path, version, tableSchema,
      options.getBoolean("vectorized", true),
      Option(options.get("scanTag")), options)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new TxWriteBuilder(path, version, info)

  /** `UPDATE` / `MERGE INTO` / expression-`DELETE` — the delta-based
    * row-level operation ([[TxRowLevelOperation]]): merge keys are the
    * row ids, the delta commits through one [[Tx.commitDelta]] CAS.
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(version < 0,
      "graft-tx: cannot run row-level SQL through a time-travel read")
    new TxRowLevelBuilder(path, tableSchema, info)
  }
}

class TxScanBuilder(
    path: String, version: Long, tableSchema: StructType,
    vectorized: Boolean = true,
    scanTag: Option[String] = None,
    options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty())
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  // resolve ONE manifest for the whole scan — snapshot isolation: a
  // commit racing this query can't shear the bucket set mid-plan
  private val snap = TxSource.snapshotAt(path, version)
  private var required: StructType = tableSchema
  private var prunable: Array[Filter] = Array.empty
  private var sawFilters = false
  private var pushedAggs: Option[Seq[TxAggCell]] = None

  /** Bare, ungrouped COUNT(*) / MIN(col) / MAX(col) are answered from
    * METADATA: the count from parquet footer row counts (one partial row
    * per bucket, no column materialized), min/max straight from the
    * manifest zone maps when [[Tx.aggBounds]] can serve them exactly
    * (lossless stat encoding AND every bucket bounded — strings, NaN/∞
    * buckets, and stat-less buckets refuse the whole pushdown; a partial
    * answer would be wrong, not just slower). Soundness across filters
    * is enforced by Spark itself: every filter here is residual, and
    * V2ScanRelationPushDown never offers an aggregate across a residual
    * Filter node — plus the sawFilters belt below. Partial pushdown only
    * (Spark min/max-merges the per-bucket rows), so AQE and grouping
    * stay Spark's business.
    */
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.{Expression, NamedReference}
    if (sawFilters || agg.groupByExpressions.nonEmpty ||
      agg.aggregateExpressions.isEmpty) return false
    // DELETION VECTORS: footer row counts over-count tombstoned rows
    // and a manifest bound may belong to a dead row — a table carrying
    // any sidecar refuses the whole pushdown and scans real (filtered)
    // rows instead; compactDeletes restores the metadata-only path
    if (snap.tombs.nonEmpty) return false
    // resolve under the session's resolver (case-insensitive by
    // default) — MAX(EVENT_ID) must find event_id; the returned name is
    // the SCHEMA's spelling, which the stat lookup keys on
    val resolver = org.apache.spark.sql.internal.SQLConf.get.resolver
    def colOf(e: Expression): Option[String] = e match {
      case f: NamedReference if f.fieldNames.length == 1 =>
        tableSchema.fields.find(x => resolver(x.name, f.fieldNames()(0)))
          .map(_.name)
      case _ => None
    }
    def bound(e: Expression, isMax: Boolean): Option[TxAggCell] = for {
      c <- colOf(e)
      dt = tableSchema.fields.find(_.name == c).get.dataType
      pb <- Tx.aggBounds(snap, c, isMax)
    } yield TxCellBound(c, isMax, dt, pb)
    val cells = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(TxCellCount: TxAggCell)
      case m: Min => bound(m.column(), isMax = false)
      case m: Max => bound(m.column(), isMax = true)
      case _ => None
    }
    if (cells.exists(_.isEmpty)) false
    else { pushedAggs = Some(cells.map(_.get)); true }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // a filter "prunes" only if it names a column with recorded stats
    // AND its bound actually narrows the kept set's math — pruneLenient
    // decides both; here we only keep the shapes it can consume
    sawFilters = filters.nonEmpty
    prunable = filters.filter(TxPrune.supported)
    filters // ALL residual: pruning is advisory, Spark re-applies exactly
  }

  /** What explain() shows as PushedFilters — the predicates the scan
    * consults for bucket pruning (still re-applied by Spark above).
    */
  override def pushedFilters(): Array[Filter] = prunable

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val zoneKept = prunable.flatMap(TxPrune.keptFor(snap, _))
      .foldLeft(snap.dirs.keySet)(_ intersect _)
    // hash pruning on top: an equality probe over the bucket keys
    // resolves to its exact bucket(s) — the point-lookup path
    val kept = TxPrune.keyEqualityKept(snap, prunable.toSeq, tableSchema)
      .map(zoneKept intersect _).getOrElse(zoneKept)
    new TxScan(path, snap, required, kept, prunable, pushedAggs, vectorized,
      scanTag, version, options)
  }
}

/** One pushed aggregate column: COUNT(*) (footer row counts per bucket)
  * or a MIN/MAX bound with its per-bucket exact values resolved from the
  * manifest at PLANNING time — by the time the scan exists, the answer
  * is already in hand; the per-bucket task only assembles its row.
  */
private[tx] sealed trait TxAggCell extends Serializable
private[tx] case object TxCellCount extends TxAggCell
private[tx] case class TxCellBound(
    col: String, isMax: Boolean, dt: DataType,
    perBucket: Map[Int, Option[Any]]) extends TxAggCell

/** Source-filter → Column translation for `DELETE FROM ... WHERE` —
  * the victim-key scan condition. Exhaustive over the shapes Spark's
  * own filter translation produces; anything else makes
  * `canDeleteWhere` false and Spark reports its standard
  * cannot-translate error.
  */
private[tx] object TxDeleteFilters {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit}

  def translatable(f: Filter): Boolean = f match {
    case _: EqualTo | _: EqualNullSafe | _: GreaterThan |
         _: GreaterThanOrEqual | _: LessThan | _: LessThanOrEqual |
         _: In | _: IsNull | _: IsNotNull | _: StringStartsWith |
         _: StringEndsWith | _: StringContains |
         _: AlwaysTrue | _: AlwaysFalse => true
    case And(l, r) => translatable(l) && translatable(r)
    case Or(l, r) => translatable(l) && translatable(r)
    case Not(c) => translatable(c)
    case _ => false
  }

  def toColumn(f: Filter): Column = f match {
    case EqualTo(a, v) => col(a) === lit(v)
    case EqualNullSafe(a, v) => col(a) <=> lit(v)
    case GreaterThan(a, v) => col(a) > lit(v)
    case GreaterThanOrEqual(a, v) => col(a) >= lit(v)
    case LessThan(a, v) => col(a) < lit(v)
    case LessThanOrEqual(a, v) => col(a) <= lit(v)
    case In(a, vs) => col(a).isin(vs.toSeq: _*)
    case IsNull(a) => col(a).isNull
    case IsNotNull(a) => col(a).isNotNull
    case StringStartsWith(a, p) => col(a).startsWith(p)
    case StringEndsWith(a, s) => col(a).endsWith(s)
    case StringContains(a, s) => col(a).contains(s)
    case And(l, r) => toColumn(l) && toColumn(r)
    case Or(l, r) => toColumn(l) || toColumn(r)
    case Not(c) => !toColumn(c)
    case _: AlwaysTrue => lit(true)
    case _: AlwaysFalse => lit(false)
    case other => throw new UnsupportedOperationException(
      s"graft-tx: untranslatable delete filter $other")
  }
}

/** A pushed filter's kept-bucket contribution — shared by compile-time
  * pushdown (ScanBuilder) and runtime filtering (DPP on the Scan).
  * Strict bounds relax to inclusive — conservative (keeps possibly-extra
  * buckets, never wrongly prunes), and exactness is Spark's job anyway.
  * `In` is the union of its values' equality prunes; `LIKE 'p%'` is the
  * byte-range `[p, increment(p))` over a string column's zones;
  * `Or(a, b)` the UNION of its children's kept sets (both children must
  * be consumable, else the whole disjunct keeps everything — a row
  * could satisfy the branch we can't bound); `IsNotNull` prunes only
  * the `~` all-null zones; `EqualNullSafe` with a non-null value IS
  * EqualTo (with null it would need null counts the manifest doesn't
  * record — keep all).
  */
private[tx] object TxPrune {
  def keptFor(snap: Tx.Snapshot, f: Filter): Option[Set[Int]] = f match {
    case EqualTo(c, v) => Some(Tx.pruneLenient(snap, c, Some(v), Some(v)))
    case EqualNullSafe(c, v) if v != null =>
      Some(Tx.pruneLenient(snap, c, Some(v), Some(v)))
    case GreaterThan(c, v) => Some(Tx.pruneLenient(snap, c, Some(v), None))
    case GreaterThanOrEqual(c, v) =>
      Some(Tx.pruneLenient(snap, c, Some(v), None))
    case LessThan(c, v) => Some(Tx.pruneLenient(snap, c, None, Some(v)))
    case LessThanOrEqual(c, v) =>
      Some(Tx.pruneLenient(snap, c, None, Some(v)))
    case In(c, vs) if vs.nonEmpty =>
      Some(vs.map(v => Tx.pruneLenient(snap, c, Some(v), Some(v)))
        .reduce(_ union _))
    case StringStartsWith(c, p) => Some(Tx.prunePrefixLenient(snap, c, p))
    case IsNotNull(c) => Some(Tx.pruneLenient(snap, c, None, None))
    case Or(l, r) =>
      for (kl <- keptFor(snap, l); kr <- keptFor(snap, r))
        yield kl union kr
    case _ => None
  }

  def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual | _: StringStartsWith |
         _: IsNotNull => true
    case EqualNullSafe(_, v) => v != null
    case In(_, vs) => vs.nonEmpty
    case Or(l, r) => supported(l) && supported(r)
    case _ => false
  }

  /** HASH pruning — the bucket layout itself as an index. When the
    * pushed conjuncts (the filter array IS the top-level conjunction)
    * pin EVERY recorded bucket-key column to a constant or a finite
    * set, each candidate tuple's bucket is computable from the
    * manifest alone ([[Tx.bucketOfValues]] — the same Catalyst hash
    * the writers used), and ONLY those buckets can hold matching rows:
    * unlike zone pruning this is an identity argument, not a bounds
    * argument — commits enforce bucket-key and key-type stability
    * since birth, so equal tuples co-locate at every version of a
    * given layout (and the scan's snapshot carries ITS layout's
    * nBuckets, so time travel across a rebucket stays correct). The
    * payoff is the 100 TB point lookup: `WHERE event_id = k` opens ONE
    * bucket instead of all of them — zone maps can't do this, because
    * a hash layout makes every bucket's min/max span the whole domain.
    *
    * Refusals (None = keep all, always sound): missing/renamed-away
    * column, float/double keys (NaN/-0.0 equality-vs-hash corners),
    * null values (a null key never matches — Spark's residual filter
    * answers), candidate blowup past a fixed cap, or any value a
    * literal of the column's type can't represent.
    */
  def keyEqualityKept(
      snap: Tx.Snapshot, filters: Seq[Filter],
      schema: StructType): Option[Set[Int]] = {
    val bk = snap.meta.get(Tx.BucketKeysKey)
      .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    if (bk.isEmpty) return None
    val resolver = org.apache.spark.sql.internal.SQLConf.get.resolver
    def schemaName(c: String): Option[String] =
      schema.fields.find(f => resolver(f.name, c)).map(_.name)
    // per bucket-key column: the smallest finite candidate set any
    // top-level conjunct pins it to (one equality suffices — extra
    // conjuncts only narrow further, and Spark re-applies exactly)
    val cand = filters.flatMap {
      case EqualTo(c, v) if v != null => schemaName(c).map(_ -> Seq(v))
      case EqualNullSafe(c, v) if v != null => schemaName(c).map(_ -> Seq(v))
      case In(c, vs) if vs.nonEmpty && vs.length <= 4096 &&
        !vs.contains(null) => schemaName(c).map(_ -> vs.toSeq)
      case _ => None
    }.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).minBy(_.size) }
    if (!bk.forall(cand.contains)) return None
    val dts = bk.map(c => schema.fields.find(_.name == c).map(_.dataType))
    if (dts.exists(dt => dt.isEmpty ||
      dt.contains(org.apache.spark.sql.types.DoubleType) ||
      dt.contains(org.apache.spark.sql.types.FloatType))) return None
    val combos = bk.foldLeft(Seq(Seq.empty[Any])) { (acc, c) =>
      if (acc.size > 4096) acc else acc.flatMap(p => cand(c).map(p :+ _))
    }
    if (combos.size > 4096) return None
    val buckets = combos.map(vals =>
      Tx.bucketOfValues(vals, dts.map(_.get), snap.nBuckets))
    if (buckets.exists(_.isEmpty)) None else Some(buckets.flatten.toSet)
  }
}

class TxScan(
    path: String, snap: Tx.Snapshot, required: StructType,
    kept: Set[Int], pushed: Array[Filter],
    aggs: Option[Seq[TxAggCell]] = None,
    vectorized: Boolean = true,
    scanTag: Option[String] = None,
    pinnedVersion: Long = -1L,
    options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty())
    extends Scan with Batch
    with SupportsReportStatistics with SupportsRuntimeFiltering
    with SupportsReportPartitioning with SupportsReportOrdering {

  /** Report the file-sort layout as the scan's OUTPUT ORDERING — with
    * [[outputPartitioning]] this completes the storage-partitioned
    * join: two same-layout Tx facts file-sorted on the bucket key plan
    * scan → merge-join with NO Exchange and NO Sort on either side
    * (the q240 `bucketBy` + legacy-outputOrdering proof rebuilt on the
    * format's own metadata). Sound per DIRECTORY: a sorted commit
    * leaves a `.sorted` marker in its commit dir, and the ordering is
    * reported only when EVERY kept bucket dir carries one matching the
    * recorded sort — a dir written before a LATE file-sort enablement
    * has no marker and silently (correctly) suppresses the report.
    * Within a bucket the rolled files' `-cNNN` counters reconstruct the
    * write order ([[TxBucketFiles]]), so concatenating them preserves
    * the per-partition sort the writers produced
    * (`sortWithinPartitions`, ascending nulls-first).
    */
  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    val sortCols = snap.meta.get(Tx.FileSortKey)
      .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    if (aggs.nonEmpty || sortCols.isEmpty) return Array.empty
    val resolver = org.apache.spark.sql.internal.SQLConf.get.resolver
    val proj = sortCols.map(c =>
      required.fields.find(f => resolver(f.name, c)).map(_.name))
    if (proj.exists(_.isEmpty)) return Array.empty
    val spec = sortCols.mkString(",")
    val allSorted = kept.toSeq.flatMap(snap.dirs.get).forall(rel =>
      Tx.sortedMarkerOf(s"$path/$rel").contains(spec))
    if (!allSorted) return Array.empty
    proj.map(c => org.apache.spark.sql.connector.expressions.Expressions
      .sort(
        org.apache.spark.sql.connector.expressions.Expressions
          .column(c.get),
        org.apache.spark.sql.connector.expressions.SortDirection
          .ASCENDING)).toArray
  }

  /** STORAGE-PARTITIONED JOINS: report the recorded bucket layout as
    * `KeyGroupedPartitioning(bucket(nBuckets, bucketKeys...))` — one
    * partition per kept bucket, keyed by its bucket id
    * ([[TxBucketPartition.partitionKey]]). Under
    * `spark.sql.sources.v2.bucketing.enabled`, two Tx tables with the
    * SAME layout (key types + nBuckets — the compatibility the bound
    * function's canonicalName and the transform's numBuckets encode)
    * then sort-merge scan-to-join with ZERO Exchange on either side;
    * any mismatch makes Spark fall back to the normal shuffle plan.
    * Reported only when the scan (a) reads real columns (not a pushed
    * aggregate's metadata rows) and (b) still projects every bucket-key
    * column — the transform's references must resolve against the
    * scan's output, and a layout the join can't see buys nothing. The
    * transform resolves through the owning [[TxCatalog]]'s
    * FunctionCatalog surface, so catalog reads get the layout and
    * path reads (`format("graft-tx").load`) stay on the sound
    * unknown-partitioning default.
    */
  /** SKEW GATE on the partitioning report (r14 verdict item 4): under
    * KeyGroupedPartitioning the join runs ONE unsplittable task per
    * bucket — AQE's skew-join splitting does not apply to storage-
    * partitioned joins, so a pathologically hot bucket becomes the
    * straggler AQE exists to kill. When the manifest's per-bucket byte
    * sizes put max/median above `spark.graft.tx.spj.maxSkew` (default
    * 16; <= 0 disables), the scan DECLINES to report the layout and the
    * join falls back to the shuffle plan, where AQE can split the hot
    * key. The statistic is a pure manifest read over the kept buckets;
    * buckets without recorded sizes (pre-sizes manifests) leave the
    * report in place — the gate only ever acts on evidence. The report
    * stays advisory either way: declining costs a shuffle, never
    * correctness.
    */
  private lazy val skewGated: Boolean = {
    val threshold = org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.tx.spj.maxSkew", "16").toDouble
    threshold > 0 && {
      val sizes = kept.toSeq.flatMap(snap.sizes.get).sorted
      sizes.size >= 2 && {
        val median = sizes(sizes.size / 2)
        sizes.last > threshold * math.max(1L, median)
      }
    }
  }

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning = {
    val bk = snap.meta.get(Tx.BucketKeysKey)
      .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val resolver = org.apache.spark.sql.internal.SQLConf.get.resolver
    def projected(c: String): Option[String] =
      required.fields.find(f => resolver(f.name, c)).map(_.name)
    val proj = bk.map(projected)
    if (aggs.isEmpty && bk.nonEmpty && proj.forall(_.isDefined) &&
        !skewGated)
      new org.apache.spark.sql.connector.read.partitioning
        .KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions
            .bucket(snap.nBuckets, proj.map(_.get): _*)),
          runtimeKept.size)
    else new org.apache.spark.sql.connector.read.partitioning
      .UnknownPartitioning(runtimeKept.size)
  }

  /** PLAIN streaming read ([[TxTableStream]]): snapshot batch first,
    * then the new commits' inserts — see the class doc for the
    * ignoreChanges / startingVersion contract.
    */
  override def toMicroBatchStream(
      checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(pinnedVersion < 0,
      "graft-tx: cannot stream a time-travel read — a pinned snapshot " +
        "never changes; drop option(\"version\"/\"timestampAsOf\")")
    require(aggs.isEmpty, "graft-tx: pushed aggregates cannot stream")
    val fullSchema = snap.meta.get(Tx.SchemaKey)
      .map(DataType.fromJson(_).asInstanceOf[StructType])
      .getOrElse(throw new IllegalStateException(
        s"graft-tx: $path has no recorded schema (no data commit yet)"))
    def longOpt(name: String): Option[Long] =
      Option(options.get(name)).map(v => v.toLongOption.getOrElse(
        throw new IllegalArgumentException(
          s"graft-tx: option($name) takes a numeric Tx version, got '$v'")))
    // startingTimestamp -> the EARLIEST commit at or after it
    // (Tx.versionAtOrAfter, Delta's inclusive round-up rule), then the
    // same inclusive startingVersion contract as the numeric option
    val sv = longOpt("startingVersion")
    val st = Option(options.get("startingTimestamp"))
    require(sv.isEmpty || st.isEmpty,
      "graft-tx: option(\"startingVersion\") and " +
        "option(\"startingTimestamp\") are exclusive — pin the start " +
        "one way")
    new TxTableStream(path, snap.version, required, fullSchema,
      st.map(t => Tx.versionAtOrAfter(
        path, TxSource.parseTsMillis(t))).orElse(sv),
      longOpt("maxVersionsPerTrigger"),
      options.getBoolean("ignoreChanges", false),
      TxChanges.maxDiffBytesOf(options))
  }

  // RUNTIME (DPP) pruning: Spark hands the scan the join-key values it
  // learned from the other side's selective filter, and the kept set
  // shrinks again — the Tx analogue of dynamic partition pruning.
  // Offered columns: zone-mapped ones (bounds pruning) and the bucket
  // keys (HASH pruning — a runtime In over the bucket keys resolves to
  // exactly the buckets holding those keys, the fact⋈dim shape);
  // anything else would cost a broadcast subquery and prune nothing.
  private var runtimeKept: Set[Int] = kept

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    (snap.meta.get(Tx.StatsColsKey)
      .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil) ++
      snap.meta.get(Tx.BucketKeysKey)
        .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil))
      .distinct
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)
      .toArray

  override def filter(filters: Array[Filter]): Unit = {
    val schema = snap.meta.get(Tx.SchemaKey)
      .map(DataType.fromJson(_).asInstanceOf[StructType])
    val zoneKept = filters.flatMap(TxPrune.keptFor(snap, _))
      .foldLeft(kept)(_ intersect _)
    runtimeKept = schema
      .flatMap(st => TxPrune.keyEqualityKept(snap, filters.toSeq, st))
      .map(zoneKept intersect _).getOrElse(zoneKept)
  }

  override def readSchema(): StructType = aggs match {
    case Some(cells) => StructType(cells.map {
      case TxCellCount =>
        StructField("count(*)", LongType, nullable = false)
      case TxCellBound(c, isMax, dt, _) =>
        StructField(s"${if (isMax) "max" else "min"}($c)", dt,
          nullable = true)
    })
    case None => required
  }

  /** Size of the KEPT buckets' files — what lets Catalyst broadcast a
    * small Tx dimension (or a heavily-pruned scan of a big one) instead
    * of shuffling both join sides. Commits stamp each bucket's data
    * bytes into the manifest, so for current tables this is a pure
    * manifest-map sum — NO directory listing, however often the
    * optimizer asks; only buckets written before sizes existed fall
    * back to one listing each, memoized per scan. Row count is served
    * only for a pushed COUNT(*) shape (exact from footers would cost
    * footer IO; absent beats wrong).
    */
  private lazy val keptBytes: Long =
    kept.toSeq.map { b =>
      snap.sizes.getOrElse(b, {
        val fs = snap.dirs.get(b)
          .map(rel => new java.io.File(s"$path/$rel").listFiles())
          .orNull
        if (fs == null) 0L
        else fs.filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .map(_.length()).sum
      })
    }.sum

  /** Row count over kept buckets, from the manifest's per-bucket footer
    * counts (stamped at commit) — reported only when EVERY kept bucket
    * has one (absent beats wrong: pre-rows manifests stay silent rather
    * than undercounting). Pre-pushdown-filter semantics, like
    * sizeInBytes — an estimate, and only ever an overestimate of the
    * post-filter output, which is the safe direction for join sizing.
    */
  private lazy val keptRows: Option[Long] = {
    val ks = kept.toSeq
    if (ks.forall(snap.rows.contains)) Some(ks.map(snap.rows).sum) else None
  }

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(keptBytes)
    override def numRows(): java.util.OptionalLong =
      keptRows.fold(java.util.OptionalLong.empty())(
        java.util.OptionalLong.of)
  }
  override def description(): String =
    s"TxScan($path v${snap.version}, buckets=${kept.size}/" +
      s"${snap.dirs.size}, pushed=${pushed.mkString("[", ", ", "]")}" +
      aggs.map(_.map {
        case TxCellCount => "COUNT(*)"
        case TxCellBound(c, isMax, _, _) =>
          s"${if (isMax) "MAX" else "MIN"}($c)"
      }.mkString(", pushedAggregation=[", ", ", "]")).getOrElse("") + ")"
  override def toBatch: Batch = this

  /** One InputPartition per KEPT bucket (compile-time pushdown ∩ any
    * runtime DPP filter) — `df.rdd.getNumPartitions == kept-bucket
    * count` is the in-plan observable queries assert on. Partitions
    * carry only strings (dir path + schema JSON); the executor task
    * lists and decodes its own immutable directory.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    TxScan.recordPlanned(scanTag.getOrElse(path),
      runtimeKept.size, snap.dirs.size)
    aggs match {
      case Some(cells) =>
        // one metadata-only partition per bucket: min/max values resolved
        // from the manifest at plan time ride IN the partition; only a
        // COUNT(*) cell touches storage (footer row counts, no column
        // data) — TxReadCounters stays at zero either way
        runtimeKept.toSeq.sorted.flatMap(b => snap.dirs.get(b).map { rel =>
          TxAggPartition(s"$path/$rel", cells.map {
            case TxCellCount => TxAggTaskCount
            case TxCellBound(_, _, _, pb) =>
              TxAggTaskValue(pb.get(b).flatten.getOrElse(null))
          }): InputPartition
        }).toArray
      case None =>
        // conjunctive single-column boxes of the pushed filters, in the
        // encoded stat domain: the per-task reader skips FILES whose
        // `.zones` entry provably misses them (sorted multi-file buckets)
        val fullSchema = snap.meta.get(Tx.SchemaKey)
          .map(DataType.fromJson(_).asInstanceOf[StructType])
        val ranges = Tx.fileRangesOf(fullSchema, pushed.toSeq)
        // readers REQUEST physical names (a renamed column lives in the
        // files under its birth name); positions stay the logical
        // projection's, which is all Spark consumes downstream
        val reqPhys = fullSchema.map(Tx.physSchema(required, _))
          .getOrElse(required)
        // merge-key schema under PHYSICAL names, shipped only to
        // tombstoned buckets (their readers must match keys even when
        // the projection lacks them)
        val keyPhysJson = (for {
          fs <- fullSchema
          ks <- snap.meta.get(Tx.KeysKey).map(_.split(",").toSeq)
        } yield Tx.physSchema(
          StructType(ks.map(k => fs(fs.fieldIndex(k)))), fs).json)
          .getOrElse("")
        // same superset the factory's columnar decision uses — every
        // partition of a degraded scan routes through the filter reader
        val scanTombed = kept.exists(snap.tombs.contains)
        runtimeKept.toSeq.sorted
          .flatMap(b => snap.dirs.get(b).map(b -> _))
          .map { case (b, rel) =>
            val tb = snap.tombs.getOrElse(b, Nil).map(t => s"$path/$t")
            TxBucketPartition(s"$path/$rel", reqPhys.json, ranges, b,
              tb, if (scanTombed) keyPhysJson else ""): InputPartition }
          .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // Spark requires every partition of a scan to agree on columnar vs
    // row: one tombstoned kept bucket degrades the WHOLE scan to the
    // row path (clean buckets still decode vectorized inside
    // TxTombstoneRowReader; compactDeletes restores the columnar plan)
    new TxReaderFactory(vectorized && !kept.exists(snap.tombs.contains))
}

object TxScan {

  /** Last (planned, total) bucket counts per RECORDING KEY — the
    * observable for RUNTIME pruning, which happens after the plan
    * strings are rendered (specs and queries read it after an action).
    * The key is the table path by default, but a caller who needs the
    * counts to be a property of ONE scan — not of whatever scan of the
    * same path ran last (a concurrent reader, a verification re-run) —
    * passes a unique `option("scanTag", ...)` and reads that key: only
    * scans carrying the tag ever write it.
    */
  private val planned =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Int)]()

  private[tx] def recordPlanned(key: String, kept: Int, total: Int): Unit =
    planned.put(key, (kept, total))

  def lastPlanned(key: String): Option[(Int, Int)] =
    Option(planned.get(key))
}

/** A kept bucket's data directory plus the projected schema, as plain
  * strings so the partition serializes to any executor; `ranges` are
  * the pushed filters' conjunctive boxes in the encoded stat domain,
  * for per-file `.zones` skipping inside sorted multi-file buckets.
  * `bucket` is the bucket id — the partition KEY under the scan's
  * reported KeyGroupedPartitioning (storage-partitioned joins group
  * and align partitions by this row).
  */
case class TxBucketPartition(dir: String, schemaJson: String,
    ranges: Seq[(String, String, String)] = Nil,
    bucket: Int = -1,
    tombs: Seq[String] = Nil, // deletion-vector dirs (absolute)
    keysJson: String = "") // merge-key schema (physical names); set iff tombs
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

/** The files a bucket reader opens, after `.zones` skipping: sound like
  * every other pruning layer — a file without a zones entry, a missing
  * `.zones`, or an unparseable spec is KEPT; Spark re-applies the exact
  * filters over whatever is served. Opened files land on
  * [[TxReadCounters]] so specs and probes can observe the skipping.
  */
private[tx] object TxBucketFiles {

  /** Order within a bucket directory = WRITE order: one task writes a
    * whole bucket (rows of a bucket hash identically, so they land in
    * one repartition slot) and `maxRecordsPerFile` rolls files with a
    * monotonically increasing `-cNNN` counter — sorting by that counter
    * (numerically: `c999` -> `c1000` breaks lexicographic order)
    * reconstructs the task's write order, which under the file-sort
    * layout is the SORTED order the scan's reported output ordering
    * promises. Files without a counter sort by name after the
    * countered ones cannot occur in one task's output, but name is the
    * deterministic tiebreak anyway.
    */
  // matches `-c000.snappy.parquet` and uncompressed `-c000.parquet`
  private val RolledCounter = ".*-c(\\d+)\\.(?:[^.]+\\.)?parquet$".r

  private def fileOrder(f: java.io.File): (Long, String) =
    f.getName match {
      case RolledCounter(n) => (n.toLong, f.getName)
      case _ => (-1L, f.getName)
    }

  def of(dir: String,
      ranges: Seq[(String, String, String)]): Seq[java.io.File] = {
    val fs = new java.io.File(dir).listFiles()
    if (fs == null) return Nil
    val all = fs.toSeq.filter(f => f.isFile &&
      f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .sortBy(fileOrder)
    if (ranges.isEmpty) return all
    val zonesFile = new java.io.File(dir, ".zones")
    if (!zonesFile.exists()) return all
    val specs = new String(java.nio.file.Files.readAllBytes(
      zonesFile.toPath), "UTF-8").split("\n").filter(_.nonEmpty)
      .flatMap { l =>
        l.split("\t", 2) match {
          case Array(f, spec) => Some(f -> spec)
          case _ => None
        }
      }.toMap
    all.filter(f => specs.get(f.getName)
      .forall(spec => !Tx.fileZoneMisses(spec, ranges)))
  }
}

/** Observable IO counter: parquet files actually opened by the bucket
  * readers — what lets a spec ASSERT per-file zone skipping instead of
  * assuming it.
  */
object TxReadCounters {
  private val opened = new java.util.concurrent.atomic.LongAdder()
  private[tx] def fileOpened(): Unit = opened.increment()
  def filesOpened(): Long = opened.sum()
  def reset(): Unit = opened.reset()
}

class TxReaderFactory(vectorized: Boolean = true)
    extends PartitionReaderFactory {

  /** Columnar whenever the scan reads real columns: Spark's vectorized
    * parquet reader decodes straight into ColumnVectors and the plan
    * stays inside whole-stage codegen via ColumnarToRow — the 100 TB
    * scan path. The row readers remain for pushed aggregates (one
    * partial row per bucket) and the empty projection, and behind
    * option("vectorized", false) as the always-works fallback the specs
    * hold equal.
    */
  override def supportColumnarReads(p: InputPartition): Boolean = p match {
    case part: TxBucketPartition =>
      // a bucket carrying deletion vectors must filter per row — it
      // rides the row path (vectorized DECODE inside, filtered
      // iteration out) until compactDeletes folds the sidecars in
      vectorized && part.tombs.isEmpty &&
        DataType.fromJson(part.schemaJson).asInstanceOf[StructType].nonEmpty
    case _ => false
  }

  override def createColumnarReader(
      p: InputPartition): PartitionReader[
        org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val part = p.asInstanceOf[TxBucketPartition]
    new TxBucketColumnarReader(part.dir,
      DataType.fromJson(part.schemaJson).asInstanceOf[StructType],
      part.ranges)
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case part: TxAggPartition => new TxAggReader(part.dir, part.tasks)
      case part: TxBucketPartition if part.keysJson.nonEmpty =>
        // tombstone-degraded scan: filtering row reader for every
        // bucket (dead set is empty for clean ones — vectorized decode
        // either way, nested columns included)
        new TxTombstoneRowReader(part.dir,
          DataType.fromJson(part.schemaJson).asInstanceOf[StructType],
          part.ranges, part.tombs,
          DataType.fromJson(part.keysJson).asInstanceOf[StructType])
      case part: TxBucketPartition => new TxBucketReader(part.dir,
        DataType.fromJson(part.schemaJson).asInstanceOf[StructType],
        part.ranges)
      case other => throw new IllegalStateException(
        s"graft-tx: unexpected partition ${other.getClass.getName}")
    }
}

/** Columnar decode of one bucket directory via Spark's OWN vectorized
  * parquet reader, driven under the MANIFEST schema: the requested
  * Catalyst schema rides the task conf
  * (`ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA`), so column order
  * is the scan's, types are the manifest's, and a requested column a
  * file predates comes back as the reader's own constant-null vector —
  * evolution needs no special casing. Rebase modes are CORRECTED (these
  * files are written by modern Spark).
  */
class TxBucketColumnarReader(dir: String, required: StructType,
    ranges: Seq[(String, String, String)] = Nil)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader

  private val files: Iterator[java.io.File] =
    TxBucketFiles.of(dir, ranges).iterator

  private var reader: VectorizedParquetRecordReader = _

  // INITIAL DEFAULTS: projected fields carrying Tx.DefaultMetaKey whose
  // column the CURRENT file physically lacks are substituted with a
  // constant vector of the default (Iceberg's initial-default read
  // shape). Which indices need it is a per-file fact — one extra footer
  // read per file, paid only when the projection has defaulted fields.
  private val defaultedIdx: Seq[Int] = required.fields.zipWithIndex
    .filter(_._1.metadata.contains(Tx.DefaultMetaKey)).map(_._2).toSeq
  private var absentIdx: Array[Int] = Array.empty

  private def openNext(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    if (!files.hasNext) return false
    val f = files.next()
    TxReadCounters.fileOpened()
    if (defaultedIdx.nonEmpty) {
      // copy-construct from the template (a fresh Configuration loads
      // XML resources every time — same reasoning as openNext's conf)
      val pf = org.apache.parquet.hadoop.ParquetFileReader.open(
        HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath),
          new Configuration(TxBucketColumnarReader.template)))
      val fileSchema =
        try pf.getFooter.getFileMetaData.getSchema finally pf.close()
      absentIdx = defaultedIdx
        .filterNot(i => fileSchema.containsField(required.fields(i).name))
        .toArray
    }
    // copy-construct from the class template: a fresh Configuration
    // loads XML resources every time; the copy is cheap and each reader
    // still gets its own mutable instance (tasks run concurrently)
    val conf = new Configuration(TxBucketColumnarReader.template)
    // the stable key ParquetReadSupport reads the requested Catalyst
    // schema from (public constant, but its object is sql-private)
    conf.set("org.apache.spark.sql.parquet.row.requested_schema",
      required.json)
    val r = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC",
      /* useOffHeap = */ false, /* capacity = */ 4096)
    // the base reader casts to the OLD mapred FileSplit (which extends
    // the mapreduce one) — construct that
    val split = new org.apache.hadoop.mapred.FileSplit(
      new org.apache.hadoop.fs.Path(f.getAbsolutePath), 0, f.length(),
      Array.empty[String])
    val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      conf, new org.apache.hadoop.mapreduce.TaskAttemptID())
    r.initialize(split, ctx)
    r.initBatch(new StructType(), InternalRow.empty)
    r.enableReturningBatches()
    reader = r
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (reader != null) {
        if (reader.nextKeyValue()) return true
        reader.close(); reader = null
      }
      if (!openNext()) return false
    }
    false // unreachable
  }

  override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = {
    val b = reader.getCurrentValue
      .asInstanceOf[org.apache.spark.sql.vectorized.ColumnarBatch]
    if (absentIdx.isEmpty) b
    else {
      // substitute a constant default vector for each projected column
      // this file predates; the other vectors pass through untouched
      val cols = Array.tabulate[
        org.apache.spark.sql.vectorized.ColumnVector](b.numCols()) { i =>
        if (absentIdx.contains(i))
          TxBucketColumnarReader.constVector(
            b.numRows(), required.fields(i))
        else b.column(i)
      }
      new org.apache.spark.sql.vectorized.ColumnarBatch(cols, b.numRows())
    }
  }

  override def close(): Unit =
    if (reader != null) { reader.close(); reader = null }
}

object TxBucketColumnarReader {

  /** A ConstantColumnVector holding `f`'s initial default, sized to one
    * batch — the vectorized twin of the row readers' default fill.
    */
  private[tx] def constVector(
      n: Int, f: StructField)
      : org.apache.spark.sql.vectorized.ColumnVector = {
    val cv = new org.apache.spark.sql.execution.vectorized
      .ConstantColumnVector(n, f.dataType)
    Tx.initDefaultValue(f) match {
      case None => cv.setNull()
      case Some(v) => f.dataType match {
        case ByteType => cv.setByte(v.asInstanceOf[Byte])
        case ShortType => cv.setShort(v.asInstanceOf[Short])
        case IntegerType | DateType => cv.setInt(v.asInstanceOf[Int])
        case LongType | TimestampType | TimestampNTZType =>
          cv.setLong(v.asInstanceOf[Long])
        case FloatType => cv.setFloat(v.asInstanceOf[Float])
        case DoubleType => cv.setDouble(v.asInstanceOf[Double])
        case BooleanType => cv.setBoolean(v.asInstanceOf[Boolean])
        case StringType => cv.setUtf8String(v.asInstanceOf[UTF8String])
        case other => throw new IllegalStateException(
          s"graft-tx: initial default for unsupported type $other")
      }
    }
    cv
  }

  /** The constant part of every reader's conf — built once per JVM.
    * The schema-converter keys must be PRESENT (it toBooleans them);
    * values are the stock session defaults — the requested schema set
    * per file decides the actual Catalyst types either way.
    */
  private lazy val template: Configuration = {
    val c = new Configuration()
    // what ParquetInputFormat.setReadSupportClass(job, ...) sets
    c.set("parquet.read.support.class",
      "org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport")
    c.set("spark.sql.parquet.binaryAsString", "false")
    c.set("spark.sql.parquet.int96AsTimestamp", "true")
    c.set("spark.sql.caseSensitive", "false")
    c.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    c.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    c
  }
}

/** One pushed-aggregate task per cell: COUNT(*) from footers, or a
  * manifest-resolved MIN/MAX value carried in verbatim (null = the
  * bucket is all-null for that column — contributes nothing, exactly
  * like the aggregate ignores nulls).
  */
private[tx] sealed trait TxAggTask extends Serializable
private[tx] case object TxAggTaskCount extends TxAggTask
private[tx] case class TxAggTaskValue(v: Any) extends TxAggTask

case class TxAggPartition(dir: String, tasks: Seq[TxAggTask])
    extends InputPartition

/** One partial-aggregate row per bucket: min/max cells were resolved at
  * PLAN time and just land in the row; only a COUNT(*) cell touches
  * storage — parquet footer record counts, no column data materialized
  * ([[TxReadCounters]] observes zero file opens either way).
  */
class TxAggReader(dir: String, tasks: Seq[TxAggTask])
    extends PartitionReader[InternalRow] {
  private var done = false

  private lazy val footerCount: Long = {
    val conf = new Configuration()
    TxBucketFiles.of(dir, Nil).map { f =>
      val pf = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try pf.getRecordCount finally pf.close()
    }.sum
  }

  override def next(): Boolean = if (done) false else { done = true; true }

  override def get(): InternalRow =
    new GenericInternalRow(tasks.map {
      case TxAggTaskCount => java.lang.Long.valueOf(footerCount): Any
      case TxAggTaskValue(v) => v
    }.toArray)

  override def close(): Unit = ()
}

/** MERGE-ON-READ reader for a bucket carrying deletion-vector sidecars
  * ([[Tx.commitDeleteVectors]]): decodes through the VECTORIZED reader
  * (nested columns, evolution nulls, zone-range file skipping — same
  * soundness as the columnar path) but iterates rows, dropping any row
  * whose merge-key tuple the sidecars list. The dead-key set loads once
  * per task (sidecars hold only the MATCHED deleted keys — small by
  * construction); when the projection lacks a key column the read
  * schema is widened with it and the emitted row projects back down.
  * Key equality is Spark-`<=>`-shaped (NaN==NaN, -0.0==0.0) to be
  * robust even for float keys, matching [[TxDiffReader]]'s map.
  */
class TxTombstoneRowReader(
    dir: String, required: StructType,
    ranges: Seq[(String, String, String)],
    tombDirs: Seq[String], keySchema: StructType)
    extends PartitionReader[InternalRow] {

  private val extraKeys = keySchema.fields.filterNot(kf =>
    required.fieldNames.contains(kf.name))
  private val readSchema = StructType(required.fields ++ extraKeys)
  private val keyIdx = keySchema.fields.map(kf => readSchema.fieldIndex(kf.name))
  private val keyTypes = keyIdx.map(readSchema(_).dataType)

  private def norm(v: Any): Any = v match {
    case d: Double =>
      if (d.isNaN) java.lang.Double.valueOf(Double.NaN)
      else if (d == 0.0) java.lang.Double.valueOf(0.0) else d
    case f: Float =>
      if (f.isNaN) java.lang.Float.valueOf(Float.NaN)
      else if (f == 0.0f) java.lang.Float.valueOf(0.0f) else f
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case u: org.apache.spark.unsafe.types.UTF8String => u.clone()
    case other => other
  }

  private def keyAt(r: InternalRow, idxs: Array[Int],
      dts: Array[DataType]): Seq[Any] =
    idxs.indices.map(i =>
      if (r.isNullAt(idxs(i))) null else norm(r.get(idxs(i), dts(i))))

  /** The dead keys, loaded once — sidecar files store exactly the key
    * columns (physical names), in `keySchema`'s order.
    */
  private val dead: java.util.HashSet[Seq[Any]] = {
    val set = new java.util.HashSet[Seq[Any]]()
    val tombIdx = keySchema.fields.indices.toArray
    val tombTypes = keySchema.fields.map(_.dataType)
    tombDirs.foreach { td =>
      val r = new TxBucketColumnarReader(td, keySchema)
      try {
        while (r.next()) {
          val it = r.get().rowIterator()
          while (it.hasNext) set.add(keyAt(it.next(), tombIdx, tombTypes))
        }
      } finally r.close()
    }
    set
  }

  private val inner = new TxBucketColumnarReader(dir, readSchema, ranges)
  private var rows: java.util.Iterator[InternalRow] = _
  private var current: InternalRow = _
  // one reusable row when the projection is narrower than the read
  private val projWidth = required.length
  private val needsProject = extraKeys.nonEmpty

  override def next(): Boolean = {
    while (true) {
      while (rows == null || !rows.hasNext) {
        if (!inner.next()) return false
        rows = inner.get().rowIterator()
      }
      val r = rows.next()
      if (!dead.contains(keyAt(r, keyIdx, keyTypes))) {
        current =
          if (!needsProject) r
          else {
            val vals = new Array[Any](projWidth)
            var i = 0
            while (i < projWidth) {
              vals(i) =
                if (r.isNullAt(i)) null else r.get(i, readSchema(i).dataType)
              i += 1
            }
            new GenericInternalRow(vals)
          }
        return true
      }
    }
    false // unreachable
  }

  override def get(): InternalRow = current
  override def close(): Unit = inner.close()
}

/** Decodes one bucket directory's parquet files into InternalRows under
  * the manifest schema: requested columns absent from a file (written
  * before an addColumn) serve null; an EMPTY projection (count(*)) is
  * answered from footer row counts without reading any column data.
  */
class TxBucketReader(dir: String, required: StructType,
    ranges: Seq[(String, String, String)] = Nil)
    extends PartitionReader[InternalRow] {

  private val conf = new Configuration()
  private val files: Iterator[java.io.File] =
    TxBucketFiles.of(dir, ranges).iterator

  private var reader: ParquetReader[Group] = _
  // per-file decoders, one per requested field: null-filling for fields
  // the file predates, else a (Group => Any) bound to the projected index
  private var decoders: Array[Group => Any] = _
  private var emptyRowsLeft: Long = 0L // count(*) path: rows per footer
  private var constantRow: InternalRow = _ // lazy, see next()
  private var current: InternalRow = _

  private def openNext(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    if (!files.hasNext) return false
    val f = files.next()
    TxReadCounters.fileOpened()
    val hp = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
    val pf = ParquetFileReader.open(HadoopInputFile.fromPath(hp, conf))
    val (fileSchema, rowCount) =
      try (pf.getFooter.getFileMetaData.getSchema, pf.getRecordCount)
      finally pf.close()
    if (required.isEmpty) { emptyRowsLeft = rowCount; return true }
    val present = fileSchema.getFields.asScala.map(_.getName).toSet
    val wanted = required.fields.filter(f2 => present(f2.name))
    if (wanted.isEmpty) { // every requested column postdates this file
      emptyRowsLeft = rowCount
      decoders = null
      return true
    }
    val projection = new MessageType(fileSchema.getName,
      fileSchema.getFields.asScala
        .filter(fd => wanted.exists(_.name == fd.getName)).asJava)
    val c2 = new Configuration(conf)
    c2.set(ReadSupport.PARQUET_READ_SCHEMA, projection.toString)
    reader = ParquetReader.builder(new GroupReadSupport(), hp)
      .withConf(c2).build()
    decoders = required.fields.map { fd =>
      if (!present(fd.name)) {
        // absent column: the initial default if the field declares one
        // (constant per file — the row readers' twin of constVector),
        // else null
        val dv = Tx.initDefaultValue(fd).orNull
        (_: Group) => dv
      }
      else {
        val idx = projection.getFieldIndex(fd.name)
        val raw = projection.getFields.get(idx)
        if (!raw.isPrimitive) throw new UnsupportedOperationException(
          s"graft-tx: column '${fd.name}' is nested — the row fallback " +
            "decodes flat primitives only; use the default vectorized " +
            "path (drop option(\"vectorized\", false))")
        TxDecode.decoder(fd.name, fd.dataType, raw.asPrimitiveType(), idx)
      }
    }
    emptyRowsLeft = 0L
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (emptyRowsLeft > 0) {
        emptyRowsLeft -= 1
        // one constant row reused for the whole file (the reader
        // contract only guarantees the row until the next() call, and
        // every synthesized row is identical — don't re-dispatch the
        // default per row × column over a million-row file)
        if (constantRow == null)
          constantRow =
            if (required.isEmpty) InternalRow.empty
            else new GenericInternalRow(required.fields.map(f =>
              Tx.initDefaultValue(f).orNull))
        current = constantRow
        return true
      }
      if (reader != null) {
        val g = reader.read()
        if (g != null) {
          val vals = new Array[Any](decoders.length)
          var i = 0
          while (i < decoders.length) { vals(i) = decoders(i)(g); i += 1 }
          current = new GenericInternalRow(vals)
          return true
        }
        reader.close(); reader = null
      }
      if (!openNext()) return false
    }
    false // unreachable
  }

  override def get(): InternalRow = current

  override def close(): Unit =
    if (reader != null) { reader.close(); reader = null }
}

/** Parquet-primitive → Catalyst decode, resolved ONCE per (file, field)
  * so the per-row path is a direct method call with no type dispatch.
  */
private[tx] object TxDecode {
  import PrimitiveType.PrimitiveTypeName._

  def decoder(
      name: String, dt: DataType, pt: PrimitiveType,
      idx: Int): Group => Any = {
    def nullable(f: Group => Any): Group => Any =
      g => if (g.getFieldRepetitionCount(idx) == 0) null else f(g)
    (dt, pt.getPrimitiveTypeName) match {
      case (LongType, INT64) => nullable(_.getLong(idx, 0))
      // WIDENED columns (Tx.widenColumn): files written before the
      // widening keep the narrower physical type — upcast on decode
      case (LongType, INT32) => nullable(_.getInteger(idx, 0).toLong)
      case (DoubleType, FLOAT) => nullable(_.getFloat(idx, 0).toDouble)
      case (IntegerType, INT32) => nullable(_.getInteger(idx, 0))
      case (ShortType, INT32) =>
        nullable(_.getInteger(idx, 0).toShort)
      case (ByteType, INT32) => nullable(_.getInteger(idx, 0).toByte)
      case (DoubleType, DOUBLE) => nullable(_.getDouble(idx, 0))
      case (FloatType, FLOAT) => nullable(_.getFloat(idx, 0))
      case (BooleanType, BOOLEAN) => nullable(_.getBoolean(idx, 0))
      case (StringType, BINARY) =>
        nullable(g => UTF8String.fromBytes(g.getBinary(idx, 0).getBytes))
      case (BinaryType, BINARY | FIXED_LEN_BYTE_ARRAY) =>
        nullable(_.getBinary(idx, 0).getBytes)
      case (DateType, INT32) => nullable(_.getInteger(idx, 0))
      case (TimestampType | TimestampNTZType, INT64) =>
        val toMicros: Long => Long = pt.getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MICROS => identity
              case LogicalTypeAnnotation.TimeUnit.MILLIS => _ * 1000L
              case LogicalTypeAnnotation.TimeUnit.NANOS =>
                Math.floorDiv(_, 1000L)
            }
          case _ => identity // bare INT64 under a timestamp column: micros
        }
        nullable(g => toMicros(g.getLong(idx, 0)))
      case (TimestampType, INT96) =>
        // legacy 12-byte (nanos-of-day LE, julian day LE) encoding
        nullable(g => int96Micros(g.getInt96(idx, 0)))
      case (d: DecimalType, INT32) =>
        nullable(g => Decimal(
          BigDecimal(BigInt(g.getInteger(idx, 0)), d.scale), d.precision, d.scale))
      case (d: DecimalType, INT64) =>
        nullable(g => Decimal(
          BigDecimal(BigInt(g.getLong(idx, 0)), d.scale), d.precision, d.scale))
      case (d: DecimalType, BINARY | FIXED_LEN_BYTE_ARRAY) =>
        nullable(g => Decimal(
          BigDecimal(BigInt(g.getBinary(idx, 0).getBytes), d.scale),
          d.precision, d.scale))
      case (other, prim) => throw new UnsupportedOperationException(
        s"graft-tx: column '$name' is $other stored as $prim — nested/" +
          "exotic types need the vectorized read path (honest scope: " +
          "Tx tables are flat)")
    }
  }

  private def int96Micros(b: Binary): Long = {
    val buf = b.toByteBuffer.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanosOfDay = buf.getLong
    val julianDay = buf.getInt
    (julianDay - 2440588L) * 86400000000L + Math.floorDiv(nanosOfDay, 1000L)
  }
}
