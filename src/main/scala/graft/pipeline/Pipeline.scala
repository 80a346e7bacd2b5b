package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Align, Cast, Dedup, Quality}
import graft.schema.Schemas

/** End-to-end pipeline orchestration mirroring the reference's scheduled run
  * (reference: src/pipeline/run.py:16-47 wrapped by src/serve/run_history.py:11-60).
  *
  * Stages (reference: src/transform/transform.py:14-79):
  *   landing frame → align schema → lenient parse/cast → %-repair →
  *   null handling → keep-last dedup → quality summary.
  *
  * Incremental semantics (S2/S6): resume cursor = `max(_id)` probed from the
  * sink before each run (run.py:20-21) — self-healing, no external offset
  * store. The fetch loop's keyset pagination
  * (`WHERE _id > cursor ORDER BY _id LIMIT n`, fetch_neso.py:66-71) becomes a
  * plain filter+sort+limit over the source relation.
  *
  * Scale note: the whole transform is lazy — align/cast/repair/null-handling
  * fuse into a single codegen stage over the scan; the only shuffles are the
  * two dedup windows. Quality counts are computed as one conditional-sum `agg`
  * pass, not one job per metric.
  */
object Pipeline {

  final case class TransformResult(
      clean: DataFrame,
      totalRaw: Long,
      totalClean: Long,
      issues: Seq[(String, Long)]) {
    /** Release the persisted dedup frame backing `clean`. Call once the
      * consuming action has run (sink write, output collection); `clean`
      * stays valid afterwards and simply recomputes if re-consumed. Without
      * this a long-lived session (a scheduler loop, a bench sweep) accretes
      * one orphaned cache per run until ContextCleaner happens to notice.
      */
    def release(): Unit = if (clean.storageLevel.useMemory || clean.storageLevel.useDisk)
      clean.unpersist(blocking = false)
  }

  /** S6/A1: resume cursor from the sink — `max(_id)`, 0 when empty. */
  def lastId(df: DataFrame, id: String = "_id"): Long = {
    val row = df.agg(max(col(id))).head()
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  /** S2: one keyset page — `WHERE id > cursor ORDER BY id LIMIT batch`. */
  def keysetPage(df: DataFrame, cursor: Long, batchSize: Int, id: String = "_id"): DataFrame =
    df.filter(col(id) > lit(cursor)).orderBy(col(id)).limit(batchSize)

  /** S2 generalized to a COMPOSITE cursor (orderCol, idCol) — the
    * production keyset shape when the pagination order key is not unique
    * (e.g. a timestamp): `WHERE ts > t0 OR (ts = t0 AND id > id0)
    * ORDER BY ts, id LIMIT batch`. The id tie-breaker makes the cursor a
    * total order, so pages never skip or repeat rows under equal
    * timestamps. The disjunctive predicate is sargable — both arms push
    * to the scan — and the page is a TakeOrderedAndProject, never a
    * global sort.
    */
  def keysetPageComposite(
      df: DataFrame,
      orderCursor: Column,
      idCursor: Long,
      batchSize: Int,
      orderCol: String,
      idCol: String): DataFrame =
    df.filter(col(orderCol) > orderCursor ||
        (col(orderCol) === orderCursor && col(idCol) > lit(idCursor)))
      .orderBy(col(orderCol), col(idCol))
      .limit(batchSize)

  /** The full transform: landing (all-string) frame → typed, repaired, deduped. */
  def transform(landing: DataFrame, tolerance: Double = Quality.DefaultTolerance): TransformResult = {
    val spark = landing.sparkSession
    if (landing.isEmpty) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.generation)
      return TransformResult(empty, 0L, 0L, Seq.empty)
    }
    val aligned = Align.alignSchema(landing, Schemas.landing)
    val typed = Cast.parseAndCast(aligned, "DATETIME", Schemas.measureCols ++ Schemas.percCols)
      .withColumn("_id", col("_id").cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE stats pass for raw count + null counts + per-fuel inconsistency
    // (the reference runs a separate job per metric). The stats agg
    // materializes the `typed` cache, the cardinality count materializes the
    // `deduped` cache, and the caller's output action reads `deduped` straight
    // from cache: one parse-scan + one dedup shuffle total, where the uncached
    // chain re-scanned and re-deduped per action. The caller owns the
    // `deduped` cache and drops it via TransformResult.release() once its
    // consuming action has run (runPipeline does this automatically).
    val stats = Quality.transformStats(typed, tolerance = tolerance)
    val repaired = Quality.repairPercentages(typed, tolerance = tolerance)
    val filled = Quality.handleMissing(repaired)
    val afterNulls = stats.totalRaw - stats.nullKeyRows
    val deduped = Dedup.dedupKeepLast(filled)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totalClean = deduped.count()
    typed.unpersist(blocking = false)
    val issues =
      Seq("Rows with any null" -> stats.anyNullRows,
        "Duplicates removed" -> (afterNulls - totalClean)) ++
      stats.inconsistencies.toSeq.sortBy(_._1)
        .map { case (f, n) => s"Inconsistent $f percentage" -> n }
    TransformResult(deduped, stats.totalRaw, totalClean, issues)
  }

  /** §3.1: one scheduled run — probe cursor, transform, upsert, metrics row.
    * `sinkBuckets > 0` selects the partition-pruned MERGE sink
    * ([[graft.sources.Merge.upsertPartitioned]]) — the scale-safe layout
    * where a batch rewrites only the hash-bucket partitions its keys touch;
    * 0 keeps the single-directory swap sink (small sinks, exact reference
    * layout).
    */
  def runPipeline(
      spark: SparkSession,
      landingBatch: DataFrame,
      sinkPath: String,
      metricsPath: String,
      sinkBuckets: Int = 0): TransformResult = {
    import spark.implicits._
    val startTs = new java.sql.Timestamp(System.currentTimeMillis())
    var result: TransformResult = null
    var error: Option[String] = None
    try {
      result = transform(landingBatch)
      if (sinkBuckets > 0)
        graft.sources.Merge.upsertPartitioned(
          spark, result.clean, sinkPath, Seq("_id"), numBuckets = sinkBuckets)
      else
        graft.sources.Merge.upsertToPath(spark, result.clean, sinkPath, Seq("_id"))
    } catch {
      case e: Exception => error = Some(e.getMessage)
    }
    val stopTs = new java.sql.Timestamp(System.currentTimeMillis())
    val lastFetched = if (result != null && result.totalClean > 0) lastId(result.clean) else 0L
    val metrics = Seq((
      startTs, stopTs, lastFetched,
      if (result != null) result.totalRaw else 0L,
      if (result != null) result.totalClean else 0L,
      error.isEmpty, error.orNull))
      .toDF("run_start", "run_stop", "last_fetched_id", "total_fetched",
        "valid_records", "success", "error_message")
    graft.sources.Merge.appendMetrics(metrics, metricsPath)
    // all consuming actions (sink write, lastId probe) are done — drop the
    // transform's dedup cache so scheduled runs leave no storage residue
    if (result != null) result.release()
    if (error.isDefined) throw new RuntimeException(error.get)
    result
  }
}
