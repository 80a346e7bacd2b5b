package graft.sources

import org.apache.spark.sql.DataFrame

/** K1: version-probe-guarded materialized cache (reference:
  * src/app/utils/data_loader.py:36-55 — the dashboard re-reads the full
  * table only when `max(_id)` changes).
  *
  * The pattern worth keeping at scale: a CHEAP scalar probe (max of the
  * monotonically-increasing key — parquet footer statistics make this a
  * metadata-only read) guards an EXPENSIVE materialization (`persist` of the
  * full table). Serving layers call [[get]] per request; the table is
  * re-persisted only when the probe value moves.
  */
final class VersionedCache(
    load: () => DataFrame,
    probe: () => Long) {

  private var version: Option[Long] = None
  private var cached: Option[DataFrame] = None
  private var loadsCount = 0L

  /** Current table: cached unless the version probe moved. */
  def get(): DataFrame = synchronized {
    val v = probe()
    if (!version.contains(v)) {
      cached.foreach(_.unpersist())
      val df = load().persist()
      cached = Some(df)
      version = Some(v)
      loadsCount += 1
    }
    cached.get
  }

  /** Number of times the cache has been (re)loaded — observability hook. */
  def loads: Long = synchronized(loadsCount)

  def invalidate(): Unit = synchronized {
    cached.foreach(_.unpersist())
    cached = None
    version = None
  }
}

object VersionedCache {
  /** Cache keyed on `max(keyCol)` of the table at `path`. The probe
    * refreshes Spark's file-listing cache first — after an atomic directory
    * swap (see [[Merge.upsertToPath]]) a stale `InMemoryFileIndex` would
    * otherwise keep reporting the old version forever.
    */
  def onMaxKey(spark: org.apache.spark.sql.SparkSession, path: String, keyCol: String): VersionedCache =
    new VersionedCache(
      () => spark.read.parquet(path),
      () => {
        spark.catalog.refreshByPath(path)
        val row = spark.read.parquet(path)
          .agg(org.apache.spark.sql.functions.max(org.apache.spark.sql.functions.col(keyCol))).head()
        if (row.isNullAt(0)) 0L else row.getLong(0)
      })
}
