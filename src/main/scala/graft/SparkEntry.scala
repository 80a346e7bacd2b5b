package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's spine (SURVEY.md §7.2): scan → keep-last dedup →
    * daily-mean resample → date-range filter.
    */
  def entry(spark: SparkSession): DataFrame = {
    val ev = sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "value")
    val deduped = operators.Dedup.keepFirstBy(
      ev, Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))
    operators.Resample.resampleThenFilter(
      deduped, "ts", "1d", "2024-01-01 00:00:00", "2024-12-31 00:00:00")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queriesList.map(m => m.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    queriesList.map(m => m.oracleSql).reduce(_ ++ _)

  private def queriesList = Seq(
    QueryGroup(graft.queries.ReferenceQueries.queries, graft.queries.ReferenceQueries.oracleSql),
    QueryGroup(graft.queries.AnalyticsQueries.queries, graft.queries.AnalyticsQueries.oracleSql),
    QueryGroup(graft.queries.TextQueries.queries, graft.queries.TextQueries.oracleSql),
    QueryGroup(graft.queries.DedupQueries.queries, graft.queries.DedupQueries.oracleSql),
    QueryGroup(graft.queries.SimilarityQueries.queries, graft.queries.SimilarityQueries.oracleSql),
    QueryGroup(graft.queries.MultimodalQueries.queries, graft.queries.MultimodalQueries.oracleSql),
    QueryGroup(graft.queries.CoverageQueries.queries, graft.queries.CoverageQueries.oracleSql),
    QueryGroup(graft.queries.PipelineQueries.queries, graft.queries.PipelineQueries.oracleSql),
    QueryGroup(graft.queries.SketchQueries.queries, graft.queries.SketchQueries.oracleSql)
  )

  private case class QueryGroup(
      queries: Map[String, (SparkSession, String) => DataFrame],
      oracleSql: Map[String, String])
}
