package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's full spine (SURVEY.md §3.2) plus the extended surface
    * in one plan: keep-last dedup → hourly resample → date filter →
    * sessionized-user join → unpivot for charting.
    */
  def entry(spark: SparkSession): DataFrame = {
    val ev = sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "value")
    // reference spine: dedup → resample → filter on bucket labels
    val deduped = operators.Dedup.keepFirstBy(
      ev, Seq("ts"), Seq(col("event_id").desc))
    val hourly = operators.Resample.resampleThenFilter(
      deduped, "ts", "1h", "2024-01-01 00:00:00", "2024-12-31 00:00:00")
    // extended surface: per-user sessions joined as a broadcast dim
    val sessions = operators.Analytics
      .sessionize(ev, "user_id", "ts", "event_id", gapSeconds = 1800L)
      .groupBy("user_id").agg(max(col("session_id") + 1).as("n_sessions"))
      .agg(count(lit(1)).as("n_users"), sum(col("n_sessions")).as("n_sessions"))
    // charting shape: wide → long
    operators.Reshape.unpivot(
      hourly.crossJoin(broadcast(sessions)),
      ids = Seq("ts"), valueCols = Seq("value", "event_id", "n_sessions"),
      variableName = "measure", valueName = "val")
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
    QueryGroup(graft.queries.SketchQueries.queries, graft.queries.SketchQueries.oracleSql),
    QueryGroup(graft.queries.SourceQueries.queries, graft.queries.SourceQueries.oracleSql),
    QueryGroup(graft.queries.WindowQueries.queries, graft.queries.WindowQueries.oracleSql),
    QueryGroup(graft.queries.CurationQueries.queries, graft.queries.CurationQueries.oracleSql),
    QueryGroup(graft.queries.MaintenanceQueries.queries, graft.queries.MaintenanceQueries.oracleSql)
  )

  private case class QueryGroup(
      queries: Map[String, (SparkSession, String) => DataFrame],
      oracleSql: Map[String, String])
}
