package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline
import graft.schema.Schemas
import graft.sources.Tables

/** End-to-end reference-parity: the COMPLETE transform chain
  * (align → lenient parse/cast → %-repair → null handling → composed
  * keep-last dedup; reference src/transform/transform.py:14-79) run over a
  * stringly landing zone synthesized from `events`, verified column-for-
  * column across the full 34-column generation schema.
  *
  * Landing mapping: _id ← event_id, DATETIME ← ISO-formatted ts (seconds
  * precision, like the NESO feed), WIND ← value, GENERATION ← value + k,
  * WIND_perc ← k (props-extracted), all other columns absent → typed nulls
  * via alignment → 0.0 after the fill stage.
  *
  * The oracle skips the double→string→double round-trip (it is lossless in
  * both engines) and mirrors the rest step-for-step.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  private def kOf(c: org.apache.spark.sql.Column) =
    regexp_extract(c, "\"k\": (\\d+)", 1).cast("double")

  val queries: Map[String, Q] = Map(
    "q48_pipeline_end_to_end" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val landing = ev.select(
        col("event_id").cast("string").as("_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("DATETIME"),
        col("value").cast("string").as("WIND"),
        (col("value") + kOf(col("props"))).cast("string").as("GENERATION"),
        kOf(col("props")).cast("string").as("WIND_perc"))
      Pipeline.transform(landing).clean
        .withColumn("DATETIME", col("DATETIME").cast("timestamp_ntz"))
        .orderBy("_id")
    })
  )

  val oracleSql: Map[String, String] = {
    // full 34-column mirror, generated from the canonical schema
    val calc =
      """CASE WHEN g = 0 THEN (CASE WHEN w > 0 THEN 'infinity'::DOUBLE
                                    WHEN w < 0 THEN '-infinity'::DOUBLE
                                    WHEN w = 0 THEN 'nan'::DOUBLE END)
              ELSE w / g * 100 END"""
    val repairedWindPerc =
      s"""CASE WHEN isnan($calc) THEN k
               WHEN abs(($calc) - k) > 1.0 THEN ($calc)
               ELSE k END"""
    val cols: Seq[String] = Schemas.generation.fields.toSeq.map(_.name).map {
      case "_id" => "_id"
      case "DATETIME" => "DATETIME"
      case "WIND" => "COALESCE(w, 0.0) AS \"WIND\""
      case "GENERATION" => "COALESCE(g, 0.0) AS \"GENERATION\""
      case "WIND_perc" => s"""COALESCE($repairedWindPerc, 0.0) AS "WIND_perc""""
      // bare 0.0 would type as DECIMAL(2,1) in DuckDB — the Spark side is
      // double, and the typed hash treats decimal as a different class
      case other => s"""0.0::DOUBLE AS "$other""""
    }
    Map(
      "q48_pipeline_end_to_end" ->
        s"""WITH landing AS (
              SELECT event_id AS _id,
                date_trunc('second', ts) AS DATETIME,
                value AS w,
                value + TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS DOUBLE) AS g,
                TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS DOUBLE) AS k
              FROM events),
            deduped AS (
              SELECT * FROM landing
              QUALIFY row_number() OVER (PARTITION BY DATETIME ORDER BY _id DESC) = 1)
            SELECT ${cols.mkString(", ")} FROM deduped ORDER BY _id"""
          .replaceAll("\\s+", " ")
    )
  }
}
