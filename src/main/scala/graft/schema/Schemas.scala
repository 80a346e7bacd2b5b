package graft.schema

import org.apache.spark.sql.types._

/** Canonical schemas for the engine's primary tables.
  *
  * Mirrors the reference ORM model (reference: src/db/models.py:6-45 for
  * `generation`, src/db/models.py:48-58 for `pipeline_run_history`) and the
  * all-string landing-zone variant (reference: src/transform/transform.py:34-35
  * forces `DATETIME` to string at ingest; everything else arrives as JSON
  * scalars).
  *
  * Design note (scale): schemas are declared once and enforced with
  * [[graft.operators.Align.alignSchema]] — schema-on-write parquet means no
  * runtime inference on a 100 TB scan; every reader gets column pruning and
  * predicate pushdown against a stable, typed layout.
  */
object Schemas {

  /** The 11 raw fuel MW columns (reference: conf/config.json:14-26). */
  val fuelCols: Seq[String] = Seq(
    "GAS", "COAL", "NUCLEAR", "WIND", "WIND_EMB", "HYDRO",
    "IMPORTS", "BIOMASS", "OTHER", "SOLAR", "STORAGE")

  /** Derived MW / index columns (reference: src/db/models.py:23-28). */
  val derivedCols: Seq[String] = Seq(
    "GENERATION", "CARBON_INTENSITY", "LOW_CARBON", "ZERO_CARBON",
    "RENEWABLE", "FOSSIL")

  /** All 17 double-typed measure columns. */
  val measureCols: Seq[String] = fuelCols ++ derivedCols

  /** The 16 percentage columns — every measure except CARBON_INTENSITY has a
    * `_perc` twin (reference: src/db/models.py:29-45).
    */
  val percCols: Seq[String] =
    (fuelCols ++ Seq("GENERATION", "LOW_CARBON", "ZERO_CARBON", "RENEWABLE", "FOSSIL"))
      .map(_ + "_perc")

  /** Fuels whose `_perc` column is subject to consistency repair: fuel/GENERATION*100
    * (reference: src/transform/transform.py:139-182 iterates fuel columns).
    */
  val repairableFuels: Seq[String] = fuelCols

  /** Typed `generation` table: 1 key + 1 timestamp + 33 doubles. */
  val generation: StructType = StructType(
    StructField("_id", LongType, nullable = false) +:
    StructField("DATETIME", TimestampType, nullable = false) +:
    (measureCols ++ percCols).map(c => StructField(c, DoubleType, nullable = true)))

  /** Landing-zone schema: identical names, all strings (stringly-typed bronze →
    * typed silver; reference: src/transform/transform.py:34-35).
    */
  val landing: StructType = StructType(
    generation.fields.map(f => StructField(f.name, StringType, nullable = true)))

  /** Pipeline run-metrics table (reference: src/db/models.py:48-58). */
  val runHistory: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("run_start", TimestampType, nullable = false),
    StructField("run_stop", TimestampType, nullable = true),
    StructField("last_fetched_id", LongType, nullable = true),
    StructField("total_fetched", LongType, nullable = false),
    StructField("valid_records", LongType, nullable = false),
    StructField("success", BooleanType, nullable = false),
    StructField("error_message", StringType, nullable = true)))
}
