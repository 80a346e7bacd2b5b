package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * One quirk: `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses
  * to read natively — we read it as nanos-since-epoch via
  * `spark.sql.legacy.parquet.nanosAsLong` and truncate to microseconds
  * (integral `div 1000`, matching DuckDB's ns→µs truncation), yielding
  * TIMESTAMP_NTZ like every other timestamp in the corpus.
  *
  * All timestamps stay NTZ (wall-clock) end-to-end; the session timezone is
  * pinned to UTC so LTZ-returning functions (`date_trunc`, ...) cast back to
  * NTZ losslessly.
  */
object Tables {

  val NanosAsLongConf = "spark.sql.legacy.parquet.nanosAsLong"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events` with `ts` as TIMESTAMP_NTZ (µs, truncated from ns). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set(NanosAsLongConf, "true")
    load(spark, sfDir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
