package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * One quirk: `events.ts` has shipped as BOTH parquet TIMESTAMP(NANOS)
  * (rounds 1–5) and TIMESTAMP(MICROS) (round 6+) across driver testdata
  * regenerations, so the loader adapts to what it reads: NANOS comes in as
  * nanos-since-epoch via `spark.sql.legacy.parquet.nanosAsLong` (Spark 4
  * refuses native NANOS) and truncates to microseconds (integral
  * `div 1000`, matching DuckDB's ns→µs truncation); MICROS loads natively
  * and only needs the NTZ cast. Either way the result is TIMESTAMP_NTZ
  * like every other timestamp in the corpus.
  *
  * All timestamps stay NTZ (wall-clock) end-to-end; the session timezone is
  * pinned to UTC so LTZ-returning functions (`date_trunc`, ...) cast back to
  * NTZ losslessly.
  */
object Tables {

  val NanosAsLongConf = "spark.sql.legacy.parquet.nanosAsLong"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events` with `ts` as TIMESTAMP_NTZ (µs; truncated from ns when the
    * file is TIMESTAMP(NANOS), native when it is TIMESTAMP(MICROS)).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set(NanosAsLongConf, "true")
    val raw = load(spark, sfDir, "events")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz")
      case _ => col("ts").cast("timestamp_ntz")
    }
    raw.withColumn("ts", ts)
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
