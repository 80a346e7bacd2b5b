package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Mirrors the reference unit suite case-for-case
  * (reference: tests/test_transform.py — see FIXTURES.md §3).
  */
class TransformSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // -- align schema (tests/test_transform.py:31-51) --------------------------

  test("alignSchema adds missing columns as typed nulls and drops extras") {
    val df = Seq((1L, "x", 9.9)).toDF("_id", "junk", "WIND")
    val target = StructType(Seq(
      StructField("_id", LongType), StructField("WIND", DoubleType),
      StructField("SOLAR", DoubleType)))
    val out = Align.alignSchema(df, target)
    assert(out.columns.toSeq == Seq("_id", "WIND", "SOLAR"))
    assert(out.schema("SOLAR").dataType == DoubleType)
    val r = out.head()
    assert(r.getLong(0) == 1L && r.getDouble(1) == 9.9 && r.isNullAt(2))
  }

  test("selectPresent ignores absent names (require_all=False)") {
    val df = Seq((1, 2)).toDF("a", "b")
    assert(Align.selectPresent(df, Seq("b", "zzz")).columns.toSeq == Seq("b"))
  }

  test("dropBySuffix drops _diff/_calc helper columns") {
    val df = Seq((1, 2, 3)).toDF("x", "x_diff", "x_calc")
    assert(Align.dropBySuffix(df, "_diff", "_calc").columns.toSeq == Seq("x"))
  }

  // -- lenient casts (tests/test_transform.py:55-82) -------------------------

  test("parseTimestamp nulls malformed input, parses ISO") {
    val df = Seq("2023-01-01T10:00:00", "not-a-date").toDF("DATETIME")
    val out = Cast.parseTimestamp(df, "DATETIME").collect()
    assert(out(0).getTimestamp(0).toString == "2023-01-01 10:00:00.0")
    assert(out(1).isNullAt(0))
  }

  test("castNumeric nulls non-numeric strings, widens ints") {
    val df = Seq(("1.5", 2), ("abc", 3)).toDF("v", "i")
    val out = Cast.castNumeric(df, Seq("v", "i")).collect()
    assert(out(0).getDouble(0) == 1.5 && out(0).getDouble(1) == 2.0)
    assert(out(1).isNullAt(0))
  }

  // -- percentage repair (tests/test_transform.py:93-104) --------------------

  test("repairPercentages fixes only rows beyond tolerance") {
    val df = Seq((100.0, 10.0, 10.0), (200.0, 50.0, 99.0))
      .toDF("GENERATION", "WIND", "WIND_perc")
    val out = Quality.repairPercentages(df, Seq("WIND")).select("WIND_perc")
      .as[Double].collect()
    assert(out(0) == 10.0) // consistent → untouched
    assert(out(1) == 25.0) // 50/200*100 — repaired
  }

  test("repairPercentages: IEEE zero-division semantics (Polars parity)") {
    val df = Seq(
      (0.0, 10.0, 7.0),   // calc=+inf → repaired to +inf
      (0.0, 0.0, 7.0),    // calc=NaN → NaN>tol is false in Polars → keep raw
      (100.0, 10.0, 10.0) // consistent → untouched
    ).toDF("GENERATION", "WIND", "WIND_perc")
    val out = Quality.repairPercentages(df, Seq("WIND")).select("WIND_perc")
      .as[Double].collect()
    assert(out(0).isPosInfinity)
    assert(out(1) == 7.0)
    assert(out(2) == 10.0)
  }

  // -- null handling (tests/test_transform.py:121-142) -----------------------

  test("handleMissing drops null-key rows and zero-fills float nulls") {
    val schema = StructType(Seq(
      StructField("_id", LongType), StructField("WIND", DoubleType)))
    val rows = Seq(Row(1L, 5.0), Row(null, 6.0), Row(3L, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val out = Quality.handleMissing(df, Seq("_id")).orderBy("_id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(0) == 1L && out(0).getDouble(1) == 5.0)
    assert(out(1).getLong(0) == 3L && out(1).getDouble(1) == 0.0)
  }

  // -- dedup (tests/test_transform.py:162-204) -------------------------------

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("keepLastById keeps latest DATETIME per _id") {
    val df = Seq(
      (1L, ts("2023-01-01 10:00:00")), (1L, ts("2023-01-01 11:00:00")),
      (2L, ts("2023-01-01 09:00:00"))).toDF("_id", "DATETIME")
    val out = Dedup.keepLastById(df).orderBy("_id").collect()
    assert(out.map(_.getTimestamp(1)).toSeq ==
      Seq(ts("2023-01-01 11:00:00"), ts("2023-01-01 09:00:00")))
  }

  test("keepLastByDatetime keeps highest _id per DATETIME") {
    val df = Seq(
      (1L, ts("2023-01-01 10:00:00")), (5L, ts("2023-01-01 10:00:00")),
      (2L, ts("2023-01-01 09:00:00"))).toDF("_id", "DATETIME")
    val out = Dedup.keepLastByDatetime(df).orderBy("DATETIME").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 5L))
  }

  test("composed dedup is order-sensitive: _id=[1,1,2,3,4] → survivors [1,3,4]") {
    // the reference's composed 5-row case (tests/test_transform.py:184-204)
    val df = Seq(
      (1L, ts("2023-01-01 10:00:00")),
      (1L, ts("2023-01-01 11:00:00")),
      (2L, ts("2023-01-01 12:00:00")),
      (3L, ts("2023-01-01 12:00:00")),
      (4L, ts("2023-01-01 13:00:00"))).toDF("_id", "DATETIME")
    val out = Dedup.dedupKeepLast(df).orderBy("_id").collect()
    assert(out.map(r => (r.getLong(0), r.getTimestamp(1))).toSeq == Seq(
      (1L, ts("2023-01-01 11:00:00")),
      (3L, ts("2023-01-01 12:00:00")),
      (4L, ts("2023-01-01 13:00:00"))))
  }

  // -- resample / filter ------------------------------------------------------

  test("downsample averages every numeric column into left-closed buckets") {
    val df = Seq(
      (1L, ts("2023-01-01 10:05:00"), 10.0),
      (2L, ts("2023-01-01 10:25:00"), 20.0),
      (3L, ts("2023-01-01 10:35:00"), 30.0)).toDF("_id", "DATETIME", "WIND")
    val out = Resample.downsample(df, "DATETIME", "30m").collect()
    assert(out.length == 2)
    assert(out(0).getTimestamp(0) == ts("2023-01-01 10:00:00"))
    assert(out(0).getDouble(out(0).fieldIndex("WIND")) == 15.0)
    assert(out(0).getDouble(out(0).fieldIndex("_id")) == 1.5) // _id averaged: quirk preserved
    assert(out(1).getDouble(out(1).fieldIndex("WIND")) == 30.0)
  }

  test("resampleThenFilter filters on bucket labels, not raw rows") {
    val df = Seq(
      (1L, ts("2023-01-31 23:59:00"), 1.0),
      (2L, ts("2023-02-01 00:01:00"), 2.0)).toDF("_id", "DATETIME", "WIND")
    // month buckets: Jan bucket start 01-01 is OUTSIDE [01-15, 02-15] → excluded
    val out = Resample.resampleThenFilter(df, "DATETIME", "1mo",
      "2023-01-15 00:00:00", "2023-02-15 00:00:00").collect()
    assert(out.length == 1)
    assert(out(0).getTimestamp(0) == ts("2023-02-01 00:00:00"))
  }

  test("gapFill densifies fixed-width buckets; empty buckets carry NULLs") {
    val df = Seq(
      (ts("2023-01-01 10:00:00"), 1.0),
      (ts("2023-01-01 12:00:00"), 3.0)).toDF("DATETIME", "WIND") // 11:00 missing
    val out = Resample.gapFill(
      Resample.downsample(df, "DATETIME", "1h"), "DATETIME", "1h").collect()
    assert(out.map(_.getTimestamp(0)) sameElements
      Array(ts("2023-01-01 10:00:00"), ts("2023-01-01 11:00:00"), ts("2023-01-01 12:00:00")))
    assert(out(1).isNullAt(out(1).fieldIndex("WIND")), "missing bucket surfaces as NULL")
    assert(out(0).getDouble(out(0).fieldIndex("WIND")) == 1.0)
  }

  test("gapFill handles calendar (month) steps across year boundaries") {
    val df = Seq(
      (ts("2023-11-03 00:00:00"), 1.0),
      (ts("2024-02-20 00:00:00"), 4.0)).toDF("DATETIME", "WIND") // Dec, Jan missing
    val out = Resample.gapFill(
      Resample.downsample(df, "DATETIME", "1mo"), "DATETIME", "1mo").collect()
    assert(out.map(_.getTimestamp(0)) sameElements Array(
      ts("2023-11-01 00:00:00"), ts("2023-12-01 00:00:00"),
      ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00")))
    assert(out(1).isNullAt(out(1).fieldIndex("WIND")) && out(2).isNullAt(out(2).fieldIndex("WIND")))
  }

  // -- unpivot ---------------------------------------------------------------

  test("unpivot produces rows × valueCols long format") {
    val df = Seq((ts("2023-01-01 00:00:00"), 1.0, 2.0)).toDF("DATETIME", "WIND", "SOLAR")
    val out = Reshape.unpivot(df, Seq("DATETIME"), Seq("WIND", "SOLAR")).collect()
    assert(out.length == 2)
    assert(out.map(r => (r.getString(1), r.getDouble(2))).toSet ==
      Set(("WIND", 1.0), ("SOLAR", 2.0)))
  }

  // -- quality summary (tests/test_transform.py:207-224) ---------------------

  test("qualitySummary builds the literal-rows table") {
    val out = Quality.qualitySummary(spark, 10L, 8L, Seq("bad" -> 2L))
      .orderBy("Check").as[(String, Long)].collect().toSeq
    assert(out == Seq(("Total clean records", 8L), ("Total raw records", 10L), ("bad", 2L)))
  }

  test("Tables.events adapts to both testdata ts layouts (ns-as-long and native µs)") {
    // the driver's testdata has shipped events.ts as TIMESTAMP(NANOS)
    // (read as nanos-since-epoch long) AND as TIMESTAMP(MICROS) across
    // regenerations — the loader must yield the same TIMESTAMP_NTZ µs
    // column from either. Simulate both layouts in temp dirs.
    val us = 1704067200123456L // 2024-01-01T00:00:00.123456
    def load(dir: java.nio.file.Path): java.time.LocalDateTime = {
      graft.sources.Tables.events(spark, dir.toString)
        .select(col("ts")).collect().head.getAs[java.time.LocalDateTime]("ts")
    }
    val dNano = java.nio.file.Files.createTempDirectory("ev_nanos")
    Seq((1L, us * 1000L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dNano/events.parquet")
    val dMicro = java.nio.file.Files.createTempDirectory("ev_micros")
    Seq((1L, new java.sql.Timestamp(us / 1000)))
      .toDF("event_id", "ts")
      .withColumn("ts", col("ts") + expr("INTERVAL 456 MICROSECOND"))
      .write.mode("overwrite").parquet(s"$dMicro/events.parquet")
    val (a, b) = (load(dNano), load(dMicro))
    assert(a == b, s"layouts disagree: $a vs $b")
    assert(a == java.time.LocalDateTime.parse("2024-01-01T00:00:00.123456"))
  }
}
