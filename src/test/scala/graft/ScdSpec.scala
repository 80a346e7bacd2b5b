package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scd

/** Pins the SCD2 construction the q163 oracle replays: interval partition
  * of each key's timeline, consecutive-equal collapse (null-safe), version
  * numbering, tie-break at equal timestamps, and the single open current
  * segment per key.
  */
class ScdSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def changelog(rows: (Int, String, Int, String)*) =
    rows.toDF("k", "t", "tie", "st")
      .withColumn("t", col("t").cast("timestamp_ntz"))

  private def run(rows: (Int, String, Int, String)*) =
    Scd.scd2(changelog(rows: _*), "k", "t", "tie", "st")

  test("consecutive equal states collapse into one segment") {
    val out = run(
      (1, "2024-01-01 00:00:00", 1, "A"),
      (1, "2024-01-02 00:00:00", 2, "A"),
      (1, "2024-01-03 00:00:00", 3, "B"),
      (1, "2024-01-04 00:00:00", 4, "A")).orderBy("version").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("A", "B", "A"))
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
  }

  test("segments tile the timeline: valid_to equals the next valid_from") {
    val out = run(
      (1, "2024-01-01 00:00:00", 1, "A"),
      (1, "2024-01-03 00:00:00", 2, "B"),
      (1, "2024-01-07 00:00:00", 3, "C")).orderBy("version").collect()
    val froms = out.map(_.getAs[java.time.LocalDateTime]("valid_from"))
    val tos = out.map(_.getAs[java.time.LocalDateTime]("valid_to"))
    assert(tos.init.toSeq == froms.tail.toSeq)
    assert(tos.last == null)
  }

  test("exactly one open (is_current) segment per key, holding the latest state") {
    val out = run(
      (1, "2024-01-01 00:00:00", 1, "A"), (1, "2024-01-02 00:00:00", 2, "B"),
      (2, "2024-01-01 00:00:00", 3, "X"))
    val current = out.filter(col("is_current")).collect()
    assert(current.length == 2)
    assert(current.map(r => (r.getInt(0), r.getString(2))).toSet == Set(1 -> "B", 2 -> "X"))
  }

  test("equal timestamps order by the tie-break column") {
    val out = run(
      (1, "2024-01-01 00:00:00", 2, "B"),
      (1, "2024-01-01 00:00:00", 1, "A")).orderBy("version").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("A", "B"))
  }

  test("null state is a real state, distinct from its neighbors") {
    val out = run(
      (1, "2024-01-01 00:00:00", 1, "A"),
      (1, "2024-01-02 00:00:00", 2, null),
      (1, "2024-01-03 00:00:00", 3, null),
      (1, "2024-01-04 00:00:00", 4, "A")).orderBy("version").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("A", null, "A"))
  }

  test("pitJoin picks the interval covering each fact ts, NULL before history") {
    import org.apache.spark.sql.functions._
    val hist = run(
      (1, "2024-01-10 00:00:00", 1, "A"),
      (1, "2024-01-20 00:00:00", 2, "B"))
    val fact = Seq(
      (100L, 1, "2024-01-05 00:00:00"), // before first version -> NULL
      (101L, 1, "2024-01-10 00:00:00"), // valid_from inclusive -> A
      (102L, 1, "2024-01-15 00:00:00"), // inside [A, B) -> A
      (103L, 1, "2024-01-20 00:00:00"), // boundary: valid_to exclusive -> B
      (104L, 1, "2024-12-01 00:00:00")) // open segment -> B
      .toDF("fid", "k", "ts0")
      .withColumn("ts", col("ts0").cast("timestamp_ntz")).drop("ts0")
    val out = Scd.pitJoin(fact, "k", "ts", hist, "k")
      .orderBy("fid").select("fid", "state").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(out.toSeq == Seq(
      100L -> null, 101L -> "A", 102L -> "A", 103L -> "B", 104L -> "B"))
    assert(Scd.pitJoin(fact, "k", "ts", hist, "k").count() == fact.count())
  }

  test("prefix-stable: appending newer changelog rows never rewrites old segments") {
    val base = Seq(
      (1, "2024-01-01 00:00:00", 1, "A"), (1, "2024-01-02 00:00:00", 2, "B"))
    val grown = base :+ ((1, "2024-01-03 00:00:00", 3, "C"))
    val before = run(base: _*).filter(!col("is_current"))
      .collect().map(_.toString).toSet
    val after = run(grown: _*).collect().map(_.toString).toSet
    assert(before.subsetOf(after))
  }
}
