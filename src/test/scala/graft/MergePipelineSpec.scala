package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Merge
import graft.pipeline.Pipeline

/** Upsert/MERGE semantics (reference: tests/test_db_load.py) and pipeline
  * orchestration invariants.
  */
class MergePipelineSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("upsert: incoming wins per key, others preserved") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("_id", "v")
    val incoming = Seq((2L, "B"), (3L, "c")).toDF("_id", "v")
    val out = Merge.upsert(existing, incoming, Seq("_id"))
      .orderBy("_id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("upsert is idempotent: re-applying the same batch is a fixpoint") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("_id", "v")
    val incoming = Seq((2L, "B")).toDF("_id", "v")
    val once = Merge.upsert(existing, incoming, Seq("_id"))
    val twice = Merge.upsert(once, incoming, Seq("_id"))
    assert(once.orderBy("_id").collect().toSeq == twice.orderBy("_id").collect().toSeq)
  }

  test("upsertToPath: creates, merges, idempotent re-run; empty batch no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val path = s"$dir/table"
    Merge.upsertToPath(spark, Seq((1L, "a")).toDF("_id", "v"), path, Seq("_id"))
    Merge.upsertToPath(spark, Seq((1L, "A"), (2L, "b")).toDF("_id", "v"), path, Seq("_id"))
    // re-run the same batch — row count must stay stable (test_db_load.py:85-100)
    Merge.upsertToPath(spark, Seq((1L, "A"), (2L, "b")).toDF("_id", "v"), path, Seq("_id"))
    // empty batch no-op (serve/load.py:20-22)
    Merge.upsertToPath(spark, Seq.empty[(Long, String)].toDF("_id", "v"), path, Seq("_id"))
    val out = spark.read.parquet(path).orderBy("_id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "A"), (2L, "b")))
  }

  test("lastId: max(_id) with null→0 coalesce on empty") {
    assert(Pipeline.lastId(Seq(3L, 7L, 5L).toDF("_id")) == 7L)
    assert(Pipeline.lastId(Seq.empty[Long].toDF("_id")) == 0L)
  }

  test("keysetPage: strictly-greater cursor, ordered, limited") {
    val df = (1L to 100L).toDF("_id")
    val page = Pipeline.keysetPage(df, 40L, 10).as[Long].collect().toSeq
    assert(page == (41L to 50L))
  }

  test("transform on empty landing returns empty typed frame") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], graft.schema.Schemas.landing)
    val r = Pipeline.transform(empty)
    assert(r.totalRaw == 0 && r.totalClean == 0 && r.clean.isEmpty)
  }
}
