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

  test("upsertPartitioned: rewrites only partitions containing incoming keys") {
    import java.nio.file.{Files, Path, Paths}
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft_upsert_part").toString
    val path = s"$dir/table"
    val existing = (1L to 200L).map(i => (i, s"v$i")).toDF("_id", "v")
    Merge.upsertPartitioned(spark, existing, path, Seq("_id"), numBuckets = 8)
    // identity of every data file per partition dir: (name, size, mtime, inode)
    def snapshot(): Map[String, Set[(String, Long, Long, String)]] =
      Files.list(Paths.get(path)).iterator().asScala
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("p_bucket="))
        .map { d =>
          d.getFileName.toString -> Files.list(d).iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .map { f =>
              val at = Files.readAttributes(f, classOf[java.nio.file.attribute.BasicFileAttributes])
              (f.getFileName.toString, at.size(), at.lastModifiedTime().toMillis,
                at.fileKey().toString)
            }.toSet
        }.toMap
    val before = snapshot()
    assert(before.size > 1, "seed data should span multiple buckets")
    // incoming batch confined to ONE bucket: pick keys that hash there
    val bucketOf = existing.select(col("_id"),
      pmod(xxhash64(col("_id")), lit(8)).cast("int").as("b"))
      .as[(Long, Int)].collect().toMap
    val targetBucket = bucketOf(1L)
    val oneBucketKeys = (1L to 200L).filter(k => bucketOf(k) == targetBucket).take(5)
    val incoming = oneBucketKeys.map(k => (k, s"UPDATED$k")).toDF("_id", "v")
    Merge.upsertPartitioned(spark, incoming, path, Seq("_id"), numBuckets = 8)
    val after = snapshot()
    // untouched partitions: identical file sets, sizes, mtimes, inodes
    for ((d, files) <- before if d != s"p_bucket=$targetBucket")
      assert(after(d) == files, s"untouched partition $d was rewritten")
    assert(after(s"p_bucket=$targetBucket") != before(s"p_bucket=$targetBucket"))
    // merged content equals the relational upsert
    val out = spark.read.parquet(path).drop("p_bucket")
      .orderBy("_id").as[(Long, String)].collect().toSeq
    val expected = Merge.upsert(existing, incoming, Seq("_id"))
      .orderBy("_id").as[(Long, String)].collect().toSeq
    assert(out == expected)
    // idempotent: re-running the same batch leaves content unchanged
    Merge.upsertPartitioned(spark, incoming, path, Seq("_id"), numBuckets = 8)
    val again = spark.read.parquet(path).drop("p_bucket")
      .orderBy("_id").as[(Long, String)].collect().toSeq
    assert(again == expected)
  }

  test("deletePartitioned: pruned rewrite, emptied-bucket cleanup, idempotent") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft_delete_part").toString
    val path = s"$dir/table"
    val existing = (1L to 200L).map(i => (i, s"v$i")).toDF("_id", "v")
    Merge.upsertPartitioned(spark, existing, path, Seq("_id"), numBuckets = 8)
    val bucketOf = existing.select(col("_id"),
      pmod(xxhash64(col("_id")), lit(8)).cast("int").as("b"))
      .as[(Long, Int)].collect().toMap
    // delete EVERY key of one bucket (the dynamic-overwrite edge: the
    // partition must disappear, not silently keep its old files) plus a
    // couple of keys from another
    val emptied = bucketOf(1L)
    val other = bucketOf.collectFirst { case (k, b) if b != emptied => b }.get
    val delKeys = bucketOf.collect { case (k, b) if b == emptied => k }.toSeq ++
      bucketOf.collect { case (k, b) if b == other => k }.take(2)
    Merge.deletePartitioned(spark, delKeys.map(Tuple1(_)).toDF("_id"),
      path, Seq("_id"), numBuckets = 8)
    assert(!Files.exists(Paths.get(path, s"p_bucket=$emptied")),
      "a fully-deleted bucket's directory must be removed")
    val out = spark.read.parquet(path).drop("p_bucket")
      .orderBy("_id").as[(Long, String)].collect().toSeq
    val expected = (1L to 200L).filterNot(delKeys.toSet)
      .map(i => (i, s"v$i")).toSeq
    assert(out == expected)
    // idempotent re-run
    Merge.deletePartitioned(spark, delKeys.map(Tuple1(_)).toDF("_id"),
      path, Seq("_id"), numBuckets = 8)
    assert(spark.read.parquet(path).count() == expected.size)
    // mismatched bucket count refused
    intercept[IllegalArgumentException] {
      Merge.deletePartitioned(spark, Seq(Tuple1(1L)).toDF("_id"),
        path, Seq("_id"), numBuckets = 16)
    }
  }

  test("upsertPartitioned refuses a merge with a mismatched bucket count") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_nbuck").toString
    val path = s"$dir/table"
    Merge.upsertPartitioned(spark, (1L to 50L).map(i => (i, s"v$i")).toDF("_id", "v"),
      path, Seq("_id"), numBuckets = 8)
    // a different N would migrate keys between partitions and silently
    // duplicate them past the pruned anti-join — must throw instead
    val ex = intercept[IllegalArgumentException] {
      Merge.upsertPartitioned(spark, Seq((1L, "X")).toDF("_id", "v"),
        path, Seq("_id"), numBuckets = 4)
    }
    assert(ex.getMessage.contains("bucketed with 8"))
    // same N still merges fine
    Merge.upsertPartitioned(spark, Seq((1L, "X")).toDF("_id", "v"),
      path, Seq("_id"), numBuckets = 8)
    assert(spark.read.parquet(path).filter(col("_id") === 1L)
      .select("v").as[String].head() == "X")
  }

  test("compactPartitioned: repacks multi-file buckets, leaves single-file buckets byte-identical") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val path = Files.createTempDirectory("graft_compact").toString + "/sink"
    // seed, then hammer key 1's bucket with several single-row upserts so
    // its partition accumulates one file per batch
    Merge.upsertPartitioned(spark, (1L to 60L).map(i => (i, s"v$i")).toDF("_id", "v"),
      path, Seq("_id"), numBuckets = 8)
    for (n <- 1 to 3)
      Merge.upsertPartitioned(spark, Seq((1L, s"u$n")).toDF("_id", "v"),
        path, Seq("_id"), numBuckets = 8)
    def filesPerBucket(): Map[String, Set[(String, Long)]] =
      Files.list(Paths.get(path)).iterator().asScala
        .filter(d => d.getFileName.toString.startsWith("p_bucket="))
        .map { d =>
          d.getFileName.toString -> Files.list(d).iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .map(f => (f.getFileName.toString, Files.getLastModifiedTime(f).toMillis))
            .toSet
        }.toMap
    val before = filesPerBucket()
    val multi = before.filter(_._2.size >= 2).keySet
    assert(multi.nonEmpty) // the hammered bucket really fragmented
    val data = spark.read.parquet(path).orderBy("_id").collect().toSeq
    val compacted = Merge.compactPartitioned(spark, path)
    val after = filesPerBucket()
    assert(compacted.map(b => s"p_bucket=$b").toSet === multi)
    assert(multi.forall(b => after(b).size === 1)) //      repacked to one file
    before.keySet.diff(multi).foreach { b => //            untouched = identical files
      assert(after(b) === before(b), s"$b was rewritten")
    }
    assert(spark.read.parquet(path).orderBy("_id").collect().toSeq === data)
    assert(Merge.compactPartitioned(spark, path) === Nil) // fixpoint
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

  test("quality counts: inconsistency, any-null, and the one-pass stats agree") {
    val df = Seq(
      (Some(1L), Some(100.0), Some(10.0), Some(10.0)), // consistent
      (Some(2L), Some(200.0), Some(50.0), Some(99.0)), // inconsistent
      (None, Some(1.0), None, Some(3.0)), // null key + null fuel
      (Some(4L), None, Some(1.0), Some(5.0))) // null GENERATION → calc null → not counted
      .toDF("_id", "GENERATION", "WIND", "WIND_perc")
    assert(graft.operators.Quality.inconsistencyCounts(df, Seq("WIND")) == Map("WIND" -> 1L))
    assert(graft.operators.Quality.anyNullCount(df) == 2L)
    val stats = graft.operators.Quality.transformStats(df, Seq("_id"), Seq("WIND"))
    assert(stats.totalRaw == 4L && stats.anyNullRows == 2L && stats.nullKeyRows == 1L)
    assert(stats.inconsistencies == Map("WIND" -> 1L))
  }

  test("runPipeline: end-to-end orchestration writes sink + success metrics row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_run").toString
    val landing = Seq(
      ("1", "2023-01-01T10:00:00", "100.0", "10.0", "10.0"),
      ("2", "2023-01-01T10:30:00", "200.0", "50.0", "99.0"), // perc repaired
      ("2", "2023-01-01T11:00:00", "210.0", "52.0", "90.0")) // dup _id: keep-last
      .toDF("_id", "DATETIME", "GENERATION", "WIND", "WIND_perc")
    val result = Pipeline.runPipeline(spark, landing, s"$dir/sink", s"$dir/metrics")
    assert(result.totalRaw == 3L && result.totalClean == 2L)
    val sink = spark.read.parquet(s"$dir/sink").orderBy("_id")
    assert(sink.count() == 2)
    val r2 = sink.filter(col("_id") === 2L).head()
    assert(r2.getDouble(r2.fieldIndex("WIND_perc")) == 52.0 / 210.0 * 100.0) // repaired
    val metrics = spark.read.parquet(s"$dir/metrics")
    assert(metrics.count() == 1)
    val m = metrics.head()
    assert(m.getBoolean(m.fieldIndex("success")))
    assert(m.getLong(m.fieldIndex("last_fetched_id")) == 2L)
    assert(m.getLong(m.fieldIndex("valid_records")) == 2L)
  }

  test("transform on empty landing returns empty typed frame") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], graft.schema.Schemas.landing)
    val r = Pipeline.transform(empty)
    assert(r.totalRaw == 0 && r.totalClean == 0 && r.clean.isEmpty)
  }
}
