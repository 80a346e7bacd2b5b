package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Merge, Stage}

/** Integrity primitives: parquet staging round-trips values without
  * leaving persisted RDDs, and bucket fingerprints are layout-invariant
  * but single-row-sensitive.
  */
class IntegritySpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("Stage.through round-trips values, fresh path per call, no persisted RDDs") {
    // suites share the session and run in parallel, so assert no NEW
    // persisted RDDs rather than a globally empty map (another suite's
    // in-flight localCheckpoint would otherwise flake this test)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
    val a = Stage.through(df)
    val b = Stage.through(df)
    assert(a.orderBy("k").collect().toSeq == df.orderBy("k").collect().toSeq)
    assert(a.inputFiles.head != b.inputFiles.head, "each call must stage to a fresh path")
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty, "staging must not persist anything")
  }

  test("bucketFingerprints: invariant to partitioning and row order") {
    val rows = (1L to 500L).map(i => (i, i % 7, s"t$i"))
    val df1 = rows.toDF("id", "g", "s").repartition(1)
    val df2 = scala.util.Random.shuffle(rows).toDF("id", "g", "s").repartition(13)
    def fp(df: org.apache.spark.sql.DataFrame) =
      Merge.bucketFingerprints(df, col("id"), Seq(col("id"), col("g"), col("s")), 16)
        .orderBy("bucket").collect().toSeq
    assert(fp(df1) == fp(df2))
  }

  test("bucketFingerprints: a single changed row flips exactly its bucket") {
    val base = (1L to 500L).map(i => (i, s"t$i")).toDF("id", "s")
    val mutated = base.withColumn("s",
      when(col("id") === 123L, lit("CHANGED")).otherwise(col("s")))
    def fp(df: org.apache.spark.sql.DataFrame) =
      Merge.bucketFingerprints(df, col("id"), Seq(col("id"), col("s")), 16)
        .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("fp")).toMap
    val (a, b) = (fp(base), fp(mutated))
    val differing = a.keySet.filter(k => a(k) != b(k))
    assert(differing.size == 1)
    // NULL column canonicalizes via the sentinel instead of vanishing
    val withNull = base.withColumn("s",
      when(col("id") === 42L, lit(null).cast("string")).otherwise(col("s")))
    assert(fp(base) != fp(withNull))
  }
}
