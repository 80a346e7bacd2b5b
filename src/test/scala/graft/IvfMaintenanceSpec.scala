package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Merge

/** The IVF append path (q132): a domain-partitioned sink merged with
  * [[Merge.upsertPartitionedBy]] — partition column is the frozen
  * quantizer's centroid assignment, not a key hash. Pins the three
  * contract points: the merged layout equals the one-shot build, appends
  * are idempotent and touch only their own partitions, and a probe's read
  * prunes to its nProbe directories after maintenance.
  */
class IvfMaintenanceSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._
  import java.nio.file.{Files, Paths}
  import scala.jdk.CollectionConverters._

  /** 40 toy vectors over 4 "centroids" (id % 4 plays the frozen
    * quantizer: deterministic per key, exactly the contract partCol
    * requires).
    */
  private def assigned(ids: Seq[Long]) =
    ids.map(i => (i, s"payload$i", i % 4)).toDF("vec_id", "payload", "centroid_id")

  private def newSink() =
    Files.createTempDirectory("graft_ivf_maint").toString + "/ivf"

  private def partDirs(path: String): Map[String, Set[(String, Long)]] =
    Files.list(Paths.get(path)).iterator().asScala
      .filter(d => d.getFileName.toString.startsWith("centroid_id="))
      .map { d =>
        d.getFileName.toString -> Files.list(d).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(f => (f.getFileName.toString, Files.getLastModifiedTime(f).toMillis))
          .toSet
      }.toMap

  test("base + append == one-shot build; append is idempotent") {
    val twoStep = newSink()
    Merge.upsertPartitionedBy(spark, assigned(1L to 30L), twoStep,
      Seq("vec_id"), "centroid_id")
    Merge.upsertPartitionedBy(spark, assigned(31L to 40L), twoStep,
      Seq("vec_id"), "centroid_id")
    val oneShot = newSink()
    Merge.upsertPartitionedBy(spark, assigned(1L to 40L), oneShot,
      Seq("vec_id"), "centroid_id")
    def contents(p: String) = spark.read.parquet(p)
      .select("vec_id", "payload", "centroid_id")
      .as[(Long, String, Long)].collect().toSet
    assert(contents(twoStep) == contents(oneShot))
    // replaying the same batch converges (per-key idempotent upsert)
    Merge.upsertPartitionedBy(spark, assigned(31L to 40L), twoStep,
      Seq("vec_id"), "centroid_id")
    assert(contents(twoStep) == contents(oneShot))
  }

  test("append rewrites ONLY the batch's centroid partitions") {
    val sink = newSink()
    Merge.upsertPartitionedBy(spark, assigned(1L to 40L), sink,
      Seq("vec_id"), "centroid_id")
    val before = partDirs(sink)
    Thread.sleep(5) // mtime resolution guard
    // batch hitting only centroid 1 (ids ≡ 1 mod 4)
    Merge.upsertPartitionedBy(spark, assigned(Seq(41L, 45L)), sink,
      Seq("vec_id"), "centroid_id")
    val after = partDirs(sink)
    assert(after.keySet == before.keySet)
    for (c <- Seq("centroid_id=0", "centroid_id=2", "centroid_id=3"))
      assert(after(c) == before(c), s"untouched partition $c was rewritten")
    assert(after("centroid_id=1") != before("centroid_id=1"))
    assert(spark.read.parquet(sink).count() === 42)
  }

  test("incoming wins on key collision within its partition") {
    val sink = newSink()
    Merge.upsertPartitionedBy(spark, assigned(1L to 8L), sink,
      Seq("vec_id"), "centroid_id")
    Merge.upsertPartitionedBy(spark,
      Seq((5L, "UPDATED", 1L)).toDF("vec_id", "payload", "centroid_id"),
      sink, Seq("vec_id"), "centroid_id")
    val out = spark.read.parquet(sink)
    assert(out.count() === 8)
    assert(out.filter(col("vec_id") === 5).select("payload")
      .as[String].head() == "UPDATED")
  }

  test("probe prunes to its nProbe partitions after an append") {
    val sink = newSink()
    Merge.upsertPartitionedBy(spark, assigned(1L to 30L), sink,
      Seq("vec_id"), "centroid_id")
    Merge.upsertPartitionedBy(spark, assigned(31L to 40L), sink,
      Seq("vec_id"), "centroid_id")
    val probed = spark.read.parquet(sink)
      .filter(col("centroid_id").isin(0L, 2L))
    val scans = probed.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    assert(scans.head.selectedPartitions.partitionCount === 2,
      "append must preserve directory-level pruning for the probe")
    assert(probed.count() === 20)
  }
}
