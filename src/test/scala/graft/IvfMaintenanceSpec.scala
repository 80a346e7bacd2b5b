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

  test("rebalance restores drift-degraded recall; untouched partitions untouched") {
    import graft.operators.Similarity
    // Unit vectors on a circle (angle ↔ similarity, cosine strictly
    // monotone in angular distance), padded to dim 4. Two well-separated
    // regions A (≈0°) and B (≈40°); the frozen quantizer has one centroid
    // per region. Drift then lands a batch E (14–18°) entirely in A's
    // partition: E's probes (≈21°) rank centroid B nearest and so MISS all
    // their true neighbors — the recall failure a frozen quantizer
    // develops under drift.
    def v(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat, 0f, 0f)
    }
    def fp(e: Seq[Float]): Seq[Long] = e.map(x => math.floor(x.toDouble * 1e7).toLong)
    def idist(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def cosine(a: Seq[Float], b: Seq[Float]): Double = {
      def dot(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val baseVecs = Seq(0L -> 7.0, 1L -> -9.0, 2L -> -6.0, 3L -> -2.0, 4L -> 3.0,
      10L -> 32.0, 11L -> 36.0, 12L -> 40.0, 13L -> 44.0, 14L -> 48.0)
    val driftVecs = Seq(20L -> 14.0, 21L -> 16.0, 22L -> 18.0)
    val cents = Seq((0L, v(0)), (1L, v(40))).toDF("centroid_id", "centroid_emb")
    val sink = newSink()
    def commit(vecs: Seq[(Long, Double)]): Unit = Merge.upsertPartitionedBy(spark,
      Similarity.ivfAssign(
        vecs.map { case (i, d) => (i, v(d)) }.toDF("vec_id", "embedding"),
        "vec_id", "embedding", cents),
      sink, Seq("vec_id"), "centroid_id")
    // driver-side recall@3 audit with nProbe=1 (the q136 semantics on a
    // corpus small enough to check by hand)
    def recall(quant: Seq[(Long, Seq[Long])], probes: Seq[Seq[Float]]): Double = {
      val rows = spark.read.parquet(sink)
        .select(col("vec_id"), col("embedding"),
          col("centroid_id").cast("long").as("centroid_id"))
        .as[(Long, Seq[Float], Long)].collect().toSeq
      probes.map { p =>
        val bucket = quant.minBy(c => (idist(fp(p), c._2), c._1))._1
        val found = rows.filter(_._3 == bucket)
          .sortBy(r => (-cosine(r._2, p), r._1)).take(3).map(_._1).toSet
        val truth = rows.sortBy(r => (-cosine(r._2, p), r._1)).take(3).map(_._1).toSet
        (truth intersect found).size
      }.sum.toDouble / (probes.size * 3)
    }
    val probes = Seq(v(-5), v(41), v(21))
    val frozenQuant = Seq(0L -> fp(v(0)), 1L -> fp(v(40)))

    commit(baseVecs)
    val recallPreDrift = recall(frozenQuant, probes)
    commit(driftVecs) //           drift: all of E lands in A's partition
    assert(spark.read.parquet(sink).filter(col("vec_id") >= 20)
      .select(col("centroid_id").cast("long")).as[Long].collect().toSet == Set(0L))
    val recallDrifted = recall(frozenQuant, probes)
    assert(recallDrifted < recallPreDrift,
      s"drift must degrade recall: $recallDrifted vs $recallPreDrift")

    val bUntouchedBefore = partDirs(sink)("centroid_id=1")
    Thread.sleep(5) // mtime resolution guard
    val quantFp = Similarity.ivfRebalanceHottest(spark, sink,
      Similarity.quantizerFp(cents))
      .select(col("centroid_id"), col("c_fp"))
      .as[(Long, Seq[Long])].collect().toSeq
    // only the hot partition was retired; the split wrote fresh ids 2 and 3
    val dirs = partDirs(sink).keySet
    assert(!dirs.contains("centroid_id=0"), "hot partition must be retired")
    assert(dirs.contains("centroid_id=2") && dirs.contains("centroid_id=3"))
    assert(partDirs(sink)("centroid_id=1") == bUntouchedBefore,
      "untouched partition was rewritten")
    // occupancy repaired: no partition holds the pre-split hot count
    val occ = Similarity.ivfOccupancy(spark.read.parquet(sink))
      .agg(max("n")).head().getLong(0)
    assert(occ < 8, s"max occupancy $occ not reduced by the split")
    // and the drifted probes find their neighborhood again
    val recallRebalanced = recall(quantFp, probes)
    assert(recallRebalanced >= recallPreDrift,
      s"post-rebalance recall $recallRebalanced below pre-drift $recallPreDrift")
  }

  test("ivfRebalanceUntil converges occupancy below the bound over passes") {
    import graft.operators.Similarity
    def v(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat, 0f, 0f)
    }
    // 24 vectors fanned across 0°–46°, one far cluster at 90° — everything
    // near 0° lands in centroid 0, so its partition starts at 24 and needs
    // MULTIPLE hottest-first splits to get under the bound.
    val fan = (0 until 24).map(i => (i.toLong, v(i * 2.0)))
    val far = Seq((100L, v(90)), (101L, v(92)), (102L, v(94)))
    val cents = Seq((0L, v(10)), (1L, v(91))).toDF("centroid_id", "centroid_emb")
    val sink = newSink()
    Merge.upsertPartitionedBy(spark,
      Similarity.ivfAssign((fan ++ far).toDF("vec_id", "embedding"),
        "vec_id", "embedding", cents),
      sink, Seq("vec_id"), "centroid_id")
    assert(Similarity.ivfOccupancy(spark.read.parquet(sink))
      .agg(max("n")).head().getLong(0) === 24L)
    val q = Similarity.ivfRebalanceUntil(spark, sink,
      Similarity.quantizerFp(cents), maxOccupancy = 8L)
    val occ = Similarity.ivfOccupancy(spark.read.parquet(sink))
      .select(col("centroid_id").cast("long"), col("n"))
      .as[(Long, Long)].collect().toMap
    assert(occ.values.max <= 8L, s"occupancy not converged: $occ")
    // every row survived every split (splits move rows, never drop them)
    assert(occ.values.sum === 27L)
    // the quantizer tracks the layout: one fp centroid per live partition
    val qc = q.select("centroid_id").as[Long].collect().toSet
    assert(qc === occ.keySet, s"quantizer $qc out of sync with layout ${occ.keySet}")
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
