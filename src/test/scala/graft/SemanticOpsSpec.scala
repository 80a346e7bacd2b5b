package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Similarity, TextDedup}

/** Semantic dedup (q112), bloom-prefiltered decontamination (q113) and the
  * ANN recall audit (q114): decision semantics, bit-parity with the
  * unfiltered formulations, and the plan shapes the operators exist for.
  */
class SemanticOpsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // --- semDedup -----------------------------------------------------------

  private def emb(xs: Double*) = xs.map(_.toFloat).toArray

  /** Two well-separated centroids; points cluster around the x axis. */
  private def centroids = Seq(
    (0L, emb(10.0, 0.0)), (1L, emb(0.0, 10.0))
  ).toDF("centroid_id", "centroid_emb")

  test("semDedup drops exact copies, keeps below-threshold neighbors") {
    val df = Seq(
      (10L, emb(1.0, 0.05)),  // kept: lowest id of its copy pair
      (11L, emb(2.0, 0.10)),  // exact x2 copy of 10 -> cosine 1.0, dropped
      (12L, emb(1.0, 0.0)),   // cosine vs 10 = 0.99875 < 0.999 -> kept
      (13L, emb(0.05, 1.0)),  // other cluster, kept
      (14L, emb(0.10, 2.0))   // x2 copy of 13, dropped
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(df, "vec_id", "embedding", centroids, 0.999)
      .orderBy("vec_id").collect()
    assert(out.map(r => r.getLong(0) -> r.getBoolean(2)).toSeq ===
      Seq(10L -> true, 11L -> false, 12L -> true, 13L -> true, 14L -> false))
    // cluster assignment carried through
    assert(out.map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(10L -> 0L, 11L -> 0L, 12L -> 0L, 13L -> 1L, 14L -> 1L))
  }

  test("semDedup policy: a dropped witness still drops its own neighbors") {
    // Angles 0, 2, 4 degrees: adjacent pairs are within the 0.999 (~2.56
    // degree) threshold, the far pair is not. SemDeDup's "close lower-id
    // neighbor" rule drops BOTH b and c (b's own witness a having been
    // dropped doesn't resurrect c) — transitive grouping would need CC.
    def at(deg: Double) = emb(math.cos(math.toRadians(deg)), math.sin(math.toRadians(deg)))
    val df = Seq((20L, at(0)), (21L, at(2)), (22L, at(4))).toDF("vec_id", "embedding")
    val keep = Similarity.semDedup(df, "vec_id", "embedding", centroids, 0.999)
      .filter(col("keep")).select("vec_id").as[Long].collect().toSet
    assert(keep === Set(20L))
  }

  test("semDedup covers every input id exactly once and is deterministic") {
    val df = spark.range(200).select(
      col("id").as("vec_id"),
      array((col("id") % 17).cast("float") + 1f,
        (col("id") % 5).cast("float")).as("embedding"))
    def run() = Similarity.semDedup(df, "vec_id", "embedding", centroids, 0.999)
      .select("vec_id", "keep").as[(Long, Boolean)].collect().sorted.toSeq
    val a = run()
    assert(a.map(_._1) === (0L until 200L), "exactly one decision per input id")
    assert(a === run(), "decision table must be deterministic")
    assert(a.exists(!_._2) && a.exists(_._2), "synthetic grid has both outcomes")
  }

  // --- contaminationPairsBloom -------------------------------------------

  private def docsFrame(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  test("contaminationPairsBloom is bit-identical to the broadcast hashed join") {
    val docs = docsFrame((0L until 60L).map { i =>
      // overlapping windows of a shared token stream -> real shared trigrams
      i -> (i until i + 12).map(j => s"w${j % 40}").mkString(" ")
    })
    val train = docs.filter(col("doc_id") % 7 =!= 0)
    val test0 = docs.filter(col("doc_id") % 7 === 0)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("train_id", "test_id", "n_shared")
        .as[(Long, Long, Long)].collect().sorted.toSeq
    val exact = key(TextDedup.contaminationPairs(
      train, test0, "doc_id", "text", n = 3, minShared = 2, hashGrams = true))
    val bloom = key(TextDedup.contaminationPairsBloom(
      train, test0, "doc_id", "text", n = 3, minShared = 2,
      expectedTestGrams = 10000L))
    assert(exact.nonEmpty, "fixture must actually produce contamination")
    assert(bloom === exact)
  }

  test("contaminationPairsBloom plan: map-side might_contain + shuffle join") {
    val docs = docsFrame((0L until 30L).map(i =>
      i -> (i until i + 8).map(j => s"t${j % 20}").mkString(" ")))
    val out = TextDedup.contaminationPairsBloom(
      docs.filter(col("doc_id") % 5 =!= 0), docs.filter(col("doc_id") % 5 === 0),
      "doc_id", "text", n = 3, minShared = 1, expectedTestGrams = 1000L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "train side must be pruned by the bloom BEFORE the join")
    assert(plan.contains("ShuffledHashJoin"),
      "the eval index is modeled above the broadcast threshold — shuffle join")
  }

  test("contaminationPairsBloom: disjoint vocabularies produce zero pairs") {
    val train = docsFrame((0L until 20L).map(i =>
      i -> (0 until 8).map(j => s"a${i}_$j").mkString(" ")))
    val test0 = docsFrame((100L until 105L).map(i =>
      i -> (0 until 8).map(j => s"b${i}_$j").mkString(" ")))
    val out = TextDedup.contaminationPairsBloom(
      train, test0, "doc_id", "text", n = 3, minShared = 1,
      expectedTestGrams = 1000L)
    assert(out.count() === 0)
  }

  // --- q114 ann recall audit ---------------------------------------------

  test("q115 quantized recall: int8 ranking stays close to float truth") {
    val rows = SparkEntry.queries("q115_quantized_recall")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === 10L && r.getLong(2) === 10L,
        "both rankings are full at corpus >> k")
      assert(r.getLong(3) <= 10L)
    }
    val total = rows.map(_.getLong(3)).sum
    // int8 symmetric quantization perturbs cosines ~1e-2 — most of the
    // top-10 must survive (deterministic data, deterministic bound)
    assert(total >= rows.length * 5L, s"quantized recall collapsed: $total")
  }

  test("q116 split leakage: every reported group genuinely spans splits") {
    val rows = SparkEntry.queries("q116_split_leakage")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty, "the augmented corpus must exhibit leakage")
    rows.groupBy(_._1).foreach { case (h, g) =>
      assert(g.map(_._2).distinct.length >= 2, s"group $h does not span splits")
    }
    assert(rows.map(_._2).distinct.forall(Set("train", "val", "test")))
  }

  test("q114 recall audit: hits bounded by both sides, overlap nonzero") {
    val rows = SparkEntry.queries("q114_ann_recall")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nExact, nAnn, nHits) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nExact === 10L, "corpus >> k, exact side is always full")
      assert(nAnn <= 10L && nHits <= math.min(nExact, nAnn))
    }
    assert(rows.map(_.getLong(3)).sum > 0L, "IVF nProbe=4/16 must find SOME truth")
  }

  test("jlProjectFp is linear: y(a) - y(b) == y of the fixed-point difference") {
    // the sign matrix is FIXED (md5-derived), so projection is linear in
    // the fixed-point domain — the property that makes projected DISTANCES
    // meaningful: ya − yb is exactly the projection of va − vb.
    import graft.operators.Similarity
    val d = 8
    // quarters are exact in float and scale 4 floors them to exact ints,
    // so fp(row0) − fp(row1) == fp(row2) element-wise by construction
    val df = Seq(
      (0L, (1 to d).map(i => i * 0.25f)),
      (1L, (1 to d).map(i => (d - i) * 0.25f)),
      (2L, (1 to d).map(i => (2 * i - d) * 0.25f))).toDF("vec_id", "embedding")
    val y = Similarity.jlProjectFp(df, "vec_id", "embedding", k = 4, dim = d, scale = 4.0)
      .orderBy("vec_id").collect()
      .map(_.getAs[scala.collection.Seq[Long]]("y").toSeq)
    val diff = y(0).zip(y(1)).map { case (a, b) => a - b }
    assert(diff == y(2), s"projection must be linear: ${y(0)} - ${y(1)} != ${y(2)}")
  }
}
