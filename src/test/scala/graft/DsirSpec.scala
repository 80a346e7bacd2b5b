package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dsir

/** Pins the DSIR estimator contract behind q162: target-token lift, the
  * exact fixed-point arithmetic of the weight table, and feature-hashing
  * consistency between the weight and scoring passes.
  */
class DsirSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // target docs speak "tgt", raw-only docs speak "raw"
  private val corpus = Seq(
    (1L, "en", "tgt tgt tgt tgt"),
    (2L, "en", "tgt tgt tgt raw"),
    (3L, "de", "raw raw raw raw"),
    (4L, "de", "raw raw raw tgt"),
    (5L, "de", "tgt tgt tgt tgt")).toDF("doc_id", "lang", "text")

  private def weights = Dsir.importanceWeights(corpus, "text", col("lang") === "en", 256)

  test("target-typical docs outscore raw-typical docs") {
    val sc = Dsir.importanceScores(corpus, "doc_id", "text", weights, 256)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sc(1L) > sc(3L))
    assert(sc(2L) > sc(4L))
    // the score is about CONTENT, not the label: doc 5 looks like the
    // target distribution and scores as doc 1 does
    assert(sc(5L) == sc(1L))
  }

  test("weight table matches the closed-form Laplace log-ratio in fixed point") {
    // tokens: target = {tgt×7, raw×1} (docs 1,2), raw corpus = all 20
    // tgt appears 12×, raw appears 8×; T=8, R=20, B=256
    val w = weights.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.size == 2) // two distinct tokens -> two buckets (no collision for these)
    def fp(t: Long, r: Long): Long =
      math.floor(1e6 * math.log(((t + 1.0) * (20 + 256)) / ((r + 1.0) * (8 + 256)))).toLong
    assert(w.values.toSet == Set(fp(7, 12), fp(1, 8)))
  }

  test("score equals the exact int64 dot product of counts and weights") {
    val w = weights
    val sc = Dsir.importanceScores(corpus, "doc_id", "text", w, 256)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wm = w.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bucket of each token resolved through the same hash the operator uses
    val buckets = corpus.select(explode(split(col("text"), " ")).as("t"))
      .select(col("t"), Dsir.featureBucket(col("t"), 256).as("b"))
      .distinct().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sc(2L) == 3 * wm(buckets("tgt")) + 1 * wm(buckets("raw")))
  }

  test("deterministic across runs") {
    val a = Dsir.importanceScores(corpus, "doc_id", "text", weights, 256)
      .collect().map(_.toString).sorted.toSeq
    val b = Dsir.importanceScores(corpus, "doc_id", "text", weights, 256)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
