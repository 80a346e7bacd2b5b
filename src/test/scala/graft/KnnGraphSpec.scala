package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Similarity, TextDedup}

/** Pins the mutual-kNN graph contract behind q165: reciprocity (one-sided
  * nearest-neighbor edges are dropped), bucket-bounded candidates, and the
  * cluster labels the star CC derives from the mutual edges.
  */
class KnnGraphSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  private def oneCentroid(rows: (Long, Seq[Float])*) =
    vecs(rows: _*).limit(1)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_emb"))

  test("mutual filter drops one-sided nearest-neighbor edges") {
    // 1-D line: 0.0, 1.0, 3.0 — P3's nearest is P2 but P2 prefers P1
    val v = vecs(1L -> Seq(0f), 2L -> Seq(1f), 3L -> Seq(3f))
    val edges = Similarity.knnGraphMutual(v, "vec_id", "embedding",
      oneCentroid(1L -> Seq(0f)), k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((1L, 2L)))
  }

  test("two separated cliques yield two components labeled by min id") {
    val a = Seq(1L -> Seq(0f, 0f), 2L -> Seq(0.1f, 0f), 3L -> Seq(0f, 0.1f))
    val b = Seq(7L -> Seq(10f, 10f), 8L -> Seq(10.1f, 10f), 9L -> Seq(10f, 10.1f))
    val v = vecs(a ++ b: _*)
    val edges = Similarity.knnGraphMutual(v, "vec_id", "embedding",
      oneCentroid(1L -> Seq(0f, 0f)), k = 2)
    val labels = TextDedup.connectedComponentsStar(edges, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("candidates never cross centroid buckets") {
    // two centroids far apart; the two nearest cross-bucket points can't edge
    val v = vecs(
      1L -> Seq(0f), 2L -> Seq(1f),     // bucket of centroid 0
      3L -> Seq(99f), 4L -> Seq(100f))  // bucket of centroid 100
    val cents = Seq(0L -> Seq(0f), 1L -> Seq(100f))
      .toDF("centroid_id", "centroid_emb")
    val edges = Similarity.knnGraphMutual(v, "vec_id", "embedding", cents, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((1L, 2L), (3L, 4L)))
  }

  test("edges are canonical (a < b) and unique") {
    val v = vecs(1L -> Seq(0f), 2L -> Seq(0.1f), 3L -> Seq(0.2f))
    val edges = Similarity.knnGraphMutual(v, "vec_id", "embedding",
      oneCentroid(1L -> Seq(0f)), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(edges.forall { case (x, y) => x < y })
    assert(edges.distinct == edges)
  }
}
