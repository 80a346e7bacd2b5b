package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextDedup

/** Pins the k-core peeling behind q221: degree-vs-core separation (hubs
  * dominate degree but have no 2-core), cascade peeling (a chain hung off
  * a clique unravels link by link), the fixpoint assertion, and the
  * commit hook.
  */
class KCoreSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def core(k: Int, rounds: Int, edges: (Long, Long)*): Set[Long] =
    TextDedup.kCore(edges.toDF("doc_a", "doc_b"), "doc_a", "doc_b", k, rounds)
      .collect().map(_.getLong(0)).toSet

  test("a star hub has maximal degree but an empty 2-core") {
    // hub 1 with 5 leaves: every node peels in one round at k=2
    val star = (2L to 6L).map(1L -> _)
    assert(core(2, 2, star: _*) == Set.empty[Long])
  }

  test("a triangle is its own 2-core; its 3-core is empty") {
    val tri = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L)
    assert(core(2, 2, tri: _*) == Set(1L, 2L, 3L))
    assert(core(3, 2, tri: _*) == Set.empty[Long])
  }

  test("a chain hung off a clique unravels one link per round (cascade)") {
    // K4 {1,2,3,4} + path 4-5-6-7: the path peels from the tail inward,
    // one node per round — after 3 rounds only the clique remains.
    val k4 = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    val chain = Seq(4L -> 5L, 5L -> 6L, 6L -> 7L)
    val edges = k4 ++ chain
    assert(core(2, 1, edges: _*) == Set(1L, 2L, 3L, 4L, 5L, 6L)) // 7 gone
    assert(core(2, 2, edges: _*) == Set(1L, 2L, 3L, 4L, 5L))
    assert(core(2, 3, edges: _*) == Set(1L, 2L, 3L, 4L))
    // K4 is 3-regular: survives k=3 peeling at any depth
    assert(core(3, 4, edges: _*) == Set(1L, 2L, 3L, 4L))
  }

  test("assertFixpoint fails loudly when rounds are too few") {
    val k4 = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    val chain = Seq(4L -> 5L, 5L -> 6L, 6L -> 7L)
    val df = (k4 ++ chain).toDF("doc_a", "doc_b")
    val ex = intercept[Exception] {
      TextDedup.kCore(df, "doc_a", "doc_b", k = 2, rounds = 1,
        assertFixpoint = true).collect()
    }
    assert(ex.getMessage != null)
    // and at sufficient depth the same assertion passes
    val ok = TextDedup.kCore(df, "doc_a", "doc_b", k = 2, rounds = 3,
      assertFixpoint = true).collect().map(_.getLong(0)).toSet
    assert(ok == Set(1L, 2L, 3L, 4L))
  }

  test("per-round commit through parquet is result-identical") {
    val k4 = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    val chain = Seq(4L -> 5L, 5L -> 6L, 6L -> 7L)
    val df = (k4 ++ chain).toDF("doc_a", "doc_b")
    val lazyRes = TextDedup.kCore(df, "doc_a", "doc_b", k = 2, rounds = 3)
      .collect().map(_.getLong(0)).toSet
    val staged = TextDedup.kCore(df, "doc_a", "doc_b", k = 2, rounds = 3,
      commit = graft.sources.Stage.through)
      .collect().map(_.getLong(0)).toSet
    assert(staged == lazyRes)
  }
}
