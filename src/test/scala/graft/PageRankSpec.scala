package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextDedup

/** Pins the exact-integer PageRank behind q172: regular-graph fixed point,
  * hub dominance, and the bounded floor-division mass leak.
  */
class PageRankSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def pr(edges: (Long, Long)*) =
    TextDedup.pageRankFp(edges.toDF("doc_a", "doc_b"), "doc_a", "doc_b", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a single edge is a fixed point at the initial mass") {
    // both nodes deg 1: r' = 0.15e9 + 0.85e9 = 1e9 every round, exactly
    assert(pr(1L -> 2L) == Map(1L -> 1000000000L, 2L -> 1000000000L))
  }

  test("any regular graph holds the fixed point (triangle)") {
    val m = pr(1L -> 2L, 2L -> 3L, 1L -> 3L)
    assert(m.values.toSet == Set(1000000000L))
  }

  test("the hub of a star outranks its leaves; leaves tie") {
    val m = pr(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L)
    assert((2L to 5L).map(m).toSet.size == 1)
    assert(m(1L) > m(2L))
  }

  test("floor division leaks mass monotonically but boundedly") {
    val m = pr(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L, 1L -> 3L)
    val total = m.values.sum
    val n = m.size
    assert(total <= n * 1000000000L)
    // leak per node per round is < deg + 100 units; 3 rounds, tiny graph
    assert(total > n * 1000000000L - 10000L)
  }
}
