package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Winnow

/** Pins the robust-winnowing contract the q161 oracle replays: the paper's
  * match guarantee, the window-min selection density bounds, rightmost
  * tie-break via the packed key, short-doc fingerprinting, and the df-cap's
  * common-gram elimination in the pair stage.
  */
class WinnowSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def fp(texts: (Int, String)*) =
    Winnow.fingerprints(texts.toDF("doc_id", "text"), "doc_id", "text", k = 5, w = 4)

  // distinct filler vocab so cross-doc gram collisions can't occur by accident
  private def salt(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("guarantee: a shared run of w+k-1 tokens always surfaces the pair") {
    // 8 shared tokens = w+k-1 exactly, embedded in disjoint salt
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val pairs = Winnow.overlapPairs(
      fp(1 -> s"${salt("xq", 12)} $shared ${salt("xr", 12)}",
         2 -> s"${salt("yq", 12)} $shared ${salt("yr", 12)}"),
      "doc_id", maxDf = 8)
    assert(pairs.count() == 1)
    assert(pairs.head().getLong(2) >= 1L)
  }

  test("density: selected fingerprints are between windows/w and gram count") {
    val text = salt("w", 40) // 40 distinct tokens -> 36 grams, 33 full windows
    val n = fp(1 -> text).count()
    assert(n >= 33 / 4 && n <= 36, s"density out of bounds: $n")
  }

  test("rightmost tie-break: duplicate min hash selects the later position") {
    // identical 5-gram at two positions -> same hash; packed key prefers
    // the larger pos among equal hashes inside one window
    val text = "a b c d e a b c d e"
    val f = fp(1 -> text).collect()
    // every selected (hash, pos): no two rows share a hash with BOTH
    // positions selected by the same window (distinct rows allowed when
    // selected by disjoint windows)
    assert(f.nonEmpty)
    val posByHash = f.groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(2)).sorted.toSeq)
    posByHash.values.foreach(ps => assert(ps.distinct == ps))
  }

  test("short doc (fewer grams than w) still fingerprints its min gram") {
    // 6 tokens -> 2 grams (< w=4): final partial window emits one min
    val f = fp(1 -> "p1 p2 p3 p4 p5 p6").collect()
    assert(f.length == 1)
  }

  test("doc with fewer than k tokens yields no fingerprints (and no pairs)") {
    assert(fp(1 -> "only four little tokens").count() == 0)
  }

  test("df-cap drops common grams from the pair stage") {
    // the same text in 3 docs: every hash has df=3 > maxDf=2 -> no pairs
    val common = s"${salt("c", 20)}"
    val f = fp(1 -> common, 2 -> common, 3 -> common)
    assert(Winnow.overlapPairs(f, "doc_id", maxDf = 2).count() == 0)
    assert(Winnow.overlapPairs(f, "doc_id", maxDf = 3).count() == 3)
  }

  test("longestSharedRuns: m consecutive shared 5-grams = m+4 shared tokens") {
    import graft.operators.Winnow
    // docs share a 12-token run -> 8 consecutive 5-grams -> longest = 12
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"${salt("ua", 8)} $shared ${salt("ub", 8)}"),
      (2L, s"${salt("vc", 5)} $shared ${salt("vd", 11)}")).toDF("doc_id", "text")
    val cand = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val out = Winnow.longestSharedRuns(docs, "doc_id", "text", cand, k = 5).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("longest_run_tokens") == 12L)
    assert(out.head.getAs[Long]("n_matching_grams") == 8L)
  }

  test("longestSharedRuns: two disjoint shared spans are separate runs") {
    import graft.operators.Winnow
    val s1 = (1 to 7).map(i => s"x$i").mkString(" ")  // 3 grams -> 7 tokens
    val s2 = (1 to 6).map(i => s"y$i").mkString(" ")  // 2 grams -> 6 tokens
    val docs = Seq(
      (1L, s"$s1 ${salt("pa", 6)} $s2"),
      (2L, s"$s2 ${salt("qb", 9)} $s1")).toDF("doc_id", "text")
    val cand = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val out = Winnow.longestSharedRuns(docs, "doc_id", "text", cand, k = 5).collect()
    assert(out.head.getAs[Long]("longest_run_tokens") == 7L)
    assert(out.head.getAs[Long]("n_matching_grams") == 5L) // 3 + 2
  }

  test("longestSharedRuns: pairs with no shared gram drop out") {
    import graft.operators.Winnow
    val docs = Seq((1L, salt("aa", 10)), (2L, salt("bb", 10))).toDF("doc_id", "text")
    val cand = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    assert(Winnow.longestSharedRuns(docs, "doc_id", "text", cand).count() == 0)
  }

  test("deterministic: two runs produce identical fingerprint sets") {
    val texts = Seq(1 -> salt("d", 30), 2 -> (salt("e", 10) + " " + salt("d", 15)))
    val a = fp(texts: _*).collect().map(_.toString).sorted
    val b = fp(texts: _*).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
