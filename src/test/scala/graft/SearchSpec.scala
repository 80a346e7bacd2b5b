package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Search

/** Retrieval operators (q155–q157): the contract points the oracle can't
  * see — incremental stats equal the one-shot build on ANY split (the
  * gate proves one split; this proves the property), only matching docs
  * surface, rank fusion handles disjoint lists and ties.
  */
class SearchSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def corpus(n: Int) = (1 to n).map { i =>
    val words = (0 until 10 + i % 7).map(j => s"w${(i * 7 + j * 3) % 23}") ++
      (if (i % 3 == 0) Seq("table") else Nil) ++
      (if (i % 4 == 0) Seq("join", "join") else Nil)
    (i.toLong, words.mkString(" "))
  }.toDF("doc_id", "text")

  test("bm25: only docs containing a query term surface; scores positive") {
    val docs = corpus(24)
    val out = Search.bm25(docs, Seq("table", "join")).collect()
    val expected = (1 to 24).filter(i => i % 3 == 0 || i % 4 == 0).map(_.toLong).toSet
    assert(out.map(_.getAs[Long]("doc_id")).toSet == expected)
    assert(out.forall(_.getAs[Long]("bm25_fp") > 0L))
    // a doc matching both terms counts both
    assert(out.filter(_.getAs[Long]("doc_id") % 12 == 0)
      .forall(_.getAs[Long]("n_terms_hit") == 2L))
  }

  test("bm25Incremental equals one-shot bm25 for every split tried") {
    val docs = corpus(30)
    val whole = Search.bm25(docs, Seq("table", "join"))
      .orderBy("doc_id").collect().toSeq
    for (m <- Seq(2, 5, 7)) {
      val inc = Search.bm25Incremental(
        docs.filter(col("doc_id") % m =!= 0),
        docs.filter(col("doc_id") % m === 0),
        Seq("table", "join"))
        .orderBy("doc_id").collect().toSeq
      assert(inc == whole, s"split mod $m diverged")
    }
  }

  test("rrfFuse: disjoint lists keep both sides; shared docs sum both terms") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val b = Seq((3L, 1), (4L, 2)).toDF("doc_id", "rank")
    val out = Search.rrfFuse(a, b, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rrf")).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(3L) == 1.0 / 63 + 1.0 / 61) // in both lists
    assert(out(1L) == 1.0 / 61 && out(4L) == 1.0 / 62)
    // the doc in both lists outranks every single-list doc here
    assert(out(3L) > out(1L) && out(3L) > out(4L))
  }

  test("phraseMatches: exact adjacency only, every occurrence, 0-based pos") {
    val docs = Seq(
      (1L, "x part filter y part filter"), // matches at pos 1 and 4
      (2L, "part x filter"),               // terms present, not adjacent
      (3L, "filter part"),                 // reversed — no match
      (4L, "nothing here")).toDF("doc_id", "text")
    val m = Search.phraseMatches(docs, Seq("part", "filter")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos"))).sorted.toSeq
    assert(m == Seq((1L, 1L), (1L, 4L)))
  }

  test("phraseMatches: 3-term phrase and repeated terms in the phrase") {
    val docs = Seq(
      (1L, "a b a c"),   // matches "a b a" at 0
      (2L, "a b b a"),   // no "a b a"
      (3L, "a a b a")).toDF("doc_id", "text") // match at 1
    val m = Search.phraseMatches(docs, Seq("a", "b", "a")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos"))).sorted.toSeq
    assert(m == Seq((1L, 0L), (3L, 1L)))
  }

  test("phraseMatches: overlapping self-phrase occurrences are all reported") {
    val docs = Seq((1L, "a a a a")).toDF("doc_id", "text")
    val m = Search.phraseMatches(docs, Seq("a", "a")).collect()
      .map(_.getAs[Long]("pos")).sorted.toSeq
    assert(m == Seq(0L, 1L, 2L))
  }
}
