package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextDedup
import graft.functions.Text

/** The load-bearing claim of q176: prefix filtering is LOSSLESS — the
  * candidate pruning provably never drops a pair with Jaccard ≥ t, so the
  * prefix join's output equals brute-force all-pairs Jaccard exactly.
  */
class PrefixJoinSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // ~80 docs with controlled overlap: shared sentence stems + per-doc tails
  // of varying length, plus exact and near copies.
  private lazy val corpus = {
    val base = (0 until 60).map { i =>
      val stem = s"the quick brown fox ${i % 5} jumps over the lazy dog again and again"
      val tail = (0 until (i % 7)).map(j => s"tail$i-$j word$j").mkString(" ")
      (i.toLong, s"$stem $tail")
    }
    val copies = (0 until 60 by 6).map(i => (1000L + i, base(i)._2))
    val near = (0 until 60 by 9).map(i => (2000L + i, base(i)._2 + " extra trailing token"))
    (base ++ copies ++ near).toDF("doc_id", "text")
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("shash", TextDedup.shingleHashes("toks", 3))
  }

  private def bruteForce(tNum: Int, tDen: Int) = {
    val d = corpus.select(col("doc_id"), col("shash")).filter(size(col("shash")) > 0)
    d.as("a").join(d.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        size(array_intersect(col("a.shash"), col("b.shash"))).cast("long").as("common"),
        size(col("a.shash")).as("na"), size(col("b.shash")).as("nb"))
      .filter(lit(tDen) * col("common") >= lit(tNum) * (col("na") + col("nb") - col("common")))
  }

  test("prefix join equals brute-force all-pairs Jaccard at t=0.7") {
    val fast = TextDedup.prefixFilterJaccardPairs(corpus, "doc_id", "shash", 7, 10)
    val truth = bruteForce(7, 10)
    assert(truth.count() > 10, "fixture must produce a non-trivial truth set")
    assert(fast.exceptAll(truth).count() == 0 && truth.exceptAll(fast).count() == 0)
  }

  test("prefix join equals brute force at a looser t=0.5 too") {
    val fast = TextDedup.prefixFilterJaccardPairs(corpus, "doc_id", "shash", 1, 2)
    val truth = bruteForce(1, 2)
    assert(fast.exceptAll(truth).count() == 0 && truth.exceptAll(fast).count() == 0)
  }

  test("plan reuses the prefix-postings exchange across both self-join sides") {
    val df = TextDedup.prefixFilterJaccardPairs(corpus, "doc_id", "shash", 7, 10)
    df.collect() // finalize THIS QueryExecution's AQE stages (count() spawns its own)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"expected the repartition(h) barrier to be reused, plan:\n${plan.take(2000)}")
  }

  test("the filter actually prunes: candidate prefixes are shorter than full sets") {
    // every matching pair shares a prefix token, but the prefix postings are
    // a strict subset of the full postings — measure via the any-token join
    val d = corpus.select(col("doc_id"), col("shash")).filter(size(col("shash")) > 0)
    val anyShared = d.as("a").join(d.as("b"), col("a.doc_id") < col("b.doc_id"))
      .filter(size(array_intersect(col("a.shash"), col("b.shash"))) > 0)
      .count()
    val matched = TextDedup.prefixFilterJaccardPairs(corpus, "doc_id", "shash", 7, 10).count()
    assert(matched < anyShared, "t=0.7 result must be smaller than share-any-token pairs")
  }
}
