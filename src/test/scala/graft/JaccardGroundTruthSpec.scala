package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Text
import graft.operators.TextDedup
import graft.sources.Tables

/** Pins the relationship between the UNCAPPED exact-pair ground truth and
  * the df-capped sweep configurations (q36/q90 use maxShingleDf=64,
  * q110/q127 use the production dial of 8).
  *
  * The uncapped inverted-index self-join has candidate cost Σ_shingle df² —
  * a quadratic scale-killer on boilerplate-heavy corpora — so it is
  * quarantined HERE, at sf0.001, as the ground-truth tier: the sweep never
  * runs it. These tests are what justify calling the capped q36/q90 outputs
  * "ground truth": on a corpus whose max shingle df is below the cap, the
  * cap provably changes nothing, and that premise itself is asserted.
  */
class JaccardGroundTruthSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  /** Same augmentation + shingling as DedupQueries (near-copies and exact
    * copies injected so the pair queries have work to do).
    */
  private def shingled = {
    val d = Tables.documents(spark, dir).select("doc_id", "text")
    val aug = d
      .unionByName(d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          expr("substring(text, 15)").as("text")))
      .unionByName(d.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 200000).as("doc_id"), col("text")))
    aug.withColumn("toks", Text.tokens(col("text")))
      .withColumn("shash", TextDedup.shingleHashes("toks", 3))
  }

  test("no shingle reaches df=64 on the test corpus (cap-is-noop premise)") {
    val maxDf = shingled
      .select(explode(col("shash")).as("s"))
      .groupBy("s").count()
      .agg(max("count")).head().getLong(0)
    assert(maxDf < 64, s"max shingle df $maxDf >= 64: q36/q90's loose cap " +
      "would no longer be exact ground truth on this corpus")
  }

  test("capped-64 Jaccard pairs == uncapped ground truth") {
    val sh = shingled
    val uncapped = TextDedup.jaccardPairs(sh, "doc_id", "shash", threshold = 0.5)
      .orderBy("doc_a", "doc_b").collect()
    val capped = TextDedup.jaccardPairs(sh, "doc_id", "shash",
        threshold = 0.5, maxShingleDf = 64L)
      .orderBy("doc_a", "doc_b").collect()
    assert(capped.toSeq == uncapped.toSeq)
    assert(uncapped.nonEmpty) // the augmentation guarantees true pairs exist
  }

  test("capped-64 containment pairs == uncapped ground truth") {
    val sh = shingled
    val uncapped = TextDedup.containmentPairs(sh, "doc_id", "shash", threshold = 0.9)
      .orderBy("doc_a", "doc_b").collect()
    val capped = TextDedup.containmentPairs(sh, "doc_id", "shash",
        threshold = 0.9, maxShingleDf = 64L)
      .orderBy("doc_a", "doc_b").collect()
    assert(capped.toSeq == uncapped.toSeq)
    assert(uncapped.nonEmpty)
  }

  test("assertCapIsNoop passes when the premise holds and changes nothing") {
    val sh = shingled
    val plain = TextDedup.jaccardPairs(sh, "doc_id", "shash",
        threshold = 0.5, maxShingleDf = 64L)
      .orderBy("doc_a", "doc_b").collect()
    val asserted = TextDedup.jaccardPairs(sh, "doc_id", "shash",
        threshold = 0.5, maxShingleDf = 64L, assertCapIsNoop = true)
      .orderBy("doc_a", "doc_b").collect()
    assert(asserted.toSeq == plain.toSeq)
    assert(asserted.nonEmpty)
  }

  test("assertCapIsNoop fails loudly when a shingle exceeds the cap") {
    // Ten docs sharing one boilerplate trigram: its df is 10, so a cap of 2
    // genuinely changes the output — the plan must refuse to produce one.
    import spark.implicits._
    val docs = (0 until 10)
      .map(i => (i.toLong, s"common boiler plate unique$i tail$i words$i here$i"))
      .toDF("doc_id", "text")
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("shash", TextDedup.shingleHashes("toks", 3))
    val ex = intercept[Exception] {
      TextDedup.jaccardPairs(docs, "doc_id", "shash",
        threshold = 0.1, maxShingleDf = 2L, assertCapIsNoop = true).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("declared a no-op")),
      s"expected the cap-premise assertion to fire, got: $ex")
  }

  test("production cap (8) retains every exact-copy pair") {
    // Identical docs have identical shingle sets; filtering the shingle
    // UNIVERSE keeps them identical, so their Jaccard stays exactly 1.0
    // under ANY df cap (provided a distinctive shingle survives — asserted
    // here). The dial bounds candidate volume without ever un-detecting a
    // verbatim copy, which is the invariant that makes it safe to ship.
    val sh = shingled
    val exactIds = sh.filter(col("doc_id") >= 200000)
      .select((col("doc_id") - 200000).as("doc_a"), col("doc_id").as("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prod = TextDedup.jaccardPairs(sh, "doc_id", "shash",
        threshold = 0.5, maxShingleDf = 8L)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactIds.nonEmpty)
    assert(exactIds.subsetOf(prod),
      s"production cap lost exact-copy pairs: ${exactIds -- prod}")
  }
}
