package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Iterated byte-pair-encoding merge learning — the tokenizer-bootstrap
  * loop (Sennrich et al. 2016, arXiv:1508.07909) run as Spark plans: count
  * corpus-frequency-weighted adjacent symbol pairs, merge the most frequent
  * pair everywhere, recount, repeat. Each round's DECISION (one pair) is
  * collected driver-side — bounded at exactly one row per round by
  * construction, the same broadcast-small-by-contract device as
  * [[Similarity.kmeansFp]]'s k×dim centroid collect — so round k+1's plan
  * references round k's choice as a string literal, not a rejoined
  * subtree, and every round costs ONE pass over the distinct-word table
  * regardless of how many rounds precede it.
  *
  * Scale shape: all counting happens on the DISTINCT-word table (classic
  * BPE trick — a 100 TB corpus has a vocabulary orders of magnitude
  * smaller; the explode-groupBy that builds it is the only corpus-sized
  * pass, with map-side combine). Merges are applied as one codegen'd
  * string `replace` per round: a symbol sequence [a, b] is encoded as a
  * string where every symbol is wrapped in U+001F sentinels, so a symbol
  * boundary is always a sentinel PAIR and a search pattern can match
  * neither across nor inside symbols; replacing wrapped "a"+"b" with
  * wrapped "ab" is exactly the greedy left-to-right non-overlapping merge
  * BPE specifies. Spark's and DuckDB's `replace` share those first-to-last
  * non-overlapping semantics, which is what puts the whole loop under the
  * cross-engine oracle (q131).
  */
object Bpe {

  /** U+001F unit-separator sentinel. Whitespace-split tokens never contain
    * it in these corpora; if one did, both engines would mis-split
    * identically (the oracle builds the same encoding with chr(31)).
    */
  private val D = "\u001f"

  /** Distinct words with corpus frequencies and initial (per-character)
    * symbol sequences, sentinel-encoded: "cat" → "␟c␟␟a␟␟t␟".
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Text.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wn"))
      .withColumn("enc", array_join(
        transform(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
          x => concat(lit(D), x, lit(D))), ""))
      .select("wn", "enc")

  /** Adjacent-pair frequencies over the encoded word table (weighted by
    * word count); one map-side-combined shuffle. Words reduced to a single
    * symbol are filtered BEFORE the sequence() call — sequence(1, 0)
    * generates a DESCENDING ramp in Spark, not an empty array.
    */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .withColumn("syms", split(expr("substring(enc, 2, length(enc) - 2)"), D + D))
      .filter(size(col("syms")) >= 2)
      .select(col("wn"), explode(expr(
        """transform(sequence(1, size(syms) - 1),
             i -> named_struct('a', syms[i-1], 'b', syms[i]))""")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("wn")).as("n"))

  /** Apply one merge (a, b) → ab everywhere: one codegen'd string replace,
    * greedy left-to-right non-overlapping. The pair values ride as string
    * LITERAL COLUMNS (never spliced into SQL text).
    */
  def applyMerge(words: DataFrame, a: String, b: String): DataFrame =
    words.withColumn("enc",
      replace(col("enc"), lit(D + a + D + D + b + D), lit(D + a + b + D)))

  /** The merge-vs-compression curve — the "when to stop merging" table a
    * tokenizer-size decision reads: corpus-total symbol counts before any
    * merge (round 0) and after each successive learned merge. Each round
    * adds two bounded actions over the cached distinct-word table (the
    * argmax pair + one sum aggregate); the corpus is touched once.
    * Output: (round, merged, n_symbols) with merged = "" for round 0.
    */
  def compressionCurve(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1)
    val s = docs.sparkSession
    val base = wordTable(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def total(words: DataFrame): Long = words.agg(
      sum(col("wn") *
        size(split(expr("substring(enc, 2, length(enc) - 2)"), D + D))))
      .head().getLong(0)
    var words: DataFrame = base
    val rows = Seq.newBuilder[(Long, String, Long)]
    rows += ((0L, "", total(base)))
    for (r <- 1 to rounds) {
      val top: Row = pairCounts(words)
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).head()
      words = applyMerge(words, top.getString(0), top.getString(1))
      rows += ((r.toLong, top.getString(0) + top.getString(1), total(words)))
    }
    base.unpersist(blocking = false)
    import s.implicits._
    rows.result().toDF("round", "merged", "n_symbols").orderBy("round")
  }

  /** ENCODE with a learned merge list — the tokenizer-apply step: every
    * doc's words are split to characters and the merges are replayed IN
    * LEARNED ORDER (BPE application order is part of the tokenizer
    * contract), then symbols are counted per doc. Output:
    * (id, n_words, n_symbols) — the before/after compression a tokenizer
    * change is evaluated by (chars-per-token ratios, token-count budgets).
    *
    * Scale shape: pure codegen'd projection per row (explode words, one
    * string `replace` per merge — merges ride as literals, the frozen
    * artifact of [[learnMerges]]) followed by ONE map-side-combined
    * groupBy on the doc id. No joins, no corpus-global state.
    */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val enc0 = docs
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("w"))
      .withColumn("enc", array_join(
        transform(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
          x => concat(lit(D), x, lit(D))), ""))
    val encoded = merges.foldLeft(enc0) { case (df, (a, b)) =>
      df.withColumn("enc",
        replace(col("enc"), lit(D + a + D + D + b + D), lit(D + a + b + D)))
    }
    encoded
      .withColumn("__n", size(split(expr("substring(enc, 2, length(enc) - 2)"), D + D)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__n")).as("n_symbols"))
  }

  /** Learn `rounds` merges; one output row per round:
    * (round, pair_a, pair_b, merged, n) with n the weighted pair count
    * that made it the argmax at selection time (ties → lexicographic
    * (a, b)).
    */
  def learnMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1)
    val s = docs.sparkSession
    // The vocabulary is orders of magnitude smaller than the corpus; cache
    // it so only round 1 pays the corpus-sized explode-groupBy — later
    // rounds replay only their (cheap, codegen'd) replace chain on top of
    // the cached base. Released before returning: the result is a literal
    // frame, so nothing downstream references the cache.
    val base = wordTable(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var words = base
    val decisions = Seq.newBuilder[(Long, String, String, String, Long)]
    for (r <- 1 to rounds) {
      val top: Row = pairCounts(words)
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).head()
      val (a, b, n) = (top.getString(0), top.getString(1), top.getLong(2))
      decisions += ((r.toLong, a, b, a + b, n))
      if (r < rounds) words = applyMerge(words, a, b)
    }
    base.unpersist(blocking = false)
    import s.implicits._
    decisions.result().toDF("round", "pair_a", "pair_b", "merged", "n")
      .orderBy("round")
  }
}
