package graft.operators

import org.apache.spark.sql.DataFrame
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
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      // headOption: a tiny corpus can run out of mergeable pairs (every word
      // reduced to one symbol) before `rounds` — the curve then just ends.
      pairCounts(words)
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect().headOption match {
        case Some(top) =>
          words = applyMerge(words, top.getString(0), top.getString(1))
          rows += ((r.toLong, top.getString(0) + top.getString(1), total(words)))
        case None => exhausted = true
      }
      r += 1
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

  /** [[encode]] via the DISTINCT-word table — the 10⁴-merge scale path.
    * [[encode]] replays the replace chain over every corpus WORD OCCURRENCE
    * (fine for a handful of merges; at 10⁴ merges it is 10⁴ string passes
    * over 100 TB). Here the chain runs ONCE over the distinct-word
    * vocabulary — orders of magnitude smaller, the same table learning
    * already builds — producing each word's symbol count, and the corpus
    * then just equi-joins its exploded words against that table and
    * aggregates. Byte-identical output to [[encode]] by construction (same
    * chain, same words), so the two formulations share one oracle; the
    * corpus-sized work drops from merges×scan to explode + one shuffle
    * join on the word (or a broadcast, when the vocab fits).
    */
  def encodeViaVocab(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val vocab0 = docs
      .select(explode(Text.tokens(col(textCol))).as("w")).distinct()
      .withColumn("enc", array_join(
        transform(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
          x => concat(lit(D), x, lit(D))), ""))
    val vocab = merges.foldLeft(vocab0) { case (df, (a, b)) =>
      df.withColumn("enc",
        replace(col("enc"), lit(D + a + D + D + b + D), lit(D + a + b + D)))
    }.select(col("w"),
      size(split(expr("substring(enc, 2, length(enc) - 2)"), D + D)).as("__n"))
    docs.select(col(idCol), explode(Text.tokens(col(textCol))).as("w"))
      .join(vocab, "w")
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
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      // headOption: return the merges learned so far when the corpus runs
      // out of mergeable pairs before `rounds` (tiny corpora).
      pairCounts(words)
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect().headOption match {
        case Some(top) =>
          val (a, b, n) = (top.getString(0), top.getString(1), top.getLong(2))
          decisions += ((r.toLong, a, b, a + b, n))
          if (r < rounds) words = applyMerge(words, a, b)
        case None => exhausted = true
      }
      r += 1
    }
    base.unpersist(blocking = false)
    import s.implicits._
    decisions.result().toDF("round", "pair_a", "pair_b", "merged", "n")
      .orderBy("round")
  }

  /** Vocabulary PRUNING audit — the tokenizer-lifecycle step after
    * learning: merges whose output symbol is rarely USED in the final
    * encoding (earlier merges consumed by later ones, or frequencies that
    * shifted since learning) are dead vocabulary slots; pruning them
    * frees ids without moving the compression needle. Per learned merge:
    * its realized usage (weighted occurrences of its output symbol in
    * the fully-merged corpus), the keep decision (kept iff
    * 2·usage ≥ max usage — scale-free, always keeps the argmax), and the
    * corpus-total symbol counts under the full vs pruned merge lists —
    * the before/after a prune proposal is judged by.
    *
    * Cost shape: learning's distinct-word table is reused; usage of ALL
    * merges + the full total come from ONE aggregation pass (one bounded
    * 1-row collect), and the pruned re-encode is one more replace chain
    * over the vocabulary. Exact integers throughout; the oracle replays
    * the same chain with conditional replaces (q181).
    *
    * Merges form DEPENDENCY CHAINS: pruning an ancestor leaves a
    * descendant's pattern unmatchable (its input symbol never forms), so
    * a prune can INCREASE the symbol total. The audit surfaces that cost
    * in `n_symbols_pruned` rather than pretending merges are independent
    * (spec-pinned in BpeSpec).
    */
  def pruneAudit(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 8)
    val s = docs.sparkSession
    val merges = learnMerges(docs, textCol, rounds).orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val base = wordTable(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val full = merges.foldLeft(base: DataFrame) { case (w, (_, a, b)) => applyMerge(w, a, b) }
      .withColumn("syms", split(expr("substring(enc, 2, length(enc) - 2)"), D + D))
    val usageAggs = merges.toSeq.map { case (r, a, b) =>
      sum(col("wn") * size(filter(col("syms"), x => x === lit(a + b)))).as(s"u$r")
    }
    // one bounded 1-row collect: every merge's usage + the full total
    val totals = full
      .agg(sum(col("wn") * size(col("syms"))).as("full_total"), usageAggs: _*)
      .head()
    val fullTotal = totals.getAs[Long]("full_total")
    val usages = merges.map { case (r, a, b) => (r, a, b, totals.getAs[Long](s"u$r")) }
    val uMax = usages.map(_._4).max
    val decided = usages.map { case (r, a, b, u) => (r, a, b, u, 2 * u >= uMax) }
    val pruned = decided.filter(_._5)
      .foldLeft(base: DataFrame) { case (w, (_, a, b, _, _)) => applyMerge(w, a, b) }
    val prunedTotal = pruned.agg(sum(col("wn") *
        size(split(expr("substring(enc, 2, length(enc) - 2)"), D + D))))
      .head().getLong(0)
    base.unpersist(blocking = false)
    import s.implicits._
    decided.toSeq
      .map { case (r, a, b, u, k) => (r, a + b, u, k, fullTotal, prunedTotal) }
      .toDF("round", "merged", "usage", "kept", "n_symbols_full", "n_symbols_pruned")
      .orderBy("round")
  }

  /** BATCHED merge learning — the shape that takes BPE from toy rounds to a
    * production vocabulary (10⁴–10⁵ merges) without 10⁴–10⁵ driver round
    * trips: each round learns up to `batchSize` merges from ONE pass.
    *
    * Selection rule (deterministic, engine-neutral): rank the round's pair
    * counts by (n DESC, a, b), keep the top `candidateCap`, and accept a
    * candidate iff NO higher-ranked candidate shares a symbol with it (the
    * dominance filter); the first `batchSize` accepted become the round's
    * merges. Any two accepted pairs therefore have disjoint symbol sets, so
    * in the sentinel encoding their patterns can never overlap in a word —
    * one pattern's two symbol slots would have to share a slot with the
    * other's — and the round's replaces commute: applying them as one
    * chained codegen'd projection is exact simultaneous batch merging, and
    * the same chain is expressible as nested `replace` calls in the oracle
    * (q135). Checking against all higher-ranked candidates (not just
    * accepted ones) is what keeps the rule non-recursive and SQL-checkable;
    * it is slightly conservative — a pair conflicting only with an already-
    * rejected candidate waits for the next round — and rank 1 is always
    * accepted, so every round makes progress.
    *
    * Cost shape: one pair-count pass + ONE bounded `candidateCap`-row
    * collect per round — `batchSize`× fewer driver round trips than
    * [[learnMerges]] — and the replace chain on top of the cached word
    * table is truncated by an eager localCheckpoint every
    * `checkpointEvery` rounds (the previous checkpoint is released as soon
    * as the next one materializes), so plan depth, driver memory, and
    * per-round cost are all O(1) in the round number (measured flat in
    * ScaleProbe). Rounds stop early when no mergeable pair remains.
    *
    * Output: (round, j, pair_a, pair_b, merged, n) — j the merge's position
    * within its round's batch, n its count at selection time.
    */
  def learnMergesBatched(
      docs: DataFrame,
      textCol: String,
      rounds: Int,
      batchSize: Int,
      candidateCap: Int,
      checkpointEvery: Int = 8): DataFrame = {
    require(rounds >= 1 && batchSize >= 1 && candidateCap >= batchSize)
    require(checkpointEvery >= 1)
    val s = docs.sparkSession
    val base = wordTable(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var words = base
    var lastCheckpoint: Option[DataFrame] = None
    val decisions = Seq.newBuilder[(Long, Long, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val candidates = pairCounts(words)
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(candidateCap)
        .collect()
      if (candidates.isEmpty) exhausted = true
      else {
        // Dominance filter over the bounded candidate window, then first
        // `batchSize` accepted. Driver-side over ≤ candidateCap rows.
        val accepted = Seq.newBuilder[(String, String, Long)]
        var nAccepted = 0
        for (i <- candidates.indices if nAccepted < batchSize) {
          val (a, b) = (candidates(i).getString(0), candidates(i).getString(1))
          val clash = candidates.take(i).exists { h =>
            val (ha, hb) = (h.getString(0), h.getString(1))
            ha == a || ha == b || hb == a || hb == b
          }
          if (!clash) {
            accepted += ((a, b, candidates(i).getLong(2)))
            nAccepted += 1
          }
        }
        val batch = accepted.result()
        batch.zipWithIndex.foreach { case ((a, b, n), j) =>
          decisions += ((r.toLong, (j + 1).toLong, a, b, a + b, n))
        }
        if (r < rounds) {
          words = batch.foldLeft(words) { case (w, (a, b, _)) => applyMerge(w, a, b) }
          if (r % checkpointEvery == 0) {
            val cp = words.localCheckpoint(true) // eager: blocks own their data
            lastCheckpoint.foreach(_.unpersist(blocking = false))
            lastCheckpoint = Some(cp)
            words = cp
          }
        }
      }
      r += 1
    }
    lastCheckpoint.foreach(_.unpersist(blocking = false))
    base.unpersist(blocking = false)
    import s.implicits._
    decisions.result().toDF("round", "j", "pair_a", "pair_b", "merged", "n")
      .orderBy("round", "j")
  }
}
