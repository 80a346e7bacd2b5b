package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Doc-level quality-filter booleans — the shared signal block behind the
  * q97 attrition funnel and the q101 release manifest. Four independent
  * signals over a (doc_id, text) corpus:
  *
  *  k1 min-length, k2 repetition (dup-token fraction + top-token
  *  dominance, the Gopher/C4-style pair), k3 OOV rate against the
  *  corpus's own top-`vocabK` vocabulary, k4 corpus-LM mean bigram NLL
  *  (CCNet-style, fixed-point floors per term so int64 sums commute).
  *
  * Scale shape: two map-side-combinable count aggregations (vocab, LM
  * tables), one broadcast of the tiny vocab, bigram scoring shuffles on
  * bigram/w1 — at 100 TB the LM tables are precomputed bucketed
  * artifacts and everything else is a projection.
  */
object QualitySignals {

  def funnelFlags(
      docs: DataFrame,
      minTokens: Int = 24,
      maxDupFrac: Double = 0.65,
      maxTopFrac: Double = 0.12,
      vocabK: Int = 20,
      maxOovRate: Double = 0.40,
      maxAvgNllFp: Long = 3420000L): DataFrame = {
    val t = Text.tokens(col("text"))
    val base = docs.select(col("doc_id"), t.as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct"))
    val toks = docs.select(col("doc_id"), explode(t).as("tok"))
    val topc = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_cnt"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc).limit(vocabK)
      .select(col("tok"), lit(1).as("__in"))
    val oov = toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg((sum(when(col("__in").isNull, 1L).otherwise(0L)).cast("double") /
        count(lit(1))).as("oov_rate"))
    val bi = docs.select(col("doc_id"),
      explode(Text.wordNgramsFromText(col("text"), 2)).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val cBg = bi.groupBy("bg").agg(count(lit(1)).as("c2"))
    val cW1 = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
    val lm = bi.join(cBg, "bg").join(cW1, "w1")
      .withColumn("term_fp",
        floor(-log(col("c2").cast("double") / col("c1")) * 1e6).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("term_fp")).as("nll_fp"))
      .select(col("doc_id"),
        floor(col("nll_fp").cast("double") / col("n_bigrams")).cast("long")
          .as("avg_nll_fp"))
    base.join(topc, "doc_id").join(oov, "doc_id").join(lm, "doc_id")
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        (col("n_tokens") >= minTokens).as("k1"),
        ((col("n_tokens") - col("n_distinct")).cast("double") / col("n_tokens") <= maxDupFrac &&
          col("top_cnt").cast("double") / col("n_tokens") <= maxTopFrac).as("k2"),
        (col("oov_rate") <= maxOovRate).as("k3"),
        (col("avg_nll_fp") <= maxAvgNllFp).as("k4"))
  }

  /** Gopher-style n-gram repetition signals (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", Table A1 — the two n-gram rules
    * [[funnelFlags]]'s unigram-level k2 doesn't cover): per doc,
    *
    *  - `top2_chars`: characters covered by the MOST FREQUENT word 2-gram
    *    (count × gram chars, space included) — Gopher's "fraction of
    *    characters in the most common n-gram" family;
    *  - `dup5_chars`: characters in DUPLICATED word 5-grams
    *    (Σ count × gram chars over grams with count ≥ 2) — the
    *    "fraction of characters in duplicate n-grams" family;
    *  - `keep`: both fractions under their percent thresholds, decided by
    *    integer cross-multiplication (chars·100 ≤ text_chars·pct) — no
    *    float division anywhere, so the decision hashes bit-identically
    *    cross-engine.
    *
    * Scale shape: n-gram expansion is the native single-pass
    * [[Text.wordNgramsFromText]] expression (no token-array
    * materialization), both count aggregations are map-side combined and
    * shuffle on (doc_id, gram) — doc-local keys, no hot key — the top-1 is
    * the bounded-heap [[Analytics.topKPerGroupNative]] (doc_id×1 rows on
    * the wire), and the signals join back on doc_id. Nothing is ever
    * resident per doc beyond its own grams.
    */
  def repetitionSignals(
      docs: DataFrame,
      top2Pct: Int = 20,
      dup5Pct: Int = 50): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"),
      length(col("text")).cast("long").as("text_chars"))
    val t2 = Analytics.topKPerGroupNative(
      base.select(col("doc_id"), explode(Text.wordNgramsFromText(col("text"), 2)).as("gram"))
        .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt")),
      Seq("doc_id"), Seq(("cnt", true), ("gram", false)), 1)
      .select(col("doc_id"), (col("cnt") * length(col("gram"))).cast("long").as("top2_chars"))
    val d5 = base
      .select(col("doc_id"), explode(Text.wordNgramsFromText(col("text"), 5)).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .groupBy("doc_id")
      .agg(sum(col("cnt") * length(col("gram"))).cast("long").as("dup5_chars"))
    base.join(t2, Seq("doc_id"), "left").join(d5, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text_chars"),
        coalesce(col("top2_chars"), lit(0L)).as("top2_chars"),
        coalesce(col("dup5_chars"), lit(0L)).as("dup5_chars"))
      .withColumn("keep",
        col("top2_chars") * 100 <= col("text_chars") * top2Pct &&
          col("dup5_chars") * 100 <= col("text_chars") * dup5Pct)
  }
}
