package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Robust winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every word k-gram, slide a
  * window of `w` consecutive hashes over the sequence, and select each
  * window's minimum (rightmost occurrence on ties). The selected set is a
  * position-aware fingerprint sketch with the paper's guarantee: any match
  * of at least w+k-1 consecutive tokens between two documents shares at
  * least one selected fingerprint, while expected density is only
  * 2/(w+1) of the grams — the local, deterministic alternative to MinHash
  * when the pipeline needs *where* the overlap is, not just how much.
  *
  * Reference semantics: the fingerprint/overlap unit of work next to the
  * reference's whole-row dedup (`src/pipeline/transform.py:31-33` drops
  * exact-duplicate readings); q30's single-min sketch is the degenerate
  * w=∞ case of this operator.
  *
  * Determinism across engines: the (hash, position) pair is packed into ONE
  * int64 key — `hash · 2^posBits + (2^posBits − 1 − pos)` — so a plain
  * `min() OVER` picks the smallest hash and, among equal hashes, the
  * LARGEST position (the paper's rightmost tie-break), identically in
  * Spark and any SQL oracle. With 32-bit gram hashes and posBits=21 the
  * key tops out below 2^53, exact in int64 and IEEE-double alike; docs are
  * capped at 2^21 grams (a 100 TB corpus shards longer docs upstream).
  *
  * Scale shape: gram hashing is a per-row codegen'd projection; the only
  * exchange is the per-doc window sort (hash-partitioned by doc_id,
  * sort within partition — embarrassingly parallel across docs). The
  * fingerprint set is ~2/(w+1) of the gram volume, and overlap pairing
  * joins fingerprints (never text) under a df-cap that bounds any hash's
  * pair fan-out at df² — the same common-gram elimination MOSS applies to
  * boilerplate (and the q36/q90 inverted-index discipline).
  */
object Winnow {

  val PosBits = 21
  private val PosMask = (1L << PosBits) - 1

  /** 32-bit gram hash: first 8 md5 hex digits, exactly the
    * [[Sampling.hashBucket]] / q118 bucket construction (engine-portable).
    */
  private[operators] def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Longest shared token run per CANDIDATE pair — the per-pair span
    * measurement behind exact-substring deduplication (Lee et al., ACL
    * 2022 "Deduplicating Training Data Makes Language Models Better"):
    * where that paper's suffix array finds duplicated spans corpus-wide,
    * this measures them on an LSH-proposed candidate list — the cheap-
    * candidates → expensive-verify shape (q150's discipline, but the
    * verdict is the SPAN LENGTH, which an edit-distance verdict can't
    * give).
    *
    * Method: word-k-gram hashes with positions for both docs of each
    * pair; matches (a_pos, b_pos) on equal hash; a run is a maximal set of
    * matches on one diagonal (a_pos − b_pos constant) with consecutive
    * a_pos — the gaps-and-islands grouping key is
    * `a_pos − row_number()` within the (pair, diagonal) partition. A run
    * of m consecutive shared k-grams is m+k−1 shared tokens.
    *
    * Returns (doc_a, doc_b, longest_run_tokens, n_matching_grams); pairs
    * with zero shared k-grams drop out (nothing to measure). Scale shape:
    * gram volume joins only FOR candidate pairs (the candidate join keys
    * the gram exchange), diagonals partition per pair, and the window
    * sort is per (pair, diagonal) — never global.
    */
  def longestSharedRuns(
      docs: DataFrame, idCol: String, textCol: String,
      cand: DataFrame, k: Int = 5): DataFrame = {
    val g = docs
      .select(col(idCol).as("__gid"),
        posexplode(Text.wordNgramsFromText(col(textCol), k))
          .as(Seq("__pos", "__gram")))
      .select(col("__gid"), col("__pos").cast("long").as("__pos"),
        h32(col("__gram")).as("__h"))
    val ga = g.select(col("__gid").as("doc_a"), col("__pos").as("__ap"), col("__h"))
    val gb = g.select(col("__gid").as("doc_b"), col("__pos").as("__bp"), col("__h"))
    val m = cand.select("doc_a", "doc_b")
      .join(ga, "doc_a")
      .join(gb, Seq("doc_b", "__h"))
    val wd = Window
      .partitionBy(col("doc_a"), col("doc_b"), (col("__ap") - col("__bp")).as("__d"))
      .orderBy("__ap")
    m.withColumn("__grp", col("__ap") - row_number().over(wd))
      .groupBy(col("doc_a"), col("doc_b"),
        (col("__ap") - col("__bp")).as("__d"), col("__grp"))
      .agg(count(lit(1)).as("__len"))
      .groupBy("doc_a", "doc_b")
      .agg((max(col("__len")) + (k - 1)).as("longest_run_tokens"),
        sum(col("__len")).as("n_matching_grams"))
  }

  /** Winnowed fingerprints, one row per selected (doc, gram hash, position).
    *
    * Short-doc guard: a doc with fewer than `w` grams still emits the min
    * over all its grams (the final partial window), so no document
    * fingerprints to the empty set — matching MOSS, which sketches files
    * shorter than the guarantee threshold too.
    *
    * @param k word-gram width (guarantee threshold is w+k-1 tokens)
    * @param w window width in grams
    */
  def fingerprints(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1 && w <= 1024, s"bad winnow params k=$k w=$w")
    // The gram count is known BEFORE the explode (size of the gram array),
    // so the short-doc guard needs no second window pass over the exploded
    // table — one sort per doc partition total, not two.
    val grams = df
      .select(col(idCol), Text.wordNgramsFromText(col(textCol), k).as("__arr"))
      .select(col(idCol), (size(col("__arr")) - 1).as("last_pos"),
        posexplode(col("__arr")).as(Seq("pos", "gram")))
      .select(col(idCol), col("pos"), col("last_pos"),
        (h32(col("gram")) * (1L << PosBits) + (lit(PosMask) - col("pos"))).as("key"))
    val sel = Window.partitionBy(idCol).orderBy("pos").rowsBetween(-(w - 1), 0)
    grams
      .withColumn("sel_key", min(col("key")).over(sel))
      .filter(col("pos") >= (w - 1) || col("pos") === col("last_pos"))
      .select(col(idCol),
        shiftright(col("sel_key"), PosBits).as("fp_hash"),
        (lit(PosMask) - col("sel_key") % (1L << PosBits)).as("fp_pos"))
      .distinct()
  }

  /** Document overlap from shared fingerprint HASHES (position-free match,
    * per the paper): pairs (a < b) with the count of distinct shared
    * hashes, after dropping hashes present in more than `maxDf` documents
    * (MOSS's boilerplate/common-code elimination — and the bound that
    * keeps the self-join's fan-out at df² per hash instead of corpus²).
    */
  def overlapPairs(fp: DataFrame, idCol: String, maxDf: Int = 8): DataFrame = {
    val hashes = fp.select(col(idCol), col("fp_hash")).distinct()
    val kept = hashes
      .withColumn("__df", count(lit(1)).over(Window.partitionBy("fp_hash")))
      .filter(col("__df") <= maxDf)
      .drop("__df")
    kept.select(col(idCol).as("doc_a"), col("fp_hash"))
      .join(kept.select(col(idCol).as("doc_b"), col("fp_hash")), "fp_hash")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
  }
}
