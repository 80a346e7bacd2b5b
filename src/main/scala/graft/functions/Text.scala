package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data-pipeline surface
  * (builder contract; no counterpart in the reference, which has no string
  * processing beyond column renames — SURVEY.md §2.3 C5).
  *
  * Everything here is built from codegen'd built-ins (split / transform /
  * filter / aggregate higher-order functions) — no UDFs, so the whole doc →
  * features pipeline stays inside WholeStageCodegen and scales linearly with
  * executors. Cross-engine determinism rules: only integer arithmetic plus
  * single IEEE divisions (no transcendentals — libm results differ between
  * engines), and md5 (identical everywhere) as the only hash.
  */
object Text {

  /** Whitespace tokens of trimmed text. Empty text → [""] (1 token) in both
    * Spark and DuckDB — callers that care filter on length first.
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Dedup-grade normalization: lowercase, strip non-alphanumerics to
    * spaces, collapse whitespace runs, trim. The standard pre-pass before
    * content-hash dedup so cosmetic variants collide.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9]+", " "), "\\s+", " "))

  /** Token count under a BPE-ish pre-tokenizer: runs of letters, runs of
    * digits, or single non-alphanumeric marks.
    */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def bpeTokenCount(text: Column): Column = regexp_count(lower(text), lit(BpePattern))

  /** Characters excluding whitespace — numerator of mean-token-length. */
  def nonSpaceChars(text: Column): Column =
    length(regexp_replace(text, "\\s", ""))

  /** Count of tokens that appear in `set` (duplicates counted). */
  def tokenHits(toks: Column, set: Seq[String]): Column = {
    val arr = array(set.map(lit): _*)
    size(filter(toks, t => array_contains(arr, t)))
  }

  /** Stopword list used by the quality score (English function words that
    * also dominate the synthetic corpus).
    */
  val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Composite quality score in [0,1]: half length-saturation (chars capped
    * at `lenCap`), half non-stopword density. Rational arithmetic only.
    */
  def qualityScore(text: Column, toks: Column, lenCap: Int = 400): Column = {
    val lenNorm = least(length(text), lit(lenCap)).cast("double") / lenCap.toDouble
    val stopRatio = tokenHits(toks, Stopwords).cast("double") / size(toks)
    lenNorm * 0.5 + (lit(1.0) - stopRatio) * 0.5
  }

  /** Per-language marker words for the language-ID heuristic. Order matters:
    * it is the deterministic tiebreak (first wins on equal score).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "fr" -> Seq("le", "la", "et", "les"),
    "es" -> Seq("el", "los", "y", "una"),
    "de" -> Seq("der", "die", "und", "das"),
    "zh" -> Seq() // scored by CJK character share instead of markers
  )

  /** Share of characters in the CJK unified block. */
  def cjkRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", "")))
      .cast("double") / greatest(length(text), lit(1))

  /** Predicted language: argmax of marker-hit counts (zh scores via CJK
    * share × token count so it is commensurable), ties broken by marker
    * order. Pure expression — no UDF.
    */
  def langId(text: Column, toks: Column): Column = {
    val n = size(toks)
    val scores: Seq[(String, Column)] = LangMarkers.map {
      case ("zh", _) => "zh" -> (cjkRatio(text) * n)
      case (lang, markers) => lang -> tokenHits(toks, markers).cast("double")
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** md5-hex of every character k-shingle. */
  def shingleHashes(text: Column, k: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => md5(text.substr(i, lit(k))))

  /** Winnowing-lite document fingerprint: lexicographic min of the md5'd
    * character k-shingles. Identical construction is expressible in the
    * DuckDB oracle (list_min over a list comprehension), so fingerprints
    * hash-match across engines. Native codegen'd expression
    * ([[graft.expressions.MinShingleFingerprint]]); [[minShingleFingerprintHof]]
    * is the equivalent built-in-function formulation.
    */
  def minShingleFingerprint(text: Column, k: Int = 8): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.expressions.MinShingleFingerprint(
        org.apache.spark.sql.graftshim.ColumnShim.expression(text), k))

  /** Higher-order-function formulation (kept for cross-checking). */
  def minShingleFingerprintHof(text: Column, k: Int = 8): Column =
    array_min(shingleHashes(text, k))

  /** Word n-grams straight from text (native single-pass expression). */
  def wordNgramsFromText(text: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.expressions.WordNgrams(
        org.apache.spark.sql.graftshim.ColumnShim.expression(text), n))

  /** Word n-grams joined by a single space. Guarded: Spark's `sequence`
    * counts *down* when start > stop, so fewer than n tokens must yield an
    * empty array, not bogus negative-index grams.
    */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array())
}
