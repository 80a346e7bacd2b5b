package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data release: detect and redact emails, URLs
  * and phone numbers before text ships to a training mix. Pure codegen'd
  * string expressions — no UDFs, no shuffle; the scrub rides the scan's
  * projection, so at 100 TB it costs exactly one pass that was being paid
  * anyway.
  *
  * The patterns deliberately live in the RE2 ∩ Java-regex common subset
  * (character classes, bounded repetition, greedy `+` — no backtracking
  * constructs, no lookaround), so the SAME pattern string runs under the
  * DuckDB oracle (RE2) and in Spark (java.util.regex) with identical
  * matches — which is what lets redaction itself sit under the
  * cross-engine hash gate rather than being spot-checked.
  */
object Scrub {

  /** Email addresses (lowercase corpus): local@domain.tld. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** http/https URLs over the unreserved-ish character set. */
  val UrlRe = "https?://[a-z0-9./_-]+"

  /** International-prefix phone shapes: +C[C]-NNN-NNNN. */
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  /** Matches per pattern (for audit counts), as a long column. */
  def countMatches(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("long")

  /** Redact all three PII classes with typed placeholders. Emails are
    * replaced before URLs so a URL never half-matches inside an already
    * rewritten span; phones are disjoint from both.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        UrlRe, "<URL>"),
      PhoneRe, "<PHONE>")
}
