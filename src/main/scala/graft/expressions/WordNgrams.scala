package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram extraction straight from the text: whitespace-run
  * tokenization + space-joined n-grams in one pass — identical output to
  * `transform(sequence(...), i -> concat_ws(' ', tokens[i..i+n-1]))` over
  * `split(trim(text), '\\s+')` (and the oracle's list-comprehension
  * equivalent), without materializing the token array per row through
  * interpreted lambdas.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"expects string, got $dt")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    WordNgrams.ngrams(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.WordNgrams.ngrams($c.toString(), $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {

  /** Space-joined word n-grams of whitespace-tokenized text. */
  def ngrams(s: String, n: Int): GenericArrayData = {
    val toks = tokenize(s)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < out.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Exactly the Java-regex `\s` class (ASCII-only). Spark's `split` goes
    * through Java regex, so `Character.isWhitespace` (full Unicode: U+2028,
    * U+1680, U+2000–200A, ...) would silently diverge from the HOF/oracle
    * formulation on Unicode whitespace.
    */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 11.toChar || c == '\f' || c == '\r'

  /** split(trim(s), "\\s+") semantics, bit-for-bit:
    *   - trim strips ONLY ' ' (U+0020), matching Spark/DuckDB `trim` — not
    *     Java String.trim (which strips every char <= U+0020);
    *   - blank input yields [""] (split of "" yields [""]);
    *   - Spark's split uses limit = -1, so a leading separator run (e.g.
    *     "\tfoo" — trim left the tab) yields an empty FIRST token and a
    *     trailing run yields an empty LAST token (unlike Java String.split,
    *     which drops trailing empties).
    */
  private def tokenize(s: String): Array[String] = {
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    if (lo == hi) return Array("")
    val out = new scala.collection.mutable.ArrayBuffer[String]((hi - lo) / 5 + 1)
    var i = lo
    if (isWs(s.charAt(i))) {
      out += ""
      while (i < hi && isWs(s.charAt(i))) i += 1
    }
    while (i < hi) {
      var j = i
      while (j < hi && !isWs(s.charAt(j))) j += 1
      out += s.substring(i, j)
      i = j
      while (i < hi && isWs(s.charAt(i))) i += 1
    }
    if (isWs(s.charAt(hi - 1))) out += ""
    out.toArray
  }
}
