package graft.expressions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native min-md5-shingle document fingerprint: lexicographic minimum of
  * md5 over every character k-shingle — identical values to the
  * higher-order-function formulation in
  * [[graft.functions.Text.minShingleFingerprint]] (and the oracle's
  * `list_min([md5(text[i:i+k-1]) ...])`), but one tight loop per row with a
  * thread-local digest instead of per-shingle Column evaluation.
  *
  * The minimum is tracked over raw digest bytes (hex encoding is
  * order-preserving per byte), so only the winner is hex-encoded.
  */
case class MinShingleFingerprint(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"expects string, got $dt")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_min_shingle_md5"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(MinShingleFingerprint.minShingleHex(s, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""org.apache.spark.unsafe.types.UTF8String.fromString(
            graft.expressions.MinShingleFingerprint.minShingleHex($c.toString(), $k))""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinShingleFingerprint {

  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".toCharArray

  /** Min md5 (hex) over char k-shingles; for len < k one shingle = whole
    * text (mirrors the HOF's greatest(len-k+1, 1) guard).
    *
    * "Char" means Unicode code point — Spark's `substr`/`length` (UTF8String)
    * and the DuckDB oracle both slice by code points, so shingling by UTF-16
    * units would diverge on supplementary-plane text (and could split a
    * surrogate pair mid-character). Texts without surrogates take a branch
    * where UTF-16 index == code-point index (no boundary table needed).
    */
  def minShingleHex(s: String, k: Int): String = {
    val md = digests.get()
    val len = s.length
    // boundaries(i) = UTF-16 offset of the i-th code point; identity when no
    // surrogate pairs are present (the common case — skip the allocation).
    var boundaries: Array[Int] = null
    var nCp = len
    if (s.codePointCount(0, len) != len) {
      nCp = s.codePointCount(0, len)
      boundaries = new Array[Int](nCp + 1)
      var off = 0
      var cp = 0
      while (cp < nCp) {
        boundaries(cp) = off
        off = s.offsetByCodePoints(off, 1)
        cp += 1
      }
      boundaries(nCp) = len
    }
    @inline def utf16(cpIdx: Int): Int =
      if (boundaries == null) cpIdx else boundaries(cpIdx)
    val n = math.max(nCp - (k - 1), 1)
    var min: Array[Byte] = null
    var i = 0
    while (i < n) {
      md.reset()
      val end = math.min(i + k, nCp)
      val d = md.digest(s.substring(utf16(i), utf16(end)).getBytes("UTF-8"))
      if (min == null || unsignedLess(d, min)) min = d
      i += 1
    }
    val out = new Array[Char](32)
    var j = 0
    while (j < 16) {
      out(2 * j) = HexChars((min(j) >> 4) & 0xf)
      out(2 * j + 1) = HexChars(min(j) & 0xf)
      j += 1
    }
    new String(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }
}
