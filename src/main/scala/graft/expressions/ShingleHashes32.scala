package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct n-gram shingle hashes over an `array<string>` token
  * column — the candidate-generation primitive of the whole dedup family
  * (q33–q36, q90, q110, q118, q127) in one tight loop per row: md5 per
  * token + rolling 8191-fold + first-occurrence dedup, instead of the HOF
  * formulation's three interpreted-lambda passes (per-token transform,
  * per-window fold, array_distinct) with boxed intermediates.
  *
  * Value parity (spec-pinned in ExpressionsSpec against the HOF
  * formulation over the real corpus):
  *  - token hash = `conv(substring(md5(t),1,8),16,10)` — the first 4
  *    digest bytes big-endian (unsigned 32-bit);
  *  - window combine = fold h·8191 + h(tok) mod 2³² across the n tokens,
  *    exactly [[graft.operators.TextDedup.shingleHashes]]'s arithmetic
  *    (and the oracle's list-comprehension);
  *  - fewer than n tokens → empty array;
  *  - duplicates drop keeping FIRST occurrence order (array_distinct
  *    semantics).
  *
  * The generated code calls the static evaluator — the expression stays
  * inside WholeStageCodegen and the digest instance is thread-local.
  */
case class ShingleHashes32(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes expects array<string>, got $dt")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes32.hashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.ShingleHashes32.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes32 {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 hex digits of md5(token) as a long — identical to
    * `conv(substring(md5(t),1,8),16,10)`: the first 4 digest bytes
    * big-endian, read unsigned.
    */
  def hash32(s: UTF8String): Long = {
    val d = digest.get()
    d.reset()
    val b = d.digest(s.getBytes)
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }

  /** Distinct rolling n-gram hashes, first-occurrence order. */
  def hashes(arr: ArrayData, n: Int): GenericArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      th(i) = hash32(arr.getUTF8String(i))
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long](len * 2)
    i = 0
    while (i <= len - n) {
      var h = th(i)
      var j = 1
      while (j < n) {
        h = (h * 8191L + th(i + j)) % 4294967296L
        j += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) {
      out(i) = it.next().longValue()
      i += 1
    }
    new GenericArrayData(out)
  }
}
