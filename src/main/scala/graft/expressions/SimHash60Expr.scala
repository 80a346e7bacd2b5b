package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit SimHash over an `array<string>` token column — one tight
  * loop per row (md5 per token + 60 counter updates on a local int array)
  * instead of either the per-row HOF fold (interpreted lambdas, boxed
  * arrays) or the explode → 61-aggregate formulation
  * ([[graft.operators.TextDedup.simhashAgg]]), whose per-token cost is 60
  * unsafe aggregation-buffer updates plus a shuffle of the exploded rows.
  *
  * Value parity (spec-pinned in ExpressionsSpec against both formulations):
  *  - bit j set iff Σ±1 over tokens of bit j of the token's 60-bit
  *    md5-prefix is positive — `conv(substring(md5(t),1,15),16,10)`
  *    computed directly from the first 7.5 digest bytes;
  *  - empty or NULL token array → 0 (no bit has a positive sum);
  *  - any NULL token → 0 (the HOF fold's null poisoning zeroes every bit).
  *
  * The generated code calls the static evaluator below — it stays inside
  * WholeStageCodegen (no interpreted expression fallback) and the digest
  * instance is thread-local, so no per-row allocation beyond the digest
  * output.
  */
case class SimHash60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash60 expects array<string>, got $dt")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60"
  // null input maps to 0, matching the HOF fold — the result is never null
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else SimHash60Expr.simhash(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = ${c.isNull}
          ? 0L
          : graft.expressions.SimHash60Expr.simhash(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60Expr {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(token) as a long — identical to
    * `conv(substring(md5(t),1,15),16,10)`: the first 8 digest bytes
    * big-endian, low nibble dropped.
    */
  def hash60(s: UTF8String): Long = {
    val d = digest.get()
    d.reset()
    val b = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def simhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return 0L // null token poisons the fold → 0
      val h = hash60(arr.getUTF8String(i))
      var j = 0
      while (j < 60) {
        counts(j) += ((((h >>> j) & 1L) << 1) - 1L).toInt
        j += 1
      }
      i += 1
    }
    var res = 0L
    var j = 0
    while (j < 60) { if (counts(j) > 0) res |= 1L << j; j += 1 }
    res
  }
}
