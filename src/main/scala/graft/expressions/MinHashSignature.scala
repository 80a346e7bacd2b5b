package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd MinHash signature over an `array<bigint>` of 32-bit
  * base hashes: element i = min over the array of
  * (h·(2i+1) + i·2654435761) mod 2³².
  *
  * Identical values to the higher-order-function formulation in
  * [[graft.operators.TextDedup.minhashSignature]] (min is order-independent
  * and the arithmetic is exact int64), but runs as one primitive k-lane
  * loop per row instead of k interpreted array traversals with boxing.
  *
  * Empty input → null signature (callers filter empty shingle sets first).
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0 && k <= 64, s"k must be in [1,64], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<bigint>, got $dt")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  private val Mult = 2654435761L
  private val Mod = 4294967296L

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < k) {
        val v = (h * (2 * i + 1) + i * Mult) % Mod
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
        int $n = $a.numElements();
        if ($n == 0) { ${ev.isNull} = true; } else {
          long[] $mins = new long[$k];
          java.util.Arrays.fill($mins, Long.MAX_VALUE);
          for (int $j = 0; $j < $n; $j++) {
            long $h = $a.getLong($j);
            for (int $i = 0; $i < $k; $i++) {
              long $v = ($h * (2L * $i + 1L) + $i * ${Mult}L) % ${Mod}L;
              if ($v < $mins[$i]) $mins[$i] = $v;
            }
          }
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
