package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd squared-L2 distances — the two fixed formulations the
  * similarity/PQ operators fold per row × candidate:
  *
  *  - [[L2SqFp]]: two `array<bigint>` fixed-point vectors → exact int64
  *    sum of squared diffs (bit-identical to the
  *    `aggregate(zip_with(a,b,(x,y)=>(x-y)*(x-y)), 0L, _+_)` HOF chain it
  *    replaces, including Java long wrap-around semantics).
  *  - [[L2SqDouble]]: `array<float|double>` vectors → double, each element
  *    promoted to double before subtraction, accumulated left-to-right in
  *    index order (exactly the HOF's sequential IEEE fold, so results are
  *    engine- and implementation-identical).
  *
  * Degenerate inputs follow the HOF too (the functions are public via
  * GraftExtensions, so the parity claim must hold off the happy path):
  * mismatched lengths → NULL (zip_with pads with nulls, the null product
  * poisons the aggregate) and any NULL element → NULL. The per-element
  * null scan is emitted only when the array type says `containsNull`;
  * vectors read from parquet columns declared non-null keep the bare
  * primitive loop.
  *
  * Why native: the HOF formulation allocates a zipped intermediate array
  * and evaluates two interpreted lambdas per element. On the ANN/PQ hot
  * paths (brute-force ground truth, ADC lookup tables, broadcast-fold
  * centroid argmin) that cost is paid rows × candidates × dims times per
  * query; these compile to one primitive loop inside WholeStageCodegen.
  */
case class L2SqFp(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_l2sq_fp expects two array<bigint> arguments, got ($l, $r)")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_l2sq_fp"
  // mismatched lengths / null elements null out even when both children
  // are non-null, so nullability cannot be inherited from the children
  override def nullable: Boolean = true

  private def mayContainNull: Boolean = Seq(left.dataType, right.dataType).exists {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (mayContainNull && (x.isNullAt(i) || y.isNullAt(i))) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      // the null-element scan compiles in only when the type allows nulls;
      // containsNull=false inputs keep the bare primitive loop
      val nullCheck =
        if (mayContainNull)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          long $acc = 0L;
          for (int $i = 0; $i < $n; $i++) {
            $nullCheck
            long $d = $a.getLong($i) - $b.getLong($i);
            $acc += $d * $d;
          }
          if (!${ev.isNull}) { ${ev.value} = $acc; }
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class L2SqDouble(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_l2sq expects array<float|double> arguments, got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq"
  // see L2SqFp: degenerate inputs null out regardless of child nullability
  override def nullable: Boolean = true

  private def mayContainNull: Boolean = Seq(left.dataType, right.dataType).exists {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  private def get(x: ArrayData, dt: DataType, i: Int): Double = dt match {
    case ArrayType(FloatType, _) => x.getFloat(i).toDouble
    case _ => x.getDouble(i)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (mayContainNull && (x.isNullAt(i) || y.isNullAt(i))) return null
      val d = get(x, left.dataType, i) - get(y, right.dataType, i)
      acc += d * d
      i += 1
    }
    acc
  }

  private def accessor(dt: DataType, arr: String, i: String): String = dt match {
    case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val nullCheck =
        if (mayContainNull)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $nullCheck
            double $d = ${accessor(left.dataType, a, i)} - ${accessor(right.dataType, b, i)};
            $acc += $d * $d;
          }
          if (!${ev.isNull}) { ${ev.value} = $acc; }
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
