package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two `array<double>` columns as a native Catalyst
  * expression: a primitive left-to-right loop over the unsafe array data.
  *
  * Exists because the composable form —
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — routes every element
  * through interpreted lambda invocation and per-pair array allocation;
  * on an all-pairs similarity join that is the entire runtime (~60×
  * slower than this loop at 64 dims). Same left-to-right summation
  * order, so results are bit-identical to the higher-order-function form.
  */
case class DoubleDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"double_dot requires array<double> inputs, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    DoubleDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DoubleDot.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "double_dot"
}

object DoubleDot {

  /** Static kernel shared by interpreted and generated paths. Unequal
    * lengths are an upstream bug (a dropped dimension) — fail loudly
    * instead of silently truncating to a plausible-but-wrong score.
    */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"double_dot: dimension mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def apply(a: Column, b: Column): Column =
    GraftExpressionBridge.column(DoubleDot(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
}
