package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Integer dot product of two `array<int>` columns — the scoring kernel
  * for int8-quantized vector search ([[graft.operators.VectorSearch]]).
  * Accumulates in long (no overflow for |q| ≤ 127 up to ~5×10¹⁴ dims)
  * and stays exact, so quantized scores are bit-identical across
  * engines — unlike float scoring, an integer ranking can be replayed
  * verbatim by the DuckDB oracle.
  */
case class IntDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int_dot requires array<int> inputs, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    IntDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntDot.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "int_dot"
}

object IntDot {

  /** Static kernel shared by interpreted and generated paths. Unequal
    * lengths are an upstream bug (a dropped dimension) — fail loudly
    * instead of silently truncating to a plausible-but-wrong score.
    */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"int_dot: dimension mismatch ($n vs ${b.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getInt(i).toLong * b.getInt(i); i += 1 }
    acc
  }

  def apply(a: Column, b: Column): Column =
    GraftExpressionBridge.column(IntDot(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
}
