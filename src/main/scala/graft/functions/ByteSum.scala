package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Sum of the UNSIGNED bytes of a `binary` column — the declarative
  * sample-sum kernel for uncompressed media payloads: over a raw
  * sample window (BMP BGR triples, WAV PCM bytes) the byte sum is
  * proportional to the window's mean intensity, so a perceptual-hash
  * bit ("block brighter than the mean") becomes
  * `ByteSum(substring(content, off, len)) >= len * 128` — real decoded
  * samples, no UDF, whole-stage codegen intact. Long accumulator:
  * exact to 2⁵⁵ bytes of payload, far past any single media column.
  */
case class ByteSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"byte_sum requires a binary input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    ByteSum.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteSum.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "byte_sum"
}

object ByteSum {

  /** Static kernel shared by interpreted and generated paths. */
  def compute(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) { acc += bytes(i) & 0xFF; i += 1 }
    acc
  }

  def apply(c: Column): Column =
    GraftExpressionBridge.column(ByteSum(GraftExpressionBridge.expression(c)))
}
