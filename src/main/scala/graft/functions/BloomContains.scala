package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_contains(key_hash, filter_bytes)` — probe where the FILTER
  * is a column, not a plan literal: the shape an index relation has
  * (one serialized filter per file/shard row,
  * [[graft.sources.FileSkipIndex]]). Deserializes per row — correct
  * for index-sized relations (rows = files, not data); for probing a
  * corpus-sized side against ONE filter use [[BloomMightContain]],
  * which deserializes once.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_contains requires (bigint, binary), got ${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(h: Any, bytes: Any): Any =
    BloomContains.test(h.asInstanceOf[Long], bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, b) =>
      s"${ev.value} = graft.functions.BloomContains.test($h, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_contains"
}

object BloomContains {

  def test(h: Long, bytes: Array[Byte]): Boolean =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes)).mightContainLong(h)

  def apply(keyHash: Column, filterBytes: Column): Column =
    GraftExpressionBridge.column(BloomContains(
      GraftExpressionBridge.expression(keyHash),
      GraftExpressionBridge.expression(filterBytes)))
}
