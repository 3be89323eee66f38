package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton / Z-order bit interleave of two dimension values — the data
  * layout key for multi-dimensional data skipping: sorting (or
  * range-partitioning) a 100 TB table by `z_interleave(dim_x, dim_y)`
  * clusters BOTH dimensions into every file, so min/max footer stats
  * prune scans on either predicate (the classic Morton-curve layout,
  * the same idea behind Delta/Iceberg Z-ORDER clustering).
  *
  * Semantics: the low 16 bits of each (already range-mapped) dimension
  * are interleaved — x in the even bit positions, y in the odd — giving
  * a 32-bit Morton code as a non-negative long. Values are masked to
  * 16 bits (callers bucket/scale real domains first, as any Z-order
  * writer does).
  *
  * Codegen'd (stays inside whole-stage codegen; the kernel is the
  * standard mask-and-spread, no loop), and elementwise-deterministic so
  * the DuckDB oracle can replay it bit-for-bit.
  */
case class ZInterleave(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"z_interleave requires (int, int), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZInterleave.compute(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZInterleave.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "z_interleave"
}

object ZInterleave {

  /** Spread the low 16 bits of v to the even bit positions of a long. */
  private def part1by1(v: Int): Long = {
    var x = (v & 0xFFFF).toLong
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Morton code of (x & 0xFFFF, y & 0xFFFF): x even bits, y odd. */
  def compute(x: Int, y: Int): Long =
    part1by1(x) | (part1by1(y) << 1)

  def apply(x: Column, y: Column): Column =
    GraftExpressionBridge.column(ZInterleave(
      GraftExpressionBridge.expression(x), GraftExpressionBridge.expression(y)))
}
