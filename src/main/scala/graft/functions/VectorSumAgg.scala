package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Element-wise sum of `array<int>` vectors as a typed imperative
  * aggregate — the centroid/statistics kernel for embedding columns.
  *
  * The declarative alternatives both fall over at scale: `posexplode`
  * + groupBy(pos) multiplies the corpus row count by the dimension
  * (10¹⁰ vectors × 64 dims = 6.4×10¹¹ shuffled rows), and
  * `collect_list`-then-fold pulls whole groups into memory. This
  * aggregate keeps ONE `Array[Long]` accumulator per group, updated in
  * a tight primitive loop with map-side partial aggregation — the
  * shuffle carries |groups| × dims longs, independent of corpus size.
  *
  * Accumulates int8-quantized components in long: overflow needs
  * > 2⁶³/127 ≈ 7×10¹⁶ rows per group — unreachable.
  *
  * The dimension is taken from the first vector seen; a mismatched
  * vector later is an upstream bug (a dropped dimension) and fails
  * loudly rather than silently mis-summing.
  */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_sum requires array<int> input, got ${other.simpleString}")
    }

  // empty array = "no vector seen yet"; sized lazily on first update so
  // callers don't have to thread the dimension through as a parameter
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val acc = if (buffer.length == 0) new Array[Long](n) else buffer
      require(acc.length == n,
        s"vector_sum: dimension mismatch (${acc.length} vs $n)")
      var i = 0
      while (i < n) {
        acc(i) += arr.getInt(i)
        i += 1
      }
      acc
    }
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.length == 0) buffer
    else if (buffer.length == 0) other
    else {
      require(buffer.length == other.length,
        s"vector_sum: dimension mismatch (${buffer.length} vs ${other.length})")
      var i = 0
      while (i < buffer.length) {
        buffer(i) += other(i)
        i += 1
      }
      buffer
    }
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "vector_sum"
}

object VectorSumAgg {

  /** Column form: `vector_sum(qvec)` aggregate. */
  def apply(c: Column): Column =
    GraftExpressionBridge.column(
      VectorSumAgg(GraftExpressionBridge.expression(c))
        .toAggregateExpression())
}
