package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_agg(key_hash, expectedItems)` — build a Bloom filter PER
  * GROUP as a typed imperative aggregate (partial filters OR-merge,
  * so the build is one distributed pass with map-side combine). The
  * per-group counterpart to `DataFrameStatFunctions.bloomFilter`'s
  * single driver-side filter: a data-skipping index builds ONE
  * filter per file/partition/shard in the same aggregation that
  * computes its min/max footer stats
  * ([[graft.sources.FileSkipIndex]]).
  *
  * Output is the filter's serialized bytes — probe with
  * [[BloomContains]] (column form) or [[BloomMightContain]] (plan
  * literal). Fixed 1% fpp; `expectedItems` sizes each group's bit
  * array (overestimate freely — it only costs bytes).
  */
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with ImplicitCastInputTypes {

  require(expectedItems >= 1, s"expectedItems must be positive, got $expectedItems")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, 0.01)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "bloom_agg"
}

object BloomAgg {
  def apply(keyHash: Column, expectedItems: Long): Column =
    GraftExpressionBridge.column(
      BloomAgg(GraftExpressionBridge.expression(keyHash), expectedItems)
        .toAggregateExpression())
}
