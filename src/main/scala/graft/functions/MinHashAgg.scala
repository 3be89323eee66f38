package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a typed imperative aggregate: one pass over a
  * document's shingles producing the full `numHashes`-wide signature in a
  * single primitive buffer.
  *
  * The expression-composition alternative — `numHashes` separate
  * `min(xxhash64(shingle, i))` aggregates — evaluates `numHashes`
  * expression trees per input row and carries a `numHashes`-column
  * aggregation buffer through the hash aggregate; this buffer form is one
  * `Array[Long]` updated in a tight loop (hash the shingle once, then
  * `numHashes` cheap avalanche mixes).
  *
  * Hash family: h_i(s) = mix64(xxhash64-style(s) ^ GOLDEN·(i+1)) — an
  * independent-enough family for banding; the LSH output is verified with
  * exact Jaccard downstream, so the family choice never leaks into
  * results.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  require(numHashes >= 1, s"numHashes must be positive, got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // SQL-facing (GraftExtensions): analyzer coerces or rejects the shingle
  // input instead of a per-row ClassCastException mid-job
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = MinHashAgg.hashUtf8(v.asInstanceOf[UTF8String])
      var i = 0
      while (i < numHashes) {
        val h = MinHashAgg.mix64(base ^ (MinHashAgg.Golden * (i + 1)))
        if (h < buffer(i)) buffer(i) = h
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (other(i) < buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
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

  override def prettyName: String = "minhash_signature"
}

object MinHashAgg {

  private[functions] val Golden = 0x9E3779B97F4A7C15L

  /** xxhash64-flavoured string hash (single pass over the UTF-8 bytes). */
  private[functions] def hashUtf8(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0x27D4EB2F165667C5L
    var i = 0
    while (i < bytes.length) {
      h = java.lang.Long.rotateLeft(h ^ (bytes(i) & 0xffL) * Golden, 27) * 5 + 0x52DCE729L
      i += 1
    }
    mix64(h ^ bytes.length)
  }

  /** splitmix64 finalizer. */
  private[functions] def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Column form: `minhash_signature(shingle, 128)` aggregate. */
  def apply(c: Column, numHashes: Int): Column =
    GraftExpressionBridge.column(
      MinHashAgg(GraftExpressionBridge.expression(c), numHashes)
        .toAggregateExpression())
}
