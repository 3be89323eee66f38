package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash signature fold as a typed imperative aggregate: one pass over
  * a document's (already-hashed) tokens, producing the packed `bits`-wide
  * signature from a single `Array[Int]` buffer.
  *
  * Semantics (identical to the declarative form it replaces, and to the
  * DuckDB oracle's replay): bit i of the signature is set iff
  * Σ over tokens of (token-hash bit i ? +1 : −1) > 0 — equivalently
  * 2·cnt_set(i) > n. The token hash itself stays an *input* (the
  * engine-portable md5-derived 60-bit value), so the oracle can recompute
  * it; only the fold is native.
  *
  * The expression-composition alternative — `bits` separate
  * `sum(when(shiftright(h, i) & 1 = 1, 1).otherwise(-1))` aggregates —
  * walks `bits` expression trees per input row and carries a
  * `bits`-column aggregation buffer; this form does `bits` shift-mask-add
  * steps in a tight JVM loop over one primitive buffer, map-side combined
  * like any other partial aggregate.
  *
  * Null inputs are SKIPPED (standard aggregate semantics) — unlike the
  * declarative form above, where a null hash's `otherwise(-1)` branch
  * counted a −1 vote on every bit. Unreachable via [[graft.operators
  * .TextDedup.simhash]] (md5 of non-null tokens), but observable through
  * the SQL-registered `simhash_signature` on a nullable column.
  */
case class SimHashAgg(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with ImplicitCastInputTypes {

  // bits > 64 would alias shifts mod 64 (silently wrong signatures);
  // bits < 1 would index outside the buffer
  require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  // SQL-facing (GraftExtensions): analyzer coerces or rejects the hash
  // input instead of a per-row ClassCastException mid-job
  override def inputTypes: Seq[DataType] = Seq(LongType)

  // buffer(0..bits-1) = per-bit set counts, buffer(bits) = token count
  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits + 1)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < bits) {
        buffer(i) += ((h >>> i) & 1L).toInt
        i += 1
      }
      buffer(bits) += 1
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i <= bits) {
      buffer(i) += other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = {
    val n = buffer(bits)
    var sig = 0L
    var i = 0
    while (i < bits) {
      if (2 * buffer(i).toLong > n) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 4)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 4)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "simhash_signature"
}

object SimHashAgg {

  /** Column form: `simhash_signature(h, 60)` aggregate over the 60-bit
    * token hash.
    */
  def apply(c: Column, bits: Int): Column =
    GraftExpressionBridge.column(
      SimHashAgg(GraftExpressionBridge.expression(c), bits)
        .toAggregateExpression())
}
