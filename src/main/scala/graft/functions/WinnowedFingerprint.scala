package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed rolling-hash document fingerprint as a native Catalyst
  * expression.
  *
  * Algorithm (Schleimer/Wilkerson/Aiken winnowing): polynomial rolling
  * hash over every `k`-byte window of the UTF-8 text; within each window
  * of `w` consecutive k-gram hashes select the minimum (rightmost on
  * ties); output the sorted distinct selected hashes. Two documents
  * sharing a sufficiently long substring share fingerprint members, so
  * containment joins on `explode(fingerprint)` find copied passages —
  * the standard content-defined dedup primitive for training corpora.
  *
  * Implementation notes: one rolling pass plus an O(len·w) winnow (w is
  * a small constant), all in primitive longs; `doGenCode` emits a static
  * call so the expression stays inside whole-stage codegen (no fallback
  * interpreter, no UDF serialization).
  */
case class WinnowedFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowedFingerprint.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowedFingerprint.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnowed_fingerprint"
}

object WinnowedFingerprint {

  private val Base = 1000003L

  /** Static kernel, called from both interpreted and generated code. */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    if (n <= k) {
      var h = 0L
      var i = 0
      while (i < n) { h = h * Base + (bytes(i) & 0xff); i += 1 }
      return new GenericArrayData(Array(h))
    }

    // rolling k-gram hashes
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var pow = 1L
    var i = 1
    while (i < k) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    hashes(0) = h
    i = 1
    while (i < m) {
      h = (h - (bytes(i - 1) & 0xff) * pow) * Base + (bytes(i + k - 1) & 0xff)
      hashes(i) = h
      i += 1
    }

    // winnow: min of each w-window (rightmost min), distinct
    val selected = scala.collection.mutable.TreeSet.empty[Long]
    if (m <= w) {
      var best = hashes(0); i = 1
      while (i < m) { if (hashes(i) <= best) best = hashes(i); i += 1 }
      selected += best
    } else {
      var start = 0
      while (start + w <= m) {
        var best = hashes(start)
        var j = start + 1
        while (j < start + w) { if (hashes(j) <= best) best = hashes(j); j += 1 }
        selected += best
        start += 1
      }
    }
    new GenericArrayData(selected.toArray)
  }

  /** Column wrapper: `winnowedFingerprint($"text")`. */
  def apply(c: Column, k: Int = 8, w: Int = 4): Column =
    GraftExpressionBridge.column(
      WinnowedFingerprint(GraftExpressionBridge.expression(c), k, w))
}
