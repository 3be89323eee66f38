package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed document fingerprint as a native Catalyst expression.
  *
  * Algorithm (Schleimer/Wilkerson/Aiken winnowing): hash every `k`-char
  * window of the text; within each window of `w` consecutive k-gram
  * hashes select the minimum; output the sorted distinct selected
  * hashes. Two documents sharing a sufficiently long substring share
  * fingerprint members, so containment joins on `explode(fingerprint)`
  * find copied passages — the standard content-defined dedup primitive
  * for training corpora.
  *
  * The k-gram hash is the top 60 bits of `md5(substring)` — the same
  * engine-portable construction as [[graft.operators.TextDedup]]'s
  * SimHash token hash: any engine with md5 + character substrings
  * (e.g. the DuckDB oracle, `CAST('0x'||substr(md5(g),1,15) AS
  * BIGINT)`) replays the whole fingerprint bit-for-bit, so the
  * operator sits fully under the cross-engine correctness gate. A
  * faster non-portable polynomial rolling hash would buy ~nothing at
  * scale: the md5 cost is linear in input size, embarrassingly
  * parallel, and dwarfed by the downstream explode/join.
  *
  * `doGenCode` emits a static call so the expression stays inside
  * whole-stage codegen (no fallback interpreter, no UDF serialization).
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

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5 — identical to parsing the first 15 hex chars
    * of the digest (the SimHash trick, TextDedup.scala `SimhashBits`).
    */
  private def hash60(md: java.security.MessageDigest, s: UTF8String): Long = {
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** Static kernel, called from both interpreted and generated code.
    * Character-based windows (not bytes) so any UTF-8 engine's
    * `substr` replays the identical grams.
    */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val n = text.numChars()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val md = md5Local.get()

    // md5-60 k-gram hashes; a single clamped gram when n <= k
    val m = math.max(n - k + 1, 1)
    val hashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      hashes(i) = hash60(md, text.substring(i, i + k))
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
