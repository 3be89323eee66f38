package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All space-joined word n-grams of a token array in ONE compiled loop:
  * gram i = tokens[i .. min(i+n, len)-1] joined by " ", for
  * i ∈ [0, max(len−n, 0)]; empty input → empty array. Bit-identical to
  * the composed form `transform(sequence(0, greatest(size-n, 0)),
  * i -> concat_ws(" ", slice(toks, i+1, n)))` — including the tiny-doc
  * edge where len < n yields the full token string as the only gram.
  *
  * Exists because ArrayTransform routes every gram through an
  * interpreted lambda with a fresh slice allocation per index — on
  * shingle-heavy paths (d02/d03/d06/d07/d10/d16/t04/t05) that lambda
  * machinery is most of the tokenize+shingle stage.
  */
case class WordGrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"gram width must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_grams requires array<string> input, got ${other.simpleString}")
    }

  override def nullSafeEval(toks: Any): Any =
    WordGrams.compute(toks.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.WordGrams.compute($toks, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_grams"
}

object WordGrams {

  private val Space = UTF8String.fromString(" ")

  /** Static kernel shared by interpreted and generated paths. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val nGrams = math.max(len - n, 0) + 1
    val out = new Array[Any](nGrams)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < nGrams) {
      val width = math.min(n, len - i)
      var j = 0
      while (j < width) { window(j) = toks.getUTF8String(i + j); j += 1 }
      // concat_ws semantics: join the window; width < n only on the
      // final grams of a short document
      out(i) =
        if (width == n) UTF8String.concatWs(Space, window: _*)
        else UTF8String.concatWs(Space, java.util.Arrays.copyOf(window, width): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(toks: Column, n: Int): Column =
    GraftExpressionBridge.column(WordGrams(
      GraftExpressionBridge.expression(toks), n))
}
