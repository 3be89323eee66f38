package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All banded hyperplane-LSH keys of a vector in ONE compiled loop:
  * output[j] packs bits (dot(vec, planes[j·bits + i]) > 0) for
  * i < `bits`, bit i = 1L << i — exactly [[graft.operators.VectorSearch
  * .lshSignature]] over each band's plane slice, but as a single
  * expression instead of |planes| nested when/bitwiseOR nodes.
  *
  * Exists because the composed form builds an expression tree whose
  * size is the plane count (256 for the near-dup path): codegen emits
  * one method call chain per plane and re-reads the vector per plane,
  * while this kernel reads the vector once per plane with no
  * intermediate expression nodes. The plane matrix rides along as a
  * constant reference object, never rebuilt per row.
  */
case class PlaneBandKeys(child: Expression, planes: Seq[Seq[Double]], bits: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")
  require(planes.nonEmpty && planes.size % bits == 0,
    s"planes (${planes.size}) must split evenly into $bits-bit bands")

  @transient private lazy val matrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"plane_band_keys requires array<double> input, got ${other.simpleString}")
    }

  override def nullSafeEval(vec: Any): Any =
    PlaneBandKeys.compute(vec.asInstanceOf[ArrayData], matrix, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, vec =>
      s"${ev.value} = graft.functions.PlaneBandKeys.compute($vec, $planesRef, $bits);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "plane_band_keys"
}

object PlaneBandKeys {

  /** Static kernel shared by interpreted and generated paths. */
  def compute(vec: ArrayData, planes: Array[Array[Double]], bits: Int): ArrayData = {
    val nBands = planes.length / bits
    val keys = new Array[Long](nBands)
    var j = 0
    while (j < planes.length) {
      val plane = planes(j)
      val n = vec.numElements()
      if (n != plane.length)
        throw new IllegalArgumentException(
          s"plane_band_keys: dimension mismatch ($n vs ${plane.length})")
      var acc = 0.0
      var i = 0
      while (i < n) { acc += vec.getDouble(i) * plane(i); i += 1 }
      if (acc > 0.0) keys(j / bits) |= 1L << (j % bits)
      j += 1
    }
    new GenericArrayData(keys)
  }

  def apply(vec: Column, planes: Seq[Seq[Double]], bits: Int): Column =
    GraftExpressionBridge.column(PlaneBandKeys(
      GraftExpressionBridge.expression(vec), planes, bits))
}
