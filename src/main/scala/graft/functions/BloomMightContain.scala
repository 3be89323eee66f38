package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(hash)` — membership probe of a pre-built Bloom
  * filter, the build-side prefilter for joins whose small side is too
  * large to broadcast as rows but compresses to a few megabytes of
  * filter bits (the runtime-filter idea behind
  * `spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`, here as a
  * first-class expression the engine can place deliberately).
  *
  * The child is the row's join-key hash (`xxhash64` upstream — one
  * canonical hash for build and probe). The filter rides the plan as
  * its serialized byte image (deterministic, immutable); each
  * executor deserializes once per task-set via the transient lazy.
  * One-sided error: `false` is definitive absence, `true` must be
  * confirmed by an exact join — [[graft.operators.BloomPrune]] wires
  * both paths so results stay exact.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain requires a bigint key hash, got ${other.simpleString}")
    }

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  /** Probe entry shared by the interpreted and generated paths. */
  def test(h: Long): Boolean = filter.mightContainLong(h)

  override def nullSafeEval(h: Any): Any = test(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $ref.test($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"

  // the byte image is part of plan identity, but Array equality is
  // reference equality — compare content so canonicalization dedups
  // identical probes
  override def equals(other: Any): Boolean = other match {
    case BloomMightContain(c, b) =>
      c == child && java.util.Arrays.equals(b, filterBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(filterBytes)
}

object BloomMightContain {
  def apply(keyHash: Column, filterBytes: Array[Byte]): Column =
    GraftExpressionBridge.column(BloomMightContain(
      GraftExpressionBridge.expression(keyHash), filterBytes))
}
