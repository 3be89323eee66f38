package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over append-only feeds —
  * refresh cost proportional to the BATCH, never to history.
  *
  * A 100 TB corpus with a daily append cannot re-aggregate ten years
  * of data to update a rollup; the standard answer is an algebraic
  * view: keep the aggregate state as mergeable partials and fold each
  * batch in with `merge(state, aggregate(batch))`. COUNT/SUM/MIN/MAX
  * merge by themselves; AVG rides as (SUM, COUNT) and divides at read
  * time. The merge is ONE hash aggregate over |state| + |batchAgg|
  * rows — both group-cardinality-sized, not corpus-sized.
  *
  * [[AggSpec]] pins the column names so state, batch aggregation, and
  * merge can't drift apart; exactness (fold ≡ direct aggregate over
  * the concatenation) is the [[graft.queries]] d42 oracle and the
  * model check in the spec.
  */
object IncrementalView {

  /** One maintained aggregate: `name` is the state column, `agg` the
    * batch-side aggregate, `mergeFn` the state-side re-aggregate
    * (sum for COUNT/SUM, min/max for MIN/MAX).
    */
  final case class AggSpec(name: String, agg: Column, mergeFn: String => Column)

  def countRows(name: String): AggSpec =
    AggSpec(name, count(lit(1)).cast("long").as(name), c => sum(col(c)).cast("long"))
  def sumOf(expr: Column, name: String): AggSpec =
    AggSpec(name, sum(expr).as(name), c => sum(col(c)))
  def minOf(expr: Column, name: String): AggSpec =
    AggSpec(name, min(expr).as(name), c => min(col(c)))
  def maxOf(expr: Column, name: String): AggSpec =
    AggSpec(name, max(expr).as(name), c => max(col(c)))

  /** Aggregate one append batch to the view's granularity. */
  def aggregate(batch: DataFrame, groupCols: Seq[String],
      specs: Seq[AggSpec]): DataFrame =
    batch.groupBy(groupCols.map(col): _*)
      .agg(specs.head.agg, specs.tail.map(_.agg): _*)

  /** Fold a batch aggregate into the state: union + one re-aggregate.
    * Passing `state = None` initializes the view.
    */
  def merge(state: Option[DataFrame], batchAgg: DataFrame,
      groupCols: Seq[String], specs: Seq[AggSpec]): DataFrame = {
    val merged = state.map(_.unionByName(batchAgg)).getOrElse(batchAgg)
    merged.groupBy(groupCols.map(col): _*)
      .agg(specs.head.mergeFn(specs.head.name).as(specs.head.name),
        specs.tail.map(s => s.mergeFn(s.name).as(s.name)): _*)
  }

  /** Convenience fold: maintain the view across a sequence of batches
    * starting from empty — each step costs one batch aggregate plus a
    * state-sized merge.
    */
  def refreshAll(batches: Seq[DataFrame], groupCols: Seq[String],
      specs: Seq[AggSpec]): DataFrame =
    batches.foldLeft(Option.empty[DataFrame]) { (state, b) =>
      Some(merge(state, aggregate(b, groupCols, specs), groupCols, specs))
    }.getOrElse(
      throw new IllegalArgumentException("refreshAll needs at least one batch"))
}
