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

  // ── signed (Z-set) maintenance: views under DELETES ─────────────────

  /** Fold a SIGNED delta (each row `sign` = +1 insert / −1 retraction
    * of a previously inserted row with exactly those values — the
    * Z-set convention; a CDC upsert is retract(old) + insert(new))
    * into COUNT/SUM state algebraically: per group, count += Σ sign
    * and each sum += Σ sign·value; groups whose live count reaches 0
    * vanish. This is what a takedown / right-to-be-forgotten pass
    * needs at 100 TB — the view updates in O(|delta|), never a
    * history re-aggregate. MIN/MAX are NOT algebraically retractable
    * (deleting the min needs the runner-up); [[repairMinMax]] is the
    * bounded escape hatch.
    *
    * Contract: the delta must be a valid retraction stream (never
    * retract what was not inserted); over-retraction surfaces as a
    * negative count, which this refuses to silently drop — callers
    * get the negative row and their spec/oracle catches it.
    */
  def mergeSigned(state: Option[DataFrame], delta: DataFrame, signCol: String,
      groupCols: Seq[String], countName: String,
      sums: Seq[(String, Column)]): DataFrame = {
    val sign = col(signCol).cast("long")
    val aggs = (sum(sign).cast("long").as(countName)) +:
      sums.map { case (n, e) => sum(sign * e).as(n) }
    val batchAgg = delta.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val merged = state.map(_.unionByName(batchAgg)).getOrElse(batchAgg)
    merged.groupBy(groupCols.map(col): _*)
      .agg(sum(col(countName)).cast("long").as(countName),
        sums.map { case (n, _) => sum(col(n)).as(n) }: _*)
      .filter(col(countName) =!= 0L)
  }

  /** Repair MIN/MAX state after retractions: only groups the delta
    * RETRACTED from are recomputed, from the authoritative live
    * relation restricted to those groups (a semi join — the recompute
    * is affected-groups-sized, not view-sized). Groups the delta only
    * inserted into need no repair (min/max absorb inserts via
    * [[merge]]). Returns the view with affected groups' min/max
    * replaced; a group emptied by the delta disappears.
    */
  def repairMinMax(view: DataFrame, liveBase: DataFrame, delta: DataFrame,
      signCol: String, groupCols: Seq[String],
      minMaxSpecs: Seq[AggSpec]): DataFrame = {
    val affected = delta.filter(col(signCol) < 0)
      .select(groupCols.map(col): _*).distinct()
    val recomputed = aggregate(
      liveBase.join(affected, groupCols, "left_semi"), groupCols, minMaxSpecs)
    val untouched = view.join(affected, groupCols, "left_anti")
    val repaired = view.join(affected, groupCols, "left_semi")
      .drop(minMaxSpecs.map(_.name): _*)
      .join(recomputed, groupCols)
    untouched.unionByName(repaired, allowMissingColumns = false)
  }
}
