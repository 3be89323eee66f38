package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group-wise quantiles over an integer measure (doc lengths, token
  * counts, latencies) — the length-distribution profile every curation
  * pipeline reports before and after filtering.
  *
  * Two paths:
  *  - [[exactQuantiles]]: rank-based, discrete (the value AT position
  *    ceil(p·n/q), never an interpolated float) — integer in, integer
  *    out, so the DuckDB oracle replays it bit-for-bit. Cost is one
  *    shuffle by group plus an in-partition sort; an array_contains
  *    filter on the target positions prunes to ≤q−1 rows per group
  *    BEFORE the explode, so the generate inflates only survivors,
  *    never the corpus. Sane even at scale when groups are few and
  *    rows per group fit a sorted window partition.
  *  - [[approxQuantiles]]: `percentile_approx` — single pass, mergeable
  *    sketches, no per-group sort; the 100 TB default when a bounded
  *    rank error is acceptable.
  */
object Quantiles {

  /** One row per (group, p) for p in 1..q−1: the exact p/q-quantile of
    * `valueCol`, with `tieCol` making the underlying order total.
    */
  def exactQuantiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, tieCol: String, q: Int): DataFrame = {
    require(q >= 2)
    val grp = groupCols.map(col)
    val ranked = df
      .withColumn("__rn", row_number().over(
        Window.partitionBy(grp: _*).orderBy(col(valueCol), col(tieCol))))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(grp: _*)))
    ranked
      // prune to the ≤q−1 target-position rows per group first — the
      // explode below then inflates only survivors, not every ranked row
      .filter(expr(s"array_contains(transform(sequence(1, ${q - 1})," +
        s" p -> (p * __cnt + ${q - 1}) div $q), cast(__rn as bigint))"))
      .withColumn("quantile", explode(array((1 until q).map(lit): _*)))
      // position of the p/q-quantile: ceil(p·cnt/q) in pure integers
      // (re-checked per p: with cnt < q−1 one row can carry several p's)
      .filter(col("__rn") === expr(s"(quantile * __cnt + ${q - 1}) div $q"))
      .select(grp ++ Seq(col("quantile"), col(valueCol)): _*)
  }

  /** Sketch-based quantiles: one row per group, `qs` as an array. */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, qs: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(valueCol),
        array(qs.map(lit): _*), lit(accuracy)).as("quantiles"))
}
