package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §4 / builder directive:
  * "salting for skew").
  *
  * AQE's skew-join handling splits oversized sort-merge partitions at
  * runtime, which covers most cases; explicit salting remains the tool
  * when (a) the build side must broadcast-replicate (AQE can't split a
  * broadcast), or (b) one key dominates so heavily that even split
  * partitions stay hot. The classic construction:
  *
  *   big side:   salt = pmod(hash(monotonic row id), S)
  *   small side: replicated S× with salt = 0..S-1
  *   join on (key, salt) — the hot key's rows spread over S partitions.
  *
  * Correctness: every big-side row meets exactly one copy of its key's
  * small-side row, so the join result is identical to the unsalted join.
  */
object SkewJoin {

  /** Inner equi-join of `big` (skewed) with `small` on `keys`, salted
    * with `saltBuckets` partitions per key. `small` must be key-unique on
    * `keys` (a dimension); it is exploded `saltBuckets`× before the join.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltBuckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets >= 1)
    val saltCol = "__salt"
    // deterministic pseudo-random salt derived from the whole big row
    // (hash of all columns): uniform without requiring a row id
    val bigSalted = big.withColumn(saltCol,
      pmod(hash(big.columns.map(col).toSeq: _*), lit(saltBuckets)))
    val smallReplicated = small.withColumn(saltCol,
      explode(array((0 until saltBuckets).map(lit): _*)))
    bigSalted
      .join(smallReplicated, keys :+ saltCol, joinType)
      .drop(saltCol)
  }

  /** Salted aggregation: two-phase groupBy for a pathologically hot key —
    * phase 1 aggregates (key, salt), phase 2 merges partials. Spark's
    * hash aggregate already does map-side partials; this exists for
    * aggregates whose partial state is too big for map-side combine to
    * help (e.g. exact distincts per hot key).
    */
  def saltedDistinctCount(
      df: DataFrame,
      keys: Seq[String],
      distinctCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val saltCol = "__salt"
    df.withColumn(saltCol, pmod(hash(col(distinctCol)), lit(saltBuckets)))
      // phase 1: per (key, salt) — the hot key spreads over S reducers;
      // distinct values land in exactly one salt bucket each, so bucket
      // counts add up exactly
      .groupBy((keys :+ saltCol).map(col): _*)
      .agg(count_distinct(col(distinctCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"${distinctCol}_distinct"))
  }
}
