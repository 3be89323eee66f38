package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join by FIXED-WIDTH BINNING — the scale path for
  * the non-equi predicate `l.s < r.e AND r.s < l.e`, which Spark can
  * only execute as a broadcast nested loop (quadratic compare) or a
  * cartesian product. Each interval replicates to the bins it
  * touches, the join becomes an EQUI-join on (keys, bin) — hashed,
  * shuffled, AQE-planned like any other — and the overlap predicate
  * filters within bins. A pair overlapping several bins would emit
  * duplicates; instead of a distinct (a second corpus-sized
  * shuffle), the FIRST-OVERLAPPING-BIN rule keeps the pair only in
  * the bin containing `greatest(l.s, r.s)` — every overlapping pair
  * has exactly one such bin, so the result is exact with zero
  * dedup shuffle. Replication factor is interval_span/binWidth:
  * pick the width near the typical span (the spatial-join
  * grid-sizing rule); skewed long intervals replicate more but land
  * in different bins, spreading rather than hotspotting.
  *
  * Intervals are HALF-OPEN [s, e): touching intervals do not
  * overlap; empty intervals (s >= e) never match.
  */
object IntervalJoin {

  /** Overlap-join `left` and `right` on co-equal `keys` plus time
    * overlap of [`sCol`, `eCol`). Output columns are the left's
    * prefixed `l_` and the right's `r_` (keys unprefixed, equal by
    * construction).
    */
  def binnedOverlap(
      left: DataFrame,
      right: DataFrame,
      sCol: String,
      eCol: String,
      binWidth: Long,
      keys: Seq[String] = Seq.empty): DataFrame = {
    require(binWidth >= 1, s"binWidth $binWidth < 1")
    def bins(df: DataFrame, prefix: String): DataFrame = {
      val renamed = df.columns.filterNot(keys.contains)
        .foldLeft(df)((d, c) => d.withColumnRenamed(c, prefix + c))
      renamed.filter(col(prefix + sCol) < col(prefix + eCol))
        .withColumn("__bin", explode(sequence(
          expr(s"$prefix$sCol div $binWidth"),
          expr(s"($prefix$eCol - 1) div $binWidth"))))
    }
    val l = bins(left, "l_")
    val r = bins(right, "r_")
    l.join(r, keys :+ "__bin")
      .filter(col(s"l_$sCol") < col(s"r_$eCol") &&
        col(s"r_$sCol") < col(s"l_$eCol"))
      // exactly one bin holds the overlap's start — keep the pair there
      .filter(col("__bin") ===
        expr(s"greatest(l_$sCol, r_$sCol) div $binWidth"))
      .drop("__bin")
  }
}
