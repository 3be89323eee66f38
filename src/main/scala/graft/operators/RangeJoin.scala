package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-range (band) join without an equi-key: pairs (l, r) with
  * `r.ts ∈ [l.ts, l.ts + horizon)`.
  *
  * Spark plans a raw inequality join as BroadcastNestedLoopJoin — an
  * all-pairs scan that dies at the first real corpus. Bucketing restores
  * an equi-key: with bucket = ⌊µs / horizon⌋, a qualifying pair's
  * buckets differ by at most 1, so the left side fans out to
  * {b, b + 1}, the right side keeps its home bucket, and the join runs
  * as an ordinary shuffle hash join on the bucket key, partitioned and
  * AQE-planned like any other. The two emitted buckets are distinct, so
  * each qualifying pair is produced exactly once — no dedup pass. The
  * exact `[l, l+h)` predicate then prunes the within-bucket false
  * candidates.
  *
  * Cost: |left|·2 + |right| shuffled rows, and per-bucket work bounded
  * by the events sharing a horizon-sized time slice — the natural skew
  * unit for event streams (a hot slice is a hot slice under any plan).
  * Timestamps compare in microseconds (the engine's native precision),
  * so boundary rows land identically in every engine.
  */
object RangeJoin {

  /** `leftTs`/`rightTs` must be differently-named timestamp columns;
    * all other column names must be disjoint too (the caller projects
    * before joining — same contract as a raw `join`). Null timestamps
    * never match (`unix_micros(null)` is null and the bucket join drops
    * them), mirroring SQL inequality-join semantics.
    */
  def bucketed(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, horizonUs: Long): DataFrame = {
    require(horizonUs > 0, "horizon must be positive")
    val l = left
      .withColumn("__lb", expr(s"unix_micros($leftTs) div $horizonUs"))
      .withColumn("__bucket", explode(array(col("__lb"), col("__lb") + 1)))
      .drop("__lb")
    val r = right
      .withColumn("__bucket", expr(s"unix_micros($rightTs) div $horizonUs"))
    l.join(r, Seq("__bucket"))
      .filter(col(rightTs) >= col(leftTs) &&
        expr(s"unix_micros($rightTs) < unix_micros($leftTs) + $horizonUs"))
      .drop("__bucket")
  }
}
