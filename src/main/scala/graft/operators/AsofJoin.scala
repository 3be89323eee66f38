package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for each probe row, the latest build-side row
  * strictly before (or at, with `strict = false`) the probe's timestamp
  * that shares its key — the enrichment primitive behind "which click led
  * to this purchase", point-in-time feature lookup, and slowly-changing
  * dimension resolution.
  *
  * The naive formulations do not survive scale: a per-key range join is
  * quadratic in events per key, and the correlated `MAX(ts)` subquery
  * costs two joins and an extra aggregate shuffle over the 100 TB side.
  * This is instead the single-shuffle plan: tag both sides, union them,
  * hash-partition once by key, sort each partition by (ts, side), and
  * carry the last non-null build payload forward with a running window —
  * cost is one exchange plus one in-partition sort regardless of how
  * many build rows precede each probe row. The same shape is what the
  * streaming state-store version would compute per micro-batch.
  *
  * Determinism: build rows tying on (key, ts) are broken by the payload
  * struct itself — the sort order within a key is (ts, side, payload),
  * so the lexicographically-greatest payload is the one the running
  * `last` carries, independent of partitioning, without spending a
  * second shuffle on a pre-aggregate. Probe rows carry null payloads
  * and are invisible to the ignore-nulls `last`.
  */
object AsofJoin {

  /** `probe` keeps all its columns; `build` must carry `keys`, `tsCol`
    * and the `payload` columns, which are appended to each probe row
    * (null when no build row precedes it).
    */
  def asofLookup(
      probe: DataFrame, build: DataFrame,
      keys: Seq[String], tsCol: String,
      payload: Seq[String], strict: Boolean = true): DataFrame = {
    require(keys.nonEmpty && payload.nonEmpty, "keys and payload required")
    val probeCols = probe.columns.toSeq
    require(payload.forall(!probeCols.contains(_)),
      s"payload columns ${payload.mkString(",")} must not collide with probe columns")

    // a null-ts build row has no position on the time axis — unfiltered
    // it would sort NULLS FIRST, ahead of every probe row, and be
    // carried into all of them
    val b = build.filter(col(tsCol).isNotNull)
      .select((keys :+ tsCol).map(col) :+
        struct(payload.map(col): _*).as("__p"): _*)
    val payloadType = b.schema("__p").dataType

    // strict: a build row at the probe's exact ts must NOT be visible,
    // so it sorts after the probe row at equal ts; non-strict reverses.
    val (probeSide, buildSide) = if (strict) (0, 1) else (1, 0)
    val extras = probeCols.filterNot(keys.contains) // includes tsCol

    val pTagged = probe.select(
      (keys ++ extras).map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(probeSide).as("__side"),
        lit(null).cast(payloadType).as("__p")): _*)
    val bTagged = b.select(
      keys.map(col) ++ extras.map(c =>
        lit(null).cast(probe.schema(c).dataType).as(c)) ++ Seq(
        col(tsCol).as("__ts"), lit(buildSide).as("__side"), col("__p")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pTagged.unionByName(bTagged)
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === probeSide)
      .select(probeCols.map(col) ++
        payload.map(p => col(s"__last.$p").as(p)): _*)
  }
}
