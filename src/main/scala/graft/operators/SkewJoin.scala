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

  /** Key-skew diagnostics — the measurement that DECIDES when
    * [[saltedJoin]]/AQE skew handling is needed: per-key group sizes
    * summarized as `(metric, value)` rows — key count, row count, max
    * group, exact p50/p99 group size, skew ratio in ppm
    * (max·10⁶·n_keys div n_rows; 10⁶ = perfectly uniform), and the
    * `topK` heaviest keys with their counts.
    *
    * Scale shape: ONE shuffle (the per-key count, map-side combined).
    * Quantiles of the group-size distribution come from a SIZE
    * HISTOGRAM — group-size frequencies are re-aggregated to
    * |distinct sizes| rows (tiny: group sizes are small integers), so
    * the only global-ordered window runs over the histogram, never
    * over |keys| rows. Heavy keys use TakeOrderedAndProject (top-k,
    * no global sort); totals are 1-row aggregates that broadcast.
    * The per-key count relation is persisted under the [[CacheScope]]
    * — histogram, totals and top-k all read it.
    */
  def keySkewReport(df: DataFrame, keyCol: String, topK: Int = 5)(
      implicit cs: CacheScope): DataFrame = {
    require(topK >= 1 && topK <= 99)
    val cnts = cs.persist(df.groupBy(col(keyCol).cast("long").as("key"))
      .agg(count(lit(1)).as("cnt")))
    val tot = cnts.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_group"))
    val W = org.apache.spark.sql.expressions.Window
    val cum = cnts.groupBy(col("cnt")).agg(count(lit(1)).as("freq"))
      .withColumn("__cum", sum(col("freq")).over(
        W.orderBy(col("cnt")).rowsBetween(W.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot))
    def pctl(p: Int) = cum.filter(col("__cum") * 100 >= col("n_keys") * p)
      .agg(min(col("cnt")).as("value"))
      .select(lit(s"p${p}_group").as("metric"), col("value"))
    val totRows = tot.select(expr(
      "stack(4, 'n_keys', n_keys, 'n_rows', n_rows, 'max_group', max_group, " +
        "'skew_ppm', (max_group * 1000000 * n_keys) div n_rows) AS (metric, value)"))
    val top = cnts.orderBy(col("cnt").desc, col("key")).limit(topK)
      .withColumn("__rn", row_number().over(
        W.orderBy(col("cnt").desc, col("key"))))
      .select(concat(lit("top"), col("__rn")).as("t"), col("key"), col("cnt"))
      .select(expr("stack(2, concat(t, '_key'), key, concat(t, '_cnt'), cnt) AS (metric, value)"))
    totRows.unionByName(pctl(50)).unionByName(pctl(99)).unionByName(top)
      .orderBy(col("metric"))
  }

  /** HYBRID hot-key salting — the production refinement of
    * [[saltedJoin]]: blanket salting replicates the ENTIRE small side
    * S×, taxing every cold key to fix a handful of hot ones. Here the
    * big side splits on membership in `hotKeys` (a handful of values —
    * from [[keySkewReport]]'s top-k or a
    * [[graft.operators.CountMin]] probe — compiled into an IN
    * predicate, never a join): the hot slice joins salted against a
    * small side replicated S× FOR THE HOT KEYS ONLY, the cold
    * majority joins completely untouched, and the union is the exact
    * unsalted result (each row takes exactly one path; a key leaking
    * into both paths would double rows — oracle-visible). At 100 TB:
    * cold-path shuffle and small side stay 1×; only |hotKeys|·S extra
    * dimension rows exist anywhere.
    */
  /** Hot-key detection WITHOUT a second full scan: probe the SMALL
    * side's key values (for an equi-join, the only keys that can
    * appear in the result) against a [[CountMin]] sketch of the big
    * side's key column, and return those whose estimated frequency
    * reaches `minCount`, heaviest first, capped at `maxHotKeys`. The
    * sketch is one map-side-combined pass over the big side (shuffle
    * state is sketch-sized, never corpus-sized) and the probe
    * broadcasts the sketch against the dimension — at 100 TB this
    * replaces q54's exact per-key pre-count, whose groupBy shuffles
    * the big side's full key universe. CM error is ONE-SIDED
    * (est ≥ true), so a collision can only promote a cold key into
    * the hot list — harmless over-salting — never hide a hot one:
    * exactness of [[hybridSkewJoin]] is unaffected by sketch error.
    */
  def sketchHotKeys(
      sketch: DataFrame,
      candidates: DataFrame,
      keyCol: String,
      minCount: Long,
      depth: Int,
      width: Int,
      maxHotKeys: Int = 64): Seq[Seq[Any]] = {
    require(minCount >= 1 && maxHotKeys >= 1)
    candidates.select(col(keyCol)).distinct()
      .select(col(keyCol), posexplode(
        CountMin.cellsOf(col(keyCol).cast("string"), depth, width))
        .as(Seq("row", "cell")))
      .join(broadcast(sketch), Seq("row", "cell"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
      .filter(col("est") >= minCount)
      .orderBy(col("est").desc, col(keyCol))
      .limit(maxHotKeys)
      .collect().map(r => Seq[Any](r.get(0))).toSeq
  }

  /** The self-contained sketch-planned join: sketch the big side's
    * key, detect hot keys via [[sketchHotKeys]], and dispatch — no
    * hot keys means a plain join (zero overhead for unskewed data);
    * otherwise [[hybridSkewJoin]] salts exactly the hot slice. The
    * result is the exact unsalted join either way; only the PLAN
    * changes with the data's skew. This is the planner loop a
    * warehouse runs from table statistics, expressed over a
    * single-pass mergeable sketch that an ingest pipeline can also
    * maintain incrementally ([[CountMin.merge]]) — then the planning
    * scan costs nothing at all.
    */
  def sketchPlannedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      minHotCount: Long,
      saltBuckets: Int = 16,
      depth: Int = 4,
      width: Int = 1024,
      joinType: String = "inner",
      maxHotKeys: Int = 64): DataFrame = {
    val sketch = CountMin.build(big.select(col(key)), key, depth, width)
      .persist() // bound probe + candidate probe share one build pass
    try {
      // The row-max minimum bounds EVERY key's count from above
      // ([[CountMin.heaviestKeyBound]]), so when it clears the
      // threshold no key can be hot and the per-candidate probe —
      // the scan of the dimension's keys against the sketch — is
      // skipped outright. Unskewed data (the common case) pays one
      // sketch build plus one sketch-sized aggregate, nothing keyed.
      if (CountMin.heaviestKeyBound(sketch) < minHotCount)
        big.join(small, Seq(key), joinType)
      else {
        val hot = sketchHotKeys(sketch, small, key, minHotCount, depth,
          width, maxHotKeys)
        if (hot.isEmpty) big.join(small, Seq(key), joinType)
        else hybridSkewJoin(big, small, Seq(key), hot, saltBuckets, joinType)
      }
    } finally sketch.unpersist(blocking = false)
  }

  def hybridSkewJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      hotKeys: Seq[Seq[Any]],
      saltBuckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(hotKeys.nonEmpty, "no hot keys — use a plain join")
    require(hotKeys.forall(_.size == keys.size), "hot key arity mismatch")
    // right/full-outer would carry the replicated small side's
    // UNMATCHED copies through the hot path (S rows where the plain
    // join has one) — only inner/left flavors survive the replication
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"joinType '$joinType' not exactness-preserving under salting " +
        "(right/full outer multiply unmatched build rows)")
    val isHot: Column = hotKeys.map { hk =>
      keys.zip(hk).map { case (c, v) => col(c) <=> lit(v) }.reduce(_ && _)
    }.reduce(_ || _)
    val hot = saltedJoin(big.filter(isHot), small.filter(isHot), keys,
      saltBuckets, joinType)
    val cold = big.filter(!isHot).join(small.filter(!isHot), keys, joinType)
    hot.unionByName(cold)
  }
}
