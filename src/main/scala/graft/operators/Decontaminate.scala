package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find (and drop) corpus documents that
  * share word n-grams with an evaluation set — the standard guard
  * against test-set leakage when assembling training corpora.
  *
  * Scale shape: the eval side is a benchmark suite — megabytes against
  * a corpus of terabytes — so its distinct gram set is broadcast and the
  * corpus side is a single narrow scan + broadcast semi/inner join: no
  * corpus shuffle at all until the per-doc aggregation, which only sees
  * rows that matched (a vanishing fraction of the corpus). A corpus doc
  * is contaminated if it shares ≥ 1 n-gram; the report also counts how
  * many grams and how many distinct eval docs it collided with, which is
  * what an operator actually reviews before deleting data.
  */
object Decontaminate {

  /** Contamination report over `pool`: one row per contaminated doc —
    * (idCol, matched_grams, matched_eval_docs). Clean docs are absent.
    */
  def report(
      pool: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val poolGrams = TextDedup.shingles(pool, idCol, textCol, n)
    val evalGrams = broadcast(
      TextDedup.shingles(evalSet, idCol, textCol, n)
        .select(col("id").as("__eval_id"), col("shingle"))
        .distinct())
    poolGrams.join(evalGrams, "shingle")
      .groupBy(col("id").as(idCol))
      .agg(
        countDistinct(col("shingle")).as("matched_grams"),
        countDistinct(col("__eval_id")).as("matched_eval_docs"))
  }

  /** The eval-centric transpose of [[report]]: per EVAL document, how
    * much of it leaks into the pool — (idCol, n_grams, n_hit,
    * overlap_pct) where n_hit counts the eval doc's distinct n-grams
    * found ANYWHERE in the pool and overlap_pct = 100·n_hit div
    * n_grams. This is the memorization-risk view: an eval doc with
    * high overlap is effectively in the training set even if no single
    * pool doc contains all of it. Same scale shape as [[report]] — the
    * pool is scanned once with the eval grams broadcast; only matched
    * rows reach the aggregation; a LEFT join from the (tiny) per-eval
    * gram counts preserves zero-overlap eval docs.
    */
  def evalOverlap(
      pool: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val evalGrams = TextDedup.shingles(evalSet, idCol, textCol, n)
      .select(col("id").as("__eval_id"), col("shingle"))
      .distinct()
    val totals = evalGrams.groupBy(col("__eval_id"))
      .agg(count(lit(1)).as("n_grams"))
    // dedup (eval doc, gram) hits across pool docs INSIDE the aggregate:
    // a gram shared with thousands of pool docs still counts once
    val hits = TextDedup.shingles(pool, idCol, textCol, n)
      .join(broadcast(evalGrams), "shingle")
      .groupBy(col("__eval_id"))
      .agg(countDistinct(col("shingle")).as("n_hit"))
    totals.join(hits, Seq("__eval_id"), "left")
      .select(col("__eval_id").as(idCol), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        expr("100 * coalesce(n_hit, 0) div n_grams").as("overlap_pct"))
  }

  /** The clean corpus: `pool` minus every contaminated doc (broadcast
    * anti join against the report's id set).
    */
  def clean(
      pool: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val contaminated = report(pool, evalSet, idCol, textCol, n)
      .select(col(idCol).as("__contaminated_id"))
    pool.join(broadcast(contaminated),
        col(idCol) === col("__contaminated_id"), "left_anti")
  }
}
