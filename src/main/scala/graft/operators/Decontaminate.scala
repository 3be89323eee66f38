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
