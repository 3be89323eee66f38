package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join (threshold 1) via SYMMETRIC DELETION
  * neighborhoods — the fuzzy-match primitive entity resolution and
  * near-duplicate *name/title* dedup need, where the n-gram family
  * ([[TextDedup]]) is the wrong tool (a one-character typo shifts
  * every following shingle).
  *
  * The pigeonhole (SymSpell / Karch et al.): two strings with
  * levenshtein ≤ 1 share an element of their deletion neighborhoods
  * D(s) = {s} ∪ {s minus one character} —
  *   substitution: deleting the differing position from BOTH sides
  *   yields the same string; insertion/deletion: deleting the extra
  *   character from the longer side yields the shorter one (∈ D(t)).
  * So candidates = explode each side to its |s|+1 variants, equi-join
  * on the variant, then VERIFY with the codegen'd `levenshtein` and
  * dedup pairs — lossless, never all-pairs.
  *
  * Scale shape at 100 TB: candidate volume is Σ|s| (string-length
  * linear, like the shingle relations), the join is a plain
  * equi-join Catalyst shuffles or broadcasts by size, verification
  * touches only candidate pairs, and there is no quadratic stage
  * anywhere. Thresholds k ≥ 2 need k-deletion neighborhoods
  * (|s| choose k variants) — combinatorially heavier, deliberately
  * out of scope here.
  */
object EditDistanceJoin {

  /** `{s} ∪ single-char deletions of s`, as an array column: element
    * 0 is the identity (covers distance-0 and the short side of an
    * insertion); element i deletes character i.
    */
  private[graft] def deletionVariants(s: Column): Column =
    transform(sequence(lit(0), length(s)), i =>
      when(i === 0, s)
        .otherwise(concat(s.substr(lit(1), i - 1),
          s.substr(i + 1, length(s) - i))))

  private def exploded(df: DataFrame, idCol: String, strCol: String,
      side: String): DataFrame =
    df.select(col(idCol).as(s"${side}_id"), col(strCol).as(s"${side}_s"))
      .withColumn("__variant", explode(deletionVariants(col(s"${side}_s"))))

  /** All (left, right) pairs with levenshtein ≤ 1. Both relations
    * explode to their deletion neighborhoods, candidates equi-join on
    * the variant, verification reruns the exact distance (a pair can
    * meet through several variants — dedup BEFORE the distance so
    * each pair is verified once). Output: (l_id, r_id, l_s, r_s,
    * dist), one row per matching pair.
    */
  def joinWithin1(left: DataFrame, lId: String, lStr: String,
      right: DataFrame, rId: String, rStr: String): DataFrame = {
    val cands = exploded(left, lId, lStr, "l")
      .join(exploded(right, rId, rStr, "r"), Seq("__variant"))
      .select(col("l_id"), col("r_id"), col("l_s"), col("r_s"))
      .distinct()
    cands
      .withColumn("dist", levenshtein(col("l_s"), col("r_s")))
      .filter(col("dist") <= 1)
  }

  /** Self-join form: unordered pairs (a < b) within distance 1 —
    * fuzzy dedup of one relation against itself.
    */
  def pairsWithin1(df: DataFrame, idCol: String, strCol: String): DataFrame =
    joinWithin1(df, idCol, strCol, df, idCol, strCol)
      .filter(col("l_id") < col("r_id"))
}
