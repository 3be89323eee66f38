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
  * linear, like the shingle relations) at k=1 and Σ|s|²/2 at k=2,
  * the join is a plain equi-join Catalyst shuffles or broadcasts by
  * size, verification touches only candidate pairs, and there is no
  * quadratic CORPUS stage anywhere. The pigeonhole generalizes
  * (SymSpell): ed(s,t) ≤ k ⟹ the ≤k-deletion neighborhoods
  * intersect — align an optimal edit script and delete, from each
  * side, the positions the script touches: ≤ k deletions each side
  * reach the same string. k caps at 2 here: the k=3 neighborhood is
  * |s|³/6 variants per string, past the point where banded sketch
  * methods (d03) win.
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

  /** `{s} ∪ D¹(s) ∪ D²(s)` — every string reachable by at most two
    * single-character deletions, deduplicated (deleting positions
    * (i,j) and (j,i) meet). Built as one nested codegen'd transform:
    * the outer element keeps the 1-deletion variant, the inner level
    * deletes once more from it.
    */
  private[graft] def deletionVariants2(s: Column): Column = {
    val d1 = deletionVariants(s)
    array_distinct(flatten(transform(d1, v => deletionVariants(v))))
  }

  private def variantsFor(s: Column, k: Int): Column = k match {
    case 1 => deletionVariants(s)
    case 2 => deletionVariants2(s)
    case _ => throw new IllegalArgumentException(
      s"k=$k unsupported (1 or 2; beyond that use the sketch family)")
  }

  private def exploded(df: DataFrame, idCol: String, strCol: String,
      side: String, k: Int): DataFrame =
    df.select(col(idCol).as(s"${side}_id"), col(strCol).as(s"${side}_s"))
      .withColumn("__variant", explode(variantsFor(col(s"${side}_s"), k)))

  /** All (left, right) pairs with levenshtein ≤ 1. Both relations
    * explode to their deletion neighborhoods, candidates equi-join on
    * the variant, verification reruns the exact distance (a pair can
    * meet through several variants — dedup BEFORE the distance so
    * each pair is verified once). Output: (l_id, r_id, l_s, r_s,
    * dist), one row per matching pair.
    */
  def joinWithin1(left: DataFrame, lId: String, lStr: String,
      right: DataFrame, rId: String, rStr: String): DataFrame =
    joinWithin(left, lId, lStr, right, rId, rStr, k = 1)

  /** General form, threshold k ∈ {1, 2}. */
  def joinWithin(left: DataFrame, lId: String, lStr: String,
      right: DataFrame, rId: String, rStr: String, k: Int): DataFrame = {
    val cands = exploded(left, lId, lStr, "l", k)
      .join(exploded(right, rId, rStr, "r", k), Seq("__variant"))
      .select(col("l_id"), col("r_id"), col("l_s"), col("r_s"))
      .distinct()
    cands
      .withColumn("dist", levenshtein(col("l_s"), col("r_s")))
      .filter(col("dist") <= k)
  }

  /** Self-join form: unordered pairs (a < b) within distance 1 —
    * fuzzy dedup of one relation against itself.
    */
  def pairsWithin1(df: DataFrame, idCol: String, strCol: String): DataFrame =
    pairsWithin(df, idCol, strCol, k = 1)

  /** Self-join at threshold k ∈ {1, 2}. */
  def pairsWithin(df: DataFrame, idCol: String, strCol: String, k: Int): DataFrame =
    joinWithin(df, idCol, strCol, df, idCol, strCol, k)
      .filter(col("l_id") < col("r_id"))
}
