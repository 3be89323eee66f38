package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus collocation mining — adjacent-token bigrams that beat
  * independence by a PMI-style lift threshold: the phrase-mining step
  * of a training-data pipeline (tokenizer merge candidates,
  * stop-phrase lists, boilerplate phrase seeds).
  *
  * The gate never computes a logarithm or a ratio: lift
  * `c_xy·N / (c_x·c_y) > num/den` is decided as the 64-bit integer
  * cross-product `den·c_xy·N > num·c_x·c_y`, so both engines compare
  * identical integers — bit-exact, no FP anywhere. (Products fit:
  * even at c_xy ~ 10^2, N ~ 10^12 the left side is ~10^15 < 2^63.)
  */
object Collocations {

  /** Bigram collocations of `textCol` with observed count ≥ `minCount`
    * and lift > `liftNum/liftDen`, as
    * `(w1, w2, c_xy, c_x, c_y)` ordered by (c_xy DESC, w1, w2).
    *
    * Scale shape: exactly two corpus-linear passes — one unigram
    * explode→count and one bigram explode→count, both map-side
    * combined. The unigram relation is persisted under the
    * [[CacheScope]] because the plan references it three times (c_x
    * join, c_y join, and N = Σc — which is derived from it rather
    * than re-scanning the corpus); without the persist each reference
    * would re-run the full explode-aggregate. The `c_xy ≥ minCount`
    * prefilter shrinks the bigram relation before any join; the 1-row
    * N broadcasts. The unigram joins are left to Catalyst/AQE: vocab
    * is Zipf-compact but corpus-dependent, so no unconditional
    * broadcast hint.
    */
  def pmiPairs(docs: DataFrame, textCol: String, minCount: Long,
      liftNum: Long, liftDen: Long)(implicit cs: CacheScope): DataFrame = {
    require(minCount >= 1 && liftNum > 0 && liftDen > 0,
      "minCount must be >= 1 and the lift fraction positive")
    val base = docs.select(TextFunctions.tokens(col(textCol)).as("toks"))
    val uni = cs.persist(base.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c")))
    val n = uni.agg(sum(col("c")).as("__n"))
    val bi = base.filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"))
        .as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    bi.join(uni.select(col("w").as("w1"), col("c").as("c_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_y")), "w2")
      .crossJoin(broadcast(n))
      .filter(lit(liftDen) * col("c_xy") * col("__n") >
        lit(liftNum) * col("c_x") * col("c_y"))
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"))
      .orderBy(col("c_xy").desc, col("w1"), col("w2"))
  }
}
