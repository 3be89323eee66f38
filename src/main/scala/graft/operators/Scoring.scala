package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.TextFunctions

/** Linear text-classifier inference — the fastText-style quality/filter
  * model every large-scale corpus pipeline runs over its documents
  * (score each doc with a trained bag-of-words model, keep the
  * accepted side). The model here is a vocabulary of per-token weights
  * plus a bias; inference is
  *
  *   logit = bias + (Σ_{tok ∈ doc} w(tok)) / n_tokens
  *
  * (mean-of-token-weights, tokens counted with multiplicity, unknown
  * tokens weight 0 — the fastText average-of-embeddings shape in one
  * dimension).
  *
  * Exactness discipline: weights are integer milli-units and the logit
  * is never materialized as a float. The decision boundary logit > 0 is
  * equivalent to the all-integer `n·bias_milli + Σ w_milli > 0`
  * (n > 0), so scores and labels are bit-identical across engines and
  * the DuckDB oracle replays them verbatim — no float-summation-order
  * hazard.
  *
  * Scale shape: one explode of the token stream, a broadcast join
  * against the (tiny) vocabulary, and one hash aggregate keyed by the
  * document id. No window, no driver-side state; the model rides along
  * as a broadcast exactly as a real exported-weights model would at
  * 100 TB.
  */
object Scoring {

  /** Demo model over the synthetic corpus vocabulary: milli-weights,
    * positive = quality signal, negative = junk signal. The oracle SQL
    * is GENERATED from this same Seq (see AnalyticsQueries.t16) so the
    * two sides cannot desynchronize.
    */
  val QualityVocab: Seq[(String, Long)] = Seq(
    "fast" -> 180L, "spark" -> 150L, "vector" -> 140L, "stream" -> 120L,
    "query" -> 100L, "join" -> 80L, "merge" -> 60L, "window" -> 50L,
    "table" -> 40L, "data" -> 30L, "the" -> 10L, "a" -> 5L,
    "slow" -> -200L, "dup" -> -250L, "small" -> -90L, "batch" -> -40L,
    "line" -> -30L, "part" -> -20L)

  val DefaultBiasMilli: Long = -25L

  /** Score every document: returns
    * (id, n_tokens, matched, score_num, accept) where
    * score_num = n_tokens·biasMilli + Σ matched milli-weights and
    * accept = score_num > 0. Documents with zero vocabulary hits are
    * kept (left join), scored on bias alone.
    */
  def classifierScore(
      df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[(String, Long)] = QualityVocab,
      biasMilli: Long = DefaultBiasMilli): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val vocabDf = vocab.toDF("tok", "w_milli")

    val base = df.select(col(idCol).as("id"),
      TextFunctions.tokenCount(col(textCol)).as("n_tokens"))

    val hits = df
      .select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .join(broadcast(vocabDf), Seq("tok"))
      .groupBy("id")
      .agg(count(lit(1)).as("matched"), sum(col("w_milli")).as("sum_w"))

    base.join(hits, Seq("id"), "left")
      .select(col("id"),
        col("n_tokens").cast(LongType).as("n_tokens"),
        coalesce(col("matched"), lit(0L)).as("matched"),
        (col("n_tokens") * lit(biasMilli) + coalesce(col("sum_w"), lit(0L)))
          .cast(LongType).as("score_num"))
      .withColumn("accept", col("score_num") > 0)
  }

  /** The vocabulary as a SQL VALUES body — shared by the oracle. */
  def vocabValuesSql(vocab: Seq[(String, Long)] = QualityVocab): String =
    vocab.map { case (t, w) => s"('$t', ${w}::BIGINT)" }.mkString(", ")
}
