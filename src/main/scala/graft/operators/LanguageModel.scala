package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.TextFunctions

/** N-gram language-model quality scoring — the CCNet-shaped
  * "perplexity filter" for training-data curation: train a cheap
  * bigram model on a trusted reference slice, score every document by
  * how well the model predicts its tokens, and gate the corpus on the
  * score. (The reference pipeline delegates its data-quality gates to
  * warehouse SQL — DATA_VALIDATION_QUERIES.sql,
  * validate_data_redshift_firebolt.py; this operator is the
  * corpus-quality analogue a 100 TB pre-training pipeline runs before
  * ingestion.)
  *
  * Probability model: stupid backoff (Brants et al. 2007, "Large
  * Language Models in Machine Translation") —
  *
  *   S(w₂|w₁) = c(w₁w₂)/c(w₁·)      when the bigram was seen
  *            = 0.4 · c(w₂)/N       backoff to the unigram
  *            = 0                   out-of-vocabulary
  *
  * kept integer-exact in MILLI-probability units (t13/t19's surrogate
  * discipline: every score is a ratio of corpus counts, so ranking
  * replays bit-identically in the oracle):
  *
  *   milli(w₁,w₂) = (1000·c₁₂) div c₁  |  (400·c₂) div N  |  0
  *
  * The document score is the arithmetic mean of per-token milli
  * scores — a declared surrogate for perplexity (which is the
  * geometric mean): both order documents by "how expected are this
  * document's tokens", the arithmetic form needs no transcendental
  * log so the driver gate stays hash-exact, and for a FILTER the
  * decision boundary is a threshold on either. n_oov rides along
  * (tokens unseen even as unigrams — the strongest single noise
  * signal).
  *
  * Scale shape (the 100 TB contract):
  *  - TRAIN is one corpus scan: one explode → one (w₁,w₂) hash
  *    aggregate with map-side partials; the context, unigram and
  *    total relations DERIVE from the persisted bigram counts
  *    (model-sized re-aggregations, never a second corpus pass).
  *  - The model is vocabulary-bounded (≤ |V|² rows, in practice ~the
  *    distinct-bigram count), so SCORING joins broadcast it against
  *    one exploded corpus scan; the per-document aggregate partials
  *    map-side (explode keeps a document's tokens co-partitioned), so
  *    the only full shuffle carries one row per document. A web-scale
  *    vocabulary must be pruned to top-V unigrams before training
  *    (standard CCNet practice; prune = one filter on c₂) — set
  *    `broadcastModel = false` to run the same plan with shuffle
  *    joins when the model outgrows the broadcast budget.
  */
object LanguageModel {

  /** Sentence-start pseudo-token: the first real token is conditioned
    * on it, so documents opening with an improbable word score low on
    * their first token too. Lowercase-free so it can never collide
    * with a real token from [[TextFunctions.tokens]] (which lowercases).
    */
  val SentenceStart = "<S>"

  /** Trained bigram model: count relations, all vocabulary-bounded.
    * `bigrams` ([groups…,] w1, w2, c12) is the persisted base;
    * `contexts` (…, w1, c1), `unigrams` (…, w2, c2) and `totals`
    * (…, n_train — one row per group, one total when ungrouped) are
    * derived re-aggregations of it.
    */
  final case class BigramLm(
      bigrams: DataFrame, contexts: DataFrame,
      unigrams: DataFrame, totals: DataFrame)

  /** The shared output tail of every scorer: per-document aggregate of
    * (__milli, __oov) token rows, re-attached to the input so token-
    * less documents emit zeroed rows, avg_milli last. One definition —
    * the column contract (names, LongType, zero-fill) is what the
    * t35/t36/t37/w43 oracles hash, so it must not fork per scorer.
    */
  private def aggregateScores(scored: DataFrame, df: DataFrame,
      idCol: String, groupCols: Seq[String] = Nil): DataFrame = {
    val agg = scored.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_tokens"),
      sum(col("__oov")).as("n_oov"),
      sum(col("__milli")).as("sum_milli"))
    df.select(col(idCol) +: groupCols.map(col): _*)
      .join(agg, Seq(idCol), "left")
      .select(col(idCol) +: groupCols.map(col) :+
        coalesce(col("n_tokens"), lit(0L)).cast(LongType).as("n_tokens") :+
        coalesce(col("n_oov"), lit(0L)).cast(LongType).as("n_oov") :+
        coalesce(col("sum_milli"), lit(0L)).cast(LongType).as("sum_milli"): _*)
      .withColumn("avg_milli",
        when(col("n_tokens") > 0, expr("sum_milli div n_tokens"))
          .otherwise(lit(0L)))
  }

  /** (id[, groups…], w1, w2) bigram stream: one row per TOKEN,
    * conditioned on its predecessor (the first token on
    * [[SentenceStart]]). Empty or whitespace-only text yields no rows.
    */
  def bigramTokens(df: DataFrame, idCol: String, textCol: String,
      groupCols: Seq[String] = Nil): DataFrame =
    df.select(col(idCol) +: groupCols.map(col) :+
        TextFunctions.tokens(col(textCol)).as("__toks"): _*)
      // zip_with pads to the LONGER array: an empty token list would
      // zip against the one-element ["<S>"] prefix into a null-w2 row
      .filter(size(col("__toks")) > 0)
      .withColumn("__prev", concat(array(lit(SentenceStart)),
        expr("slice(__toks, 1, greatest(size(__toks) - 1, 0))")))
      .select(col(idCol) +: groupCols.map(col) :+
        explode(zip_with(col("__prev"), col("__toks"),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"): _*)
      .select(col(idCol) +: groupCols.map(col) :+
        col("__bg.w1").as("w1") :+ col("__bg.w2").as("w2"): _*)

  /** Train on `df` (the trusted reference slice). ONE corpus pass: the
    * bigram aggregate persists (vocabulary-bounded, via the caller's
    * [[CacheScope]]) and every other model relation derives from it —
    * c₁ = Σ_w₂ c₁₂, c₂ = Σ_w₁ c₁₂ (each token is the w₂ of exactly one
    * bigram), N = Σ c₁₂.
    *
    * With `groupCols` every model relation is keyed by the group too —
    * ONE model per group trained in the same single pass (the CCNet
    * per-language design: a document is judged against ITS language's
    * model, not a global mixture). Model size stays group-count ×
    * vocabulary-bounded.
    */
  def train(df: DataFrame, idCol: String, textCol: String,
      groupCols: Seq[String] = Nil)(implicit cs: CacheScope): BigramLm = {
    val g = groupCols.map(col)
    val bi = cs.persist(bigramTokens(df, idCol, textCol, groupCols)
      .groupBy(g :+ col("w1") :+ col("w2"): _*).agg(count(lit(1)).as("c12")))
    BigramLm(
      bigrams = bi,
      contexts = bi.groupBy(g :+ col("w1"): _*).agg(sum(col("c12")).as("c1")),
      unigrams = bi.groupBy(g :+ col("w2"): _*).agg(sum(col("c12")).as("c2")),
      totals = bi.groupBy(g: _*).agg(sum(col("c12")).as("n_train")))
  }

  /** (id, w1, w2, w3) trigram stream: one row per TOKEN, conditioned
    * on its two predecessors (positions before the document start read
    * [[SentenceStart]], the standard double-pad). The (w2, w3)
    * projection of this stream IS the [[bigramTokens]] stream — which
    * is what lets the trigram model derive every lower order from one
    * aggregate.
    */
  def trigramTokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .withColumn("__p1", concat(array(lit(SentenceStart)),
        expr("slice(__toks, 1, greatest(size(__toks) - 1, 0))")))
      // truncate the double-pad to the token count: a 1-token document
      // would otherwise leave __p2 one LONGER than the zip partners and
      // zip_with pads with a null row
      .withColumn("__p2", expr(
        "slice(concat(array('" + SentenceStart + "', '" + SentenceStart +
          "'), slice(__toks, 1, greatest(size(__toks) - 2, 0))), 1, size(__toks))"))
      .select(col(idCol), explode(zip_with(col("__p2"),
        zip_with(col("__p1"), col("__toks"),
          (b, c) => struct(b.as("w2"), c.as("w3"))),
        (a, bc) => struct(a.as("w1"), bc.getField("w2").as("w2"),
          bc.getField("w3").as("w3")))).as("__tg"))
      .select(col(idCol), col("__tg.w1").as("w1"),
        col("__tg.w2").as("w2"), col("__tg.w3").as("w3"))

  /** Trained trigram model: ONE corpus aggregate (w1,w2,w3 counts);
    * every backoff relation derives from it model-sized — c(w1w2·) by
    * summing over w3, the bigram tier c(w2w3) by summing over w1
    * (each token is the w3 of exactly one trigram), its context
    * c(w2·) from that, unigrams and N likewise.
    */
  final case class TrigramLm(
      trigrams: DataFrame, ctx12: DataFrame,
      bigrams23: DataFrame, ctx2: DataFrame,
      unigrams: DataFrame, totals: DataFrame)

  def trainTrigram(df: DataFrame, idCol: String, textCol: String)(
      implicit cs: CacheScope): TrigramLm = {
    val tri = cs.persist(trigramTokens(df, idCol, textCol)
      .groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c123")))
    val bi23 = tri.groupBy(col("w2"), col("w3")).agg(sum(col("c123")).as("c23"))
    TrigramLm(
      trigrams = tri,
      ctx12 = tri.groupBy(col("w1"), col("w2")).agg(sum(col("c123")).as("c12")),
      bigrams23 = bi23,
      ctx2 = bi23.groupBy(col("w2")).agg(sum(col("c23")).as("c2")),
      unigrams = bi23.groupBy(col("w3")).agg(sum(col("c23")).as("c3")),
      totals = tri.agg(sum(col("c123")).as("n_train")))
  }

  /** Trigram stupid backoff in the same integer milli units as
    * [[score]], one more tier deep:
    *   (1000·c₁₂₃) div c₁₂ | (400·c₂₃) div c₂ | (160·c₃) div N | 0
    * (0.4 per backoff level — 0.4² = 0.16 at the unigram tier). Same
    * output contract as the bigram scorer.
    */
  def scoreTrigram(df: DataFrame, lm: TrigramLm, idCol: String,
      textCol: String, broadcastModel: Boolean = true): DataFrame = {
    def side(m: DataFrame): DataFrame = if (broadcastModel) broadcast(m) else m
    val scored = trigramTokens(df, idCol, textCol)
      .join(side(lm.trigrams), Seq("w1", "w2", "w3"), "left")
      .join(side(lm.ctx12), Seq("w1", "w2"), "left")
      .join(side(lm.bigrams23), Seq("w2", "w3"), "left")
      .join(side(lm.ctx2), Seq("w2"), "left")
      .join(side(lm.unigrams), Seq("w3"), "left")
      .crossJoin(broadcast(lm.totals))
      .withColumn("__milli", expr(
        "CASE WHEN c123 IS NOT NULL THEN (1000 * c123) div c12 " +
          "WHEN c23 IS NOT NULL THEN (400 * c23) div c2 " +
          "WHEN c3 IS NOT NULL THEN (160 * c3) div n_train " +
          "ELSE 0 END"))
      .withColumn("__oov", when(col("c123").isNull && col("c23").isNull &&
        col("c3").isNull, 1L).otherwise(0L))
    aggregateScores(scored, df, idCol)
  }

  /** Score every document of `df` under the model: per-token stupid-
    * backoff milli-probabilities summed per document. Output one row
    * per input document (token-less documents score 0 with
    * n_tokens = 0): (id[, groups…], n_tokens, n_oov, sum_milli,
    * avg_milli). `groupCols` must match training: every model join
    * adds the group to its key, so a document only ever consults its
    * own group's counts (a group absent from training scores all-OOV,
    * exactly like an unseen vocabulary).
    */
  def score(df: DataFrame, lm: BigramLm, idCol: String, textCol: String,
      groupCols: Seq[String] = Nil, broadcastModel: Boolean = true): DataFrame = {
    def side(m: DataFrame): DataFrame = if (broadcastModel) broadcast(m) else m
    val withTotals: DataFrame => DataFrame = bg =>
      if (groupCols.isEmpty) bg.crossJoin(broadcast(lm.totals)) // 1 row
      else bg.join(side(lm.totals), groupCols, "left")
    val scored = withTotals(bigramTokens(df, idCol, textCol, groupCols)
      .join(side(lm.bigrams), groupCols ++ Seq("w1", "w2"), "left")
      .join(side(lm.contexts), groupCols :+ "w1", "left")
      .join(side(lm.unigrams), groupCols :+ "w2", "left"))
      .withColumn("__milli", expr(
        "CASE WHEN c12 IS NOT NULL THEN (1000 * c12) div c1 " +
          "WHEN c2 IS NOT NULL THEN (400 * c2) div n_train " +
          "ELSE 0 END"))
      .withColumn("__oov",
        when(col("c12").isNull && col("c2").isNull, 1L).otherwise(0L))
    aggregateScores(scored, df, idCol, groupCols)
  }
}
