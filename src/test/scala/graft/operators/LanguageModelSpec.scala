package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bigram-LM quality scoring: the bigram stream's sentence-start
  * conditioning, the hand-computed stupid-backoff arithmetic (each
  * tier hit separately), OOV accounting, token-less documents, and
  * the scale contract — the scoring plan broadcasts the model and
  * never exchanges the token stream for the model joins.
  */
class LanguageModelSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  test("bigramTokens conditions the first token on <S> and chains the rest") {
    val bg = LanguageModel.bigramTokens(df((1L, "a b c")), "id", "text")
      .select("w1", "w2").collect().map(r => (r.getString(0), r.getString(1)))
    assert(bg.toSeq == Seq(("<S>", "a"), ("a", "b"), ("b", "c")))
  }

  test("bigramTokens yields no rows for empty or whitespace-only text") {
    val bg = LanguageModel.bigramTokens(df((1L, ""), (2L, "   ")), "id", "text")
    assert(bg.count() == 0)
  }

  test("bigramTokens lowercases, so <S> cannot collide with a real token") {
    val bg = LanguageModel.bigramTokens(df((1L, "<S> A")), "id", "text")
      .select("w1", "w2").collect().map(r => (r.getString(0), r.getString(1)))
    // the literal "<S>" in TEXT becomes lowercase "<s>" ≠ the pseudo-token
    assert(bg.toSeq == Seq(("<S>", "<s>"), ("<s>", "a")))
  }

  test("stupid-backoff tiers score by hand: bigram, unigram backoff, OOV") {
    implicit val cs: CacheScope = CacheScope.processOwned
    // train: "a b" ×2, "a c" ×1 → N=6 tokens; contexts: <S>=3, a=3
    val lm = LanguageModel.train(
      df((1L, "a b"), (2L, "a b"), (3L, "a c")), "id", "text")
    // score "a b x": (<S>,a) seen c12=3,c1=3 → 1000; (a,b) c12=2,c1=3 → 666;
    // (b,x): bigram unseen, x unseen as unigram → OOV 0
    val r1 = LanguageModel.score(df((10L, "a b x")), lm, "id", "text")
      .head()
    assert(r1.getLong(1) == 3L, "n_tokens")
    assert(r1.getLong(2) == 1L, "n_oov")
    assert(r1.getLong(3) == 1000L + 666L, "sum_milli")
    assert(r1.getLong(4) == 1666L / 3, "avg_milli")
    // score "c a": (<S>,c) bigram unseen but c IS a unigram (c2=1, N=6)
    // → 400*1 div 6 = 66; (c,a) unseen bigram, a unigram c2=3 → 400*3 div 6 = 200
    val r2 = LanguageModel.score(df((11L, "c a")), lm, "id", "text").head()
    assert(r2.getLong(2) == 0L, "no OOV")
    assert(r2.getLong(3) == 66L + 200L, "backoff sum")
    lm.bigrams.unpersist()
  }

  test("token-less documents still emit a zeroed row") {
    implicit val cs: CacheScope = CacheScope.processOwned
    val lm = LanguageModel.train(df((1L, "a b")), "id", "text")
    val out = LanguageModel.score(df((20L, ""), (21L, "a")), lm, "id", "text")
      .orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 0L && out(0).getLong(3) == 0L &&
      out(0).getLong(4) == 0L)
    assert(out(1).getLong(1) == 1L)
    lm.bigrams.unpersist()
  }

  test("scoring plan broadcasts the model; no shuffle before the doc aggregate") {
    implicit val cs: CacheScope = CacheScope.processOwned
    val lm = LanguageModel.train(df((1L, "a b c a b")), "id", "text")
    val out = LanguageModel.score(df((2L, "a b q")), lm, "id", "text")
    out.collect()
    val plan = out.queryExecution.executedPlan
    val bhj = collectWithSubqueries(plan) {
      case p if p.nodeName.contains("BroadcastHashJoin") => p
    }
    assert(bhj.size >= 3,
      s"model joins must broadcast (bigram/context/unigram):\n$plan")
    // the only exchanges allowed: the per-doc aggregate (rows = docs,
    // after map-side partials) and the final left-join back to ids —
    // never the raw token stream into a model join
    val sortMerge = collectWithSubqueries(plan) {
      case p if p.nodeName.contains("SortMergeJoin") => p
    }
    val docJoins = 1 // the id re-attach join may legitimately sort-merge
    assert(sortMerge.size <= docJoins,
      s"token stream must not shuffle into model joins:\n$plan")
    lm.bigrams.unpersist()
  }

  test("grouped models isolate languages: a doc only consults its own group") {
    import spark.implicits._
    implicit val cs: CacheScope = CacheScope.processOwned
    val train = Seq((1L, "en", "a b"), (2L, "en", "a b"),
      (3L, "de", "x y")).toDF("id", "lang", "text")
    val lm = LanguageModel.train(train, "id", "text", groupCols = Seq("lang"))
    // "a b" under lang=de: 'a'/'b' exist ONLY in the en model → all OOV
    val test = Seq((10L, "de", "a b"), (11L, "en", "a b"))
      .toDF("id", "lang", "text")
    val out = LanguageModel.score(test, lm, "id", "text",
        groupCols = Seq("lang")).orderBy("id").collect()
    // grouped output is (id, lang, n_tokens, n_oov, sum_milli, avg_milli)
    assert(out(0).getLong(3) == 2L, "de doc must not see en counts (all OOV)")
    assert(out(0).getLong(5) == 0L)
    // same text under en: (<S>,a) c12=2/c1=2 → 1000; (a,b) 2/2 → 1000
    assert(out(1).getLong(3) == 0L)
    assert(out(1).getLong(5) == 1000L)
    lm.bigrams.unpersist()
  }

  test("trigramTokens double-pads the sentence start") {
    val tg = LanguageModel.trigramTokens(df((1L, "a b c")), "id", "text")
      .select("w1", "w2", "w3").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(tg.toSeq == Seq(("<S>", "<S>", "a"), ("<S>", "a", "b"), ("a", "b", "c")))
  }

  test("trigram backoff tiers score by hand: trigram, bigram, unigram, OOV") {
    implicit val cs: CacheScope = CacheScope.processOwned
    // train "a b c" ×2, "a b d" ×1 → N = 9
    val lm = LanguageModel.trainTrigram(
      df((1L, "a b c"), (2L, "a b c"), (3L, "a b d")), "id", "text")
    // "a b c": (<S><S>a) 3/3 → 1000; (<S>ab) 3/3 → 1000; (abc) 2/3 → 666
    val r1 = LanguageModel.scoreTrigram(df((10L, "a b c")), lm, "id", "text").head()
    assert(r1.getLong(3) == 1000L + 1000L + 666L)
    // "b c": trigram (<S><S>b) unseen; bigram tier (<S>,b) unseen;
    // unigram b c3=3, N=9 → 160*3 div 9 = 53. then (<S> b c): trigram
    // unseen, bigram (b,c) c23=2, c2(b)=3 → 400*2 div 3 = 266
    val r2 = LanguageModel.scoreTrigram(df((11L, "b c")), lm, "id", "text").head()
    assert(r2.getLong(3) == 53L + 266L, s"got ${r2.getLong(3)}")
    assert(r2.getLong(2) == 0L)
    // OOV: "x" at every tier
    val r3 = LanguageModel.scoreTrigram(df((12L, "x")), lm, "id", "text").head()
    assert(r3.getLong(2) == 1L && r3.getLong(3) == 0L)
    lm.trigrams.unpersist()
  }

  test("scores are bounded: 0 ≤ avg_milli ≤ 1000 whatever the corpus") {
    implicit val cs: CacheScope = CacheScope.processOwned
    // c12 ≤ c1 bounds the bigram tier at 1000; the backoff tier at 400
    val corpus = df((0L until 40L).map(i =>
      (i, s"w${i % 7} w${(i * 3) % 5} w${(i * i) % 11} w${i % 3}")): _*)
    val lm = LanguageModel.train(corpus.filter(col("id") % 2 === 0), "id", "text")
    val out = LanguageModel.score(corpus, lm, "id", "text")
    assert(out.filter(col("avg_milli") < 0 || col("avg_milli") > 1000).isEmpty,
      "avg_milli out of [0, 1000]")
    assert(out.filter(col("sum_milli") > col("n_tokens") * 1000).isEmpty,
      "sum_milli exceeds the per-token bound")
    lm.bigrams.unpersist()
  }

  test("training is additive: counts over a union equal summed batch counts") {
    implicit val cs: CacheScope = CacheScope.processOwned
    // the streaming-maintenance property: bigram counts are a pure sum,
    // so an incremental model update is a count merge, never a retrain
    val b1 = df((1L, "a b c"), (2L, "b c a"))
    val b2 = df((3L, "c a b"), (4L, "a b"))
    val union = LanguageModel.train(b1.unionAll(b2), "id", "text")
    val m1 = LanguageModel.train(b1, "id", "text")
    val m2 = LanguageModel.train(b2, "id", "text")
    val merged = m1.bigrams
      .unionAll(m2.bigrams)
      .groupBy(col("w1"), col("w2"))
      .agg(sum(col("c12")).as("c12"))
    assert(union.bigrams.exceptAll(merged).isEmpty &&
      merged.exceptAll(union.bigrams).isEmpty,
      "union-trained bigram counts != merged batch counts")
    Seq(union, m1, m2).foreach(_.bigrams.unpersist())
  }

  test("broadcastModel=false runs the same semantics with shuffle joins") {
    implicit val cs: CacheScope = CacheScope.processOwned
    val lm = LanguageModel.train(df((1L, "a b c a b")), "id", "text")
    val b = LanguageModel.score(df((2L, "a b q"), (3L, "c c")), lm, "id", "text")
      .orderBy("id").collect().toSeq
    val s = LanguageModel.score(df((2L, "a b q"), (3L, "c c")), lm, "id", "text",
      broadcastModel = false).orderBy("id").collect().toSeq
    assert(b == s)
    lm.bigrams.unpersist()
  }
}
