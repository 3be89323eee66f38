package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Boilerplate

/** Boilerplate mining (d24/d25) against independent models: mined
  * frequent grams vs a driver-side count, passage spans vs a
  * brute-force interval-merge model on random corpora, and the
  * strip operation's consistency with the spans it derives from.
  */
class BoilerplateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def samples[T](gen: Gen[T], n: Int, seed: Long = 11L): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(seed + i)))

  /** Reference model: tokens → positioned n-grams with the kernel's
    * short-doc clamp, frequent grams by distinct-doc count, covered
    * intervals merged (adjacent intervals merge too).
    */
  private def model(corpus: Seq[(Long, String)], n: Int, minDf: Int) = {
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    def grams(ts: Seq[String]): Seq[(Int, String)] =
      if (ts.isEmpty) Seq.empty
      else (0 until math.max(ts.size - n, 0) + 1)
        .map(i => i -> ts.slice(i, i + n).mkString(" "))
    val byDoc = corpus.map { case (id, t) => id -> grams(toks(t)) }
    val df = byDoc.flatMap { case (id, gs) => gs.map(_._2).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.size }
    val frequent = df.filter(_._2 >= minDf).keySet
    val spans = byDoc.map { case (id, gs) =>
      val nToks = corpus.find(_._1 == id).map(c => toks(c._2).size).get
      val ivs = gs.filter(g => frequent(g._2))
        .map(g => (g._1, math.min(g._1 + n, nToks))).sortBy(identity)
      val merged = ivs.foldLeft(List.empty[(Int, Int)]) {
        case (acc, (s, e)) => acc match {
          case (ps, pe) :: rest if s <= pe => (ps, math.max(pe, e)) :: rest
          case _ => (s, e) :: acc
        }
      }.reverse
      id -> merged
    }.toMap
    (frequent, spans)
  }

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
  private val genDoc: Gen[String] =
    Gen.choose(0, 12).flatMap(k => Gen.listOfN(k, word).map(_.mkString(" ")))
  private val genCorpus: Gen[List[String]] = Gen.listOfN(10, genDoc)

  test("frequent grams and merged spans match the reference model") {
    import spark.implicits._
    samples(genCorpus, 5).zipWithIndex.foreach { case (texts, ci) =>
      val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = corpus.toDF("doc_id", "text")
      for (minDf <- Seq(2, 4)) {
        val (expFreq, expSpans) = model(corpus, n = 2, minDf = minDf)
        val gotFreq = Boilerplate.frequentNgrams(df, "doc_id", "text", 2, minDf)
          .collect().map(_.getString(0)).toSet
        assert(gotFreq == expFreq, s"corpus $ci minDf $minDf grams")
        val gotSpans = Boilerplate.passageSpans(df, "doc_id", "text", 2, minDf)
          .collect()
          .groupBy(_.getLong(0))
          .map { case (id, rs) =>
            id -> rs.map(r => (r.getInt(1), r.getInt(2))).sortBy(identity).toList
          }
        val expNonEmpty = expSpans.filter(_._2.nonEmpty)
        assert(gotSpans == expNonEmpty, s"corpus $ci minDf $minDf spans: " +
          s"got $gotSpans expected $expNonEmpty")
      }
    }
  }

  /** Reference model for [[Boilerplate.canonicalDupSpans]]: per gram,
    * carriers and min-id owner; per doc, intervals of duplicated grams
    * NOT owned by this doc, merged (adjacent merge too).
    */
  private def canonicalModel(corpus: Seq[(Long, String)], n: Int) = {
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    def grams(ts: Seq[String]): Seq[(Int, String)] =
      if (ts.isEmpty) Seq.empty
      else (0 until math.max(ts.size - n, 0) + 1)
        .map(i => i -> ts.slice(i, i + n).mkString(" "))
    val byDoc = corpus.map { case (id, t) => id -> grams(toks(t)) }
    val owner = byDoc.flatMap { case (id, gs) => gs.map(_._2).distinct.map(_ -> id) }
      .groupBy(_._1).collect { case (g, xs) if xs.map(_._2).distinct.size >= 2 =>
        g -> xs.map(_._2).min
      }
    byDoc.map { case (id, gs) =>
      val nToks = corpus.find(_._1 == id).map(c => toks(c._2).size).get
      val ivs = gs.collect { case (p, g) if owner.get(g).exists(_ != id) =>
        (p, math.min(p + n, nToks))
      }.sortBy(identity)
      val merged = ivs.foldLeft(List.empty[(Int, Int)]) {
        case (acc, (s, e)) => acc match {
          case (ps, pe) :: rest if s <= pe => (ps, math.max(pe, e)) :: rest
          case _ => (s, e) :: acc
        }
      }.reverse
      id -> merged
    }.toMap
  }

  test("canonicalDupSpans: owner election and spans match the reference model") {
    import spark.implicits._
    samples(genCorpus, 5, seed = 23L).zipWithIndex.foreach { case (texts, ci) =>
      val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = corpus.toDF("doc_id", "text")
      val exp = canonicalModel(corpus, n = 2).filter(_._2.nonEmpty)
      val got = Boilerplate.canonicalDupSpans(df, "doc_id", "text", 2)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (id, rs) =>
          id -> rs.map(r => (r.getInt(1), r.getInt(2))).sortBy(identity).toList
        }
      assert(got == exp, s"corpus $ci: got $got expected $exp")
    }
  }

  test("canonicalDupSpans pins the keep-one-copy semantics") {
    import spark.implicits._
    // P = "red fox jumps" shared by docs 1,2,3 → owner 1 keeps it.
    // Q = "old gray wall" shared by docs 2,4 → owner 2 keeps it.
    // Doc 2 carries P (foreign, owner 1) ADJACENT to Q (owned):
    // only P's interval is excised there; the merge never bleeds into
    // owned coverage that foreign coverage does not overlap.
    val corpus = Seq(
      1L -> "red fox jumps over things",
      2L -> "red fox jumps old gray wall",
      3L -> "we saw red fox jumps today",
      4L -> "near the old gray wall stones",
      5L -> "nothing shared here at all")
    val got = Boilerplate.canonicalDupSpans(corpus.toDF("doc_id", "text"),
        "doc_id", "text", 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(identity)
    // doc 1 (owner of P): untouched. doc 5: untouched. doc 2: P at
    // [0,3) (Q at [3,6) is OWNED — kept). doc 3: P at [2,5). doc 4:
    // Q at [2,5) (owner is doc 2).
    assert(got.toSeq == Seq((2L, 0, 3, 3), (3L, 2, 5, 3), (4L, 2, 5, 3)))
  }

  test("canonicalReelection matches two independent elections; restoration is monotone") {
    import spark.implicits._
    samples(genCorpus, 5, seed = 41L).zipWithIndex.foreach { case (texts, ci) =>
      val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      def live(id: Long) = id % 3 != 1
      val df = corpus.toDF("doc_id", "text")
      // model: BEFORE = full-corpus election, coverage on live docs;
      // AFTER = an election run on the live corpus alone
      val beforeSpans = canonicalModel(corpus, n = 2).filter(k => live(k._1))
      val afterSpans = canonicalModel(corpus.filter(c => live(c._1)), n = 2)
      def tokensOf(spans: Map[Long, List[(Int, Int)]]) =
        spans.view.mapValues(_.map { case (s, e) => e - s }.sum)
          .filter(_._2 > 0).toMap
      val expB = tokensOf(beforeSpans)
      val expA = tokensOf(afterSpans)
      val got = Boilerplate.canonicalReelection(df, "doc_id", "text", 2,
          liveId = _ % 3 =!= 1)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got.keySet == expB.keySet, s"corpus $ci: affected sets diverge")
      got.foreach { case (id, (b, a)) =>
        assert(b == expB(id), s"corpus $ci doc $id before")
        assert(a == expA.getOrElse(id, 0L), s"corpus $ci doc $id after")
        assert(a <= b, s"corpus $ci doc $id: restoration must be monotone")
      }
    }
  }

  test("canonicalReelection pins re-election and pair dissolution") {
    import spark.implicits._
    // P shared by 1,2,3 (owner 1). Q shared by 4,5 (owner 4).
    // Forget {1, 4} (live = id % 3 != 1): P re-elects owner 2 → doc 2
    // RESTORES its 3 tokens, doc 3 stays excised under the new owner;
    // Q's pair dissolves (df 2 → 1) → doc 5 restores everything.
    val corpus = Seq(
      1L -> "red fox jumps over things",
      2L -> "red fox jumps quiet stones",
      3L -> "we saw red fox jumps today",
      4L -> "old gray wall stands here",
      5L -> "near old gray wall tonight")
    val got = Boilerplate.canonicalReelection(corpus.toDF("doc_id", "text"),
        "doc_id", "text", 3, liveId = _ % 3 =!= 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((2L, 3L, 0L), (3L, 3L, 3L), (5L, 3L, 0L)),
      s"re-election semantics broke: ${got.toSeq}")
  }

  test("canonicalExcise drops exactly the non-owned duplicated positions") {
    import spark.implicits._
    samples(genCorpus, 4, seed = 31L).foreach { texts =>
      val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = corpus.toDF("doc_id", "text")
      val spans = canonicalModel(corpus, n = 2)
      val got = Boilerplate.canonicalExcise(df, "doc_id", "text", 2)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      corpus.foreach { case (id, t) =>
        val ts = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        val covered = spans(id).flatMap { case (s, e) => s until e }.toSet
        val expect = ts.zipWithIndex.collect {
          case (tok, i) if !covered(i) => tok
        }.mkString(" ")
        assert(got(id) == expect, s"doc $id: got '${got(id)}' expect '$expect'")
      }
    }
  }

  test("stripPassages drops exactly the covered token positions") {
    import spark.implicits._
    samples(genCorpus, 4).foreach { texts =>
      val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = corpus.toDF("doc_id", "text")
      val (_, spans) = model(corpus, n = 2, minDf = 2)
      val got = Boilerplate.stripPassages(df, "doc_id", "text", 2, 2)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      corpus.foreach { case (id, t) =>
        val ts = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        val covered = spans(id).flatMap { case (s, e) => s until e }.toSet
        val expect = ts.zipWithIndex.collect {
          case (tok, i) if !covered(i) => tok
        }.mkString(" ")
        assert(got(id) == expect, s"doc $id: got '${got(id)}' expect '$expect'")
      }
    }
  }

  test("histogram-prefiltered budget admission ≡ naive per-domain sort") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val W = org.apache.spark.sql.expressions.Window
    // skewed domains, heavy quality ties (multiples of 1000, so bucket
    // boundaries land ON tie groups), and ~10% zero-token docs (the
    // post-overflow edge case)
    val rnd = new scala.util.Random(7)
    val rows = (0L until 300L).map { i =>
      (s"dom${(i % 4).toInt}", i, rnd.nextInt(50).toLong * 1000L,
        if (rnd.nextInt(10) == 0) 0L else rnd.nextInt(9).toLong + 1L)
    }
    val df = rows.toDF("source", "doc_id", "q", "n")
    val w = W.partitionBy($"source").orderBy($"q".desc, $"doc_id")
      .rowsBetween(W.unboundedPreceding, 0)
    val naive = df.withColumn("cum_tokens", sum($"n").over(w))
      .filter($"cum_tokens" <= 40L)
      .select($"doc_id", $"source", $"n", $"cum_tokens")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    // width 1 = one bucket per quality value; 7 = misaligned boundaries;
    // 5000 = boundaries on tie groups; 10^6 = a single bucket (pure naive)
    for (width <- Seq(1L, 7L, 5000L, 1000000L)) {
      val fast = graft.operators.Sampling
        .tokenBudgetAdmit(df, "source", "doc_id", "q", "n",
          budget = 40L, bucketWidth = width)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(fast == naive, s"bucketWidth=$width")
    }
  }

  test("d26 admission is a prefix of the quality order and respects the budget") {
    import spark.implicits._
    // admission must be monotone: if a doc is admitted, every doc ranked
    // before it (same domain) is admitted too, and the running total of
    // the admitted prefix never exceeds the budget
    val rows = (0 until 40).map { i =>
      (i.toLong, s"dom${i % 3}", ("tok " * (i % 7 + 1)).trim)
    }
    val df = rows.toDF("doc_id", "source", "text")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source")
      .orderBy($"quality_micro".desc, $"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    import org.apache.spark.sql.functions._
    val admitted = df
      .select($"doc_id", $"source",
        graft.functions.TextFunctions.tokenCount($"text").cast("long").as("n_tokens"),
        floor(graft.functions.TextFunctions.qualityScore($"text") * 1e6).cast("long")
          .as("quality_micro"))
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .filter($"cum_tokens" <= 12L)
      .select($"doc_id", $"source", $"n_tokens", $"cum_tokens")
    val byDom = admitted.collect().groupBy(_.getString(1))
    byDom.foreach { case (_, rs) =>
      val cums = rs.map(_.getLong(3)).sorted
      assert(cums.last <= 12L)
      // contiguous running sums: each admitted cum = previous + its tokens
      val sorted = rs.sortBy(_.getLong(3))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val prior = if (i == 0) 0L else sorted(i - 1).getLong(3)
        assert(r.getLong(3) == prior + r.getLong(2))
      }
    }
  }
}
