package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** BPE induction vs a driver-side reference implementation: the
  * distributed trainer must reproduce the exact merge sequence of the
  * classic single-machine algorithm (same tie-breaks), on both a
  * hand-checked corpus and random corpora.
  */
class BpeInductionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The textbook algorithm, driver-side: same tokenization (lowercased
    * whitespace words), same tie-break (count desc, pair asc).
    */
  private def referenceBpe(docs: Seq[String], k: Int): Seq[(String, String, Long)] = {
    val words = docs.flatMap(_.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
    var vocab: Map[Seq[String], Long] = words.toSeq
      .map { case (w, f) => (w.map(_.toString): Seq[String], f) }
      .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).sum) }
    val out = Seq.newBuilder[(String, String, Long)]
    var round = 0
    var done = false
    while (round < k && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((a, b, c))
        vocab = vocab.toSeq
          .map { case (s, f) => (BpeInduction.applyMerge(s, a, b), f) }
          .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).sum) }
      }
      round += 1
    }
    out.result()
  }

  test("hand-checked corpus: classic merges in order") {
    import spark.implicits._
    // 'lo' dominates (low x4, lower, lowest), then 'low'
    val docs = Seq("low low lower lowest", "low low newest newest")
    val (merges, vocab) = BpeInduction.train(docs.toDF("text"), "text", k = 3)
    assert(merges.map(m => (m.left, m.right, m.pairCount)) ==
      referenceBpe(docs, 3))
    assert(merges.head.left == "l" && merges.head.right == "o" &&
      merges.head.pairCount == 6L)
    assert(merges(1) == BpeInduction.Merge("lo", "w", 6L))
    // after (l,o) and (lo,w): 'low' is one symbol
    val lowSyms = vocab.collect().find(_.word == "low").get.syms
    assert(lowSyms == Seq("low"))
  }

  test("random corpora: distributed ≡ driver reference, including tie-breaks") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val docs = (1 to 40).map(_ =>
        (1 to 6).map(_ => Seq("ab", "abc", "bc", "cab", "ba", "ac")(rnd.nextInt(6)))
          .mkString(" "))
      val (merges, _) = BpeInduction.train(docs.toDF("text"), "text", k = 4)
      assert(merges.map(m => (m.left, m.right, m.pairCount)) ==
        referenceBpe(docs, 4))
    }
  }

  test("merge application is non-overlapping left-to-right") {
    assert(BpeInduction.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(BpeInduction.applyMerge(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(BpeInduction.applyMerge(Seq("x"), "a", "b") == Seq("x"))
    assert(BpeInduction.applyMerge(Nil, "a", "b") == Nil)
  }

  test("tokenCounts: subword counts from the trained vocab; OOV falls back to chars") {
    import spark.implicits._
    val train = Seq("low low lower lowest", "low low newest newest").toDF("text")
    val (_, vocab) = BpeInduction.train(train, "text", k = 3)
    val docs = Seq((1L, "low lower"), (2L, "zzz low")).toDF("doc_id", "text")
    val got = BpeInduction.tokenCounts(docs, "doc_id", "text", vocab)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // merges: (l,o), (lo,w), (e,s) -> low = [low] (1), lower = [low,e,r] (3)
    assert(got(0) == (1L, 2L, 4L, 0L))
    // zzz unseen -> 3 char symbols, flagged OOV; low = 1
    assert(got(1) == (2L, 2L, 4L, 1L))
  }

  test("tokenIdSequences: sequence digest decodes, length ≡ tokenCounts, OOV chars id") {
    import spark.implicits._
    val train = Seq("low low lower lowest", "low low newest newest").toDF("text")
    val (_, vocab) = BpeInduction.train(train, "text", k = 3)
    val vseq = vocab.collect().toSeq
    val symId = BpeInduction.symbolization(vseq).toMap
    // every training character keeps an id even when merged away in
    // every word (the 'h'-inside-"th" case from the scaladoc)
    "lowernst".foreach(c => assert(symId.contains(c.toString)))
    val docs = Seq((1L, "low lower"), (2L, "zzz low"), (3L, "  ")).toDF("doc_id", "text")
    val got = BpeInduction.tokenIdSequences(docs, "doc_id", "text", vseq)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // expected sequences from the spec'd merge list (l,o)(lo,w)(e,s):
    //   low -> [low]; lower -> [low, e, r]; zzz (OOV, z unseen) -> [0,0,0]
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val seq1 = Seq(symId("low"), symId("low"), symId("e"), symId("r"))
    assert(got(0) == (1L, 4L, md5(seq1.mkString(" "))))
    val seq2 = Seq(0, 0, 0, symId("low"))
    assert(got(1) == (2L, 4L, md5(seq2.mkString(" "))))
    // whitespace-only doc vanishes (no tokens), same as the oracle
    assert(got.length == 2)
    // cross-implementation invariant: sequence length ≡ budget counts
    val docs2 = (1L to 30L).map(i =>
      (i, Seq("low", "lower", "zzz", "newest", "qx").take((i % 5 + 1).toInt)
        .mkString(" "))).toDF("doc_id", "text")
    val counts = BpeInduction.tokenCounts(docs2, "doc_id", "text", vocab)
      .select("id", "n_subwords")
    val seqs = BpeInduction.tokenIdSequences(docs2, "doc_id", "text", vseq)
      .select($"id", $"n_tokens")
    assert(counts.join(seqs, "id")
      .filter($"n_subwords" =!= $"n_tokens").count() == 0L)
  }

  test("exhaustion: single-char words stop the loop early") {
    import spark.implicits._
    val (merges, _) = BpeInduction.train(
      Seq("a b c a").toDF("text"), "text", k = 5)
    assert(merges.isEmpty)
  }
}
