package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ConnectedComponents, TextDedup}

/** Property-based checks of the round-5 operators against independent
  * reference models: consecutive-line collapse (model fold + idempotence),
  * prefix-filtered containment (≡ the exact inverted-index operator on
  * random corpora), fingerprint pairs (≡ per-doc kernel fingerprints
  * intersected driver-side), and pointer-jumped connected components
  * (≡ union-find on random graphs, jump path forced on).
  */
class TextPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Deterministic sampling (scalatestplus bridge not in offline cache). */
  def samples[T](gen: Gen[T], n: Int, seed: Long = 7L): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(seed + i)))

  test("property: dropRepeatedLines matches the fold model and is idempotent") {
    import spark.implicits._
    // tiny line alphabet forces consecutive runs
    val genDoc: Gen[List[String]] =
      Gen.listOfN(12, Gen.oneOf("a", "b", "c", "")).map(_.take(12))
    val genCorpus: Gen[List[List[String]]] = Gen.listOfN(6, genDoc)

    def model(lines: List[String]): List[String] =
      lines.foldLeft(List.empty[String]) {
        case (acc, l) if acc.headOption.contains(l) => acc
        case (acc, l) => l :: acc
      }.reverse

    samples(genCorpus, 5).foreach { corpus =>
      val df = corpus.zipWithIndex
        .map { case (ls, i) => (i.toLong, ls.mkString("\n")) }
        .toDF("doc_id", "text")
      val out = TextDedup.dropRepeatedLines(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
      corpus.zipWithIndex.foreach { case (ls, i) =>
        // split("\n") on the joined text: an empty doc is one empty line
        val lines = ls.mkString("\n").split("\n", -1).toList
        val kept = model(lines)
        assert(out(i.toLong) == ((lines.size, kept.size, kept.mkString("\n"))),
          s"doc $i: lines=$lines model=$kept got=${out(i.toLong)}")
      }
      // idempotence: collapsing an already-collapsed corpus changes nothing
      val once = TextDedup.dropRepeatedLines(df, "doc_id", "text")
        .select($"doc_id", $"clean_text".as("text"))
      val twice = TextDedup.dropRepeatedLines(once, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      assert(out.keys.forall(k => twice(k) == out(k)._3))
    }
  }

  test("property: prefix containment equals exact containment on random corpora") {
    import spark.implicits._
    // small vocab ⇒ heavy shingle sharing, docs of varied length ⇒
    // asymmetric containments
    val word = Gen.oneOf("red", "blue", "fox", "dog", "run", "sky", "sea", "oak")
    val genDoc: Gen[String] = Gen.choose(3, 14)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val genCorpus: Gen[List[String]] = Gen.listOfN(10, genDoc)

    samples(genCorpus, 4).zipWithIndex.foreach { case (corpus, ci) =>
      val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      for (t <- Seq(0.6, 0.9)) {
        val exact = TextDedup.containmentPairs(df, "doc_id", "text", n = 2, threshold = t)
          .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
        val prefix = TextDedup.containmentPairsPrefix(df, "doc_id", "text", n = 2, threshold = t)
          .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
        assert(prefix == exact, s"corpus $ci threshold $t: $prefix != $exact")
      }
    }
  }

  test("property: fingerprint pairs equal driver-side kernel intersection counts") {
    import spark.implicits._
    val genDoc: Gen[String] = Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val genCorpus: Gen[List[String]] = Gen.listOfN(8, genDoc)

    def fpSet(text: String): Set[Long] = {
      val arr = graft.functions.WinnowedFingerprint
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(text), 8, 4)
      (0 until arr.numElements()).map(arr.getLong).toSet
    }

    samples(genCorpus, 4).foreach { corpus =>
      val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextDedup.fingerprintPairs(df, "doc_id", "text", minShared = 2)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      val fps = corpus.map(fpSet)
      val expect = (for {
        a <- corpus.indices; b <- corpus.indices if a < b
        shared = (fps(a) intersect fps(b)).size if shared >= 2
      } yield ((a.toLong, b.toLong), shared.toLong)).toMap
      assert(got == expect, s"got $got expect $expect")
    }
  }

  test("property: prefix fingerprint containment equals exact containment") {
    import spark.implicits._
    // docs built from a tiny vocab of long words ⇒ shared 8-char grams;
    // two planted near-copies of doc 0 guarantee qualifying pairs
    val word = Gen.oneOf("crimson", "harbour", "lantern", "granite", "meadows")
    val genDoc: Gen[String] = Gen.choose(4, 12)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val genCorpus: Gen[List[String]] = Gen.listOfN(8, genDoc)

    samples(genCorpus, 4).zipWithIndex.foreach { case (base, ci) =>
      val corpus = base ++ List(base.head + " granite", base.head)
      val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      for (t <- Seq(0.3, 0.6, 0.9); lim <- Seq(100000L, 0L)) {
        val exact = TextDedup.fingerprintContainment(df, "doc_id", "text", threshold = t)
          .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
        val prefix = TextDedup.fingerprintContainmentPrefix(df, "doc_id", "text",
            threshold = t, broadcastCandidateLimit = lim)
          .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
        assert(prefix == exact, s"corpus $ci threshold $t lim $lim: $prefix != $exact")
        if (t == 0.9) assert(exact.nonEmpty, s"corpus $ci: planted copies found no pairs")
      }
    }
  }

  test("property: pointer-jumped components equal union-find on random graphs") {
    import spark.implicits._
    val genEdge: Gen[(Long, Long)] = for {
      a <- Gen.choose(1L, 18L); b <- Gen.choose(1L, 18L) if a != b
    } yield (a, b)
    val genGraph: Gen[List[(Long, Long)]] = Gen.listOfN(20, genEdge)

    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // canonicalize to the component MINIMUM (find gives min-root here
      // because unions always point larger roots at smaller ones)
      nodes.map(n => n -> find(n)).toMap
    }

    samples(genGraph, 4).foreach { edges =>
      val df = edges.toDF("id_a", "id_b")
      // jumpAfter = 0 forces the pointer-jump branch on EVERY round
      val got = ConnectedComponents.components(df, "id_a", "id_b", jumpAfter = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == unionFind(edges), s"edges $edges")
    }
  }
}
