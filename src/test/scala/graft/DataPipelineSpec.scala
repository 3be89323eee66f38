package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions, WinnowedFingerprint}
import graft.operators.{Decontaminate, IncrementalDedup, Multimodal, Sampling, TextDedup, VectorSearch}

/** Unit tests for the training-data operators: planted-duplicate recovery,
  * ANN sanity, text functions, fingerprint sensitivity, multimodal
  * batch plumbing.
  */
class DataPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import scala.jdk.CollectionConverters._

  def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  val corpus: DataFrame = docs(
    1L -> "the quick brown fox jumps over the lazy dog and runs far away today",
    2L -> "the quick brown fox jumps over the lazy dog and runs far away today", // exact dup of 1
    3L -> "a quick brown fox jumps over the lazy dog and runs far away today",   // near dup of 1
    4L -> "completely different content about spark catalyst optimizer rules engine",
    5L -> "")

  test("exact dedup keeps min-id survivor per content group") {
    val out = TextDedup.exact(corpus, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 3L, 4L, 5L))
    val groups = TextDedup.exactGroups(corpus, "doc_id", "text")
      .filter(col("group_size") > 1).collect()
    assert(groups.length == 1 && groups(0).getAs[Long]("survivor_id") == 1L)
  }

  test("ngram jaccard finds exact + near dup pairs, not unrelated docs") {
    val pairs = TextDedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("normalized dedup groups case/punct/whitespace variants; raw hash keeps them apart") {
    val c = docs(
      1L -> "Hello,  World!",
      2L -> "hello world",
      3L -> "different text entirely")
    val norm = TextDedup.normalizedGroups(c, "doc_id", "text")
      .collect().map(r => (r.getLong(2), r.getLong(1))).toMap // survivor -> size
    assert(norm == Map(1L -> 2L, 3L -> 1L))
    val raw = TextDedup.exactGroups(c, "doc_id", "text")
      .collect().map(r => (r.getLong(2), r.getLong(1))).toMap
    assert(raw == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("containment is asymmetric: quoted doc flagged inside container, not vice versa") {
    val c = docs(
      1L -> "alpha beta gamma delta epsilon",
      // doc 1's full gram set sits inside doc 2 (a boilerplate wrapper)
      2L -> "header text alpha beta gamma delta epsilon footer text here",
      3L -> "completely different content with no shared grams at all")
    val out = TextDedup.containmentPairs(c, "doc_id", "text", n = 3, threshold = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out.contains((1L, 2L)) && out((1L, 2L)) == 1.0) // 1 fully inside 2
    assert(!out.contains((2L, 1L))) // the container is NOT inside the quote
    assert(!out.keys.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("prefix containment equals exact containment, including asymmetric pairs") {
    val c = docs(
      1L -> "alpha beta gamma delta epsilon",
      // doc 1 fully inside doc 2 — LOW Jaccard (container much longer), so
      // symmetric-signature banding would miss it; the prefix filter must not
      2L -> "header text alpha beta gamma delta epsilon footer text here plus much more trailing content",
      3L -> "completely different content with no shared grams at all",
      4L -> "alpha beta gamma delta epsilon", // exact dup of 1 (both directions)
      5L -> "")
    for (t <- Seq(0.7, 0.9, 1.0)) {
      val exact = TextDedup.containmentPairs(c, "doc_id", "text", n = 3, threshold = t)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val prefix = TextDedup.containmentPairsPrefix(c, "doc_id", "text", n = 3, threshold = t)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      assert(prefix == exact, s"threshold $t: prefix $prefix != exact $exact")
    }
    // sanity on the asymmetric pair itself at 0.9
    val out = TextDedup.containmentPairsPrefix(c, "doc_id", "text", n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L)) && !out.contains((2L, 1L)))
    assert(out.contains((1L, 4L)) && out.contains((4L, 1L)))
  }

  test("prefix containment: over-limit candidates fall back to shuffle verify, same result") {
    import spark.implicits._
    val cluster = (1L to 120L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val df = (cluster ++ Seq((900L, "unrelated content entirely about something else here")))
      .toDF("doc_id", "text")
    val viaShuffle = TextDedup.containmentPairsPrefix(df, "doc_id", "text",
        broadcastCandidateLimit = 10L)
      .select("id_src", "id_dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaBroadcast = TextDedup.containmentPairsPrefix(df, "doc_id", "text")
      .select("id_src", "id_dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaShuffle.size == 120 * 119, s"expected all directed pairs, got ${viaShuffle.size}")
    assert(viaShuffle == viaBroadcast)
  }

  test("de-repetition collapses consecutive runs only; non-consecutive repeats survive") {
    val c = docs(
      1L -> "a\na\nb\nb\nb\na",
      2L -> "solo line",
      3L -> "a\nb\na",
      4L -> "")
    val out = TextDedup.dropRepeatedLines(c, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L) == ((6, 3, "a\nb\na")))
    assert(out(2L) == ((1, 1, "solo line")))
    assert(out(3L) == ((3, 3, "a\nb\na"))) // non-consecutive repeat kept
    assert(out(4L) == ((1, 1, "")))
  }

  test("token de-repetition collapses stutter runs, preserves case and non-consecutive repeats") {
    val c = docs(
      1L -> "the the the cat sat sat here",
      2L -> "The the mixed Case case",  // case-sensitive: no collapse
      3L -> "a b a b a")
    val out = TextDedup.dropRepeatedTokens(c, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L) == ((7, 4, "the cat sat here")))
    assert(out(2L) == ((5, 5, "The the mixed Case case")))
    assert(out(3L) == ((5, 5, "a b a b a")))
  }

  test("fingerprint pairs: exact + near dups share fingerprints, unrelated docs do not") {
    val c = docs(
      1L -> "the quick brown fox jumps over the lazy dog and runs far away today",
      2L -> "the quick brown fox jumps over the lazy dog and runs far away today",
      3L -> "xx quick brown fox jumps over the lazy dog and runs far away today",
      4L -> "completely different content about spark catalyst optimizer rules engine")
    val pairs = TextDedup.fingerprintPairs(c, "doc_id", "text", minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)), s"exact dup must share all fingerprints: $pairs")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)),
      s"char-level near dup must clear minShared: $pairs")
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated doc must not pair: $pairs")
    // the exact pair shares every fingerprint; the near pair strictly fewer
    assert(pairs((1L, 2L)) > pairs((1L, 3L)))
  }

  test("fingerprint pairs maxDf: no-op above corpus size, suppresses corpus-wide boilerplate") {
    // 12 docs all sharing one boilerplate sentence (its fingerprints
    // have df = 12); two true near-dups share a second, rare passage
    val boiler = "subscribe to our newsletter for updates and offers every single week"
    val rare = "the archival records from nineteen twelve describe a harbor flood event"
    val c = docs(
      ((1L to 10L).map(i => i -> s"$boiler unique$i${i}ripple$i tail${i}stone$i") :+
        (11L -> s"$boiler $rare") :+ (12L -> s"$boiler $rare extra")): _*)
    val uncapped = TextDedup.fingerprintPairs(c, "doc_id", "text", minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // cap >= corpus size: bit-identical to the uncapped baseline
    val wideCap = TextDedup.fingerprintPairs(c, "doc_id", "text", minShared = 5, maxDf = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(wideCap == uncapped)
    // cap below the boilerplate df: pairs held together only by the
    // shared template vanish; the rare-passage pair survives with its
    // shared count reduced by exactly the suppressed fingerprints
    val capped = TextDedup.fingerprintPairs(c, "doc_id", "text", minShared = 5, maxDf = 11)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(capped.contains((11L, 12L)), s"rare-passage pair must survive: $capped")
    assert(capped((11L, 12L)) < uncapped((11L, 12L)))
    assert(!capped.contains((1L, 2L)), s"template-only pair must be suppressed: $capped")
    assert(uncapped.contains((1L, 2L)))
  }

  test("lsh index lookup equals exact query-vs-corpus jaccard, both broadcast gates") {
    import spark.implicits._
    val corpus = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota lambda",
      3L -> "one two three four five six seven eight nine ten eleven twelve",
      4L -> "totally unrelated words about catalyst plans and shuffles here")
    val queries = docs(
      101L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa", // exact of 1
      102L -> "zz two three four five six seven eight nine ten eleven twelve", // near of 3
      103L -> "nothing in common with anything stored in the index")
    val idx = TextDedup.lshIndexRelations(corpus, "doc_id", "text")
    // exact truth: directed query->corpus jaccard over shingle sets
    def shingleSet(t: String): Set[String] = {
      val toks = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val corpusMap = corpus.collect().map(r => r.getLong(0) -> shingleSet(r.getString(1))).toMap
    val expected = queries.collect().flatMap { r =>
      val (qid, qs) = (r.getLong(0), shingleSet(r.getString(1)))
      corpusMap.flatMap { case (cid, cs) =>
        val j = qs.intersect(cs).size.toDouble / qs.union(cs).size
        if (j >= 0.8) Some((qid, cid) -> j) else None
      }
    }.toMap
    for (limit <- Seq(100000L, 0L)) { // broadcast gate open, then forced shuffle
      val got = TextDedup.lshIndexLookup(queries, "doc_id", "text",
          idx("bands"), idx("shingles"), idx("sizes"),
          broadcastCandidateLimit = limit)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got == expected, s"limit=$limit: $got vs $expected")
    }
    assert(expected.contains((101L, 1L)) && expected.contains((102L, 3L)))
  }

  test("hashed verification policy returns the string-exact pairs and jaccards") {
    import spark.implicits._
    val df = ((1L to 60L).map(i => (i, "alpha beta gamma delta epsilon zeta eta")) ++
      (100L to 110L).map(i => (i, s"unique doc $i content block alpha$i beta$i gamma$i")))
      .toDF("doc_id", "text")
    val exactStr = TextDedup.minhashLshPairs(df, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val hashed = TextDedup.minhashLshPairs(df, "doc_id", "text", hashedVerification = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(hashed == exactStr)
    assert(exactStr.size == 60 * 59 / 2)
  }

  test("hashed verification policy: containment prefix matches string-exact") {
    import spark.implicits._
    // quoted-inclusion shape (the asymmetric case) + a duplicate cluster
    val df = ((1L to 30L).map(i => (i, "alpha beta gamma delta epsilon zeta eta theta")) ++
      Seq(50L -> "alpha beta gamma delta epsilon zeta eta theta plus a much longer framing document around the quoted block") ++
      (100L to 105L).map(i => (i, s"unrelated doc $i filler alpha$i beta$i gamma$i delta$i")))
      .toDF("doc_id", "text")
    val exactStr = TextDedup.containmentPairsPrefix(df, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val hashed = TextDedup.containmentPairsPrefix(df, "doc_id", "text",
        hashedVerification = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(hashed == exactStr)
    // the cluster is fully mutually contained; the quote is one-directional
    assert(exactStr.contains((1L, 50L)), s"quoted block must be contained in the frame: $exactStr")
    assert(!exactStr.contains((50L, 1L)), "the frame is NOT contained in the quote")
  }

  test("minhash LSH: over-limit candidate set verifies via shuffle joins, same result") {
    import spark.implicits._
    // a 200-member duplicate cluster alone yields 19,900 candidate pairs;
    // with the broadcast limit forced below that the verification joins
    // must run as shuffles and produce the identical pair set
    val cluster = (1L to 200L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val distinctDocs = (1001L to 1010L).map(i =>
      (i, s"doc$i has entirely separate content block number five$i six$i seven$i"))
    val df = (cluster ++ distinctDocs).toDF("doc_id", "text")
    val viaShuffle = TextDedup.minhashLshPairs(df, "doc_id", "text",
        broadcastCandidateLimit = 10L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaBroadcast = TextDedup.minhashLshPairs(df, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaShuffle.size == 200 * 199 / 2, s"expected full cluster, got ${viaShuffle.size}")
    assert(viaShuffle == viaBroadcast)
  }

  test("minhash LSH recovers the same pairs as exact jaccard at high threshold") {
    val exact = TextDedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextDedup.minhashLshPairs(corpus, "doc_id", "text",
        n = 3, numHashes = 128, bands = 32, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("connected components: chains collapse, cliques collapse, singletons survive") {
    import spark.implicits._
    // chain 1-2-3 (1~3 only transitively), clique 10-11-12, pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L))
      .toDF("id_a", "id_b")
    val comp = graft.operators.ConnectedComponents.components(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))

    // corpus view: docs without pairs label themselves and survive
    val corpus = Seq(1L, 2L, 3L, 99L).toDF("doc_id")
    val groups = graft.operators.ConnectedComponents
      .dedupGroups(corpus, pairs.filter($"id_a" < 10), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(groups == Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (99L, 99L, true)))

    // convergence guard: a long chain exceeds a tiny iteration bound loudly
    // (jumpAfter past the bound keeps this pure propagation)
    val chain = (1L to 30L).sliding(2).map(s => (s.head, s.last)).toSeq.toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      graft.operators.ConnectedComponents.components(chain, "id_a", "id_b",
          maxIterations = 2, jumpAfter = 2).collect()
    }
  }

  test("connected components: 1000-node path converges in O(log n) rounds via pointer jump") {
    import spark.implicits._
    // worst case for pure min-label propagation (diameter 999, needs ~999
    // rounds); pointer-jumping after round 3 must close it well inside the
    // default 20-round bound, labeling every node with the path minimum
    val path = (1L to 1000L).sliding(2).map(s => (s.head, s.last)).toSeq.toDF("id_a", "id_b")
    val comp = graft.operators.ConnectedComponents.components(path, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(comp.length == 1000)
    assert(comp.forall(_._2 == 1L), s"non-min labels: ${comp.filter(_._2 != 1L).take(5).toSeq}")
  }

  test("simhash: identical docs hamming 0; near dups close; different docs far") {
    val sigs = TextDedup.simhash(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(ham(1L, 2L) == 0)
    assert(ham(1L, 3L) <= 6)
    assert(ham(1L, 4L) > 10)
  }

  test("vector search: brute-force top-k exact ordering, self excluded") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = VectorSearch.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1L),
        "vec_id", "embedding", "vec_id", k = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, 2L), (2, 3L))) // nearest 2, then 3; never self or 4
  }

  test("vector search: LSH bucket join finds near-identical vectors") {
    import spark.implicits._
    val base = (1L to 50L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 31 + d * 7).toFloat)))
    val vecs = (base :+ ((1001L, base.head._2.map(x => x * 1.001f)))).toDF("vec_id", "embedding")
    val planes = Seq.tabulate(6)(p => Seq.tabulate(8)(d => math.cos(p * 13 + d * 3)))
    val out = VectorSearch.lshTopK(vecs, vecs.filter($"vec_id" === 1001L),
        "vec_id", "embedding", "vec_id", planes, k = 1)
      .collect()
    assert(out.length == 1 && out(0).getLong(2) == 1L) // its near-copy tops the bucket
  }

  test("IVF top-k: probes only nearby cells, finds cluster neighbors") {
    import spark.implicits._
    // two tight clusters around (1,0,...) and (0,1,...)
    def around(base: Int, i: Long): Array[Float] =
      Array.tabulate(8)(d => (if (d == base) 1.0 else 0.0).toFloat +
        (math.sin(i * 13 + d) * 0.01).toFloat)
    val vecs = ((1L to 20L).map(i => (i, around(0, i))) ++
      (21L to 40L).map(i => (i, around(1, i)))).toDF("vec_id", "embedding")
    val centroids = Seq(
      Seq(1.0, 0, 0, 0, 0, 0, 0, 0),
      Seq(0.0, 1, 0, 0, 0, 0, 0, 0))
    val out = VectorSearch.ivfTopK(vecs, vecs.filter($"vec_id" === 1L),
        "vec_id", "embedding", "vec_id", centroids, k = 5, nProbe = 1)
      .collect().map(_.getLong(2))
    assert(out.length == 5)
    assert(out.forall(_ <= 20L), s"neighbors must come from the same cluster: ${out.toSeq}")
  }

  test("semantic dedup: cluster cells assigned, within-cell lower-id dups dropped") {
    import spark.implicits._
    // two tight clusters; ids 1-20 cluster 0, 21-40 cluster 1
    def around(base: Int, i: Long): Array[Float] =
      Array.tabulate(8)(d => (if (d == base) 1.0 else 0.0).toFloat +
        (math.sin(i * 13 + d) * 0.01).toFloat)
    val base = (1L to 20L).map(i => (i, around(0, i))) ++
      (21L to 40L).map(i => (i, around(1, i)))
    // 101 = exact copy of 1, 102 = exact copy of 21: each lands in its
    // original's cell and loses to the lower id there
    val vecs = (base ++ Seq((101L, around(0, 1L)), (102L, around(1, 21L))))
      .toDF("vec_id", "embedding")
    val centroids = Seq(
      Seq(1.0, 0, 0, 0, 0, 0, 0, 0),
      Seq(0.0, 1, 0, 0, 0, 0, 0, 0))
    val out = VectorSearch.semanticDedup(vecs, "vec_id", "embedding",
        centroids, threshold = 0.9999999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(out.size == 42)
    val kept = out.filter(_._3).map(_._1).toSet
    // exact copies lose to their lower-id originals; everyone else is
    // kept (distinct 0.01-jitter members peak at cos ≈ 0.9999935)
    assert(!kept.contains(101L) && !kept.contains(102L))
    assert(kept.size == 40)
    // cell labels follow the clusters
    val cells = out.map(t => t._1 -> t._2).toMap
    assert((1L to 20L).forall(cells(_) == 0L) && (21L to 40L).forall(cells(_) == 1L))
    assert(cells(101L) == 0L && cells(102L) == 1L)
  }

  test("quantized k-means matches a driver-side Lloyd replay and is partition-invariant") {
    import spark.implicits._
    // three loose clusters around unit axes with deterministic jitter
    def around(base: Int, i: Long): Array[Float] =
      Array.tabulate(8)(d => (if (d == base) 1.0 else 0.0).toFloat +
        (math.sin(i * 17 + d) * 0.05).toFloat)
    val rows = (1L to 15L).map(i => (i, around(0, i))) ++
      (16L to 30L).map(i => (i, around(3, i))) ++
      (31L to 45L).map(i => (i, around(6, i)))
    val vecs = rows.toDF("vec_id", "embedding")
    def run(df: DataFrame): Seq[(Long, Int, Long)] =
      VectorSearch.quantizedKMeans(df, "vec_id", "embedding", k = 3, iters = 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSeq.sortBy(_._1)
    val out = run(vecs)

    // driver-side replay: same quantization (HALF_UP like Spark round),
    // same seeds (k lowest ids), same floor(sum/count) update, same
    // ties-to-lower-index argmin
    val scale = rows.flatMap(_._2).map(v => math.abs(v.toDouble)).max
    val q = rows.map { case (id, v) =>
      id -> v.map(x => BigDecimal(x.toDouble / scale * 127)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toInt)
    }.sortBy(_._1)
    def d2(v: Array[Int], c: Seq[Int]): Long =
      v.zip(c).map { case (a, b) => val d = (a - b).toLong; d * d }.sum
    var cents: Seq[Seq[Int]] = q.take(3).map(_._2.toSeq)
    for (_ <- 1 until 3) {
      val assign = q.map { case (_, v) =>
        (cents.indices.map(c => (d2(v, cents(c)), c)).min._2, v) }
      cents = cents.indices.map { c =>
        val members = assign.filter(_._1 == c).map(_._2)
        if (members.isEmpty) cents(c)
        else (0 until 8).map(p =>
          math.floor(members.map(_(p).toLong).sum.toDouble / members.size).toInt)
      }
    }
    val expect = q.map { case (id, v) =>
      val (dist, c) = cents.indices.map(c => (d2(v, cents(c)), c)).min
      (id, c, dist)
    }
    assert(out == expect)
    // clusters recovered: each id band lands in one distinct cluster
    val byBand = Seq(1L to 15L, 16L to 30L, 31L to 45L)
      .map(b => out.filter(t => b.contains(t._1)).map(_._2).distinct)
    assert(byBand.forall(_.size == 1) && byBand.flatten.distinct.size == 3)
    // partition-invariant: integer arithmetic + commutative partials
    assert(run(vecs.repartition(7)) == out)
  }

  test("kmpp seeding lands one seed per mass region before any Lloyd round") {
    import spark.implicits._
    // three tight, well-separated clusters ALL of whose lowest ids sit
    // in cluster A — "first" seeding with iters=1 (pure seeding, no
    // update) cannot separate them; k-means|| must: D²-sampling pulls
    // candidates from every distant mass, and the weight·D² greedy
    // keeps one per region rather than an outlier
    def around(base: Int, i: Long): Array[Float] =
      Array.tabulate(8)(d => (if (d == base) 1.0 else 0.0).toFloat +
        (math.sin(i * 13 + d) * 0.02).toFloat)
    val rows = (1L to 20L).map(i => (i, around(0, i))) ++
      (21L to 40L).map(i => (i, around(3, i))) ++
      (41L to 60L).map(i => (i, around(6, i)))
    val vecs = rows.toDF("vec_id", "embedding")
    def bands(seeding: String): Seq[Seq[Int]] = {
      val out = VectorSearch.quantizedKMeans(vecs, "vec_id", "embedding",
          k = 3, iters = 1, seeding = seeding)
        .collect().map(r => (r.getLong(0), r.getInt(1)))
      Seq(1L to 20L, 21L to 40L, 41L to 60L)
        .map(b => out.filter(t => b.contains(t._1)).map(_._2).distinct.toSeq)
    }
    val kmpp = bands("kmpp")
    assert(kmpp.forall(_.size == 1) && kmpp.flatten.distinct.size == 3,
      s"kmpp seeds must separate the three planted clusters: $kmpp")
    // the control: lowest-id seeding starts all three seeds inside
    // cluster A, so cluster A SPLITS across labels and the bands
    // cannot come out one-label-each without Lloyd rounds
    val first = bands("first")
    assert(!(first.forall(_.size == 1) && first.flatten.distinct.size == 3),
      s"control failed — 'first' cleanly separated the clusters at iters=1: $first")
  }

  test("embedding decontamination flags only near-eval vectors") {
    import spark.implicits._
    def unit(d0: Int): Array[Float] = Array.tabulate(8)(d => if (d == d0) 1.0f else 0.0f)
    val evals = Seq((900L, unit(0)), (901L, unit(1))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, unit(0)),                                  // exact copy of eval 900
      (2L, Array.tabulate(8)(d => if (d == 0) 0.99f else if (d == 1) 0.14f else 0f)), // near 900
      (3L, unit(2)),                                  // orthogonal to both
      (4L, unit(1))                                   // exact copy of eval 901
    ).toDF("vec_id", "embedding")
    val out = VectorSearch.decontamFlags(corpus, evals,
        "vec_id", "embedding", "vec_id", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(out.map(_._1) == Seq(1L, 2L, 4L))
    // best_eval_id is the argmax-cosine eval vector
    assert(out == Seq((1L, 1L, 900L), (2L, 1L, 900L), (4L, 1L, 901L)))
  }

  test("quantized top-k matches exact ranking on separated vectors") {
    import spark.implicits._
    // unit-norm vectors: dot ranking (quantized metric) == cosine
    // ranking (exact metric)
    val vecs = (1L to 40L).map { i =>
      val raw = Array.tabulate(16)(d => math.sin(i * 31 + d * 7))
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      (i, raw.map(x => (x / nrm).toFloat))
    }.toDF("vec_id", "embedding")
    val exact = VectorSearch.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1L),
        "vec_id", "embedding", "vec_id", k = 5)
      .select("rank", "id").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val quant = VectorSearch.quantizedTopK(vecs, vecs.filter($"vec_id" === 1L),
        "vec_id", "embedding", "vec_id", k = 5)
      .select("rank", "id").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    // int8 keeps ~2 decimal digits of each component; random vectors'
    // cosine gaps dwarf that, so the top-5 ordering must survive
    assert(quant == exact)
    // quantization is a pure function of the corpus: rerun identical
    val again = VectorSearch.quantizedTopK(vecs.repartition(5), vecs.filter($"vec_id" === 1L),
        "vec_id", "embedding", "vec_id", k = 5)
      .select("rank", "id").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(again == quant)
  }

  test("two-stage rerank: int8 prefilter + exact rerank recovers brute force") {
    import spark.implicits._
    val vecs = (1L to 60L).map { i =>
      val raw = Array.tabulate(16)(d => math.sin(i * 31 + d * 7))
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      (i, raw.map(x => (x / nrm).toFloat))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 1L)
    val exact = VectorSearch.bruteForceTopK(vecs, q,
        "vec_id", "embedding", "vec_id", k = 5)
      .select("rank", "id").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    // 4x over-fetch: every exact top-5 member survives the int8 cut
    val rr = VectorSearch.rerankTopK(vecs, q,
        "vec_id", "embedding", "vec_id", k = 5, candidates = 20)
      .select("rank", "id").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(rr == exact)
    // candidates = k: the kept SET is exactly the prefilter's top-k
    // (stage 2 can only re-order inside the candidate set, never widen it)
    val tight = VectorSearch.rerankTopK(vecs, q,
        "vec_id", "embedding", "vec_id", k = 5, candidates = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    val pre = VectorSearch.quantizedTopK(vecs, q,
        "vec_id", "embedding", "vec_id", k = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(tight == pre)
  }

  test("MMR: lambda=100 degenerates to brute-force order; lambda=50 diversifies") {
    import spark.implicits._
    // planted geometry: a1 = a2 (exact duplicate, different ids) very
    // close to the query; b slightly less relevant but orthogonal-ish
    val rows = Seq(
      (1L, Array(1.0f, 0f, 0f)),        // query
      (2L, Array(0.98f, 0.199f, 0f)),   // a1
      (3L, Array(0.98f, 0.199f, 0f)),   // a2 = dup of a1
      (4L, Array(0.9f, 0f, 0.436f)),    // b: rel .9, far from a-cluster
      (5L, Array(0.5f, 0.5f, 0.707f))). // filler
      toDF("vec_id", "embedding")
    val q = rows.filter($"vec_id" === 1L)
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.orderBy("rank").select("id").collect().map(_.getLong(0)).toSeq
    // pure-relevance lambda: greedy MMR == brute force, rank for rank
    val brute = VectorSearch.bruteForceTopK(rows, q, "vec_id", "embedding", "vec_id", k = 3)
    val pure = VectorSearch.mmrTopK(rows, q, "vec_id", "embedding", "vec_id",
      k = 3, candidates = 4, lambdaPct = 100)
    assert(ids(pure) == ids(brute))
    // balanced lambda: the duplicate a2 (redundancy 1.0 vs picked a1)
    // loses rank 2 to the diverse b
    val div = VectorSearch.mmrTopK(rows, q, "vec_id", "embedding", "vec_id",
      k = 2, candidates = 4, lambdaPct = 50)
    assert(ids(div) == Seq(2L, 4L), s"expected diversified pick, got ${ids(div)}")
  }

  test("cosine near-dup pairs with LSH pruning vs exact") {
    import spark.implicits._
    val base = (1L to 30L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 31 + d * 7))))
    val vecs = (base :+ ((2001L, base.head._2.map(_ * 2.0)))).toDF("vec_id", "vec") // scaled copy: cosine 1
    val exact = VectorSearch.cosineNearDupPairs(vecs, "vec_id", "vec", 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((1L, 2001L)))
    val planes = Seq.tabulate(6)(p => Seq.tabulate(8)(d => math.cos(p * 13 + d * 3)))
    val pruned = VectorSearch.cosineNearDupPairs(vecs, "vec_id", "vec", 0.999, planes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned.contains((1L, 2001L))) // identical direction ⇒ same bucket always
    // banded variant (3 bands × 2 bits): candidates are the union over
    // bands, so recall can only improve on the conjunctive signature;
    // pairs must come out deduplicated across bands
    val banded = VectorSearch.cosineNearDupPairs(vecs, "vec_id", "vec", 0.999,
      planes, bands = 3)
    val bandedPairs = banded.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(bandedPairs.length == bandedPairs.distinct.length, "pairs must be distinct")
    assert(bandedPairs.toSet.subsetOf(exact) && pruned.subsetOf(bandedPairs.toSet))
  }

  test("banded near-dup LSH equals the exact oracle on the planted corpus") {
    // largest locally-available sf (most planted near-threshold pairs);
    // override with GRAFT_TESTDATA_SF_DIR to re-run the guard elsewhere
    val dir = DataPipelineSpec.TestDataDir
    val corpus = graft.queries.DataPipelineQueries.dupVecCorpus(spark, dir)
    // same parameters as the d05 driver query (256 planes, 32 bands)
    val planes = graft.queries.DataPipelineQueries.derivedPlanes(spark, dir, 256)
    val exact = VectorSearch.cosineNearDupPairs(corpus, "vec_id", "vec", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = VectorSearch.cosineNearDupPairs(corpus, "vec_id", "vec", 0.9,
        planes, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "planted corpus must contain near-dup pairs")
    assert(banded == exact,
      s"banded LSH must be lossless here: missed=${exact -- banded} extra=${banded -- exact}")
  }

  test("salted join ≡ plain join; salted distinct count exact") {
    import spark.implicits._
    // skew: key 1 dominates
    val big = ((1L to 900L).map(i => (1L, i)) ++ (1L to 100L).map(i => (2L, i)))
      .toDF("k", "v")
    val small = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).collect().map(_.toSeq).toSet
    val salted = graft.operators.SkewJoin.saltedJoin(big, small, Seq("k"), 8)
      .collect().map(_.toSeq).toSet
    assert(salted == plain && salted.size == 1000)

    val dc = graft.operators.SkewJoin.saltedDistinctCount(big, Seq("k"), "v", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dc == Map(1L -> 900L, 2L -> 100L))

    // hybrid: only the hot key takes the salted path; result identical,
    // multiplicities included (a key leaking into both paths would
    // double its rows and break the Seq comparison)
    val hybrid = graft.operators.SkewJoin.hybridSkewJoin(
      big, small, Seq("k"), hotKeys = Seq(Seq(1L)), saltBuckets = 8)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(hybrid == big.join(small, Seq("k")).collect()
      .map(_.toSeq).sortBy(_.toString).toSeq)
    // a declared hot key absent from the data is harmless
    val hybrid2 = graft.operators.SkewJoin.hybridSkewJoin(
      big, small, Seq("k"), hotKeys = Seq(Seq(1L), Seq(99L)), saltBuckets = 4)
    assert(hybrid2.count() == 1000L)
    // cold path's small side is NOT replicated: the only explode feeds
    // the hot slice (blanket salting would explode the whole dimension)
    val coldSmall = hybrid2.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(coldSmall.size == 1, "exactly one salt explode (the hot slice)")
  }

  test("text functions: tokens, counts, quality, langid") {
    val df = docs(
      1L -> "The quick brown fox, it jumps over the lazy dog!",
      2L -> "der die und das ist ein test von der sache",
      3L -> "")
    val out = df.select(
      col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.punctCount(col("text")).as("p"),
      TextFunctions.langId(col("text")).as("lang"),
      TextFunctions.qualityScore(col("text")).as("q"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(out(0)._2 == 10 && out(0)._3 == 2 && out(0)._4 == "en")
    assert(out(1)._4 == "de")
    assert(out(2)._2 == 0 && out(2)._4 == "und")
    assert(out.forall(t => t._5 >= 0.0 && t._5 <= 1.0))
  }

  test("word ngrams: standard, short-doc, and empty-doc edges") {
    val out = docs(1L -> "a b c d", 2L -> "a b", 3L -> "")
      .select(col("doc_id"), TextFunctions.wordNgrams(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(out(1L) == Set("a b c", "b c d"))
    assert(out(2L) == Set("a b"))
    assert(out(3L) == Set.empty[String])
  }

  test("incremental dedup: batch vs store index finds planted dups; index appends compose") {
    val store = docs(
      1L -> "the quick brown fox jumps over the lazy dog and runs far away today",
      2L -> "completely different content about spark catalyst optimizer rules engine",
      3L -> "yet another unrelated document discussing parquet column pruning today ok")
    val batch = docs(
      10L -> "the quick brown fox jumps over the lazy dog and runs far away today", // dup of 1
      11L -> "nothing like anything in the existing corpus whatsoever right now")
    val index = IncrementalDedup.bandIndex(store, "doc_id", "text")
    val hits = IncrementalDedup.dedupAgainst(index, store, batch, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits == Set((10L, 1L)))
    // the index is append-only: signing slices independently equals
    // signing the whole store (per-doc signatures don't cross docs)
    val sliced = IncrementalDedup.bandIndex(store.filter(col("doc_id") < 3), "doc_id", "text")
      .unionAll(IncrementalDedup.bandIndex(store.filter(col("doc_id") >= 3), "doc_id", "text"))
    val whole = index.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val parts = sliced.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(whole == parts)
  }

  test("incremental dedup: over-limit candidates verify via shuffle joins, same result") {
    import spark.implicits._
    val clusterText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val store = (1L to 60L).map(i => (i, clusterText)).toDF("doc_id", "text")
    val batch = (1001L to 1010L).map(i => (i, clusterText)).toDF("doc_id", "text")
    val index = IncrementalDedup.bandIndex(store, "doc_id", "text")
    def run(limit: Long) = IncrementalDedup
      .dedupAgainst(index, store, batch, "doc_id", "text", broadcastCandidateLimit = limit)
      .select("batch_id", "store_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaShuffle = run(10L)     // 600 candidates ≫ 10 → shuffle path
    val viaBroadcast = run(100000L)
    assert(viaShuffle.size == 600, s"10 batch × 60 store dups, got ${viaShuffle.size}")
    assert(viaShuffle == viaBroadcast)
  }

  test("decontaminate: flags only docs overlapping the eval set; clean() drops them") {
    val evalSet = docs(
      100L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val pool = docs(
      1L -> "prefix words alpha beta gamma delta epsilon zeta eta theta suffix", // 8-gram overlap
      2L -> "alpha beta gamma delta different tail here now ok fine",            // <8 shared tokens
      3L -> "totally unrelated content with no shared words at all today")
    val report = Decontaminate.report(pool, evalSet, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(report.keySet == Set(1L))
    assert(report(1L) >= 1L)
    val kept = Decontaminate.clean(pool, evalSet, "doc_id", "text", n = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }

  test("stratified sample: deterministic across partitionings, nested rates, exact bounds") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("doc_id", "stratum")
    val rate = when(col("stratum") === "even", 10).otherwise(50)
    val once = Sampling.stratifiedSample(df, "doc_id", rate)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val again = Sampling.stratifiedSample(df.repartition(7), "doc_id", rate)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once == again, "membership must not depend on partitioning")
    // rate p ⊆ rate q for p < q (bucket < p ⇒ bucket < q)
    val wider = Sampling.stratifiedSample(df, "doc_id", lit(50))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once.subsetOf(wider))
    assert(Sampling.stratifiedSample(df, "doc_id", lit(0)).count() == 0L)
    assert(Sampling.stratifiedSample(df, "doc_id", lit(100)).count() == 1000L)
    // md5 buckets are uniform: each stratum lands near its rate
    val evens = once.count(_ % 2 == 0)
    val odds = once.size - evens
    assert(evens > 20 && evens < 80, s"~50 expected, got $evens")
    assert(odds > 175 && odds < 325, s"~250 expected, got $odds")
  }

  test("repetition metrics: duplicated 2-grams fail the keep gate") {
    val loop = Array.fill(20)("spam ham").mkString(" ")            // 2 grams repeated 20×
    val varied = (1 to 40).map(i => s"w$i").mkString(" ")           // all distinct
    val df = docs(1L -> loop, 2L -> varied)
    val n2 = size(TextFunctions.wordNgramsAll(col("text"), 2))
    val d2 = size(TextFunctions.wordNgrams(col("text"), 2))
    val out = df.select(col("doc_id"), n2.as("n"), d2.as("d"),
        (((n2 - d2) * 10) <= n2).as("keep"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(out(1L)._1 == 39 && out(1L)._2 == 2 && !out(1L)._3)
    assert(out(2L)._1 == 39 && out(2L)._2 == 39 && out(2L)._3)
  }

  test("winnowed fingerprint: deterministic, shared substrings detected, edit-local") {
    // varied shared passage (a periodic prefix collapses to ~one period
    // of distinct grams, under-weighting the shared region)
    val shared = (1 to 40).map(i => s"catalyst$i optimizer$i").mkString(" ") + " "
    val df = docs(
      1L -> (shared + "unique tail one"),
      2L -> (shared + "other ending two"),
      3L -> "totally unrelated short text")
    val fp = df.select(col("doc_id"), WinnowedFingerprint(col("text"), 8, 4).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // determinism across evaluations
    val fp2 = df.select(col("doc_id"), WinnowedFingerprint(col("text"), 8, 4).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fp == fp2)
    val overlap12 = (fp(1L) intersect fp(2L)).size.toDouble / (fp(1L) union fp(2L)).size
    val overlap13 = (fp(1L) intersect fp(3L)).size.toDouble / (fp(1L) union fp(3L)).size
    assert(overlap12 >= 0.5, s"shared-prefix docs should share fingerprints ($overlap12)")
    assert(overlap13 < 0.2, s"unrelated docs should not ($overlap13)")
    // empty + shorter-than-k inputs
    val edges = docs(7L -> "", 8L -> "abc")
      .select(col("doc_id"), WinnowedFingerprint(col("text"), 8, 4).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(edges(7L).isEmpty && edges(8L).length == 1)
  }

  test("multimodal: resize plan and embedding extraction feed the ANN path") {
    val d = docs(
      0L -> ("x" * 2000), 3L -> ("y" * 50), 6L -> ("z" * 800))
      .withColumn("source", lit("s"))
    val media = Multimodal.syntheticMedia(d, "doc_id", "text", "source") // all "image" (ids %3==0)
    val feats = Multimodal.processBatches(media)
    val resized = Multimodal.resizePlan(feats, maxDim = 256)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    resized.foreach { case (_, (w, h, tw, th)) =>
      assert(tw <= 256 && th <= 256)
      assert(tw == w && th == h || math.max(tw, th) == 256 ||
        math.abs(tw.toDouble / th - w.toDouble / h) < 0.05) // aspect preserved
    }

    val emb = Multimodal.embedBatches(media, dim = 8)
    assert(emb.schema.fieldNames.toSeq == Seq("media_id", "embedding"))
    // embeddings deterministic + usable by VectorSearch
    val top = VectorSearch.bruteForceTopK(emb, emb.filter(col("media_id") === 0L),
      "media_id", "embedding", "media_id", k = 2)
    assert(top.collect().length == 2)
    val emb2 = Multimodal.embedBatches(media, dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val emb1 = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(emb1 == emb2)
  }

  test("video near-dup: same-position frame agreement, prefix edit costs one frame") {
    import spark.implicits._
    val base = ("x" * 200)
    val media = Seq(
      (1L, base),                        // original
      (2L, base),                        // exact copy — shares all frames
      (3L, "zz" + base.substring(2)),    // frame 0 differs, rest shared
      (4L, "y" * 200))                   // no shared frames
      .map { case (id, t) => (id, "video", t.getBytes("UTF-8"), "src") }
      .toDF("media_id", "kind", "content", "source")
      .as[Multimodal.MediaRecord]
    val pairs = Multimodal.videoNearDupPairs(media, stride = 32, maxFrames = 8, minShared = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // 200 bytes / 32 ⇒ 7 frames
    assert(pairs((1L, 2L)) == 7L)
    assert(pairs((1L, 3L)) == 6L && pairs((2L, 3L)) == 6L)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("audio near-dup: alignment matching catches hop-aligned shifts video matching misses") {
    import spark.implicits._
    // pseudo-random ASCII so windows inside one clip are all distinct
    val base = (0 until 300).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val other = (0 until 300).map(i => ('a' + (i * 11 + 5) % 26).toChar).mkString
    def mk(kind: String) = Seq(
      (1L, base),                 // original
      (2L, base),                 // exact copy — aligns at delta 0
      (3L, ("P" * 32) + base),    // 32-byte (2-hop) prefix insertion
      (4L, other))                // unrelated
      .map { case (id, t) => (id, kind, t.getBytes("UTF-8"), "src") }
      .toDF("media_id", "kind", "content", "source")
      .as[Multimodal.MediaRecord]
    val audio = Multimodal.audioNearDupPairs(mk("audio"), windowBytes = 32,
        hop = 16, maxWins = 16, minAligned = 4, maxSigDf = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(2), r.getLong(3)))
      .toMap
    // exact copy: every window aligns at delta 0
    assert(audio((1L, 2L)) == ((0, 16L)))
    // shifted copy: clip 3's window w ≥ 2 equals clip 1's window w − 2,
    // so the pair aligns at delta −2 on 14 windows
    assert(audio((1L, 3L)) == ((-2, 14L)) && audio((2L, 3L)) == ((-2, 14L)))
    assert(!audio.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    // the same shift defeats POSITIONAL matching: no same-position
    // frame of the prefix-inserted copy agrees with the original
    val video = Multimodal.videoNearDupPairs(mk("video"), stride = 32,
        maxFrames = 8, minShared = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(video.contains((1L, 2L)) && !video.contains((1L, 3L)))
  }

  test("audio near-dup: over-common landmark cap drops the hot signature before the join") {
    import spark.implicits._
    // 70 clips share one window-aligned 32-byte block; tails distinct
    val shared = "S" * 32
    val media = (1L to 70L).map { i =>
      // the 16-char id block repeats, so EVERY tail window carries the
      // id — no accidental cross-clip window collisions
      val tail = ("%016d".format(i) * 5).take(68)
      (i, "audio", (shared + tail).getBytes("UTF-8"), "src")
    }.toDF("media_id", "kind", "content", "source")
      .as[Multimodal.MediaRecord]
    def pairs(cap: Int): Long =
      Multimodal.audioNearDupPairs(media, windowBytes = 32, hop = 16,
        maxWins = 16, minAligned = 1, maxSigDf = cap).count()
    // df(shared-block sig) = 70: cap 64 drops it — zero pairs survive;
    // a loose cap would pair every clip with every other on that one
    // hot landmark (70·69/2 pairs from a single signature)
    assert(pairs(64) == 0L)
    assert(pairs(100) == 70L * 69L / 2L)
  }

  test("image near-dup: banded hamming join equals brute-force popcount pairs") {
    import spark.implicits._
    // driver-side replica of the 60-bit block hash
    def phash(bytes: Array[Byte], blockBytes: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until math.min(60, (bytes.length + blockBytes - 1) / blockBytes))
        .foldLeft(0L) { (h, b) =>
          val slice = bytes.slice(b * blockBytes, math.min((b + 1) * blockBytes, bytes.length))
          val nibble = (md.digest(slice)(0) >> 4) & 0xf
          if (nibble >= 8) h | (1L << b) else h
        }
    }
    // varied random-ish contents + planted copies (exact and 1-byte edit)
    val rnd = new scala.util.Random(42)
    val base = (1 to 12).map(i =>
      i.toLong -> Array.fill(40 + rnd.nextInt(160))(rnd.nextInt(128).toByte))
    val planted = base ++ Seq(
      100L -> base.head._2.clone(),
      101L -> { val c = base.head._2.clone(); c(0) = (c(0) ^ 1).toByte; c })
    val media = planted.map { case (id, c) => (id, "image", c, "src") }
      .toDF("media_id", "kind", "content", "source")
      .as[Multimodal.MediaRecord]
    val got = Multimodal.imageNearDupPairs(media, blockBytes = 16, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val hs = planted.map { case (id, c) => id -> phash(c, 16) }.toMap
    val expect = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= 3
    } yield (a, b) -> d).toMap
    assert(got == expect, s"got $got expect $expect")
    assert(got.contains((1L, 100L)) && got((1L, 100L)) == 0)
    assert(got.contains((1L, 101L)) && got((1L, 101L)) <= 1)
  }

  test("codec injection: a custom MediaCodec swaps in, plans unchanged") {
    import spark.implicits._
    val media = Seq(
      (1L, "image", ("a" * 100).getBytes("UTF-8"), "s"),
      (2L, "image", ("b" * 100).getBytes("UTF-8"), "s"),
      (3L, "video", ("c" * 100).getBytes("UTF-8"), "s"))
      .toDF("media_id", "kind", "content", "source")
      .as[Multimodal.MediaRecord]
    val codec = DataPipelineSpec.ParityCodec

    // decode: fixed dimensions flow through the batch contract
    val feats = Multimodal.processBatches(media, codec = codec).collect()
    assert(feats.forall(f => f.width == 640 && f.checksum == 42L))

    // embed: constant per-id vectors flow through the same batch shape
    val emb = Multimodal.embedBatches(media, dim = 4, codec = codec)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(emb(2L) == Seq(3.0f, 3.0f, 3.0f, 3.0f))

    // blockBit: parity bits give every 100-byte image the identical
    // 7-block hash 0b1010101 = 85, making ALL image pairs hamming-0 —
    // the banded join plan must surface exactly those pairs
    val hashes = Multimodal.perceptualHashes(media, blockBytes = 16, codec = codec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes == Map(1L -> 85L, 2L -> 85L))
    val pairs = Multimodal.imageNearDupPairs(media, blockBytes = 16,
        maxHamming = 3, codec = codec)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0)))

    // frameSig: position-only signatures make every same-length video
    // pair share all frames (only one video here: no pairs, no errors)
    val sigs = Multimodal.frameSignatures(media, stride = 32, maxFrames = 8,
        codec = codec)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(sigs.forall { case (id, no, sig) => id == 3L && sig == s"pos$no" })
  }

  test("multimodal: batch plumbing preserves ids, stub features deterministic") {
    val d = docs(
      0L -> "abcdefgh", 1L -> "0123456789", 2L -> "xyz")
      .withColumn("source", lit("s"))
    val media = Multimodal.syntheticMedia(d, "doc_id", "text", "source")
    val feats = Multimodal.processBatches(media, batchSize = 2).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(0L, 1L, 2L))
    assert(feats.map(_.kind).toSeq == Seq("image", "audio", "video"))
    assert(feats(0).byte_size == 8 && feats(0).width == 64 + 8 % 577 && feats(0).channels == 3)
    assert(feats(1).duration_ms == 10 * 8 && feats(1).channels == 2)
    // checksum is order-aware and deterministic
    val again = Multimodal.processBatches(media, batchSize = 1).collect().sortBy(_.media_id)
    assert(feats.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
    // frame sampling explodes video payloads only
    val frames = Multimodal.sampleFrames(media, stride = 2, maxFrames = 2).collect()
    assert(frames.forall(_.getLong(0) == 2L) && frames.length == 2)
  }

  // ── codegen kernels ≡ the compositions they replaced ────────────────

  test("WordGrams kernel is bit-identical to the transform/slice composition") {
    import spark.implicits._
    // edge shapes: empty, shorter than n, exactly n, repeats, unicode,
    // single token, plus a pseudo-random spread
    val rnd = new scala.util.Random(7)
    val cases: Seq[Seq[String]] =
      Seq(Seq(), Seq("a"), Seq("a", "b"), Seq("a", "b", "c"),
        Seq("x", "x", "x", "x"), Seq("α", "βγ", "δ", "ε", "ζ")) ++
      (1 to 40).map(_ => Seq.fill(rnd.nextInt(12))(
        rnd.alphanumeric.take(1 + rnd.nextInt(5)).mkString))
    for (n <- Seq(1, 2, 3, 8)) {
      val df = cases.map(Tuple1(_)).toDF("toks")
      val composed = {
        val toks = col("toks")
        val count = size(toks)
        val grams = transform(
          sequence(lit(0), greatest(count - n, lit(0))),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))
        when(count === 0, array().cast("array<string>")).otherwise(grams)
      }
      val rows = df.select(
          graft.functions.WordGrams(col("toks"), n).as("kernel"),
          composed.as("composed"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n kernel=${r.getSeq[String](0)} composed=${r.getSeq[String](1)}")
      }
    }
  }

  test("PlaneBandKeys kernel matches per-band lshSignature slices") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dims = 16
    val planes: Seq[Seq[Double]] =
      Seq.fill(32)(Seq.fill(dims)(rnd.nextGaussian()))
    val vecs: Seq[Seq[Double]] =
      Seq.fill(25)(Seq.fill(dims)(rnd.nextGaussian())) :+ Seq.fill(dims)(0.0)
    val bands = 4
    val bits = planes.size / bands
    val df = vecs.map(Tuple1(_)).toDF("vec")
    val sliced = array((0 until bands).map { j =>
      VectorSearch.lshSignature(col("vec"), planes.slice(j * bits, (j + 1) * bits))
    }: _*)
    val rows = df.select(
        graft.functions.PlaneBandKeys(col("vec"), planes, bits).as("kernel"),
        sliced.as("composed"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("leakageSafeSplit: dup-group members never straddle, doc-id split does") {
    import spark.implicits._
    // 200 docs, each with a near-copy 100k ids away sharing its
    // normalized content — the d17/d52 planting shape
    val base = (0L until 200L).map(i => (i, s"Doc body $i"))
    val variants = base.map { case (i, t) => (i + 100000L, t.toUpperCase + " !!") }
    val corpus = (base ++ variants).toDF("doc_id", "text")
      .withColumn("grp", md5(TextDedup.normalizedText(col("text"))))
    val byGroup = Sampling.leakageSafeSplit(corpus, col("grp"), 90)
    assert(byGroup.groupBy("grp").agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count() == 0, "group split leaked")
    // both sides populated (90/10 over 200 groups)
    assert(byGroup.select("split").distinct().count() == 2)
    // the naive per-doc split DOES straddle: ids i and i+100000 hash
    // independently, so among 200 pairs at 90/10 some pair disagrees
    val byDoc = Sampling.leakageSafeSplit(corpus, col("doc_id"), 90)
    assert(byDoc.groupBy("grp").agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count() > 0,
      "doc-id split unexpectedly leak-free — planting broken?")
    intercept[IllegalArgumentException] {
      Sampling.leakageSafeSplit(corpus, col("grp"), 100)
    }
  }
}

object DataPipelineSpec {
  /** Shared testdata dir for the oracle-parity guards: the largest
    * locally-available sf, overridable for ad-hoc re-runs elsewhere.
    */
  val TestDataDir: String =
    sys.env.getOrElse("GRAFT_TESTDATA_SF_DIR", "/root/testdata/sf0.1")

  /** A non-default codec for the injection test: fixed decode
    * dimensions, constant embeddings, parity block bits, position-only
    * frame signatures. Top-level so the mapPartitions closure
    * serializes without dragging the spec class (and its
    * SparkSession) along.
    */
  object ParityCodec extends Multimodal.MediaCodec {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    def decode(r: Multimodal.MediaRecord): Multimodal.MediaFeatures =
      Multimodal.MediaFeatures(r.media_id, r.kind, r.content.length.toLong,
        width = 640, height = 480, channels = 3, duration_ms = 0L, checksum = 42L)
    def embed(r: Multimodal.MediaRecord, dim: Int): Array[Float] =
      Array.fill(dim)(r.media_id.toFloat + 1.0f)
    def blockBit(content: Column, block: Column, blockBytes: Int): Column =
      pmod(block, lit(2)) === 0
    def frameSig(content: Column, byteOffset: Column, stride: Int): Column =
      concat(lit("pos"), (byteOffset / stride).cast("int").cast("string"))
  }
}
