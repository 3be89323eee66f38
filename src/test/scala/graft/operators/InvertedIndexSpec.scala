package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Positional-postings semantics: 1-based positions, phrase matching
  * via shifted equi-joins — including the overlap and repeated-term
  * edges a substring-style mental model gets wrong.
  */
class InvertedIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def posOf(docs: Seq[(Long, String)]) =
    InvertedIndex.positions(docs.toDF("doc_id", "text"), "doc_id", "text")

  private def counts(docs: Seq[(Long, String)], phrase: String): Map[Long, Long] =
    InvertedIndex.phraseCount(posOf(docs), phrase.split(" ").toSeq)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("positions are 1-based and lowercased-token aligned") {
    val p = posOf(Seq(1L -> "  The quick  Fox ")).collect()
      .map(r => (r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(p.toSeq == Seq(1L -> "the", 2L -> "quick", 3L -> "fox"))
  }

  test("phrase occurrences count every start position, order-sensitively") {
    val docs = Seq(
      1L -> "new york is not york new",   // 1 match, reversal not counted
      2L -> "new york new york",          // 2 non-overlapping matches
      3L -> "york new",                   // reversal only: no match
      4L -> "new",                        // phrase longer than doc
      5L -> "")
    assert(counts(docs, "new york") == Map(1L -> 1L, 2L -> 2L))
  }

  test("repeated-term phrases count overlapping occurrences") {
    // "a a" in "a a a a": starts at 1,2,3 — overlaps included (the
    // positional-join definition; substring scanners agree here)
    assert(counts(Seq(1L -> "a a a a"), "a a") == Map(1L -> 3L))
    // "a b a" in "a b a b a": starts at 1 and 3
    assert(counts(Seq(1L -> "a b a b a"), "a b a") == Map(1L -> 2L))
  }

  test("single-term phrase degenerates to term frequency") {
    assert(counts(Seq(1L -> "x y x x", 2L -> "y"), "x") == Map(1L -> 3L))
  }

  test("recrawl masking: stale positions never feed the adjacency joins") {
    import graft.streaming.PostingsIndex
    val cat = new graft.sources.TableCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft-posmask")
        .toFile.getAbsolutePath + "/cat")
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noneIds = spark.range(0).select(col("id").as("doc_id"))
    PostingsIndex.commitPositionsBatch(cat,
      Seq(1L -> "a b c", 2L -> "b c d").toDF("doc_id", "text"), noneIds, 0L)
    // recrawl doc 1: "b c" moves from positions (2,3) to (1,2); the
    // stale revision would still claim a "a b" start at position 1
    PostingsIndex.commitPositionsBatch(cat,
      Seq(1L -> "b c a").toDF("doc_id", "text"), noneIds, 1L, replace = true)
    // delete doc 2 entirely
    PostingsIndex.commitPositionsBatch(cat, none,
      Seq(2L).toDF("doc_id"), 2L)
    val live = PostingsIndex.livePositions(cat)
    def phrase(p: String) = InvertedIndex.phraseCount(live, p.split(" ").toSeq)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(phrase("a b") == Map.empty, "stale revision served a phantom start")
    assert(phrase("b c") == Map(1L -> 1L), "fresh revision missing or doubled")
    assert(phrase("c a") == Map(1L -> 1L))
    assert(phrase("c d") == Map.empty, "deleted doc still served")
    // re-ingest after delete revives the id at the new revision
    PostingsIndex.commitPositionsBatch(cat,
      Seq(2L -> "d c b").toDF("doc_id", "text"), noneIds, 3L)
    assert(InvertedIndex.phraseCount(PostingsIndex.livePositions(cat),
      Seq("d", "c")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == Map(2L -> 1L))
  }

  test("proximity counts all close pairs, direction-blind, window-inclusive") {
    val docs = Seq(
      1L -> "a x b",           // dist 2: one pair
      2L -> "b x x x x x a",   // dist 6 > window 5: excluded entirely
      3L -> "a b x x a",       // pairs: (1,2)=1, (5,2)=3 → n=2, min=1, mass=5+3
      4L -> "a a",             // no b: absent
      5L -> "b a")             // reversed order still counts: dist 1
    val r = InvertedIndex.proximity(posOf(docs), "a", "b", window = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(r == Map(
      1L -> ((1L, 2L, 4L)),
      3L -> ((2L, 1L, 8L)),
      5L -> ((1L, 1L, 5L))))
    // window boundary is inclusive: dist == window scores 1
    val edge = InvertedIndex.proximity(
      posOf(Seq(1L -> "a x x x x b")), "a", "b", window = 5)
      .collect()(0)
    assert((edge.getLong(1), edge.getLong(2), edge.getLong(3)) == ((1L, 5L, 1L)))
  }
}
