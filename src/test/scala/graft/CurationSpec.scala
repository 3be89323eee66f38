package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Redaction
import graft.operators.{AsofJoin, Quantiles, Sampling, SequencePacking, TextDedup}
import graft.queries.CurationQueries

/** Unit tests for the round-4 curation operators: as-of join semantics,
  * domain-mixture thresholds, sequence packing, exact quantiles, PII
  * redaction.
  */
class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // ── AsofJoin ────────────────────────────────────────────────────────

  private def asofFixture: (DataFrame, DataFrame) = {
    import spark.implicits._
    val probe = Seq(
      (1L, 10L, ts(100)), // before any build row
      (2L, 10L, ts(200)), // exactly at a build ts (strict: must miss it)
      (3L, 10L, ts(300)), // after two build rows
      (4L, 20L, ts(300))  // key with no build rows
    ).toDF("event_id", "user_id", "ts")
    val build = Seq(
      (10L, ts(200), 91L),
      (10L, ts(250), 92L),
      (10L, ts(250), 93L) // tie on (key, ts): greatest payload must win
    ).toDF("user_id", "ts", "b_id")
    (probe, build)
  }

  test("asof strict: latest strictly-prior build row per probe") {
    val (probe, build) = asofFixture
    val out = AsofJoin.asofLookup(probe, build, Seq("user_id"), "ts", Seq("b_id"))
      .orderBy("event_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq == Seq(1L -> -1L, 2L -> -1L, 3L -> 93L, 4L -> -1L))
  }

  test("asof non-strict: equal-ts build row is visible") {
    val (probe, build) = asofFixture
    val out = AsofJoin.asofLookup(probe, build, Seq("user_id"), "ts", Seq("b_id"),
        strict = false)
      .orderBy("event_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq == Seq(1L -> -1L, 2L -> 91L, 3L -> 93L, 4L -> -1L))
  }

  test("asof ignores null-ts build rows (no time-axis position)") {
    import spark.implicits._
    val probe = Seq((1L, 10L, ts(100))).toDF("event_id", "user_id", "ts")
    val build = Seq((10L, Option.empty[Timestamp], 91L), (10L, Some(ts(50)), 92L))
      .toDF("user_id", "ts", "b_id")
    val out = AsofJoin.asofLookup(probe, build, Seq("user_id"), "ts", Seq("b_id"))
      .collect()
    assert(out.length == 1 && out(0).getLong(3) == 92L,
      "null-ts build row must not be carried") // NOT 91
  }

  test("asof plans a single exchange before the window (no range join)") {
    val (probe, build) = asofFixture
    val df = AsofJoin.asofLookup(probe, build, Seq("user_id"), "ts", Seq("b_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"as-of must not fall back to a product join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one key shuffle, got $exchanges:\n$plan")
  }

  // ── SequencePacking ─────────────────────────────────────────────────

  test("packing fills contiguous windows and spills long docs") {
    import spark.implicits._
    // one shard (ids all ≡ 0 mod 1) → pure contiguous semantics
    val df = Seq((0L, 3L), (1L, 4L), (2L, 10L), (3L, 2L))
      .toDF("doc_id", "n")
    val out = SequencePacking.pack(df, "doc_id", col("n"), ctx = 8, shards = 1)
      .orderBy("doc_id")
      .select("pack_id", "pack_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // starts: 0, 3, 7, 17 → packs 0,0,0,2 offsets 0,3,7,1
    assert(out.toSeq == Seq((0L, 0L), (0L, 3L), (0L, 7L), (2L, 1L)))
  }

  test("packing is shard-disjoint and partitioning-invariant") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, 5L + i % 7)).toDF("doc_id", "n")
    val a = SequencePacking.pack(df, "doc_id", col("n"), 64, 4)
      .orderBy("doc_id").collect().toSeq
    val b = SequencePacking.pack(df.repartition(13), "doc_id", col("n"), 64, 4)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    val shards = a.map(r => (r.getLong(1), r.getLong(3) / SequencePacking.PackIdSpace))
    assert(shards.forall { case (shard, packShard) => shard == packShard })
  }

  // ── Quantiles ───────────────────────────────────────────────────────

  test("exact quantiles pick the rank-ceil element per group") {
    import spark.implicits._
    val df = ((1 to 10).map(i => ("a", i)) ++ Seq(("b", 5), ("b", 9)))
      .toDF("g", "v").withColumn("tie", col("v"))
    val out = Quantiles.exactQuantiles(df, Seq("g"), "v", "tie", q = 4)
      .orderBy("g", "quantile").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    // group a (n=10): positions ceil(2.5)=3, ceil(5)=5, ceil(7.5)=8
    // group b (n=2): positions 1, 1, 2
    assert(out.toSeq == Seq(
      ("a", 1, 3), ("a", 2, 5), ("a", 3, 8),
      ("b", 1, 5), ("b", 2, 5), ("b", 3, 9)))
  }

  test("approx quantiles agree with exact on a large uniform group") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ("g", i)).toDF("g", "v")
    val approx = Quantiles.approxQuantiles(df, Seq("g"), "v", Seq(0.5))
      .collect()(0).getSeq[Int](1).head
    assert(math.abs(approx - 500) <= 5)
  }

  test("t14 sketch gate: bounds hold on real data and exact witnesses match t07") {
    val dir = "/root/testdata/sf0.001"
    val rows = CurationQueries.t14_sketch_bounds(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    // the gated property: every sketch lands inside its error bound
    assert(rows.forall(_._3), s"sketch outside bound: ${rows.filterNot(_._3).toSeq}")
    // the witness columns: pctl exact values are t07's rank-based
    // quantiles for the same (lang, decile)
    val t07 = graft.operators.Quantiles.exactQuantiles(
        graft.Tables(spark, dir, "documents"), Seq("lang"), "n_chars", "doc_id", q = 10)
      .collect().map(r => (s"pctl_${r.getString(0)}_${r.getInt(1)}", r.getLong(2))).toMap
    rows.filter(_._1.startsWith("pctl_")).foreach { case (m, v, _) =>
      assert(t07(m) == v, s"$m witness $v != t07 ${t07(m)}")
    }
  }

  test("epochUpsample: per-domain integer expansion, zero drops, default passes through") {
    import spark.implicits._
    val df = Seq((1L, "wiki"), (2L, "wiki"), (3L, "spam"), (4L, "web"))
      .toDF("doc_id", "source")
    val out = Sampling.epochUpsample(df, "source", Map("wiki" -> 3, "spam" -> 0))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.count(_._2 == "wiki") == 6)             // 2 docs x 3 epochs
    assert(!out.exists(_._2 == "spam"))                // 0 => dropped
    assert(out.filter(_._1 == 4L).map(_._3).toSeq == Seq(1)) // default 1x
    assert(out.filter(_._1 == 1L).map(_._3).sorted.toSeq == Seq(1, 2, 3))
  }

  test("t15 collocations: gate and counts agree with a direct recount") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark, dir, "documents")
    val toks = docs.select(graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    val n = toks.agg(sum(size(col("toks")))).collect()(0).getLong(0)
    val uniMap = toks.select(explode(col("toks")).as("w")).groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = CurationQueries.t15_collocations(spark, dir).collect()
    rows.foreach { r =>
      // join reordering can shuffle column positions: read by name
      val m = r.getValuesMap[Any](Seq("w1", "w2", "c_xy", "c_x", "c_y"))
      val (a, b) = (m("w1").asInstanceOf[String], m("w2").asInstanceOf[String])
      assert(uniMap(a) == m("c_x").asInstanceOf[Long], s"c_x recount for $a")
      assert(uniMap(b) == m("c_y").asInstanceOf[Long], s"c_y recount for $b")
      val gate = 5L * m("c_xy").asInstanceOf[Long] * n >
        7L * m("c_x").asInstanceOf[Long] * m("c_y").asInstanceOf[Long]
      assert(gate && m("c_xy").asInstanceOf[Long] >= 5, s"gate must hold for ($a,$b)")
    }
  }

  test("q32 cube: levels reconcile to the grand total") {
    val dir = "/root/testdata/sf0.001"
    val rows = CurationQueries.q32_cube_grouping(spark, dir).collect()
    val byGid = rows.groupBy(_.getLong(2))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L))
    val grand = byGid(3L).head.getLong(4)
    // every marginal level re-sums to the same total item count
    Seq(0L, 1L, 2L).foreach { g =>
      assert(byGid(g).map(_.getLong(4)).sum == grand, s"gid=$g n_items mismatch")
    }
    // flag_grouped mirrors the returnflag bit of gid (MSB)
    rows.foreach(r => assert((r.getLong(2) >= 2) == (r.getInt(3) == 1)))
  }

  test("keySkewReport: metrics recount on a hand-built skewed relation") {
    import spark.implicits._
    // key 1 -> 6 rows, key 2 -> 3, keys 3..6 -> 1 each: n_keys=6, n_rows=13
    val df = (Seq.fill(6)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L, 4L, 5L, 6L))
      .toDF("k")
    val m = graft.operators.SkewJoin.keySkewReport(df, "k", topK = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("n_keys") == 6 && m("n_rows") == 13 && m("max_group") == 6)
    // skew_ppm = 6 * 1e6 * 6 div 13
    assert(m("skew_ppm") == 6L * 1000000L * 6L / 13L)
    // size histogram: sizes (1,1,1,1,3,6); p50 -> rank 3 -> 1; p99 -> rank 6 -> 6
    assert(m("p50_group") == 1 && m("p99_group") == 6)
    assert(m("top1_key") == 1 && m("top1_cnt") == 6)
    assert(m("top2_key") == 2 && m("top2_cnt") == 3)
  }

  // ── Sampling.domainMix ──────────────────────────────────────────────

  test("domain mix keeps ~weight·budget per group, drops unweighted groups") {
    import spark.implicits._
    val df = ((0L until 800L).map(i => (i, "en")) ++
      (800L until 1000L).map(i => (i, "de")) ++
      (1000L until 1100L).map(i => (i, "xx"))).toDF("doc_id", "lang")
    val out = Sampling.domainMix(df, "doc_id", "lang",
      Map("en" -> 60L, "de" -> 40L), budgetNum = 1L, budgetDen = 2L)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("xx"))
    // budget T = 550; targets: en 330/800, de 220/200 → capped at 200
    assert(counts("de") == 200L) // rate capped at 100%: everything kept
    assert(math.abs(counts("en") - 330L) < 60L) // binomial around target
    // determinism: same membership on rerun with different partitioning
    val again = Sampling.domainMix(df.repartition(7), "doc_id", "lang",
      Map("en" -> 60L, "de" -> 40L), budgetNum = 1L, budgetDen = 2L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  // ── Sampling.groupSplit / shardShuffle ──────────────────────────────

  test("group split is pure per group; NULL groups land in test") {
    import spark.implicits._
    val df = ((0L until 200L).map(i => (i, s"host${i % 20}")) :+
      (200L, null.asInstanceOf[String])).toDF("doc_id", "host")
    val out = Sampling.groupSplit(df, "host", trainPct = 80, valPct = 10)
    // every group maps to exactly one split — the leakage-safety claim
    val mixed = out.groupBy("host")
      .agg(countDistinct(col("split")).as("n")).filter(col("n") =!= 1).count()
    assert(mixed == 0)
    assert(out.filter(col("host").isNull).select("split").head().getString(0) == "test")
    // partitioning-independent membership
    val again = Sampling.groupSplit(df.repartition(7), "host", 80, 10)
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(again == out.select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq)
    // degenerate percents still total the corpus
    assert(Sampling.groupSplit(df, "host", 100, 0)
      .filter(col("host").isNotNull && col("split") =!= "train").count() == 0)
  }

  test("shard shuffle is a permutation: dense in-shard positions, stable under repartition") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("doc_id")
    val out = Sampling.shardShuffle(df, "doc_id", 8)
    assert(out.count() == 1000L)
    // positions are 1..|shard| with no gaps or dups
    val bad = out.groupBy("shard").agg(
        count(lit(1)).as("n"), max(col("shard_pos")).as("mx"),
        countDistinct(col("shard_pos")).as("nd"))
      .filter(col("n") =!= col("mx") || col("n") =!= col("nd")).count()
    assert(bad == 0)
    // deterministic under different input partitioning
    val again = Sampling.shardShuffle(df.repartition(7), "doc_id", 8)
      .select("doc_id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(again == out.select("doc_id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq)
    // the order key actually shuffles: in-shard order != id order
    val monotone = out.filter(col("shard") === 0L).orderBy(col("shard_pos"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(monotone != monotone.sorted)
  }

  // ── Chunking (d14 semantics on a handmade doc) ──────────────────────

  test("chunking covers the text with stride overlap and exact tails") {
    import spark.implicits._
    // 200-char window, 150 stride on a 380-char doc → chunks at 0, 150,
    // 300; the last is a 80-char tail
    val text = ("a" * 150) + ("b" * 150) + ("c" * 80)
    val df = Seq((1L, text), (2L, "short")).toDF("doc_id", "text")
    val out = df
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), expr("(length(text) - 1) div 150").cast("int"))).as("cno"))
      .select(col("doc_id"), col("cno"),
        expr("substr(text, cno * 150 + 1, 200)").as("chunk"))
      .orderBy("doc_id", "cno").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.length == 4)
    assert(out(0) == ((1L, 0, ("a" * 150) + ("b" * 50))))
    assert(out(1) == ((1L, 1, ("b" * 150) + ("c" * 50))))
    assert(out(2) == ((1L, 2, "c" * 80)))
    assert(out(3) == ((2L, 0, "short")))
    // overlap reconstruction: stripping the 50-char overlap from every
    // non-first chunk re-yields the document
    val rebuilt = out.filter(_._1 == 1L).map { case (_, cno, c) =>
      if (cno == 0) c else c.drop(50)
    }.mkString
    assert(rebuilt == text)
  }

  // ── Redaction ───────────────────────────────────────────────────────

  test("redaction replaces planted PII and counts hits") {
    import spark.implicits._
    val df = Seq(
      (1L, "write to alice.smith+x@corp.example.org or bob@x.io today"),
      (2L, "call +1-555-0199 then +1-555-7 tomorrow"),
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        Redaction.emailCount(col("text")).as("e"),
        Redaction.phoneCount(col("text")).as("p"),
        Redaction.redact(col("text")).as("r"))
      .orderBy("doc_id").collect()
    assert(out(0).getInt(1) == 2 && out(0).getInt(2) == 0)
    assert(out(0).getString(3) == "write to <EMAIL> or <EMAIL> today")
    assert(out(1).getInt(1) == 0 && out(1).getInt(2) == 2)
    assert(out(1).getString(3) == "call <PHONE> then <PHONE> tomorrow")
    assert(out(2).getString(3) == "no pii here at all")
  }

  // ── bucketed range join ─────────────────────────────────────────────

  test("bucketed range join matches naive inequality join, exact boundaries") {
    import spark.implicits._
    val h = 10L * 1000000L // 10-second horizon
    // boundary cases: equal ts (inclusive), ts + h (exclusive),
    // pairs whose buckets differ by one, and an unmatched row
    val left = Seq((1L, ts(100)), (2L, ts(107)), (3L, ts(500)))
      .toDF("l_id", "l_ts")
    val right = Seq((11L, ts(100)), (12L, ts(109)), (13L, ts(110)),
        (14L, ts(117)), (15L, ts(300)))
      .toDF("r_id", "r_ts")
    val bucketed = operators.RangeJoin.bucketed(left, right, "l_ts", "r_ts", h)
      .select("l_id", "r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = left.crossJoin(right)
      .filter(col("r_ts") >= col("l_ts") &&
        unix_micros(col("r_ts")) < unix_micros(col("l_ts")) + h)
      .select("l_id", "r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive)
    // click 1 @100 catches 100 (inclusive) and 109, not 110 (= +h, exclusive)
    assert(bucketed.contains((1L, 11L)) && bucketed.contains((1L, 12L)))
    assert(!bucketed.contains((1L, 13L)))
    // click 2 @107 catches 109 and 110 (next bucket), not 117 (= +h, exclusive)
    assert(Set((2L, 12L), (2L, 13L)).subsetOf(bucketed))
    assert(!bucketed.contains((2L, 14L)))
    assert(!bucketed.exists(_._1 == 3L), "click far from purchases matches nothing")
  }

  // ── edit-distance dedup ─────────────────────────────────────────────

  test("edit-distance banding is lossless vs all-pairs, incl cross-band pairs") {
    import spark.implicits._
    // lengths straddle band edges (bandWidth 8): 15|16 and 23|24 pairs
    // must match across bands; far-length and over-distance pairs must not
    val docs = Seq(
      (1L, "aaaaaaaaaaaaaaa"),   // len 15 (band 1)
      (2L, "aaaaaaaaaaaaaaab"),  // len 16 (band 2), dist 1 to id 1
      (3L, "bbbbbbbbbbbbbbbbbbbbbbb"),  // len 23 (band 2)
      (4L, "bbbbbbbbbbbbbbbbbbbbbbbcc"), // len 25 (band 3), dist 2 to id 3
      (5L, "cccccccccccccccc"),  // len 16, dist > 2 from everything
      (6L, "aaaaaaaaaaaaaaa")    // exact copy of id 1, dist 0
    ).toDF("doc_id", "text")
    val banded = operators.TextDedup.editDistancePairs(
        docs, "doc_id", "text", maxDist = 2, maxLen = 100, bandWidth = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val allPairs = docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id") &&
        levenshtein(col("a.text"), col("b.text")) <= 2)
      .select(col("a.doc_id"), col("b.doc_id"),
        levenshtein(col("a.text"), col("b.text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == allPairs)
    assert(banded.contains((1L, 2L, 1)) && banded.contains((3L, 4L, 2)) &&
      banded.contains((1L, 6L, 0)))
    assert(!banded.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("edit-distance banding matches all-pairs on the planted corpus") {
    // gate-scale corpus: the all-pairs oracle side is quadratic with a
    // full O(n²) levenshtein per candidate, so sf0.01 (the driver's own
    // gate sf) is the largest practical parity check here
    val corpus = queries.DataPipelineQueries.dupDocCorpus(spark, "/root/testdata/sf0.01")
    val banded = operators.TextDedup.editDistancePairs(
        corpus, "doc_id", "text", maxDist = 2, maxLen = 220)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val short = corpus.filter(length(col("text")) <= 220)
    val exact = short.as("a").crossJoin(short.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id") &&
        levenshtein(col("a.text"), col("b.text")) <= 2)
      .select(col("a.doc_id"), col("b.doc_id"),
        levenshtein(col("a.text"), col("b.text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == exact)
    assert(banded.nonEmpty, "planted prefix-mutated copies must surface")
  }

  // ── TextDedup.lineDedup (d18) ───────────────────────────────────────

  test("line dedup drops cross-doc boilerplate, keeps order and stats") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "banner\nalpha one\nbravo two"),
      (2L, "banner\ncharlie three"),
      (3L, "delta four\nbanner\necho five"), // banner mid-document
      (4L, "foxtrot six")                    // no boilerplate
    ).toDF("doc_id", "text")
    val out = TextDedup.lineDedup(corpus, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 2L, "alpha one\nbravo two"),
      (2L, 2L, 1L, "charlie three"),
      (3L, 3L, 2L, "delta four\necho five"),
      (4L, 1L, 1L, "foxtrot six")))
  }

  test("line dedup: all-boilerplate doc survives with empty clean text") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "banner"), (2L, "banner"), (3L, "banner\nunique line")
    ).toDF("doc_id", "text")
    val out = TextDedup.lineDedup(corpus, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq((1L, 0L, ""), (2L, 0L, ""), (3L, 1L, "unique line")))
  }

  test("line dedup is partitioning-invariant") {
    import spark.implicits._
    val corpus = (1L to 40L).map { i =>
      val boiler = if (i % 4 == 0) "shared footer\n" else ""
      (i, s"${boiler}doc $i body\ndoc $i tail")
    }.toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      TextDedup.lineDedup(df, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(run(corpus) == run(corpus.repartition(7)))
  }

  test("w44 gate boundary: 500 permille admits inclusively, riders split the batch") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-w44fix")
      .toFile.getAbsolutePath
    val baseText = (1 to 16).map(i => s"b$i").mkString(" ")
    // doc 3 (base, %3=0): the indexed corpus. doc 1: its first 8-gram
    // (8 of 16 tokens) + 8 novel → exactly 500 permille → ADMIT (the
    // gate is inclusive). doc 2: 9 consecutive base tokens (two
    // overlapping grams merge to one 9-token island) → 562 → REJECT.
    // doc 4: fully novel → 0 → admit.
    val docs = Seq(
      (3L, baseText, "en"),
      (1L, ((1 to 8).map(i => s"b$i") ++ (1 to 8).map(i => s"n$i")).mkString(" "), "en"),
      (2L, ((1 to 9).map(i => s"b$i") ++ (1 to 7).map(i => s"m$i")).mkString(" "), "en"),
      (4L, "entirely novel content here", "en"))
      .toDF("doc_id", "text", "lang")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = CurationQueries.queries("w44_novelty_admission")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(("en", 2L, 20L, 1L, 9L, 562L)),
      s"gate boundary broke: ${out.toSeq}")
  }

  test("line dedup: repetition within ONE doc is not boilerplate") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "echo\necho\nmiddle"), // echo twice in the same doc only
      (2L, "other text")
    ).toDF("doc_id", "text")
    val out = TextDedup.lineDedup(corpus, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 3L, "echo\necho\nmiddle"),
      (2L, 1L, 1L, "other text")))
  }
}
