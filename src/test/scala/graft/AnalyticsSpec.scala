package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZInterleave
import graft.operators.{Sampling, Scoring}

/** Round-8 second-half operators: linear classifier inference (integer
  * logits), Z-order interleave kernel properties, and weighted
  * sampling without replacement.
  */
class AnalyticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ── Scoring.classifierScore ─────────────────────────────────────────

  test("classifier: hand-computed logit, zero-hit doc kept, empty doc zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "fast fast slow"),   // 2*180 - 200 = 160; n=3: 3*(-25)+160 = 85 > 0
      (2L, "slow slow"),        // -400; n=2: -50-400 = -450
      (3L, "zzz yyy"),          // no hits; n=2: -50
      (4L, "")                  // empty: n=0, score 0, reject
    ).toDF("doc_id", "text")
    val r = Scoring.classifierScore(docs, "doc_id", "text")
      .orderBy("id").collect()
    assert(r.map(_.getLong(3)).toSeq == Seq(85L, -450L, -50L, 0L))
    assert(r.map(_.getBoolean(4)).toSeq == Seq(true, false, false, false))
    assert(r.map(_.getLong(2)).toSeq == Seq(3L, 2L, 0L, 0L)) // matched counts
  }

  test("classifier: tokens scored with multiplicity, not as a set") {
    import spark.implicits._
    val docs = Seq((1L, "fast"), (2L, "fast fast")).toDF("doc_id", "text")
    val r = Scoring.classifierScore(docs, "doc_id", "text")
      .orderBy("id").collect()
    // 1*(-25)+180 = 155 vs 2*(-25)+360 = 310 — doubled hit doubles the sum
    assert(r.map(_.getLong(3)).toSeq == Seq(155L, 310L))
  }

  // ── ZInterleave ─────────────────────────────────────────────────────

  test("z_interleave: bit-exact interleave and 16-bit masking") {
    // x = 0b101 (bits 0,2 -> even positions 0,4), y = 0b11 (odd positions 1,3)
    assert(ZInterleave.compute(5, 3) == ((1L << 0) | (1L << 4) | (1L << 1) | (1L << 3)))
    assert(ZInterleave.compute(0, 0) == 0L)
    assert(ZInterleave.compute(0xFFFF, 0xFFFF) == 0xFFFFFFFFL)
    // bits above 16 are masked off
    assert(ZInterleave.compute(0x1FFFF, 0) == ZInterleave.compute(0xFFFF, 0))
  }

  test("z_interleave: monotone locality — nearby points share high bits") {
    // two points in the same 512x512 tile -> same zval >> 18 bucket
    val a = ZInterleave.compute(1000, 2000)
    val b = ZInterleave.compute(1023, 2047)
    assert((a >> 18) == (b >> 18))
    // a point a full tile away in x lands in a different bucket
    val c = ZInterleave.compute(1000 + 512, 2000)
    assert((a >> 18) != (c >> 18))
  }

  test("z_interleave: column API matches kernel on a generated range") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i * 37 % 65536, i * 91 % 65536))
      .toDF("x", "y")
    val got = df.select(ZInterleave(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    val want = (0 until 1000)
      .map(i => ZInterleave.compute(i * 37 % 65536, i * 91 % 65536))
    assert(got.toSeq == want)
  }

  // ── Constraints ─────────────────────────────────────────────────────

  test("constraints: null cells fail only not_null; unique ignores null-keyed rows") {
    import graft.operators.Constraints
    import graft.operators.Constraints.Rule._
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "F"), (1L, "O"), (2L, "X"), (null, "F"), (null, null)
    ).toDF("k", "status")
    val got = Constraints.audit(df, Seq(
        NotNull("k"), Unique(Seq("k")), InSet("status", Seq("F", "O", "P"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("not_null(k)") == 2L)     // two null keys
    assert(got("unique(k)") == 1L)       // the duplicated k=1, nulls excluded
    assert(got("in_set(status)") == 1L)  // 'X'; null status passes (NotNull's job)
  }

  test("sameMultiset: duplicates counted, null-safe, order-free; one-row drift fails") {
    import graft.operators.Constraints
    import spark.implicits._
    val a = Seq[(java.lang.Long, String)](
      (1L, "x"), (1L, "x"), (2L, null), (null, "y")).toDF("k", "v")
    // same multiset, different order/partitioning
    val b = a.orderBy(col("v")).repartition(7)
    assert(Constraints.sameMultiset(a, b))
    // one duplicate dropped: sets equal, multisets not
    assert(!Constraints.sameMultiset(a, a.dropDuplicates()))
    // one extra row on the right
    assert(!Constraints.sameMultiset(a,
      a.unionAll(Seq((3L, "z")).toDF("k", "v"))))
    // both empty
    assert(Constraints.sameMultiset(a.limit(0), a.limit(0)))
    // empty vs non-empty
    assert(!Constraints.sameMultiset(a.limit(0), a))
    // agrees with the exceptAll pair it replaces on a random-ish pair
    val c = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    assert(Constraints.sameMultiset(a, a) ==
      (a.exceptAll(a).isEmpty && a.exceptAll(a).isEmpty))
    assert(Constraints.sameMultiset(a, c) ==
      (a.exceptAll(c).isEmpty && c.exceptAll(a).isEmpty))
  }

  // ── VectorSearch.ivfPqTopK ──────────────────────────────────────────

  test("ivfPqTopK: deterministic under repartitioning, k per query, exact-overlap sanity") {
    import graft.operators.VectorSearch
    import graft.queries.DataPipelineQueries.derivedPlanes
    val dir = "/root/testdata/sf0.001"
    val e = Tables(spark, dir, "embeddings")
    val planes = derivedPlanes(spark, dir, 8)
    val codebooks = (0 until 4).map(s => planes.map(_.slice(s * 16, s * 16 + 16)))
    val qs = e.filter(col("vec_id") < 5)
    def run(corpus: org.apache.spark.sql.DataFrame) =
      VectorSearch.ivfPqTopK(corpus, qs, "vec_id", "embedding", "vec_id",
          planes, codebooks, k = 10, nProbe = 2)
        .select("query_id", "rank", "id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val a = run(e)
    // both argmins and the ADC ranking are pure row functions — the
    // physical layout must not change a single rank
    assert(a == run(e.repartition(17)))
    val perQuery = a.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perQuery.keySet == Set(0L, 1L, 2L, 3L, 4L) && perQuery.values.forall(_ == 10))
    // approximate by design (8 coarse cells, 3-bit codes on random
    // 64-dim data is PQ's worst case) — but a collapsed index would
    // share ~0 with the exact ranking
    val exact = VectorSearch.bruteForceTopK(e, qs, "vec_id", "embedding", "vec_id", k = 10)
      .select("query_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = a.map(t => (t._1, t._3)) intersect exact
    assert(overlap.nonEmpty, "IVF-PQ shares nothing with the exact top-10")
  }

  test("ivfPqTopK: dimension mismatch fails loudly, never truncates") {
    import graft.operators.VectorSearch
    import spark.implicits._
    val bad = Seq((1L, Array(1.0, 2.0, 3.0)), (2L, Array(4.0, 5.0, 6.0)))
      .toDF("vec_id", "embedding")
    val cents = Seq(Seq(1.0, 0.0, 0.0, 0.0))
    val cbs = Seq(Seq(Seq(1.0, 0.0)), Seq(Seq(0.0, 1.0))) // m*subDim = 4 != 3
    val ex = intercept[Exception] {
      VectorSearch.ivfPqTopK(bad, bad, "vec_id", "embedding", "vec_id",
        cents.map(_.padTo(4, 0.0)), cbs, k = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("dimension")))
  }

  // ── Sampling.weightedSample ─────────────────────────────────────────

  private def sampleFixture = {
    import spark.implicits._
    (1 to 200).map(i => (i.toLong, s"s${i % 4}", (i % 7 + 1) * 100L))
      .toDF("id", "stratum", "w")
  }

  test("weightedSample: k per stratum, deterministic across reruns/partitionings") {
    val df = sampleFixture
    val a = Sampling.weightedSample(df, "id", "w", "stratum", 5)
      .select("stratum", "sample_rank", "id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val b = Sampling.weightedSample(df.repartition(13), "id", "w", "stratum", 5)
      .select("stratum", "sample_rank", "id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b)
    assert(a.groupBy(_._1).forall(_._2.size == 5))
    assert(a.map(_._3).size == 20) // without replacement: all distinct
  }

  test("weightedSample: zero/negative weights never selected; k > stratum size takes all") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 0L), (3L, "a", -5L), (4L, "a", 10L)
    ).toDF("id", "stratum", "w")
    val got = Sampling.weightedSample(df, "id", "w", "stratum", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L))
  }

  test("weightedSample: heavier weights win more often (statistical sanity)") {
    import spark.implicits._
    // one stratum, half the ids weight 1000, half weight 10 — the k=20
    // sample should be dominated by heavy ids
    val df = (1 to 200)
      .map(i => (i.toLong, "s", if (i <= 100) 1000L else 10L))
      .toDF("id", "stratum", "w")
    val heavy = Sampling.weightedSample(df, "id", "w", "stratum", 20)
      .select("id").collect().map(_.getLong(0)).count(_ <= 100)
    assert(heavy >= 15, s"expected heavy ids to dominate, got $heavy/20")
  }
}
