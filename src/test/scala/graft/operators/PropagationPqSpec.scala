package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 operators vs independent driver-side models: integer
  * degree-damped propagation (vs a plain Map-based reference on
  * LCG-random graphs and a hand-computed path graph) and PQ/ADC top-k
  * (vs a Scala reference that encodes and scores with the identical
  * fold orders).
  */
class PropagationPqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ── Propagation ─────────────────────────────────────────────────────

  /** Reference: the same integer rules, driver-side. */
  private def model(
      edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    val bidir = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val nbrs = bidir.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val deg = nbrs.map { case (k, v) => k -> v.size.toLong }
    var score = deg.map { case (k, _) => k -> 1000000L }
    for (_ <- 1 to iters) {
      val in = bidir.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => score(src) / deg(src) }.sum
      }
      score = deg.map { case (k, _) =>
        k -> (150000L + 850L * in.getOrElse(k, 0L) / 1000L)
      }
    }
    deg.map { case (k, d) => k -> ((d, score(k))) }
  }

  test("propagate matches the hand-computed 3-node path graph") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = Propagation.propagate(edges, "a", "b", iters = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // ends: 150000 + 850·(1000000/2)/1000 = 575000; middle gets both ends' full unit
    assert(out == Map(
      1L -> ((1L, 575000L)), 2L -> ((2L, 1850000L)), 3L -> ((1L, 575000L))))
  }

  test("propagate matches the Map model on LCG-random graphs; isolated nodes absent") {
    import spark.implicits._
    var x = 42L
    def lcg(n: Int): Int = { x = x * 6364136223846793005L + 1442695040888963407L
      (((x >>> 33) % n).toInt + n) % n }
    for (trial <- 1 to 3) {
      val n = 30 + trial * 10
      val edges = (1 to n * 2).map { _ =>
        val a = lcg(n); val b = lcg(n); (math.min(a, b).toLong, math.max(a, b).toLong)
      }.filter(e => e._1 != e._2).distinct
      val expected = model(edges, iters = 3)
      val out = Propagation.propagate(edges.toDF("a", "b"), "a", "b", iters = 3)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(out == expected, s"trial $trial: ${out.toSeq.sorted} vs ${expected.toSeq.sorted}")
      // node ids cover 0..n-1 but only edge endpoints may appear
      val endpoints = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(out.keySet == endpoints)
    }
  }

  test("propagate with iters=0 returns unit scores with degrees") {
    import spark.implicits._
    val out = Propagation.propagate(
        Seq((5L, 6L)).toDF("a", "b"), "a", "b", iters = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((5L, 1L, 1000000L), (6L, 1L, 1000000L)))
  }

  // ── pqTopK ──────────────────────────────────────────────────────────

  /** Reference ADC with the operator's exact fold orders: sequential
    * dots, c·c as a Scala constant, subspace sum folded left.
    */
  private def pqModel(
      corpus: Seq[(Long, Array[Double])], queries: Seq[(Long, Array[Double])],
      codebooks: Seq[Seq[Seq[Double]]], k: Int): Seq[(Long, Int, Long)] = {
    val subDim = codebooks.head.head.size
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def dist2(sv: Seq[Double], c: Seq[Double]): Double =
      dot(sv, sv) - 2.0 * dot(sv, c) + c.map(x => x * x).sum
    def codes(v: Array[Double]): Seq[Int] =
      codebooks.zipWithIndex.map { case (cb, s) =>
        val sv = v.slice(s * subDim, s * subDim + subDim).toSeq
        cb.zipWithIndex.map { case (c, j) => (dist2(sv, c), j) }.min._2
      }
    queries.flatMap { case (qid, qv) =>
      val dtabs = codebooks.zipWithIndex.map { case (cb, s) =>
        val sv = qv.slice(s * subDim, s * subDim + subDim).toSeq
        cb.map(c => dist2(sv, c))
      }
      corpus.filter(_._1 != qid).map { case (id, cv) =>
        val dist = codes(cv).zipWithIndex
          .map { case (code, s) => dtabs(s)(code) }.reduceLeft(_ + _)
        (id, dist)
      }.sortBy { case (id, dist) => (dist, id) }.take(k)
        .zipWithIndex.map { case ((id, _), r) => (qid, r + 1, id) }
    }
  }

  private def lcgVecs(n: Int, dim: Int, seed: Long): Seq[(Long, Array[Double])] = {
    var x = seed
    def next(): Double = { x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 40).toDouble / (1L << 24).toDouble) - 0.5 }
    (0 until n).map(i => (i.toLong, Array.fill(dim)(next())))
  }

  test("pqTopK matches the driver-side ADC model") {
    import spark.implicits._
    val dim = 8
    val corpus = lcgVecs(30, dim, seed = 7L)
    val queriesV = corpus.take(3)
    // 2 subspaces × 4 dims, 4 codes each, codebooks from the corpus tail
    val codebooks = (0 until 2).map(s =>
      corpus.takeRight(4).map(_._2.slice(s * 4, s * 4 + 4).toSeq).toSeq)
    val cdf = corpus.map { case (id, v) => (id, v.toSeq) }.toDF("id", "vec")
    val qdf = queriesV.map { case (id, v) => (id, v.toSeq) }.toDF("id", "vec")
    val out = VectorSearch.pqTopK(cdf, qdf, "id", "vec", "id", codebooks, k = 5)
      .select("query_id", "rank", "id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val expected = pqModel(corpus, queriesV, codebooks, k = 5).toSet
    assert(out == expected,
      s"spark=${out.toSeq.sorted}\nmodel=${expected.toSeq.sorted}")
  }

  test("pqTopK with a single code per subspace degrades to id order") {
    import spark.implicits._
    val corpus = lcgVecs(12, 8, seed = 11L)
    val codebooks = (0 until 2).map(s =>
      Seq(corpus.head._2.slice(s * 4, s * 4 + 4).toSeq))
    val cdf = corpus.map { case (id, v) => (id, v.toSeq) }.toDF("id", "vec")
    val qdf = cdf.filter("id = 0")
    val out = VectorSearch.pqTopK(cdf, qdf, "id", "vec", "id", codebooks, k = 4)
      .select("rank", "id")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sorted
    // every corpus row shares the one possible code word → equal ADC
    // distance → rank is pure id ASC (self excluded)
    assert(out == Seq((1, 1L), (2, 2L), (3, 3L), (4, 4L)))
  }

  test("pqTopK fails loudly when m*subDim != embedding dimension") {
    import spark.implicits._
    val corpus = lcgVecs(6, 8, seed = 13L)
    // 2 subspaces × 3 dims = 6 != 8 — would silently slice short
    // subvectors without the runtime gate
    val codebooks = (0 until 2).map(s =>
      Seq(corpus.head._2.slice(s * 3, s * 3 + 3).toSeq))
    val cdf = corpus.map { case (id, v) => (id, v.toSeq) }.toDF("id", "vec")
    val qdf = cdf.filter("id = 0")
    val e = intercept[Exception] {
      VectorSearch.pqTopK(cdf, qdf, "id", "vec", "id", codebooks, k = 3)
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("pqTopK: embedding dimension")),
      s"unexpected failure chain: ${chain(e)}")
  }
}
