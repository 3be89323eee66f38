package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Filter-aware IVF-PQ probing: the adaptive depth reaches >= k
  * predicate survivors whenever the corpus holds them, recall against
  * the exact filtered ranking is at least fixed-nProbe's (and strictly
  * better when the filter starves the near cells), and the depth stays
  * shallow when the predicate is NOT selective (no all-cells fallback
  * tax on easy queries).
  */
class FilteredAnnSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Dim = 16
  private val K = 5

  // deterministic corpus: 8 planted clusters of 30 points each around
  // orthogonal-ish anchors; labels round-robin INSIDE each cluster so a
  // label predicate keeps ~1/6 of every cell
  private lazy val corpus: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = for {
      c <- 0 until 8
      i <- 0 until 30
    } yield {
      val anchor = Array.tabulate(Dim)(d => if (d % 8 == c % 8) 4.0f else 0.0f)
      val vec = anchor.map(a => a + (rnd.nextFloat() - 0.5f))
      (c * 100L + i, vec.toSeq, (i % 6).toLong)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  private lazy val centroids: Seq[Seq[Double]] =
    (0 until 8).map(c => Seq.tabulate(Dim)(d => if (d % 8 == c % 8) 4.0 else 0.0))
  // 64-entry sub-codebooks sliced from corpus vectors (8 per planted
  // cluster) — fine enough that ADC ranking tracks the exact one; the
  // coarse 8-entry variant caps recall at the quantizer, which would
  // test PQ error rather than the probing under test here
  private lazy val codebooks: Seq[Seq[Seq[Double]]] = {
    val refs = corpus.filter(col("vec_id") % 100 < 8).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    (0 until 4).map(sub => refs.map(_.slice(sub * 4, sub * 4 + 4)))
  }

  private def queries = corpus.filter(col("vec_id").isin(5L, 105L, 305L, 705L))

  private def filteredEncoded(pred: org.apache.spark.sql.Column): DataFrame = {
    val enc = VectorSearch.encodeIvfPq(corpus, "vec_id", "embedding",
      centroids, codebooks)
    enc.join(corpus.filter(pred).select(col("vec_id").as("id")), "id")
  }

  private def resultSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }

  test("every query reaches k results when the corpus holds k survivors") {
    val r = VectorSearch.searchIvfPqFiltered(
      filteredEncoded(col("label") === 2), queries,
      "vec_id", "embedding", centroids, codebooks, k = K)
    val counts = r.groupBy("query_id").count().collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(counts.size == 4 && counts.values.forall(_ == K.toLong),
      s"underfilled result sets: $counts") // 40 survivors exist, 5 per cell
  }

  test("recall vs exact filtered ranking is at least the fixed-nProbe=1 baseline") {
    val pred = col("label") === 2
    val adaptive = resultSets(VectorSearch.searchIvfPqFiltered(
      filteredEncoded(pred), queries, "vec_id", "embedding",
      centroids, codebooks, k = K))
    val fixed = resultSets(VectorSearch.searchIvfPq(
      filteredEncoded(pred), queries, "vec_id", "embedding",
      centroids, codebooks, k = K, nProbe = 1, excludeSelf = false))
    val exact = resultSets(VectorSearch.bruteForceTopK(
      corpus.filter(pred), queries, "vec_id", "embedding", "vec_id",
      k = K, excludeSelf = false))
    def recall(got: Map[Long, Set[Long]]): Double =
      // .toSeq: Set.map would collapse equal per-query recalls
      exact.keys.toSeq.map(q => (got.getOrElse(q, Set.empty) & exact(q)).size.toDouble
        / exact(q).size).sum / exact.size
    val (ra, rf) = (recall(adaptive), recall(fixed))
    assert(ra >= rf, s"adaptive recall $ra below fixed-probe $rf")
    assert(ra >= 0.6, s"adaptive recall $ra under the 0.6 gate")
    // fixed nProbe=1 can return under k survivors on starved cells;
    // adaptive must never, given 40 exist
    assert(adaptive.values.forall(_.size == K))
  }

  test("a non-selective predicate keeps the probe shallow (no fallback tax)") {
    // label >= 0 keeps everything: 30 survivors per cell >= k, so the
    // cum-sum hits k at the FIRST cell and candidates stay ~cell-sized
    val r = VectorSearch.searchIvfPqFiltered(
      filteredEncoded(col("label") >= 0), queries,
      "vec_id", "embedding", centroids, codebooks, k = K)
    // 4 queries x 5 ranks, and every returned id shares the query's
    // planted cluster (first-cell candidates only)
    val rows = r.select("query_id", "id").collect()
    assert(rows.length == 4 * K)
    rows.foreach { x =>
      assert(x.getLong(0) / 100L == x.getLong(1) / 100L,
        s"query ${x.getLong(0)} escaped its cell to ${x.getLong(1)}")
    }
  }

  test("residual flag matches a residual-encoded index (ADVICE r9)") {
    // encode with residual=true; the filtered search must build its ADC
    // tables from per-cell residuals too, or distances are measured in
    // the wrong frame and rankings silently drift
    val pred = col("label") === 2
    val encRes = VectorSearch.encodeIvfPq(corpus, "vec_id", "embedding",
        centroids, codebooks, residual = true)
      .join(corpus.filter(pred).select(col("vec_id").as("id")), "id")
    val adaptive = resultSets(VectorSearch.searchIvfPqFiltered(
      encRes, queries, "vec_id", "embedding",
      centroids, codebooks, k = K, residual = true))
    val exact = resultSets(VectorSearch.bruteForceTopK(
      corpus.filter(pred), queries, "vec_id", "embedding", "vec_id",
      k = K, excludeSelf = false))
    def recall(got: Map[Long, Set[Long]]): Double =
      exact.keys.toSeq.map(q => (got.getOrElse(q, Set.empty) & exact(q)).size.toDouble
        / exact(q).size).sum / exact.size
    assert(recall(adaptive) >= 0.6,
      s"residual filtered recall ${recall(adaptive)} under the 0.6 gate")
    assert(adaptive.values.forall(_.size == K))
    // and the frames must agree with the unfiltered residual search on
    // the same encoded relation (same ADC math, different probing only)
    val full = resultSets(VectorSearch.searchIvfPq(
      encRes, queries, "vec_id", "embedding", centroids, codebooks,
      k = K, nProbe = centroids.size, excludeSelf = false, residual = true))
    assert(adaptive == full,
      "adaptive residual probing diverged from all-cells residual search")
  }

  test("fewer than k survivors in the whole corpus: all cells probed, all returned") {
    // ids 4, 104, 204 (label = 4 % 6 = 4): 3 survivors corpus-wide
    val pred = col("label") === 4 && col("vec_id") % 100 === 4 && col("vec_id") < 300
    val survivors = corpus.filter(pred).count()
    assert(survivors > 0 && survivors < K)
    val r = VectorSearch.searchIvfPqFiltered(
      filteredEncoded(pred), queries,
      "vec_id", "embedding", centroids, codebooks, k = K)
    val perQuery = r.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(perQuery.forall(_ == survivors), "not every survivor surfaced")
  }
}
