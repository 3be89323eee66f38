package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binned interval-overlap join vs the brute-force cross-join filter:
  * exactness across bin widths (pairs spanning many bins dedup to one
  * row via the first-overlapping-bin rule), half-open semantics, key
  * scoping, and empty intervals.
  */
class IntervalJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ivals(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("id", "s", "e")
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("l_id"), col("r_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def brute(l: Seq[(Long, Long, Long)],
      r: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      a <- l; b <- r
      if a._2 < a._3 && b._2 < b._3 && a._2 < b._3 && b._2 < a._3
    } yield (a._1, b._1)).toSet

  test("random intervals match brute force at several bin widths") {
    val rnd = new scala.util.Random(7)
    val mk = (n: Int) => (1 to n).map { i =>
      val s = rnd.nextInt(500).toLong
      (i.toLong, s, s + rnd.nextInt(80).toLong)
    }
    val l = mk(60); val r = mk(60).map(t => (t._1 + 1000, t._2, t._3))
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = canon(IntervalJoin.binnedOverlap(
        ivals(l: _*), ivals(r: _*), "s", "e", w))
      assert(got == brute(l, r), s"width $w")
    }
  }

  test("half-open: touching intervals do not overlap; empty intervals never match") {
    val l = Seq((1L, 0L, 5L), (2L, 10L, 10L))
    val r = Seq((3L, 5L, 9L), (4L, 4L, 5L), (5L, 10L, 12L))
    assert(canon(IntervalJoin.binnedOverlap(
      ivals(l: _*), ivals(r: _*), "s", "e", 4L)) == Set((1L, 4L)))
  }

  test("keys scope the join: same window, different key, no pair") {
    import spark.implicits._
    val l = Seq((1L, "a", 0L, 10L), (2L, "b", 0L, 10L)).toDF("id", "g", "s", "e")
    val r = Seq((3L, "a", 5L, 15L)).toDF("id", "g", "s", "e")
    val got = IntervalJoin.binnedOverlap(l, r, "s", "e", 4L, keys = Seq("g"))
    assert(canon(got) == Set((1L, 3L)))
    assert(got.columns.contains("g"))
  }

  test("a pair spanning many bins appears exactly once") {
    val l = Seq((1L, 0L, 1000L))
    val r = Seq((2L, 999L, 1001L))
    val got = IntervalJoin.binnedOverlap(
      ivals(l: _*), ivals(r: _*), "s", "e", 10L)
    assert(got.count() == 1L)
  }
}
