package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Symmetric-deletion edit-distance join vs brute force: the
  * pigeonhole must be LOSSLESS for distance ≤ 1 across all three edit
  * types, on hand-picked cases and random small-alphabet corpora
  * (short strings over {a,b,c} force heavy variant collisions — the
  * adversarial case for candidate dedup).
  */
class EditDistanceJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("hand-picked: substitution, insertion, deletion, identity, and misses") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark"), (2L, "spork"),  // substitution
      (3L, "spak"),                   // deletion of r
      (4L, "sparks"),                 // insertion of s
      (5L, "sparkle"),                // dist 2 from spark — must NOT match
      (6L, "spark")                   // identical (dist 0)
    ).toDF("id", "s")
    val got = EditDistanceJoin.pairsWithin1(df, "id", "s")
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      a <- 1L to 6L; b <- (a + 1) to 6L
      sa = Seq("spark", "spork", "spak", "sparks", "sparkle", "spark")(a.toInt - 1)
      sb = Seq("spark", "spork", "spak", "sparks", "sparkle", "spark")(b.toInt - 1)
      if lev(sa, sb) <= 1
    } yield (a, b)).toSet
    assert(got == want)
    assert(got.contains((1L, 2L)) && got.contains((1L, 3L)) &&
      got.contains((1L, 4L)) && got.contains((1L, 6L)))
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("random small-alphabet corpora: candidates ≡ brute force (lossless)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val strs = (1 to 120).map(i =>
        (i.toLong, (1 to (2 + rnd.nextInt(4))).map(_ => "abc"(rnd.nextInt(3))).mkString))
      val df = strs.toDF("id", "s")
      val got = EditDistanceJoin.pairsWithin1(df, "id", "s")
        .select("l_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (ia, sa) <- strs; (ib, sb) <- strs
        if ia < ib && lev(sa, sb) <= 1
      } yield (ia, ib)).toSet
      assert(got == want,
        s"missed=${want -- got} extra=${got -- want}")
    }
  }

  test("k=2: lossless vs brute force on random corpora, including 2-edit combos") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    (1 to 2).foreach { _ =>
      val strs = (1 to 90).map(i =>
        (i.toLong, (1 to (3 + rnd.nextInt(4))).map(_ => "abc"(rnd.nextInt(3))).mkString))
      val df = strs.toDF("id", "s")
      val got = EditDistanceJoin.pairsWithin(df, "id", "s", k = 2)
        .select("l_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (ia, sa) <- strs; (ib, sb) <- strs
        if ia < ib && lev(sa, sb) <= 2
      } yield (ia, ib)).toSet
      assert(got == want, s"missed=${want -- got} extra=${got -- want}")
    }
    // mixed 2-edit shapes against a fixed anchor
    val df2 = Seq((1L, "spark"), (2L, "sprk"), (3L, "sprak"), (4L, "parka"),
      (5L, "spa"), (6L, "sparkler")).toDF("id", "s")
    val got2 = EditDistanceJoin.pairsWithin(df2, "id", "s", k = 2)
      .filter($"l_id" === 1L).select("r_id").collect().map(_.getLong(0)).toSet
    // sprk (1 del), sprak (transpose = del+ins), spa (2 del),
    // parka (del 's' + append 'a' = 2); sparkler is 3 -> out
    assert(got2 == Set(2L, 3L, 4L, 5L), got2.toString)
  }

  test("two-relation form carries strings and distances") {
    import spark.implicits._
    val l = Seq((1L, "data"), (2L, "graft")).toDF("id", "s")
    val r = Seq((10L, "date"), (11L, "raft"), (12L, "nope")).toDF("id", "s")
    val got = EditDistanceJoin.joinWithin1(l, "id", "s", r, "id", "s")
      .select("l_id", "r_id", "dist").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    assert(got == Set((1L, 10L, 1), (2L, 11L, 1)))
  }
}
