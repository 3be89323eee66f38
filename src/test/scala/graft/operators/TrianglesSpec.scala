package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Degree-oriented triangle counting vs a driver-side brute-force
  * model on random graphs, hub graphs (the skew case the orientation
  * exists for), and degenerate inputs.
  */
class TrianglesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Brute-force model over a canonical edge set. */
  private def model(edges: Set[(Long, Long)]): (Long, Long) = {
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    val nodes = adj.keys.toSeq.sorted
    var tri = 0L
    for {
      a <- nodes; b <- adj.getOrElse(a, Set.empty).filter(_ > a)
      c <- adj.getOrElse(b, Set.empty).filter(_ > b)
      if adj.getOrElse(a, Set.empty).contains(c)
    } tri += 1
    val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    (tri, wedges)
  }

  private def run(edges: Seq[(Long, Long)]): (Long, Long) = {
    import spark.implicits._
    val r = Triangles.count(
      Triangles.canonical(edges.toDF("s", "t"), "s", "t")).head()
    (r.getLong(0), r.getLong(1))
  }

  test("random graphs match the brute-force model") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 20 + trial * 5
      val edges = Seq.fill(n * 3)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val canon = edges.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
      assert(run(edges) == model(canon), s"trial $trial")
    }
  }

  test("hub graph: star core contributes wedges but the count stays exact") {
    // hub 0 linked to everyone, plus a triangle ring 1-2-3
    val star = (1L to 50L).map(i => (0L, i))
    val ring = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val edges = star ++ ring
    // triangles: (0,1,2),(0,2,3),(0,1,3),(1,2,3) = 4
    assert(run(edges) == model(edges.toSet))
    assert(run(edges)._1 == 4L)
  }

  test("self-loops and parallel/reversed edges are canonicalized away") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (1L, 3L), (3L, 1L))
    assert(run(edges) == model(Set((1L, 2L), (2L, 3L), (1L, 3L))))
    assert(run(edges)._1 == 1L)
  }

  test("triangle-free graph counts zero with nonzero wedges") {
    val path = (1L to 10L).sliding(2).map(s => (s(0), s(1))).toSeq
    val (tri, wedges) = run(path)
    assert(tri == 0L && wedges == 8L)
  }
}
