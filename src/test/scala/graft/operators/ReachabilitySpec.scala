package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** BFS fixpoint: cycles terminate, multi-path arrivals collapse, the
  * closure over a symmetric edge set equals the seed's connected
  * component ([[ConnectedComponents]] cross-check — two independent
  * closure algorithms, one answer).
  */
class ReachabilitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def edgesDf(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def seedsDf(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("seed", "node")
  }

  private def reachSet(seeds: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Set[Long]] =
    Reachability.reach(seedsDf(seeds.map(s => s -> s): _*), edgesDf(edges: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (s, ns) => s -> ns.map(_._2).toSet }

  test("a directed cycle terminates at the fixpoint, not the round cap") {
    // 1 → 2 → 3 → 1 (cycle) plus 3 → 4 (tail)
    val r = reachSet(Seq(1L), Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L))
    assert(r(1L) == Set(1L, 2L, 3L, 4L))
  }

  test("multi-path arrivals appear once (diamond)") {
    val r = reachSet(Seq(1L), Seq(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L))
    assert(r(1L) == Set(1L, 2L, 3L, 4L))
  }

  test("direction matters: closure follows edges, not their reverses") {
    val r = reachSet(Seq(3L), Seq(1L -> 2L, 2L -> 3L, 3L -> 4L))
    assert(r(3L) == Set(3L, 4L))
  }

  test("disconnected seeds stay in their own islands") {
    val r = reachSet(Seq(1L, 10L), Seq(1L -> 2L, 10L -> 11L, 11L -> 12L))
    assert(r(1L) == Set(1L, 2L))
    assert(r(10L) == Set(10L, 11L, 12L))
  }

  test("symmetric closure equals the ConnectedComponents component (random graph)") {
    val rnd = new scala.util.Random(7)
    // 3 planted components of 40 nodes each, random internal edges
    val edges = (0 until 3).flatMap { c =>
      val base = c * 100L
      (0 until 80).map { _ =>
        (base + rnd.nextInt(40), base + rnd.nextInt(40))
      } ++ (0 until 39).map(i => (base + i, base + i + 1L)) // keep connected
    }.filter { case (a, b) => a != b }
    val sym = edges ++ edges.map(_.swap)
    val seeds = Seq(5L, 105L, 205L)
    val r = reachSet(seeds, sym)
    val cc = ConnectedComponents.components(edgesDf(edges: _*), "src", "dst")
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    for (s <- seeds) {
      val component = cc.collect { case (n, c) if c == cc(s) => n }.toSet
      assert(r(s) == component, s"seed $s closure != its component")
    }
  }

  test("the round cap throws instead of truncating") {
    // a 100-node path needs 99 rounds; cap at 5 must refuse
    val path = (0L until 100L).sliding(2).map { case Seq(a, b) => a -> b }.toSeq
    val e = intercept[IllegalArgumentException] {
      Reachability.reach(seedsDf(0L -> 0L), edgesDf(path: _*), maxRounds = 5)
        .count()
    }
    assert(e.getMessage.contains("not converged"))
  }
}
