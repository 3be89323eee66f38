package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PageRank contracts: exact equality with a sequential reference on
  * random graphs (the integer fixed-point iterate is a pure function
  * of the edge set — any engine-order dependence would break this),
  * plus the shape facts (hub dominance, symmetry, bounded mass).
  */
class PageRankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Scale = 1000000000L

  /** Textbook sequential iterate with the SAME integer ops as the
    * operator: share = rank div outdeg, teleport = (15·scale) div
    * (100·n), inflow damped as (85·sum) div 100.
    */
  private def reference(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.size.toLong
    val outdeg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r: Map[String, Long] = nodes.map(_ -> Scale / n).toMap
    for (_ <- 1 to iters) {
      val inflow = e.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (src, _) => r(src) / outdeg(src) }.sum
      }
      r = nodes.map(v =>
        v -> ((15L * Scale) / (100L * n) + 85L * inflow.getOrElse(v, 0L) / 100L)).toMap
    }
    r
  }

  private def runSpark(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    import spark.implicits._
    PageRank.run(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("matches the sequential reference exactly on random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 20 + trial * 10
      val edges = Seq.fill(n * 3)((s"v${rnd.nextInt(n)}", s"v${rnd.nextInt(n)}"))
        .filter { case (a, b) => a != b }
      assert(runSpark(edges, 5) == reference(edges, 5), s"trial $trial")
    }
  }

  test("two-node cycle: perfectly symmetric ranks") {
    val r = runSpark(Seq(("a", "b"), ("b", "a")), 8)
    assert(r("a") == r("b"))
  }

  test("star graph: the hub outranks every leaf, leaves tie") {
    val leaves = (1 to 10).map(i => s"leaf$i")
    // leaves point at the hub, hub points back (so nothing dangles)
    val edges = leaves.map(_ -> "hub") ++ leaves.map("hub" -> _)
    val r = runSpark(edges, 5)
    assert(leaves.forall(l => r("hub") > r(l)))
    assert(leaves.map(r).distinct.size == 1)
  }

  test("dangling nodes drop mass: total stays <= scale, sinks still ranked") {
    // chain a -> b -> c, c dangles
    val r = runSpark(Seq(("a", "b"), ("b", "c")), 6)
    assert(r.keySet == Set("a", "b", "c"))
    assert(r.values.sum <= Scale)
    assert(r("c") > 0L) // teleport keeps every node alive
  }
}
