package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source graph reachability as a distributed BFS FIXPOINT —
  * the graph-shaped recursive query (`WITH RECURSIVE … UNION`) Spark
  * SQL cannot yet express (recursive CTEs allow UNION ALL only, which
  * diverges on cyclic graphs and explodes on multi-path ones). The
  * reference's engine-side recursion surface (SURVEY §2.6's subquery
  * family) meets the LLM-pipeline need for closure computations —
  * contamination spread, near-dup group expansion, lineage chasing.
  *
  * Per round: frontier ⋈ edges → candidate nodes, minus everything
  * already visited (the DEDUP IS the cycle guard — a revisited node
  * never re-enters the frontier, so cyclic graphs terminate at the
  * fixpoint, in ≤ diameter rounds). Each round is one equi-join plus
  * one anti-join, both on the node key; the frontier is
  * `localCheckpoint`-cut every round so round N never re-executes
  * rounds 1..N−1 ([[ConnectedComponents]]' lineage discipline). At
  * 100 TB the edge relation is the big side: it stays untouched
  * across rounds (scan-reuse), while per-round work is
  * frontier-sized. For single-label closure over ALL nodes use
  * [[ConnectedComponents]] (O(log d) pointer-jump rounds); this
  * operator is for closure FROM SEEDS, where BFS touches only the
  * reachable subgraph instead of labeling the world.
  *
  * `maxRounds` is a safety bound like [[ConnectedComponents]]'
  * `maxIterations`: hitting it throws instead of returning a
  * truncated closure.
  */
object Reachability {

  /** All (seed, node, depth) tuples reachable from `seeds` over
    * directed `edges`. Seeds are their own round-0 nodes; `depth` is
    * the SHORTEST hop count from the seed (BFS layers: a node enters
    * the frontier exactly once, on its first arrival, so the recorded
    * round is the minimum over all paths for free).
    *
    * @param seeds (seedCol, nodeCol) — starting frontier, one row per
    *              seed/start-node (a seed may start at several nodes)
    * @param edges (srcCol, dstCol) — directed; pass both directions
    *              for undirected closure
    */
  def reach(seeds: DataFrame, edges: DataFrame,
      seedCol: String = "seed", nodeCol: String = "node",
      srcCol: String = "src", dstCol: String = "dst",
      maxRounds: Int = 64): DataFrame = {
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .localCheckpoint() // edge pipeline (joins/LSH upstream) runs once
    var visited = seeds
      .select(col(seedCol).as(seedCol), col(nodeCol).as(nodeCol))
      .distinct().withColumn("depth", lit(0L)).localCheckpoint()
    var frontier = visited
    var round = 0
    while (round < maxRounds && !frontier.isEmpty) {
      val next = frontier.join(e, frontier(nodeCol) === e("__src"))
        .select(frontier(seedCol), e("__dst").as(nodeCol))
        .distinct() // collapse multi-path arrivals BEFORE the anti join
        .join(visited, Seq(seedCol, nodeCol), "left_anti")
        .withColumn("depth", lit(round + 1L))
        .localCheckpoint()
      visited = visited.unionByName(next).localCheckpoint()
      frontier = next
      round += 1
    }
    require(frontier.isEmpty,
      s"reachability not converged after $maxRounds rounds — raise maxRounds " +
        "(bound is a safety net against unexpectedly deep graphs)")
    visited
  }
}
