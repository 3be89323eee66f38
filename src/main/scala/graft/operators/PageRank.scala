package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank (Brin & Page 1998) over an edge RELATION
  * — link-graph authority scoring, the curation signal large-scale
  * web-corpus pipelines weight documents by (a page linked from many
  * authoritative pages is itself authoritative; domain-level variants
  * rank crawl frontiers and filter spam farms).
  *
  * Everything is INTEGER-EXACT fixed point: ranks live in
  * parts-per-`scale` (default ppb), the damping split is
  * `(100-dampPct)/100` teleport + `dampPct/100` propagation, and
  * every division is integral (`div` / floor semantics, positive
  * operands) — so the k-th iterate is a pure function of the edge
  * set, bit-identical across engines, partitionings, and reruns. The
  * standard float formulation would make the oracle hash unstable.
  * Dangling mass (nodes without out-edges) is dropped, not
  * redistributed — the simplest deterministic variant; ranks then
  * sum to ≤ scale rather than exactly scale.
  *
  * Scale shape: per iteration, ONE shuffle keyed on `src` (the
  * rank÷outdeg share join) and ONE keyed on `dst` (the contribution
  * aggregate) — the canonical distributed PageRank; the node and
  * outdeg relations are |V|-sized while the join streams |E|. At
  * 100 TB the iterate should be checkpointed every few rounds to cut
  * lineage (here k is small and the plan stays a DAG of 2k joins);
  * pre-partitioning edges by `src` makes the share join co-located
  * across ALL iterations since the key never changes.
  */
object PageRank {

  /** Run `iterations` rounds over `edges(src, dst)` (directed, will
    * be deduplicated). Returns (node, rank) for every node appearing
    * as a src or dst, ranks in parts-per-`scale`.
    */
  def run(edges: DataFrame, iterations: Int, dampPct: Int = 85,
      scale: Long = 1000000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 50, s"bad iterations $iterations")
    require(dampPct >= 0 && dampPct <= 100, s"bad dampPct $dampPct")
    // deliberately NOT persisted: the repeated edges/nodes/outdeg
    // subtrees dedup through Spark's exchange reuse, and an explicit
    // persist of all three measured SLOWER at sf0.1 (4.94 vs 3.06 s
    // median of 5 — the cache write + in-memory scan costs more than
    // the reused shuffle reads it replaces). At real scale, persist
    // the EDGE relation only, once, at the storage layer (bucketed by
    // src), not per-run.
    val e = edges.select(col("src"), col("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val meta = broadcast(nodes.agg(count(lit(1)).as("n")))
    var ranks = nodes.crossJoin(meta)
      .select(col("node"), expr(s"$scale div n").as("rank"))
    for (_ <- 1 to iterations) {
      val shares = ranks.join(outdeg, col("node") === col("src"))
        .select(col("src"), expr("rank div deg").as("share"))
      val contrib = e.join(shares, "src")
        .groupBy(col("dst")).agg(sum(col("share")).as("inflow"))
      ranks = nodes.crossJoin(meta)
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"), (
          expr(s"${(100 - dampPct).toLong * scale} div (100 * n)") +
            expr(s"($dampPct * coalesce(inflow, 0L)) div 100")).as("rank"))
    }
    ranks
  }
}
