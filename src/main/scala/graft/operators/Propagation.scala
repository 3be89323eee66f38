package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact degree-damped score propagation over an undirected
  * graph — the PageRank shape with every float replaced by fixed-point
  * integer arithmetic, so a fixed-iteration run replays bit-identically
  * on any engine (the s12 quantized-k-means discipline applied to graph
  * iteration).
  *
  * Per node, score₀ = `unit`; each round every node sends
  * `score div deg` to each neighbor and re-scores as
  * `base + (dampNum · Σ incoming) div dampDen` with
  * `base = unit − unit·dampNum div dampDen` — all BIGINT ops (div =
  * floor division on non-negative values), so the sum over neighbors is
  * order-independent and there is no float to drift.
  *
  * Curation use: run over a near-dup / shared-boilerplate pair graph,
  * high scores mark documents deep inside templated clusters (SEO
  * farms, mirrored site chrome) — a centrality signal that pure pair
  * counting misses because it ignores transitive structure.
  *
  * Scale shape: the symmetrized edge relation is checkpointed ONCE and
  * reused every round (the ConnectedComponents pattern); each round is
  * one join edges⋈scores (shuffle keyed on src) + one aggregation keyed
  * on dst + one join back to the degree relation — per-round cost is
  * O(|E|) shuffled bytes with no growth across rounds, and `iters` is
  * fixed (propagation radius, typically 2-4), not data-driven.
  * Nodes with no edges are not in the output (degree 0 has no defined
  * share); isolated docs keep their baseline by definition.
  */
object Propagation {

  def propagate(
      edges: DataFrame, aCol: String, bCol: String, iters: Int,
      unit: Long = 1000000L, dampNum: Long = 850L, dampDen: Long = 1000L): DataFrame = {
    require(iters >= 0 && unit > 0 && dampDen > 0 && dampNum >= 0 && dampNum <= dampDen)
    // symmetrize once, checkpoint: every round re-reads this relation
    val dir = edges
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionAll(edges.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .localCheckpoint()
    val deg = dir.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val base = unit - unit * dampNum / dampDen
    var scores = deg.select(col("id"), col("deg"), lit(unit).as("score"))
    for (_ <- 1 to iters) {
      val in = scores
        .withColumn("__out", expr("score div deg"))
        .join(dir, col("id") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(col("__out")).as("__in"))
      scores = deg
        .join(in, col("id") === col("dst"), "left")
        .select(col("id"), col("deg"),
          (lit(base) + expr(s"$dampNum * coalesce(__in, 0) div $dampDen")).as("score"))
        .localCheckpoint()
    }
    scores
  }
}
