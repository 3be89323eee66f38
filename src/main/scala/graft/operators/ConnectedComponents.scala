package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair graph — the step that turns near-dup
  * PAIRS (LSH output) into dedup GROUPS: every document in a component
  * keeps the component's minimum id as its label, so `label = id` marks
  * the survivor and everything else is droppable. This is the missing
  * half of corpus dedup: pair detection alone cannot decide survivors
  * when duplicates chain (a~b, b~c but a≁c must still collapse to one
  * survivor).
  *
  * Algorithm: minimum-label propagation — every node starts labeled with
  * its own id; each round takes the min of its label and its neighbors'
  * labels; converges when no label changes. Rounds needed = graph
  * diameter, and near-dup components are clique-ish (LSH emits most
  * intra-cluster pairs directly), so 2-3 rounds in practice; each round
  * is one join + one aggregation, all shuffles on node id. For
  * adversarial long-chain graphs the round count grows with the chain
  * length — the known remedy is star-contraction (large-star/small-star)
  * with O(log n) rounds, which this implementation deliberately trades
  * for per-round simplicity since duplicate clusters are not chains.
  *
  * `maxIterations` is a safety bound, not a tuning knob: hitting it
  * throws rather than silently emitting unconverged labels.
  */
object ConnectedComponents {

  /** @param pairs (aCol, bCol) undirected edges
    * @return (id, component) for every node appearing in an edge;
    *         component = min node id reachable
    */
  def components(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIterations: Int = 20): DataFrame = {
    // Iterative plans re-derive their whole lineage on every reuse unless
    // it is cut: checkpoint the edge set once (so the possibly-expensive
    // pair pipeline upstream — LSH, joins — runs exactly once) and the
    // label frame every round (so round N never re-executes rounds
    // 1..N-1, and the returned frame is a flat scan for the caller).
    // localCheckpoint stores executor-resident blocks — the right trade
    // for a frame that is orders of magnitude smaller than the corpus;
    // clusters needing fault-tolerant recompute set a checkpoint dir and
    // these become reliable checkpoints automatically.
    def cut(df: DataFrame): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint()

    // cut BEFORE the union too: `directed` appears in both branches, and
    // an uncut plan would execute the (possibly expensive — LSH, joins)
    // pair pipeline twice inside the edges job
    val directed = cut(pairs.select(col(aCol).as("src"), col(bCol).as("dst")))
    val edges = cut(
      directed.unionAll(directed.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())

    // round-0 shortcut: the first pull from identity labels is just
    // min(id, neighbors) — fold it into initialization and save one
    // full propagation round (star-shaped dup groups, the common case,
    // then converge in a single counting round)
    var labels = edges.groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), min(col("src"))).as("component"))
    var converged = false
    var iter = 0
    while (!converged) {
      iter += 1
      if (iter > maxIterations)
        throw new IllegalStateException(
          s"connected components did not converge in $maxIterations rounds " +
            "(component diameter exceeds the bound — raise maxIterations or " +
            "switch to star-contraction for chain-shaped graphs)")
      // each node pulls the smallest label among its neighbors
      val pulled = edges.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("component")).as("__nbr"))
      val joined = cut(labels.join(pulled, col("id") === col("src"), "left"))
      // labels only ever decrease, so "pulled a smaller label" IS the
      // convergence test — one job per round over the checkpointed frame
      val changed = joined
        .filter(coalesce(col("__nbr"), col("component")) < col("component"))
        .count()
      labels = joined.select(col("id"),
        least(col("component"), coalesce(col("__nbr"), col("component"))).as("component"))
      converged = changed == 0
    }
    labels
  }

  /** Dedup-group view over a corpus: every row labeled with its
    * component (own id when it has no duplicates) and a survivor flag.
    */
  def dedupGroups(
      corpus: DataFrame, pairs: DataFrame,
      idCol: String, aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val comp = components(pairs, aCol, bCol)
      .withColumnRenamed("id", "__cc_id")
    corpus.join(comp, col(idCol) === col("__cc_id"), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("component"))
      .withColumn("is_survivor", col(idCol) === col("component"))
  }
}
