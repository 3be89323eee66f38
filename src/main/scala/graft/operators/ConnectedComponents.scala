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
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist()

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .persist()
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
      val next = labels.join(pulled, col("id") === col("src"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("__nbr"), col("component"))).as("component"))
        .persist()
      // one job per round: the change-count join materializes (and
      // caches) `next` before the parent is unpersisted
      val changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.component") =!= col("o.component"))
        .count()
      labels.unpersist()
      labels = next
      converged = changed == 0
    }
    edges.unpersist()
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
