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
  * is one join + one aggregation, all shuffles on node id, and ONE
  * Spark job: the convergence count piggybacks on the action that
  * materializes the round's lazy localCheckpoint instead of running as
  * a second job over it.
  *
  * Chain-shaped graphs (shingled revision sequences, a~b~c~… paths)
  * would need diameter rounds under pure propagation; after
  * `jumpAfter` rounds without convergence each subsequent round also
  * pointer-jumps the label table (label := label[label], one extra
  * self-join on the LABELS frame — orders of magnitude smaller than
  * the corpus). Jumping halves the remaining chain depth per round, so
  * convergence is O(log diameter) total — the same asymptotics as
  * star-contraction without rebuilding the edge relation each round.
  * Clique-ish duplicate graphs converge before the jump threshold and
  * never pay the extra join.
  *
  * `maxIterations` is a safety bound, not a tuning knob: hitting it
  * throws rather than silently emitting unconverged labels (with
  * jumping, 20 rounds covers diameters beyond any physical corpus).
  */
object ConnectedComponents {

  /** @param pairs (aCol, bCol) undirected edges
    * @param jumpAfter rounds of pure propagation before each round also
    *        pointer-jumps the label table (chain-graph acceleration)
    * @return (id, component) for every node appearing in an edge;
    *         component = min node id reachable
    */
  def components(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIterations: Int = 20, jumpAfter: Int = 3): DataFrame = {
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
    // LAZY cut for the per-round label frame: the round's convergence
    // count is the action that materializes it, so a round costs exactly
    // one job (checkpoint-then-count was two)
    def cutLazy(df: DataFrame): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(eager = false)
      else df.localCheckpoint(eager = false)

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
            "(with pointer-jumping this needs diameter > 2^(rounds-jumpAfter) — " +
            "raise maxIterations)")
      // each node pulls the smallest label among its neighbors; labels
      // only ever decrease, so "pulled a smaller label" IS the
      // convergence test and rides along as a __changed column
      val pulled = edges.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("component")).as("__nbr"))
      val prop = labels.join(pulled, col("id") === col("src"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("__nbr"), col("component"))).as("component"),
          (coalesce(col("__nbr"), col("component")) < col("component")).as("__changed"))
      val next = cutLazy(
        if (iter <= jumpAfter) prop
        else {
          // pointer jump: label := label's label. The label table is tiny
          // next to the corpus, so the extra self-join is cheap; it halves
          // the remaining chain depth each round (O(log diameter) total).
          // Lazily cut so the shared base computes once inside the count
          // job below; left join — every label IS a node id in the frame,
          // but left keeps the row count invariant by construction.
          val base = cutLazy(prop)
          val lookup = base.select(col("id").as("__jid"), col("component").as("__jcomp"))
          base.join(lookup, base("component") === col("__jid"), "left")
            .select(base("id"),
              coalesce(col("__jcomp"), base("component")).as("component"),
              (base("__changed") ||
                coalesce(col("__jcomp"), base("component")) < base("component")).as("__changed"))
        })
      // the ONE job per round: materializes the lazy checkpoint(s) and
      // counts changed labels in the same pass
      val changed = next.filter(col("__changed")).count()
      labels = next.select(col("id"), col("component"))
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
