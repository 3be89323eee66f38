package graft.operators

import java.math.BigDecimal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Connected components over a pair graph — the step that turns near-dup
  * PAIRS (LSH output) into dedup GROUPS: every document in a component
  * keeps the component's minimum id as its label, so `label = id` marks
  * the survivor and everything else is droppable. This is the missing
  * half of corpus dedup: pair detection alone cannot decide survivors
  * when duplicates chain (a~b, b~c but a≁c must still collapse to one
  * survivor).
  *
  * Algorithm: minimum-label propagation — every node starts labeled
  * with its own id; each round every node takes the min label over
  * its neighborhood and its own label. The own-label term is a
  * "virtual self-loop": the label table unions straight into the
  * pull aggregation, so a round is ONE join + ONE aggregation with
  * no join back to the label table (measured, that re-attach join
  * was a third label-sized exchange per round — checkpointed frames
  * report UnknownPartitioning, so Spark can neither preserve nor
  * reuse their shuffles across references). Convergence piggybacks
  * on the same job: labels only ever decrease, so the label SUM is
  * strictly monotone and "sum unchanged" ⟺ "no label changed" — no
  * `__changed` column, no second action. Rounds needed = graph
  * diameter; near-dup components are clique-ish (LSH emits most
  * intra-cluster pairs directly), so 2-3 rounds in practice.
  *
  * Chain-shaped graphs (shingled revision sequences, a~b~c~… paths)
  * would need diameter rounds under pure propagation; after
  * `jumpAfter` rounds without convergence each subsequent round also
  * pointer-jumps the pulled labels through the round-input label
  * table (label := label[label] — the fused form: one extra
  * label-sized exchange on the probe side, no extra checkpoint, vs
  * the prior self-join form's two exchanges plus a second checkpoint
  * materialization). Jumping halves the remaining chain depth per
  * round, so convergence is O(log diameter) total — the same
  * asymptotics as large-star/small-star contraction without
  * rebuilding the edge relation each round. Clique-ish duplicate
  * graphs converge before the jump threshold and never pay the extra
  * join.
  *
  * `maxIterations` is a safety bound, not a tuning knob: hitting it
  * throws rather than silently emitting unconverged labels (with
  * jumping, the default 40 rounds covers diameters to ~2^37 — beyond
  * any physical corpus; a 1M-node path measures ~24 rounds).
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
      maxIterations: Int = 40, jumpAfter: Int = 3): DataFrame = {
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
    // aggregate is the action that materializes it, so a round costs
    // exactly one job (checkpoint-then-aggregate would be two)
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

    // decimal(38,0) label sums: exact at any node count (a LONG sum
    // would wrap at ~10^19 and could alias "changed" as "converged")
    def labelSum(df: DataFrame): BigDecimal = {
      val s = df.agg(sum(col("component").cast(DecimalType(38, 0)))).head().getDecimal(0)
      if (s == null) BigDecimal.ZERO else s
    }

    // round-0 shortcut: the first pull from identity labels is just
    // min(id, neighbors) — fold it into initialization and save one
    // full propagation round (star-shaped dup groups, the common case,
    // then converge in a single aggregate round)
    var labels = cutLazy(edges.groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), min(col("src"))).as("component")))
    var prevSum = labelSum(labels) // materializes the init checkpoint
    var converged = false
    var iter = 0
    while (!converged) {
      iter += 1
      if (iter > maxIterations)
        throw new IllegalStateException(
          s"connected components did not converge in $maxIterations rounds " +
            "(with pointer-jumping this needs diameter > 2^(rounds-jumpAfter) — " +
            "raise maxIterations)")
      // The whole propagation round: every node takes the min label
      // over its neighborhood AND its own label — the own-label term
      // comes from unioning the label table straight into the
      // aggregation (a "virtual self-loop": no extra edge rows through
      // the dst-join shuffle, and map-side combine absorbs the union
      // rows before the src shuffle). One join, one aggregation, no
      // join back to the label table afterward — measured, that
      // re-attach join was a third label-sized exchange per round
      // (checkpoints report UnknownPartitioning, so its shuffle could
      // be neither preserved nor reused).
      val pulled = edges.join(labels, col("dst") === col("id"))
        .select(col("src"), col("component"))
        .unionAll(labels.select(col("id").as("src"), col("component")))
        .groupBy(col("src")).agg(min(col("component")).as("component"))
        .select(col("src").as("id"), col("component"))
      val next = cutLazy(
        if (iter <= jumpAfter) pulled
        else {
          // pointer jump, fused: chase the pulled label through the
          // ROUND-INPUT label table (already checkpoint-backed — a flat
          // scan) instead of a self-join on the round's own output,
          // which needed a second lazy checkpoint and an extra
          // label-sized exchange. labels_prev[c] ≤ c keeps labels
          // monotone (the convergence test relies on it), and the
          // looked-up value is itself a reachable node's label,
          // preserving the "labels are reachable ids" invariant. Left
          // join: every component value IS a node id present in
          // `labels`, but left keeps the row count invariant by
          // construction.
          val lookup = labels.select(col("id").as("__jid"), col("component").as("__jcomp"))
          pulled.join(lookup, pulled("component") === col("__jid"), "left")
            .select(pulled("id"),
              coalesce(col("__jcomp"), pulled("component")).as("component"))
        })
      // the ONE job per round: materializes the lazy checkpoint and
      // computes the convergence aggregate in the same pass — labels
      // only decrease, so an unchanged sum means an unchanged table
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
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
