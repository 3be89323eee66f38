package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.InvertedIndex
import graft.sources.TableCatalog

/** Tombstone-fraction compaction policy for the persisted serving
  * indexes — the trigger d58 (LSH) and the postings compaction leave
  * manual, made automatic the way [[MorSink]]'s `compactEvery` prices
  * MoR delta stacks. MoR counts COMMITS because its serve cost grows
  * with the delta stack depth; a tombstoned index's serve cost grows
  * with the MASKED ROW FRACTION instead (the anti-join scans dead rows
  * only to drop them, and every lookup pays it), so the trigger here
  * is the measured dead fraction of the per-document relation — the
  * exact quantity serving wastes.
  *
  * Policy: after a maintenance commit, if dead_rows / total_rows of
  * the per-doc relation (`sizes` for the LSH index, `doclen` for the
  * postings index) is ≥ `threshold`, fold the tombstones into every
  * member relation and reset the tombstone relation — ONE atomic
  * [[TableCatalog.transact]] generation, so readers see either the
  * masked index or the compacted one, never a torn mix, and AS OF
  * still reads the pre-compaction state. Below threshold: no-op, no
  * generation. The check costs two count jobs over the smallest
  * member relation (one row per doc — metadata-cheap on parquet),
  * never a scan of bands/postings.
  *
  * The default threshold comes from the measured serve-cost curve
  * (ScaleSmoke `tombcurve`, figures in COVERAGE.md). At 100k docs the
  * postings mask costs ~2× per serve (0.7-1.1 s masked vs 0.38 s
  * compacted — a flat broadcast + anti-join toll once ANY tombstone
  * exists, plus the dead-row scan that grows with the index), while
  * the LSH mask hides inside verification noise; a compaction transact
  * (~2.4 s) amortizes in under ten serves. The fraction trigger's
  * deeper job is bounding what the threshold DENOMINATES: the
  * tombstone relation rides every serve as a broadcast, so letting it
  * grow unboundedly (a pure count trigger can — N tiny delete batches)
  * eventually breaks the never-shuffle-the-index contract; a fraction
  * cap keeps the broadcast ≤ threshold × corpus ids by construction.
  * Compacting much below ~0.3 thrashes generations on a trickle of
  * deletes for overhead the measurements can't even see.
  */
object IndexMaintenance {

  /** Dead fraction ≥ this triggers compaction (see scaladoc). */
  val DefaultThreshold = 0.3

  /** Masked-row fraction of the d57 LSH dedup index: tombstoned ids
    * over indexed docs, measured on `sizes` (one row per doc).
    */
  def lshDeadFraction(cat: TableCatalog): Double =
    deadFraction(cat, "sizes",
      (rel, tomb) => rel.join(broadcast(tomb), Seq("id"), "left_anti"))

  /** Masked-row fraction of the w30 postings index, measured on
    * `doclen` (one row per doc REVISION — replaced revisions count as
    * dead rows, which is right: the serve mask pays for them too).
    */
  def postingsDeadFraction(cat: TableCatalog): Double =
    deadFraction(cat, "doclen", InvertedIndex.liveView)

  private val IdMask: (DataFrame, DataFrame) => DataFrame =
    (rel, tomb) => rel.join(broadcast(tomb), Seq("id"), "left_anti")

  /** The unified family's kill-floor mask: LITERALLY
    * [[UnifiedIndex]]'s serve semantics — the fold calls the same
    * `killFloors` aggregation and `masked` anti-join the serve path
    * uses, so compaction destroys EXACTLY the rows serving masks and
    * a future edit to the floor arithmetic cannot diverge the two.
    */
  private def killMask(key: String): (DataFrame, DataFrame) => DataFrame =
    (rel, tomb) => UnifiedIndex.masked(rel, key, UnifiedIndex.killFloors(tomb))

  /** Segment-count ceiling: an append member's serve cost ALSO
    * degrades with CHAIN LENGTH, independent of dead rows — every
    * serve lists and opens each segment directory (the classic
    * small-files problem), so a delete-free stream would fragment
    * forever under a dead-fraction-only trigger. When the policy's
    * longest member chain reaches this, the same fold fires as pure
    * DEFRAGMENTATION (tombstones folded too if any exist; the
    * snapshot commit resets every chain to one directory). The
    * default is sized so a per-serve listing stays trivially cheap
    * while a steady stream still amortizes each fold over many
    * commits.
    */
  val DefaultMaxSegments = 64

  /** Longest append-member chain among `members` at the head — the
    * fragmentation the segment-count trigger prices. Metadata-only:
    * one generation-file read, no data touched.
    */
  def fragmentation(cat: TableCatalog, members: Iterable[String]): Int =
    cat.latestGeneration() match {
      case Some(head) =>
        val chains = cat.appendVersions(head)
        val ms = members.toSet
        chains.collect { case (t, c) if ms(t) => c.size }
          .foldLeft(0)(math.max)
      case None => 0
    }

  /** Compact the LSH dedup index iff its dead fraction crossed
    * `threshold` OR its chains fragmented past `maxSegments`: one
    * transact folds tombstones out of bands/shingles/sizes and
    * empties the tombstone relation (the d58 event, scheduled instead
    * of manual). Returns the compaction generation, or None below
    * both triggers.
    */
  def compactLshIfNeeded(cat: TableCatalog, batchId: Long,
      threshold: Double = DefaultThreshold,
      maxSegments: Int = DefaultMaxSegments): Option[Long] =
    compactIfNeeded(cat, batchId, threshold, lshDeadFraction,
      Seq("bands", "shingles", "sizes"),
      _ => FoldPlan(Seq("bands", "shingles", "sizes").map(_ -> IdMask).toMap),
      maxSegments = maxSegments)

  /** Compact the postings index iff its dead fraction crossed
    * `threshold` or its chains fragmented past `maxSegments`: one
    * transact folds every killed revision out of postings/doclen and
    * empties the tombstone relation. Surviving rows keep their
    * revision — later replaces/deletes carry higher kill floors, so
    * compaction never disturbs the rev contract.
    */
  def compactPostingsIfNeeded(cat: TableCatalog, batchId: Long,
      threshold: Double = DefaultThreshold,
      maxSegments: Int = DefaultMaxSegments): Option[Long] =
    compactIfNeeded(cat, batchId, threshold, postingsDeadFraction,
      Seq("postings", "doclen"),
      _ => FoldPlan(Seq("postings", "doclen")
        .map(_ -> (InvertedIndex.liveView _)).toMap),
      maxSegments = maxSegments)

  /** Masked-row fraction of the unified (w32) index — one tombstone
    * set prices BOTH families, measured once on `sizes` (the same
    * (id, rev) set as `doclen` by [[UnifiedIndex]]'s membership
    * invariant). Dead rows here are REVISIONS below their id's kill
    * floor: replaced recrawl revisions count beside forgotten docs,
    * which is right — the serve mask pays for both.
    *
    * DOCUMENTED APPROXIMATION: rider-member rows for ids that never
    * got a `sizes` row (a 0-token doc whose only modality is a rider,
    * the w39 empty-text-still-embeds case) are invisible to this
    * fraction — their dead revisions accumulate without moving the
    * trigger, and such a rider-heavy churn pattern compacts only when
    * the SEGMENT-COUNT ceiling trips (which it always eventually does:
    * every rider append extends a chain). Pricing riders exactly would
    * cost a count per rider per maintenance commit against a relation
    * the membership invariant doesn't govern; the segment ceiling
    * bounds the miss instead.
    */
  def unifiedDeadFraction(cat: TableCatalog): Double =
    deadFraction(cat, "sizes", killMask("id"))

  /** Compact the unified index iff the shared dead fraction crossed
    * `threshold`: ONE transact folds the one tombstone set out of all
    * SIX member relations — the cross-family analogue of the w32
    * commit (a per-family compaction pair could tear: one family
    * compacted, the other still masking).
    *
    * Tombstone survivors are exactly the PENDING ERASE requests:
    * forget tombstones ([[UnifiedIndex.ForgetFloor]]) whose id had no
    * rows to destroy — the durable erase ledger for documents that
    * have not arrived yet ([[UnifiedIndex.delete]]'s GDPR contract;
    * dropping one would serve the doc when it is finally admitted).
    * Every SATISFIED forget (its rows just folded away) and every
    * finite recrawl floor (its dead revisions just folded away, and
    * batch-id monotonicity means no future row can land under it)
    * folds with the rows it masked, so the relation stays
    * erase-ledger-sized, and the fraction trigger is unaffected (a
    * pending tombstone masks zero rows, so it never counts toward the
    * dead fraction it is retained past).
    */
  /** The six built-in unified members plus the tombstone relation —
    * any OTHER member of a unified catalog is a rider.
    */
  private val UnifiedBuiltins = Set("bands", "shingles", "sizes",
    "postings", "doclen", "positions", "tombstones")

  /** Rider relations fold AUTOMATICALLY: any member of the snapshot
    * generation beyond the six built-ins that carries a `rev` column
    * and an `id`/`doc_id` key (the [[UnifiedIndex.commitBatch]]
    * `extraMembers` contract) joins the fold under the same floors —
    * the fold set derives from the generation's own member manifest,
    * so a maintenance loop cannot strand dead revisions in a modality
    * by forgetting to name it (the cross-modal tear this family
    * exists to prevent). `extraMembers` remains as an explicit
    * override for riders whose key column the convention cannot
    * infer. Discovery costs one schema (parquet footer) read per
    * rider and runs ONLY once a trigger has fired (the cheap-first
    * check short-circuits first — a per-commit probe on a healthy
    * index touches no rider footers), against the exact snapshot the
    * transact validated; MoR members sharing the catalog are skipped
    * (they are not commitBatch riders and have no snapshot directory
    * to footer-read). Single-writer maintenance loop assumed as
    * everywhere.
    */
  def compactUnifiedIfNeeded(cat: TableCatalog, batchId: Long,
      threshold: Double = DefaultThreshold,
      maxSegments: Int = DefaultMaxSegments,
      extraMembers: Map[String, String] = Map.empty): Option[Long] =
    // Fragmentation trigger checks the built-ins only: `sizes` appends
    // in EVERY commitBatch generation while a rider appends in at most
    // those, so the longest built-in chain bounds every rider chain
    // and the trigger fires no later than a rider-inclusive check —
    // without reading any rider footer on the no-op path.
    compactIfNeeded(cat, batchId, threshold, unifiedDeadFraction,
      UnifiedBuiltins - "tombstones",
      plan = g => {
        val discovered: Map[String, String] = cat.memberNames(g)
          .filterNot(UnifiedBuiltins).filterNot(extraMembers.keySet)
          .filterNot(cat.morVersions(g).keySet)
          .flatMap { m =>
            val cols = cat.readAt(g, m).columns.toSet
            if (!cols("rev")) None
            else if (cols("id")) Some(m -> "id")
            else if (cols("doc_id")) Some(m -> "doc_id")
            else None
          }.toMap
        val riders = extraMembers ++ discovered
        FoldPlan(
          Seq("bands", "shingles", "sizes").map(_ -> killMask("id")).toMap ++
            Seq("postings", "doclen", "positions").map(_ -> killMask("doc_id")).toMap ++
            riders.map { case (m, key) => m -> killMask(key) },
          // erase satisfaction is judged against EVERY id-bearing
          // member, riders included: a forget whose only rows lived in
          // a rider (0-token doc, w39) is SATISFIED by this fold and
          // must not linger as a pending tombstone that would mask a
          // later legitimate re-admission (the revival contract —
          // an erase is not a forever-ban). Built-ins beyond `sizes`
          // add no ids by the membership invariant.
          retainUnmatched = Some(Seq("sizes" -> "id") ++ riders.toSeq))
      },
      maxSegments = maxSegments)

  private def deadFraction(cat: TableCatalog, perDocRel: String,
      mask: (DataFrame, DataFrame) => DataFrame): Double =
    cat.latestGeneration() match {
      case Some(head) if cat.memberNames(head).contains("tombstones")
          // an erase ledger can exist before ANY ingest (the
          // races-ahead contract): with no per-doc relation yet there
          // is nothing to be dead
          && cat.memberNames(head).contains(perDocRel) =>
        val tomb = cat.read("tombstones")
        // empty erase ledger (delete-free stream, or every tombstone
        // folded): nothing can be dead, and the short-circuit keeps
        // the per-commit probe of a healthy index to ONE limit-1 scan
        // of the (empty) tombstone chain — never a per-doc-relation
        // scan
        if (tomb.isEmpty) 0.0
        else {
          val rel = cat.read(perDocRel)
          // total and surviving counted in ONE action (the two scans
          // are concurrent stages of one job) instead of two
          // sequential count jobs: this probe runs after EVERY
          // maintenance commit, so its job count is serve-loop latency
          val r = rel.select(lit(1L).as("__all"), lit(0L).as("__live"))
            .unionAll(mask(rel, tomb)
              .select(lit(0L).as("__all"), lit(1L).as("__live")))
            .agg(sum(col("__all")).as("total"), sum(col("__live")).as("live"))
            .head()
          val total = if (r.isNullAt(0)) 0L else r.getLong(0)
          val live = if (r.isNullAt(1)) 0L else r.getLong(1)
          if (total == 0L) 0.0 else 1.0 - live.toDouble / total
        }
      case _ => 0.0
    }

  /** One fold's worth of work, computed against the exact snapshot
    * generation the transact validated: which members fold under which
    * mask, and (unified family only) which (member, keyCol) relations
    * define "this id has rows" for erase-satisfaction.
    */
  private final case class FoldPlan(
      masks: Map[String, (DataFrame, DataFrame) => DataFrame],
      retainUnmatched: Option[Seq[(String, String)]] = None)

  private def compactIfNeeded(cat: TableCatalog, batchId: Long,
      threshold: Double, fraction: TableCatalog => Double,
      fragMembers: Iterable[String], plan: Long => FoldPlan,
      maxSegments: Int = DefaultMaxSegments): Option[Long] = {
    require(threshold > 0.0,
      s"threshold $threshold must be positive (0 would compact on every delete)")
    require(maxSegments > 1,
      s"maxSegments $maxSegments must exceed 1 (every append starts a 1-chain)")
    // cheap-first: fragmentation is one generation-file read; the dead
    // fraction costs two counts over the smallest member relation.
    // The plan (and any rider footer reads inside it) is only built
    // past this point — the healthy-index probe stays metadata-cheap.
    if (fragmentation(cat, fragMembers) < maxSegments &&
        fraction(cat) < threshold) None
    else Some(cat.transact(batchId) { snap =>
      // fold against the SNAPSHOT the transact validated — a conflict
      // retry re-invokes this body, rebuilding the plan on the fresh
      // snapshot (rider discovery included)
      val g = snap.getOrElse(
        throw new IllegalStateException("compacting an empty catalog"))
      val p = plan(g)
      val present = cat.memberNames(g)
      // a fragmentation-triggered fold on a delete-free stream has no
      // tombstone relation yet: fold with an empty mask (pure
      // defragmentation — the snapshot commit resets every chain)
      val hasTomb = present.contains("tombstones")
      // materialize the erase ledger ONCE for the whole fold: every
      // member's kill-floor mask (and the survivor computation) reads
      // this id-sized relation — without the checkpoint each of the
      // 6-7 concurrent staged writes re-scans the tombstone chain and
      // re-aggregates the floors for its own broadcast
      lazy val tombAt = cat.readAt(g, "tombstones").localCheckpoint()
      val folded = p.masks.collect { case (m, mask) if present(m) =>
        m -> (if (hasTomb) mask(cat.readAt(g, m), broadcast(tombAt))
              else cat.readAt(g, m))
      }
      if (!hasTomb) folded
      else {
        // retained tombstones: PENDING erase requests — forget floors
        // whose id matched NOTHING in any id-bearing member (riders
        // included), i.e. the erases whose documents have not arrived
        // in ANY modality (unified family only; the standalone
        // revisioned families revive by design). Satisfied forgets and
        // finite recrawl floors fold with the rows they masked.
        val survivors = p.retainUnmatched match {
          case Some(rels) =>
            val ids = rels.collect { case (m, key) if present(m) =>
              cat.readAt(g, m).select(col(key).as("id"))
            }.reduceOption(_ unionByName _)
            val pendings = tombAt
              .filter(col("kill_below") === UnifiedIndex.ForgetFloor)
            ids.fold(pendings)(p => pendings.join(p, Seq("id"), "left_anti"))
          case None => tombAt.limit(0)
        }
        folded + ("tombstones" -> survivors)
      }
    })
  }
}
