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

  /** The unified family's kill-floor mask ([[UnifiedIndex]]'s serve
    * semantics, reused at the fold so compaction destroys EXACTLY the
    * rows serving masks): per id the MAX kill_below dominates (a
    * forget's [[UnifiedIndex.ForgetFloor]] over any recrawl floor),
    * and a row dies iff its revision sits below it.
    */
  private def killMask(key: String): (DataFrame, DataFrame) => DataFrame =
    (rel, tomb) => {
      val floors = tomb.groupBy(col("id")).agg(max(col("kill_below")).as("__kill"))
      rel.as("__r").join(broadcast(floors).as("__k"),
        col(s"__r.$key") === col("__k.id") &&
          col("__r.rev") < col("__k.__kill"),
        "left_anti")
    }

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
      Seq("bands", "shingles", "sizes").map(_ -> IdMask).toMap,
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
      Seq("postings", "doclen").map(_ -> (InvertedIndex.liveView _)).toMap,
      maxSegments = maxSegments)

  /** Masked-row fraction of the unified (w32) index — one tombstone
    * set prices BOTH families, measured once on `sizes` (the same
    * (id, rev) set as `doclen` by [[UnifiedIndex]]'s membership
    * invariant). Dead rows here are REVISIONS below their id's kill
    * floor: replaced recrawl revisions count beside forgotten docs,
    * which is right — the serve mask pays for both.
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

  /** Rider relations fold AUTOMATICALLY: any member of the head
    * generation beyond the six built-ins that carries a `rev` column
    * and an `id`/`doc_id` key (the [[UnifiedIndex.commitBatch]]
    * `extraMembers` contract) joins the fold under the same floors —
    * the fold set derives from the generation's own member manifest,
    * so a maintenance loop cannot strand dead revisions in a modality
    * by forgetting to name it (the cross-modal tear this family
    * exists to prevent). `extraMembers` remains as an explicit
    * override for riders whose key column the convention cannot
    * infer. Discovery costs one schema (parquet footer) read per
    * rider, single-writer maintenance loop assumed as everywhere.
    */
  def compactUnifiedIfNeeded(cat: TableCatalog, batchId: Long,
      threshold: Double = DefaultThreshold,
      maxSegments: Int = DefaultMaxSegments,
      extraMembers: Map[String, String] = Map.empty): Option[Long] = {
    val discovered: Map[String, String] = cat.latestGeneration() match {
      case Some(g) => cat.memberNames(g)
        .filterNot(UnifiedBuiltins).filterNot(extraMembers.keySet)
        .flatMap { m =>
          val cols = cat.readAt(g, m).columns.toSet
          if (!cols("rev")) None
          else if (cols("id")) Some(m -> "id")
          else if (cols("doc_id")) Some(m -> "doc_id")
          else None
        }.toMap
      case None => Map.empty
    }
    compactIfNeeded(cat, batchId, threshold, unifiedDeadFraction,
      Seq("bands", "shingles", "sizes").map(_ -> killMask("id")).toMap ++
        Seq("postings", "doclen", "positions").map(_ -> killMask("doc_id")).toMap ++
        (extraMembers ++ discovered).map { case (m, key) => m -> killMask(key) },
      retainUnmatched = Some("sizes"), maxSegments = maxSegments)
  }

  private def deadFraction(cat: TableCatalog, perDocRel: String,
      mask: (DataFrame, DataFrame) => DataFrame): Double =
    cat.latestGeneration() match {
      case Some(head) if cat.memberNames(head).contains("tombstones")
          // an erase ledger can exist before ANY ingest (the
          // races-ahead contract): with no per-doc relation yet there
          // is nothing to be dead
          && cat.memberNames(head).contains(perDocRel) =>
        val tomb = cat.read("tombstones")
        if (tomb.isEmpty) 0.0
        else {
          val rel = cat.read(perDocRel)
          val total = rel.count()
          if (total == 0L) 0.0
          else 1.0 - mask(rel, tomb).count().toDouble / total
        }
      case _ => 0.0
    }

  private def compactIfNeeded(cat: TableCatalog, batchId: Long,
      threshold: Double, fraction: TableCatalog => Double,
      members: Map[String, (DataFrame, DataFrame) => DataFrame],
      retainUnmatched: Option[String] = None,
      maxSegments: Int = DefaultMaxSegments): Option[Long] = {
    require(threshold > 0.0,
      s"threshold $threshold must be positive (0 would compact on every delete)")
    require(maxSegments > 1,
      s"maxSegments $maxSegments must exceed 1 (every append starts a 1-chain)")
    // cheap-first: fragmentation is one generation-file read; the dead
    // fraction costs two counts over the smallest member relation
    if (fragmentation(cat, members.keys) < maxSegments &&
        fraction(cat) < threshold) None
    else Some(cat.transact(batchId) { snap =>
      // fold against the SNAPSHOT the transact validated — a conflict
      // retry re-invokes this body with the fresh snapshot
      val g = snap.getOrElse(
        throw new IllegalStateException("compacting an empty catalog"))
      // a fragmentation-triggered fold on a delete-free stream has no
      // tombstone relation yet: fold with an empty mask (pure
      // defragmentation — the snapshot commit resets every chain)
      val hasTomb = cat.memberNames(g).contains("tombstones")
      def tombAt = cat.readAt(g, "tombstones")
      val folded = members.map { case (m, mask) =>
        m -> (if (hasTomb) mask(cat.readAt(g, m), broadcast(tombAt))
              else cat.readAt(g, m))
      }
      if (!hasTomb) folded
      else {
        // retained tombstones: PENDING erase requests — forget floors
        // whose id matched NOTHING in the per-doc relation, i.e. the
        // erases whose documents have not arrived (unified family
        // only; the standalone revisioned families revive by design).
        // Satisfied forgets and finite recrawl floors fold with the
        // rows they masked.
        val survivors = retainUnmatched match {
          case Some(perDoc) => tombAt
            .filter(col("kill_below") === UnifiedIndex.ForgetFloor)
            .join(cat.readAt(g, perDoc).select(col("id")), Seq("id"), "left_anti")
          case None => tombAt.limit(0)
        }
        folded + ("tombstones" -> survivors)
      }
    })
  }
}
