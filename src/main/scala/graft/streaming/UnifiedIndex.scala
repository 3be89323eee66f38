package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{CacheScope, TextDedup}
import graft.sources.TableCatalog

/** Cross-family index maintenance: ONE micro-batch commit advances the
  * LSH dedup index (bands / shingles / sizes — the w29 admission gate),
  * the BM25 postings index (postings / doclen — the t23/w30 retrieval
  * serve), AND the positional index (positions — the t30/t31 phrase
  * and proximity serve) as ONE atomic catalog generation. The property
  * this buys is MEMBERSHIP CONSISTENCY between index families: a
  * document the gate admits is searchable AND phrase-searchable in the
  * same generation, and a crash between "deduped", "indexed", and
  * "positioned" cannot strand a doc in a subset of the families. With
  * separate commits the torn window is real — a replayed batch would
  * re-shingle docs the postings already serve (double dedup rows),
  * serve docs the gate never admitted, or leave a doc BM25-searchable
  * but invisible to every phrase query (the exact tear r11 shipped:
  * positions rode their own commit).
  *
  * REVISIONS (kill-floor semantics across all six relations): every
  * index row carries the committing batch id as its `rev`; tombstones
  * carry (id, kill_below) and a serve masks rev < MAX(kill_below) per
  * id. Two tombstone classes share the one relation:
  *
  *   - RECRAWL floors (finite, = the replacing batch's id): written by
  *     [[commitBatch]] with `replace = true` IN THE SAME atomic
  *     generation as the replacement rows, so a document's re-crawl
  *     replaces its old revision in all six relations at once — stale
  *     shingles can't gate, stale postings can't rank, stale positions
  *     can't feed an adjacency join — without rewriting a single term
  *     file. Compaction folds the dead revisions and drops the floor
  *     (safe because batch ids are STRICTLY INCREASING — Structured
  *     Streaming's contract — so no future row can land under a folded
  *     floor).
  *   - FORGET tombstones (kill_below = Long.MaxValue): the GDPR path
  *     ([[delete]]). An erase request masks every revision, including
  *     ones admitted AFTER the request (the erase-races-ahead case),
  *     and survives compaction until it has destroyed matching rows —
  *     the durable erase ledger. Once a fold has physically removed
  *     the id's rows the satisfied request folds away too; a LATER
  *     re-crawl of the same id is then a new ingestion event and
  *     serves normally (an erase is a destruction order for data held
  *     NOW, not a forever-ban on the id).
  *
  * Cost shape per batch: the batch is shingled once (the shared
  * relation behind all three LSH members, cached through the scope)
  * and tokenized once WITH positions (posexplode — postings and doclen
  * fold the same cached relation positions project, so the third
  * family costs no extra scan of the text); both caches are released
  * as soon as the commit's writes materialize them, so a long-running
  * stream pins no per-batch state. Each relation is a pure append
  * (every doc REVISION lands in exactly one batch) committed as a
  * catalog APPEND MEMBER ([[graft.sources.TableCatalog.commitAllAppend]]):
  * the commit stages one batch-sized segment per relation and the
  * generation prepends it to the member's chain, so maintenance is
  * O(batch) PHYSICALLY — not just logically — however many families
  * ride the commit and however large the accumulated index (with
  * full-state commits every micro-batch would rewrite the whole
  * index: the one write pattern an inverted/LSH index cannot afford
  * at 100 TB). Serves read the chain as one multi-segment parquet
  * scan; the fraction-triggered compaction transact folds a long
  * chain back to one segment (a snapshot commit resets the chain).
  */
object UnifiedIndex {

  /** `kill_below` of a forget tombstone: masks every revision, past
    * and future, until a compaction physically destroys the rows.
    */
  val ForgetFloor: Long = Long.MaxValue

  /** Commit `adm` (an admitted micro-batch of (idCol, textCol) docs)
    * into all three index families as one atomic generation at
    * revision `batchId`. With `replace = true` the same generation
    * also tombstones every upserted id below this revision — the
    * RECRAWL path: the new rows serve, every older revision is masked
    * in all six relations at once, and no torn state between "old
    * revision dead" and "new revision live" can exist. Returns the
    * committed generation, or -1 on redelivery (the exactly-once
    * check covers ALL relations at once — that is the point).
    *
    * Batch ids must be strictly increasing across commits (the
    * Structured Streaming contract): revisions and recrawl floors are
    * compared numerically, and compaction folds finite floors on the
    * strength of it.
    *
    * `extraMembers` ride the SAME atomic generation — the cross-MODAL
    * extension point (w39 passes the IVF-PQ code relation derived
    * from the batch's embeddings, so a document becomes dedup-gated,
    * BM25-ranked, phrase-searchable AND ANN-searchable in one
    * generation, and none without the others). Each extra relation
    * must be row-local over the batch (an O(batch) append), carry the
    * doc id in some column, and gets this batch's `rev` stamped like
    * the six built-ins; serve it through [[memberLive]] and fold it
    * by naming it to [[IndexMaintenance.compactUnifiedIfNeeded]].
    */
  def commitBatch(cat: TableCatalog, adm: DataFrame, batchId: Long,
      idCol: String = "doc_id", textCol: String = "text",
      replace: Boolean = false,
      extraMembers: Map[String, DataFrame] = Map.empty): Long =
    CacheScope.scoped { implicit cs =>
      val lsh = TextDedup.lshIndexRelations(adm, idCol, textCol)
      // ONE tokenize feeds all three text-side relations: positions
      // project it, postings/doclen aggregate it (1-based pos matches
      // InvertedIndex.positions so phrase/proximity serve identically
      // from a batch-built or a stream-maintained index)
      val toks = adm.select(col(idCol).as("doc_id"),
          posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos0", "tok")))
        .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
          col("tok"))
        .persist()
      val rev = lit(batchId)
      try {
        // append members: each relation stages ONLY this batch's rows
        // (an O(batch) segment prepended to the chain) — full-state
        // derive here would rewrite the whole index per micro-batch
        val appends = Map(
          "bands" -> lsh("bands").withColumn("rev", rev),
          "shingles" -> lsh("shingles").withColumn("rev", rev),
          "sizes" -> lsh("sizes").withColumn("rev", rev),
          "postings" -> toks.groupBy(col("doc_id"), col("tok"))
            .agg(count(lit(1)).as("tf")).withColumn("rev", rev),
          "doclen" -> toks.groupBy(col("doc_id"))
            .agg(count(lit(1)).as("dl")).withColumn("rev", rev),
          "positions" -> toks.select(col("doc_id"), col("pos"),
            col("tok")).withColumn("rev", rev)) ++
          extraMembers.map { case (m, df) => m -> df.withColumn("rev", rev) }
        val withFloors =
          if (!replace) appends
          else appends + ("tombstones" -> adm
            .select(col(idCol).as("id"),
              lit(batchId).as("kill_below")))
        CatalogSink.commitBatchAppend(cat, batchId, withFloors)
      } finally toks.unpersist(blocking = false)
    }

  /** Tombstone `ids` (a 1-column id relation, any column name) out of
    * ALL families as one atomic generation: the GDPR/right-to-be-
    * forgotten path. One tombstone relation serves every family —
    * the delete cannot land in one index and not the others, mirroring
    * [[commitBatch]]'s atomicity on the way out. Exactly-once on
    * redelivery like every maintenance commit.
    *
    * The floor is [[ForgetFloor]] — the erase masks every revision of
    * the id, including revisions admitted AFTER the request, so an
    * erase that races ahead of its document is durable by
    * construction: the tombstone lands first and masks the id the
    * moment anything is admitted under it, with no matched/unmatched
    * special-casing. Ids never admitted are appended UNCONDITIONALLY —
    * deliberate, not an oversight (the doc may be mid-admission, or
    * arrive in a later crawl). The bloat this allows is bounded two
    * ways: [[IndexMaintenance.compactUnifiedIfNeeded]] folds every
    * tombstone whose rows it destroyed but RETAINS the pending ones
    * (forgetting an erase request before it has destroyed anything
    * would serve the doc when it arrives), and the fraction trigger
    * caps the masked share of admitted docs, so the serve-path
    * broadcast stays erase-ledger-sized.
    */
  def delete(cat: TableCatalog, ids: DataFrame, batchId: Long): Long =
    CatalogSink.commitBatchAppend(cat, batchId, Map(
      "tombstones" -> ids.select(col(ids.columns.head).as("id"),
        lit(ForgetFloor).as("kill_below"))))

  private def tombAt(cat: TableCatalog, g: Long): DataFrame =
    if (cat.memberNames(g).contains("tombstones"))
      cat.readAt(g, "tombstones")
    else cat.readAt(g, "sizes")
      .select(col("id"), lit(ForgetFloor).as("kill_below")).limit(0)

  private def tomb(cat: TableCatalog): DataFrame =
    cat.latestGeneration() match {
      case Some(g) => tombAt(cat, g)
      case None => throw new IllegalStateException("serving an empty catalog")
    }

  /** Per-id kill floor from a raw tombstone relation: MAX over the
    * id's tombstones (a forget's [[ForgetFloor]] dominates any recrawl
    * floor; among recrawl floors the newest masks everything the older
    * ones did). Package-visible so [[IndexMaintenance]]'s compaction
    * fold derives floors through the SAME aggregation the serve path
    * uses — one implementation, so fold and serve can never disagree
    * on which rows a tombstone kills.
    */
  private[graft] def killFloors(tomb: DataFrame): DataFrame =
    tomb.groupBy(col("id")).agg(max(col("kill_below")).as("__kill"))

  private def floorsAt(cat: TableCatalog, g: Long): DataFrame =
    killFloors(tombAt(cat, g))

  private def floors(cat: TableCatalog): DataFrame =
    killFloors(tomb(cat))

  /** The kill-floor serve mask: drop rows whose revision sits below
    * the id's floor. The floor relation is id-sized (erase ledger +
    * currently-masked recrawls) and broadcast — the index side is
    * scanned, never shuffled, for a maintenance event. Package-visible
    * for the same reason as [[killFloors]]: compaction destroys
    * EXACTLY the rows this mask hides, by calling this mask.
    */
  private[graft] def masked(rel: DataFrame, key: String, fl: DataFrame): DataFrame =
    rel.as("__r").join(broadcast(fl).as("__k"),
      col(s"__r.$key") === col("__k.id") &&
        col("__r.rev") < col("__k.__kill"),
      "left_anti")

  /** The LSH gate's live relations (bands, shingles, sizes) under the
    * shared kill floors — pass these to `TextDedup.lshIndexLookup`;
    * sizes ride along so Jaccard denominators stay right for free.
    */
  def lshLive(cat: TableCatalog): (DataFrame, DataFrame, DataFrame) = {
    val fl = floors(cat)
    (masked(cat.read("bands"), "id", fl),
      masked(cat.read("shingles"), "id", fl),
      masked(cat.read("sizes"), "id", fl))
  }

  /** The retrieval side's live relations (postings, doclen) under the
    * SAME kill floors — one delete or recrawl masks every family's
    * serves.
    */
  def postingsLive(cat: TableCatalog): (DataFrame, DataFrame) = {
    val fl = floors(cat)
    (masked(cat.read("postings"), "doc_id", fl),
      masked(cat.read("doclen"), "doc_id", fl))
  }

  /** The positional member's live relation under the SAME kill floors —
    * phrase/proximity serving follows the one delete set too (a
    * forgotten doc must stop matching phrases in the same generation
    * it stops ranking in BM25; a recrawled one must stop matching its
    * OLD phrases — positions shift, so serving a stale revision is a
    * wrong answer, not a staleness).
    */
  def positionsLive(cat: TableCatalog): DataFrame =
    masked(cat.read("positions"), "doc_id", floors(cat))

  /** [[postingsLive]] AS OF generation `g`: the index exactly as it
    * served then — relations at `g` under the floors that were active
    * at `g`. This is what makes a retrieval snapshot REPRODUCIBLE
    * (which corpus ranked when a training batch was sampled, what a
    * dedup gate saw when it admitted): later recrawls and forgets
    * leave history untouched, because every maintenance event is a
    * pure append and compaction is a new generation, never an edit.
    * GDPR note: an erase therefore stays time-travelable until
    * [[graft.sources.TableCatalog]] vacuum expires the pre-erase
    * generations — destruction becomes absolute at retention, the
    * standard table-format contract.
    */
  def postingsLiveAt(cat: TableCatalog, g: Long): (DataFrame, DataFrame) = {
    val fl = floorsAt(cat, g)
    (masked(cat.readAt(g, "postings"), "doc_id", fl),
      masked(cat.readAt(g, "doclen"), "doc_id", fl))
  }

  /** [[positionsLive]] AS OF generation `g` (see [[postingsLiveAt]]). */
  def positionsLiveAt(cat: TableCatalog, g: Long): DataFrame =
    masked(cat.readAt(g, "positions"), "doc_id", floorsAt(cat, g))

  /** Live view of an EXTRA member committed through
    * [[commitBatch]]'s `extraMembers` (e.g. the w39 vector codes),
    * under the SAME kill floors as the built-in families — one
    * forget/recrawl masks every modality at once.
    */
  def memberLive(cat: TableCatalog, member: String, keyCol: String): DataFrame =
    masked(cat.read(member), keyCol, floors(cat))

  /** Distinct (id, rev) sets per family at generation `g`, keyed by
    * their per-doc relation — None for an absent relation. `sizes`
    * and `doclen` are one-row-per-(id, rev) already; `positions`
    * needs the distinct.
    */
  private def familyIds(cat: TableCatalog, g: Long): Seq[Option[DataFrame]] = {
    val present = cat.memberNames(g)
    def keyed(rel: String, idc: String, distinct: Boolean) =
      if (!present(rel)) None
      else {
        val k = cat.readAt(g, rel).select(col(idc).as("id"), col("rev"))
        Some(if (distinct) k.distinct() else k)
      }
    Seq(
      keyed("sizes", "id", distinct = false),
      keyed("doclen", "doc_id", distinct = false),
      keyed("positions", "doc_id", distinct = true))
  }

  /** The cross-family membership invariant at a generation (head when
    * None): (id, rev) pairs indexed by the gate (`sizes`) ≡ pairs
    * served by retrieval (`doclen`) ≡ pairs phrase-served
    * (`positions`). All three families index exactly the ≥1-token doc
    * revisions (a 1-token doc still has its whole text as one
    * shingle, one doclen row, and one position row; an empty doc has
    * none), so equality is exact — and because the comparison is
    * per-REVISION, a recrawl that landed its new rows in five
    * relations but not the sixth is a torn state this flags even
    * while the id itself is present everywhere. This is the EXACT
    * check — two `exceptAll` scans per family pair — kept for specs
    * and forensics; production maintenance loops should pin
    * [[membershipConsistentFast]] instead.
    */
  def membershipConsistent(cat: TableCatalog, gen: Option[Long] = None): Boolean =
    checkMembership(cat, gen) { fams =>
      // exact MULTISET equality across all families — the same
      // invariant as the historical pairwise
      // `a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty` (multiset
      // equality is symmetric-difference emptiness), computed as ONE
      // action: family-tagged union, one grouped count per (id, rev),
      // keep any group whose per-family counts differ. The pairwise
      // form cost two exceptAll shuffles per family pair (four jobs
      // over the token-sized positions relation); this is one shuffle
      // of the union, and the per-family scans are concurrent stages.
      val tagged = fams.zipWithIndex
        .map { case (df, i) => df.select(col("id"), col("rev"),
          lit(i).as("__fam")) }
        .reduce(_ unionAll _)
      val perFam = fams.indices
        .map(i => count(when(col("__fam") === i, 1)).as(s"__c$i"))
      tagged.groupBy(col("id"), col("rev"))
        .agg(perFam.head, perFam.tail: _*)
        .filter(fams.indices.tail
          .map(i => col(s"__c$i") =!= col("__c0")).reduce(_ || _))
        .isEmpty
    }

  /** [[membershipConsistent]] as an O(aggregate) detector: per family,
    * ONE map-side-combined aggregate — COUNT(DISTINCT id, rev) and
    * SUM(DISTINCT xxhash64(id, rev)) — compared across families. Any
    * (id, rev) in one family and not another moves the count or the
    * hash sum (two UNEQUAL sets colliding on BOTH is a 128-bit-odds
    * accident), so every torn state the exceptAll path flags, this
    * flags — at the cost of one aggregate per family instead of two
    * full-relation exceptAll shuffles per pair, which is what makes it
    * pinnable inside a per-batch maintenance loop at 100 TB. The sum
    * accumulates in DECIMAL(38,0): full-range 64-bit hashes overflow a
    * LongType sum (an ANSI error, and silent wrap pre-ANSI), and 10¹⁰
    * ids × 2⁶³ still sits 9 orders of magnitude under the decimal cap.
    */
  def membershipConsistentFast(cat: TableCatalog, gen: Option[Long] = None): Boolean =
    checkMembership(cat, gen) { fams =>
      // raw count rides along so a DUPLICATED per-doc row (which the
      // exceptAll multiset compare flags) is caught too — the per-doc
      // relations are one-row-per-(id, rev) by contract, so raw ==
      // distinct on every healthy family. All families' signatures
      // come out of ONE action (family-tagged union, one grouped
      // aggregate — the per-family scans are concurrent stages of one
      // job) instead of one sequential aggregate job per family: this
      // check is pinned after every maintenance commit, so its job
      // count is per-batch latency.
      val sigs = fams.zipWithIndex
        .map { case (df, i) =>
          df.select(lit(i).as("__fam"), col("id"), col("rev")) }
        .reduce(_ unionAll _)
        .groupBy(col("__fam")).agg(
          count(lit(1)).as("rows"),
          count_distinct(col("id"), col("rev")).as("n"),
          coalesce(
            sum_distinct(xxhash64(col("id"), col("rev"))
              .cast(org.apache.spark.sql.types.DecimalType(38, 0))),
            lit(java.math.BigDecimal.ZERO)).as("h"))
        .collect()
        .map(r => r.getInt(0) ->
          ((r.getLong(1), r.getLong(2), r.getDecimal(3)))).toMap
      // a zero-row family produces no group: signature (0, 0, 0) —
      // exactly what the per-family aggregate returned for it
      val zero = (0L, 0L, java.math.BigDecimal.ZERO)
      def sigOf(i: Int) = sigs.getOrElse(i, zero)
      val (rh, nh, hh) = sigOf(0)
      rh == nh && fams.indices.tail.forall { i =>
        val (r, n, h) = sigOf(i)
        r == rh && n == nh && h.compareTo(hh) == 0
      }
    }

  private def checkMembership(cat: TableCatalog, gen: Option[Long])(
      same: Seq[DataFrame] => Boolean): Boolean = {
    val g = gen.orElse(cat.latestGeneration()).getOrElse(return true)
    familyIds(cat, g) match {
      // a generation before any ingest (e.g. a tombstone-only first
      // batch) has NO family: trivially consistent. A strict subset of
      // families present IS the torn state this invariant catches.
      case fams if fams.forall(_.isEmpty) => true
      case fams if fams.exists(_.isEmpty) => false
      case fams => same(fams.flatten)
    }
  }
}
