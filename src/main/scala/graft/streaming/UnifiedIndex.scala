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
  * Cost shape per batch: the batch is shingled once (the shared
  * relation behind all three LSH members, cached through the scope)
  * and tokenized once WITH positions (posexplode — postings and doclen
  * fold the same cached relation positions project, so the third
  * family costs no extra scan of the text); both caches are released
  * as soon as the commit's writes materialize them, so a long-running
  * stream pins no per-batch state. Each relation is a pure append
  * (every doc lands in exactly one batch) committed as a catalog
  * APPEND MEMBER ([[graft.sources.TableCatalog.commitAllAppend]]):
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

  /** Commit `adm` (an admitted micro-batch of (idCol, textCol) docs)
    * into all three index families as one atomic generation. Returns
    * the committed generation, or -1 on redelivery (the exactly-once
    * check covers ALL six relations at once — that is the point).
    */
  def commitBatch(cat: TableCatalog, adm: DataFrame, batchId: Long,
      idCol: String = "doc_id", textCol: String = "text"): Long =
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
      try
        // append members: each relation stages ONLY this batch's rows
        // (an O(batch) segment prepended to the chain) — full-state
        // derive here would rewrite the whole index per micro-batch
        CatalogSink.commitBatchAppend(cat, batchId, Map(
          "bands" -> lsh("bands"),
          "shingles" -> lsh("shingles"),
          "sizes" -> lsh("sizes"),
          "postings" -> toks.groupBy(col("doc_id"), col("tok"))
            .agg(count(lit(1)).as("tf")),
          "doclen" -> toks.groupBy(col("doc_id"))
            .agg(count(lit(1)).as("dl")),
          "positions" -> toks.select(col("doc_id"), col("pos"),
            col("tok"))))
      finally toks.unpersist(blocking = false)
    }

  /** Tombstone `ids` (a 1-column id relation, any column name) out of
    * ALL families as one atomic generation: the GDPR/right-to-be-
    * forgotten path. One tombstone relation serves every family —
    * the delete cannot land in one index and not the others, mirroring
    * [[commitBatch]]'s atomicity on the way out. Exactly-once on
    * redelivery like every maintenance commit.
    *
    * Ids never admitted are appended UNCONDITIONALLY — the deliberate
    * GDPR-safe choice, not an oversight: an erase request must be
    * durable even when it races ahead of the document it names (the
    * doc may be mid-admission, or arrive in a later crawl), so the
    * tombstone lands first and masks the id the moment anything is
    * admitted under it. The bloat this allows is bounded two ways:
    * [[IndexMaintenance.compactUnifiedIfNeeded]] folds every MATCHED
    * tombstone but RETAINS the never-admitted ones (forgetting an
    * erase request because its doc had not arrived yet would serve
    * the doc when it does), and the fraction trigger caps the masked
    * share of admitted docs, so the serve-path broadcast stays
    * erase-ledger-sized.
    */
  def delete(cat: TableCatalog, ids: DataFrame, batchId: Long): Long =
    CatalogSink.commitBatchAppend(cat, batchId, Map(
      "tombstones" -> ids.select(col(ids.columns.head).as("id"))))

  private def tomb(cat: TableCatalog): DataFrame =
    if (cat.latestGeneration().exists(g =>
        cat.memberNames(g).contains("tombstones")))
      cat.read("tombstones")
    else cat.read("sizes").select(col("id")).limit(0)

  /** The LSH gate's live relations (bands, shingles, sizes) under the
    * shared tombstones — pass these to `TextDedup.lshIndexLookup`;
    * sizes ride along so Jaccard denominators stay right for free.
    */
  def lshLive(cat: TableCatalog): (DataFrame, DataFrame, DataFrame) = {
    val t = broadcast(tomb(cat))
    def live(rel: String) = cat.read(rel).join(t, Seq("id"), "left_anti")
    (live("bands"), live("shingles"), live("sizes"))
  }

  /** The retrieval side's live relations (postings, doclen) under the
    * SAME tombstones — one delete masks every family's serves.
    */
  def postingsLive(cat: TableCatalog): (DataFrame, DataFrame) = {
    val t = broadcast(tomb(cat).select(col("id").as("doc_id")))
    def live(rel: String) = cat.read(rel).join(t, Seq("doc_id"), "left_anti")
    (live("postings"), live("doclen"))
  }

  /** The positional member's live relation under the SAME tombstones —
    * phrase/proximity serving follows the one delete set too (a
    * forgotten doc must stop matching phrases in the same generation
    * it stops ranking in BM25).
    */
  def positionsLive(cat: TableCatalog): DataFrame =
    cat.read("positions").join(
      broadcast(tomb(cat).select(col("id").as("doc_id"))),
      Seq("doc_id"), "left_anti")

  /** Distinct-id sets per family at generation `g`, keyed by their
    * per-doc relation — None for an absent relation. `sizes` and
    * `doclen` are per-doc already; `positions` needs the distinct.
    */
  private def familyIds(cat: TableCatalog, g: Long): Seq[Option[DataFrame]] = {
    val present = cat.memberNames(g)
    Seq(
      if (present("sizes")) Some(cat.readAt(g, "sizes").select(col("id")))
      else None,
      if (present("doclen"))
        Some(cat.readAt(g, "doclen").select(col("doc_id").as("id")))
      else None,
      if (present("positions"))
        Some(cat.readAt(g, "positions").select(col("doc_id").as("id")).distinct())
      else None)
  }

  /** The cross-family membership invariant at a generation (head when
    * None): ids indexed by the gate (`sizes`) ≡ ids served by
    * retrieval (`doclen`) ≡ ids phrase-served (`positions`). All three
    * families index exactly the ≥1-token docs (a 1-token doc still has
    * its whole text as one shingle, one doclen row, and one position
    * row; an empty doc has none), so equality is exact. This is the
    * EXACT check — two `exceptAll` scans per family pair — kept for
    * specs and forensics; production maintenance loops should pin
    * [[membershipConsistentFast]] instead.
    */
  def membershipConsistent(cat: TableCatalog, gen: Option[Long] = None): Boolean =
    checkMembership(cat, gen) { case (a, b) =>
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    }

  /** [[membershipConsistent]] as an O(aggregate) detector: per family,
    * ONE map-side-combined aggregate — COUNT(DISTINCT id) and
    * SUM(DISTINCT xxhash64(id)) — compared across families. Any id in
    * one family and not another moves the count or the hash sum
    * (two UNEQUAL id sets colliding on BOTH is a 128-bit-odds
    * accident), so every torn state the exceptAll path flags, this
    * flags — at the cost of one aggregate per family instead of two
    * full-relation exceptAll shuffles per pair, which is what makes it
    * pinnable inside a per-batch maintenance loop at 100 TB. The sum
    * accumulates in DECIMAL(38,0): full-range 64-bit hashes overflow a
    * LongType sum (an ANSI error, and silent wrap pre-ANSI), and 10¹⁰
    * ids × 2⁶³ still sits 9 orders of magnitude under the decimal cap.
    */
  def membershipConsistentFast(cat: TableCatalog, gen: Option[Long] = None): Boolean =
    checkMembership(cat, gen) { case (a, b) =>
      // raw count rides along so a DUPLICATED per-doc row (which the
      // exceptAll multiset compare flags) is caught too — the per-doc
      // relations are one-row-per-id by contract, so raw == distinct
      // on every healthy family
      def sig(df: DataFrame): (Long, Long, java.math.BigDecimal) = {
        val r = df.agg(
          count(lit(1)).as("rows"),
          count_distinct(col("id")).as("n"),
          coalesce(
            sum_distinct(xxhash64(col("id"))
              .cast(org.apache.spark.sql.types.DecimalType(38, 0))),
            lit(java.math.BigDecimal.ZERO)).as("h")).head()
        (r.getLong(0), r.getLong(1), r.getDecimal(2))
      }
      val (ra, na, ha) = sig(a); val (rb, nb, hb) = sig(b)
      ra == rb && na == nb && ra == na && ha.compareTo(hb) == 0
    }

  private def checkMembership(cat: TableCatalog, gen: Option[Long])(
      same: (DataFrame, DataFrame) => Boolean): Boolean = {
    val g = gen.orElse(cat.latestGeneration()).getOrElse(return true)
    familyIds(cat, g) match {
      // a generation before any ingest (e.g. a tombstone-only first
      // batch) has NO family: trivially consistent. A strict subset of
      // families present IS the torn state this invariant catches.
      case fams if fams.forall(_.isEmpty) => true
      case fams if fams.exists(_.isEmpty) => false
      case fams =>
        val ids = fams.flatten
        ids.tail.forall(same(ids.head, _))
    }
  }
}
