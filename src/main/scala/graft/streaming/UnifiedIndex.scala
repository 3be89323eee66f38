package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{CacheScope, TextDedup}
import graft.sources.TableCatalog

/** Cross-family index maintenance: ONE micro-batch commit advances the
  * LSH dedup index (bands / shingles / sizes — the w29 admission gate)
  * AND the BM25 postings index (postings / doclen — the t23/w30
  * retrieval serve) as ONE atomic catalog generation. The property
  * this buys is MEMBERSHIP CONSISTENCY between index families: a
  * document the gate admits is searchable in the same generation, and
  * a crash between "deduped" and "indexed" cannot strand a doc in one
  * family but not the other. With separate commits the torn window is
  * real — a replayed batch would re-shingle docs the postings already
  * serve (double dedup rows) or serve docs the gate never admitted.
  *
  * Cost shape per batch: the batch is shingled once (the shared
  * relation behind all three LSH members, cached through the scope)
  * and tokenized once (shared by postings and doclen); both caches are
  * released as soon as the commit's writes materialize them, so a
  * long-running stream pins no per-batch state. Each relation is a
  * pure append (every doc lands in exactly one batch), so maintenance
  * is O(batch) however many families ride the commit.
  */
object UnifiedIndex {

  /** Commit `adm` (an admitted micro-batch of (idCol, textCol) docs)
    * into both index families as one atomic generation. Returns the
    * committed generation, or -1 on redelivery (the exactly-once
    * check covers ALL five relations at once — that is the point).
    */
  def commitBatch(cat: TableCatalog, adm: DataFrame, batchId: Long,
      idCol: String = "doc_id", textCol: String = "text"): Long =
    CacheScope.scoped { implicit cs =>
      val lsh = TextDedup.lshIndexRelations(adm, idCol, textCol)
      val toks = adm.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("tok")).persist()
      try {
        def app(r: DataFrame): (Option[DataFrame], DataFrame) => DataFrame =
          (prev, _) => prev.map(_.unionByName(r)).getOrElse(r)
        CatalogSink.commitBatch(cat, adm, batchId, Map(
          "bands" -> app(lsh("bands")),
          "shingles" -> app(lsh("shingles")),
          "sizes" -> app(lsh("sizes")),
          "postings" -> app(toks.groupBy(col("doc_id"), col("tok"))
            .agg(count(lit(1)).as("tf"))),
          "doclen" -> app(toks.groupBy(col("doc_id"))
            .agg(count(lit(1)).as("dl")))))
      } finally toks.unpersist(blocking = false)
    }

  /** Tombstone `ids` (a 1-column id relation, any column name) out of
    * BOTH families as one atomic generation: the GDPR/right-to-be-
    * forgotten path. One tombstone relation serves both families —
    * the delete cannot land in one index and not the other, mirroring
    * [[commitBatch]]'s atomicity on the way out. Exactly-once on
    * redelivery like every maintenance commit.
    */
  def delete(cat: TableCatalog, ids: DataFrame, batchId: Long): Long = {
    val t = ids.select(col(ids.columns.head).as("id"))
    CatalogSink.commitBatch(cat, t, batchId, Map(
      "tombstones" -> ((prev, b) =>
        prev.map(_.unionByName(b)).getOrElse(b))))
  }

  private def tomb(cat: TableCatalog): DataFrame =
    if (cat.latestGeneration().exists(g =>
        cat.tableVersions(g).contains("tombstones")))
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
    * SAME tombstones — one delete masks both families' serves.
    */
  def postingsLive(cat: TableCatalog): (DataFrame, DataFrame) = {
    val t = broadcast(tomb(cat).select(col("id").as("doc_id")))
    def live(rel: String) = cat.read(rel).join(t, Seq("doc_id"), "left_anti")
    (live("postings"), live("doclen"))
  }

  /** The cross-family membership invariant at a generation (head when
    * None): ids indexed by the gate (`sizes`) ≡ ids served by
    * retrieval (`doclen`). Both families index exactly the ≥1-token
    * docs (a 1-token doc still has its whole text as one shingle and
    * one doclen row; an empty doc has neither), so equality is exact.
    */
  def membershipConsistent(cat: TableCatalog, gen: Option[Long] = None): Boolean = {
    val g = gen.orElse(cat.latestGeneration()).getOrElse(return true)
    val present = cat.tableVersions(g).keySet
    // a generation before any ingest (e.g. a tombstone-only first
    // batch) has NEITHER family: trivially consistent. Exactly one
    // family present IS the torn state this invariant exists to catch.
    (present("sizes"), present("doclen")) match {
      case (false, false) => true
      case (true, true) =>
        val gate = cat.readAt(g, "sizes").select(col("id"))
        val retr = cat.readAt(g, "doclen").select(col("doc_id").as("id"))
        gate.exceptAll(retr).isEmpty && retr.exceptAll(gate).isEmpty
      case _ => false
    }
  }
}
