package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{CacheScope, InvertedIndex}
import graft.sources.TableCatalog

/** Streaming maintenance sink for the persisted BM25 postings index —
  * the [[CatalogSink]] composition that turns t23's batch-built index
  * into a continuously-maintained one (the same step w29 took for the
  * LSH dedup index). Each micro-batch commits ONE atomic catalog
  * generation carrying the batch's postings/doclen appends AND the
  * tombstones of every id the batch replaced or deleted — a torn
  * commit could otherwise serve a recrawled document twice (old and
  * new revision both live) or a deleted one at all. Exactly-once
  * comes from [[CatalogSink.commitBatch]]'s batch-id ledger: a
  * redelivered micro-batch no-ops.
  *
  * Serving reads the stored relations only (raw text is never
  * touched): [[live]] masks each relation with the tombstone kill
  * floors via [[InvertedIndex.liveView]]'s broadcast anti-join.
  */
object PostingsIndex {

  /** Commit one micro-batch of index maintenance: `upserts` are
    * documents to (re-)ingest, `deletes` are ids to remove — both in
    * ONE atomic generation at revision `batchId`. `replace = true`
    * tombstones every upserted id's older revisions (the recrawl
    * path); leave it false for feeds of known-fresh ids so the
    * tombstone relation stays delete-sized. Returns the committed
    * generation, or -1 if `batchId` was already applied (redelivery).
    *
    * The per-batch token-frequency cache is released as soon as the
    * commit's writes materialize it ([[CacheScope.scoped]]) — a
    * long-running stream pins no per-batch state.
    */
  def commitBatch(cat: TableCatalog, upserts: DataFrame, deletes: DataFrame,
      batchId: Long, idCol: String = "doc_id", textCol: String = "text",
      replace: Boolean = false): Long =
    CacheScope.scoped { implicit cs =>
      val rels = InvertedIndex.postingsRelations(upserts, idCol, textCol, batchId)
      val deadIds = {
        val del = deletes.select(col(idCol).as("doc_id"))
        if (replace) del.unionByName(upserts.select(col(idCol).as("doc_id")))
        else del
      }
      val killed = deadIds.withColumn("kill_below", lit(batchId))
      // append members: each commit stages only this batch's rows —
      // term-partitioned postings are the one relation a per-batch
      // full rewrite can never afford (see UnifiedIndex scaladoc)
      CatalogSink.commitBatchAppend(cat, batchId, Map(
        "postings" -> rels("postings"),
        "doclen" -> rels("doclen"),
        "tombstones" -> killed))
    }

  /** The served index: (live postings, live doclen) at the catalog
    * head — every row of a replaced/deleted revision masked out by
    * the broadcast tombstone anti-join. BM25's df/Σdl/N derive from
    * these relations downstream, so the statistics follow deletes
    * with no separate invalidation.
    */
  def live(cat: TableCatalog): (DataFrame, DataFrame) = {
    val tomb = cat.read("tombstones")
    (InvertedIndex.liveView(cat.read("postings"), tomb),
      InvertedIndex.liveView(cat.read("doclen"), tomb))
  }

  /** [[commitBatch]] for the POSITIONAL index member: same revision /
    * tombstone / exactly-once contract, but the maintained relation is
    * (doc_id, pos, tok, rev) — phrase and proximity serving need the
    * order tf postings erase, and a RECRAWL shifts every position, so
    * masking stale revisions is not an optimization here but the
    * correctness of every downstream adjacency join.
    */
  def commitPositionsBatch(cat: TableCatalog, upserts: DataFrame,
      deletes: DataFrame, batchId: Long, idCol: String = "doc_id",
      textCol: String = "text", replace: Boolean = false): Long = {
    val rel = InvertedIndex.positions(upserts, idCol, textCol)
      .withColumn("rev", lit(batchId))
    val deadIds = {
      val del = deletes.select(col(idCol).as("doc_id"))
      if (replace) del.unionByName(upserts.select(col(idCol).as("doc_id")))
      else del
    }
    val killed = deadIds.withColumn("kill_below", lit(batchId))
    CatalogSink.commitBatchAppend(cat, batchId, Map(
      "positions" -> rel,
      "tombstones" -> killed))
  }

  /** The live positional relation at the head (see [[live]]). */
  def livePositions(cat: TableCatalog): DataFrame =
    InvertedIndex.liveView(cat.read("positions"), cat.read("tombstones"))
}
