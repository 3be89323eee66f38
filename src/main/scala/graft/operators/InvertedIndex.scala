package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Revisioned inverted-index relations — the storage half of the BM25
  * build/serve split (t19 scan-time vs t23 index-served), extended so
  * the index survives STREAMING maintenance: ingests, re-crawls that
  * REPLACE a document's previous revision, and deletes, all without
  * ever rewriting term-partitioned postings (a document touches as
  * many term files as it has distinct tokens — the one rewrite an
  * inverted index cannot afford; cf. the reference's retention
  * DELETE-over-merge shape, handler.py:736-849, applied to postings).
  *
  * Every relation row carries the REVISION (the committing batch id):
  *
  *  - `postings` (doc_id, tok, tf, rev) — appended per batch
  *  - `doclen`   (doc_id, dl, rev)      — appended per batch
  *  - `tombstones` (doc_id, kill_below) — a replace/delete of doc D at
  *    batch B appends (D, B): every index row of D with rev < B is
  *    dead. A later re-ingest at rev > B revives the id (the recrawl
  *    lifecycle), and MAX(kill_below) per doc is the serve-time mask.
  *
  * Deletion/replacement stays broadcast-sized (ids, not postings
  * rows), so at 100 TB the serve-path anti-join never shuffles the
  * index; BM25's df/Σdl/N statistics come out right for free because
  * the scoring tail derives all three from the relations it is fed.
  */
object InvertedIndex {

  /** One ingest batch's index relations: `postings` (doc_id, tok, tf,
    * rev) and `doclen` (doc_id, dl, rev). The term-frequency aggregate
    * is persisted under the [[CacheScope]] — `doclen` folds it
    * (dl = Σ tf over the doc's terms), so the batch is tokenized
    * exactly once however many members the caller's commit writes.
    */
  def postingsRelations(batch: DataFrame, idCol: String, textCol: String,
      rev: Long)(implicit cs: CacheScope): Map[String, DataFrame] = {
    val tf = cs.persist(
      batch.select(col(idCol).as("doc_id"),
          explode(TextFunctions.tokens(col(textCol))).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf")))
    Map(
      "postings" -> tf.withColumn("rev", lit(rev)),
      "doclen" -> tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
        .withColumn("rev", lit(rev)))
  }

  /** Positional postings of one batch: (doc_id, pos, tok), pos
    * 1-based token position — the index member phrase/proximity
    * queries serve from (positions beside term-frequency postings is
    * the standard Lucene layout; tf postings alone cannot distinguish
    * "new york" from "york new").
    */
  def positions(batch: DataFrame, idCol: String, textCol: String): DataFrame =
    batch.select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        col("tok"))

  /** Exact-phrase occurrences from positional postings: docs where
    * `phrase`'s terms appear at CONSECUTIVE positions, with their
    * occurrence counts. Each term's postings are filtered FIRST (the
    * per-term posting list — selective for real query terms), then
    * chained on position adjacency: term i's positions shift by −i so
    * every join is a plain equi-join on (doc_id, start_pos). At scale
    * the join inputs are posting-list-sized, never corpus-sized, and
    * the chain shuffles on (doc_id, pos) — no window, no collect.
    */
  def phraseCount(positions: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    def term(t: String, i: Int) =
      positions.filter(col("tok") === t)
        .select(col("doc_id"), (col("pos") - i).as("pos"))
    phrase.zipWithIndex.tail
      .foldLeft(term(phrase.head, 0)) { case (acc, (t, i)) =>
        acc.join(term(t, i), Seq("doc_id", "pos"))
      }
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_occurrences"))
  }

  /** Proximity pairs from positional postings: for two DISTINCT query
    * terms, every same-doc occurrence pair within `window` positions,
    * aggregated per doc — pair count, closest distance, and an
    * integer proximity mass Σ (window + 1 − dist) that rewards near
    * co-occurrence linearly (the span-scoring family of Clarke et
    * al.'s cover density, integer-exact so oracles replay it
    * bit-identically). Like [[phraseCount]], each term's postings are
    * filtered FIRST, so the join inputs are posting-list-sized and
    * the only shuffle is the (doc_id) equi-join; the per-doc pair
    * blowup is tf(a)·tf(b) — bounded by the query terms' own
    * frequencies, and the window filter drops far pairs before any
    * aggregation.
    */
  def proximity(positions: DataFrame, termA: String, termB: String,
      window: Int): DataFrame = {
    require(termA != termB, "proximity terms must be distinct")
    require(window > 0, "window must be positive")
    val pa = positions.filter(col("tok") === termA)
      .select(col("doc_id"), col("pos").as("pa"))
    val pb = positions.filter(col("tok") === termB)
      .select(col("doc_id"), col("pos").as("pb"))
    pa.join(pb, Seq("doc_id"))
      .withColumn("dist", abs(col("pa") - col("pb")))
      .filter(col("dist") <= window)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_close_pairs"),
        min(col("dist")).as("min_dist"),
        sum(lit(window + 1) - col("dist")).as("prox_score"))
  }

  /** The live view of a revisioned relation under its tombstones:
    * drop every row whose `rev` is below its doc's kill floor
    * (MAX(kill_below) per doc — a doc deleted at batch 3 and
    * re-ingested at batch 5 serves its rev-5 rows). The tombstone
    * side is ids, never postings rows, so the mask is an explicit
    * broadcast anti-join — the index is scanned, never shuffled, for
    * a maintenance event (PlanSpec-guarded).
    */
  def liveView(rel: DataFrame, tombstones: DataFrame): DataFrame = {
    val kill = tombstones.groupBy(col("doc_id"))
      .agg(max(col("kill_below")).as("__kill"))
    rel.as("__r").join(broadcast(kill).as("__k"),
      col("__r.doc_id") === col("__k.doc_id") &&
        col("__r.rev") < col("__k.__kill"),
      "left_anti")
  }
}
