package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IncrementalDedup

/** Streaming corpus admission — the ingestion-time face of near-dup
  * dedup: every micro-batch is checked against everything ADMITTED so
  * far, near-dups are rejected, survivors (docs + their MinHash band
  * index) are appended to the store. This is how a 100 TB corpus is
  * actually deduplicated: no batch ever re-signs or re-joins the full
  * store text — per-batch cost is the [[IncrementalDedup.dedupAgainst]]
  * contract (batch signatures + narrow index join + candidate-only
  * verification).
  *
  * Binding to Structured Streaming is `foreachBatch { (df, _) =>
  * admission.admit(df) }` — the admission decision is a batch-vs-store
  * join, which is exactly what foreachBatch exists for (proved
  * stream≡batch in StreamingWindowSpec). Batch-INTERNAL duplicates are
  * out of scope by contract (compose d01-d06 upstream of admission),
  * matching `dedupAgainst`.
  *
  * State: the admitted docs and index frames are lineage-cut
  * (localCheckpoint) every batch, so batch k's plan never re-executes
  * batches 1..k−1; clusters wanting fault-tolerant state set a
  * checkpoint dir (same policy as ConnectedComponents.cut). At real
  * scale the store lives as parquet tables (BucketedTableStore-style)
  * and `admit` appends instead — the decision logic is unchanged.
  */
final class CorpusAdmission(
    idCol: String, textCol: String,
    n: Int = 3, numHashes: Int = 128, bands: Int = 32,
    threshold: Double = 0.8) {

  private var store: Option[(DataFrame, DataFrame)] = None // (docs, index)

  /** Admitted docs so far (empty Option before the first batch). */
  def admitted: Option[DataFrame] = store.map(_._1)

  private def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Process one batch: returns the ADMITTED subset (rows of `batch`
    * with no near-dup at `threshold` among previously admitted docs)
    * and appends it — docs and band index — to the store.
    */
  def admit(batch: DataFrame): DataFrame = {
    val survivors = store match {
      case None => cut(batch)
      case Some((docs, idx)) =>
        val hits = IncrementalDedup.dedupAgainst(idx, docs, batch,
          idCol, textCol, n, numHashes, bands, threshold)
        cut(batch.join(hits.select(col("batch_id")).distinct(),
          batch(idCol) === col("batch_id"), "left_anti"))
    }
    val newIndex = cut(IncrementalDedup.bandIndex(survivors, idCol, textCol, n, numHashes, bands))
    store = Some(store match {
      case None => (survivors, newIndex)
      case Some((docs, idx)) =>
        (docs.unionAll(survivors), idx.unionAll(newIndex))
    })
    survivors
  }
}
