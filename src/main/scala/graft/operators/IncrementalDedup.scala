package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Incremental near-dup detection: an incoming batch against an
  * already-ingested corpus — the shape corpus ingestion actually has at
  * 100 TB, where re-running all-corpus dedup per batch is impossible.
  *
  * The store keeps a persistent MinHash **band index** (one row per
  * doc × band, appended as each batch is admitted — the store text is
  * never re-signed). Per batch the cost is: sign the batch (∝ batch
  * size), join its bands against the index (batch side broadcast — the
  * only full pass over anything store-sized, and it's the narrow
  * 3-column index, not the text), then verify candidates with exact
  * Jaccard, touching store TEXT only for candidate ids (a broadcast
  * semi join drives the candidate-doc scan).
  */
object IncrementalDedup {

  /** The persistent index rows for a corpus slice: (id, band, band_key).
    * Build once per admitted batch and append to the index table.
    */
  def bandIndex(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32): DataFrame =
    TextDedup.lshBands(df, idCol, textCol, n, numHashes, bands)

  /** Near-dups of `batch` against the store: (batch_id, store_id,
    * jaccard ≥ threshold). `storeIndex` must be the [[bandIndex]] of
    * `storeDocs` with the same (n, numHashes, bands). Batch-internal
    * duplicates are out of scope here (that's corpus dedup, d01-d06).
    * With 128 hashes × 32 bands the banded candidates lose < 5e-8 of
    * true pairs at j ≥ 0.8, so results match the exact batch×store
    * Jaccard join.
    */
  def dedupAgainst(
      storeIndex: DataFrame, storeDocs: DataFrame, batch: DataFrame,
      idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8, broadcastCandidateLimit: Long = 100000L)(
      implicit cs: CacheScope): DataFrame = {
    // one batch shingle pass feeds signatures, sizes, and verification
    val bsh = cs.persist(TextDedup.shingles(batch, idCol, textCol, n))
    val bbk = TextDedup.lshBandsFromShingles(bsh, numHashes, bands)

    val candidates = cs.persist(storeIndex
      .join(broadcast(bbk.select(col("id").as("batch_id"),
          col("band"), col("band_key"))),
        Seq("band", "band_key"))
      .select(col("batch_id"), col("id").as("store_id"))
      .distinct())
    // batch-sized frames (bsh, bbk, bsz) always broadcast; the
    // candidate-driven ones grow with collisions — a boilerplate-heavy
    // batch matching huge store clusters can exceed broadcast limits,
    // so past `broadcastCandidateLimit` pairs the same plan runs as
    // shuffle joins (identical results, different exchange strategy —
    // the d03 gate, mirrored)
    val candCount = candidates.count()
    val bStats = bsh.agg(countDistinct(col("id")), count(lit(1))).head()
    val avgShingles =
      if (bStats.getLong(0) == 0L) 1L
      else math.max(1L, bStats.getLong(1) / bStats.getLong(0))
    // bound broadcast ROWS (pairShingles ≈ candidates × shingles/doc),
    // not just the pair count — long docs widen every candidate
    val small = candCount <= broadcastCandidateLimit &&
      candCount * avgShingles <= TextDedup.PairShingleBroadcastRows
    val gate: DataFrame => DataFrame = if (small) broadcast else identity

    // store text only for candidate ids: semi join, then shingle
    val candStoreDocs = storeDocs.join(
        gate(candidates.select(col("store_id")).distinct()),
        col(idCol) === col("store_id"), "left_semi")
    val ssh = cs.persist(TextDedup.shingles(candStoreDocs, idCol, textCol, n))

    val bsz = bsh.groupBy("id").agg(count(lit(1)).as("n_b"))
      .withColumnRenamed("id", "batch_id")
    val ssz = ssh.groupBy("id").agg(count(lit(1)).as("n_s"))
      .withColumnRenamed("id", "store_id")
    val pairShingles = bsh.join(gate(candidates), col("id") === col("batch_id"))
      .select(col("batch_id"), col("store_id").as("__cand_s"), col("shingle").as("__cand_sh"))
    val inter = ssh.join(gate(pairShingles),
        col("id") === col("__cand_s") && col("shingle") === col("__cand_sh"))
      .select(col("batch_id"), col("__cand_s").as("store_id"))
      .groupBy("batch_id", "store_id").agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(bsz), "batch_id")
      .join(gate(ssz), "store_id")
      .withColumn("jaccard",
        col("n_inter").cast(DoubleType) / (col("n_b") + col("n_s") - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select("batch_id", "store_id", "jaccard")
  }
}
