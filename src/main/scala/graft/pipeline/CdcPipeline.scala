package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.TableKeys
import graft.operators.{CdcDedup, CdcMerge, EvolutionLog, FileLedger, MergePlanner, SchemaEvolution}
import graft.routing.CdcPath
import graft.sources.{BucketedTableStore, MorStore}

/** Batch CDC pipeline: one file (or micro-batch of files) applied to one
  * target table — the reference's `lambda_handler` re-expressed
  * (reference: lambda/handler.py:736-1000; SURVEY §3.1):
  *
  *   route → key lookup → ledger check → stage (+ingestion_seq) →
  *   schema-evolve → dedup (cascade) → MERGE → ledger mark
  *
  * Differences by design (SURVEY §4): Firebolt staging tables collapse
  * into lazy DataFrames; the MVCC retry loop collapses into deterministic
  * single-writer semantics per table; exactly-once comes from the ledger +
  * idempotent merge instead of engine MVCC.
  *
  * MERGE strategy is per-batch ADAPTIVE by default ([[MergePlanner]]):
  * the typical small concentrated CDC file takes the bucket-pruned
  * broadcast CoW rewrite exactly as before, but a batch that SCATTERS
  * across most buckets commits as an O(batch) MoR delta to the table's
  * side-store instead of rewriting the table to change a sliver. The
  * side-store drains back into the CoW home (one amortized rewrite of
  * the NET changes, [[MergePlanner.drain]]) before any later CoW-routed
  * batch of the same table — preserving per-key apply order — so CoW
  * buckets never interleave with undrained scatter. Readers use
  * [[readTable]], which resolves home ∪ side; `adaptiveMerge = false`
  * restores the static always-CoW path (then `storeFor(...).read()`
  * alone is complete).
  */
final class CdcPipeline(
    spark: SparkSession,
    storeRoot: String,
    tableKeys: TableKeys,
    numBuckets: Int = 64,
    deleteCol: String = "Op",
    deleteVals: Seq[String] = Seq("D"),
    pathRoot: String = "fair",
    cleanupProbability: Double = 0.0,
    cleanupRetentionDays: Int = 30,
    cleanupRng: () => Double = () => math.random(),
    adaptiveMerge: Boolean = true) {

  val ledger = new FileLedger(spark, s"$storeRoot/_ledger")
  val evolutionLog = new EvolutionLog(spark, s"$storeRoot/_evolution_log")

  /** Commit-ts allocator for the MoR side-stores. MoR commits are
    * idempotent BY TS (a replayed commitTsMillis no-ops), so two
    * commits in the same wall millisecond — base bootstrap + first
    * delta, or two small files applied back-to-back — would silently
    * swallow the second. Allocate strictly increasing values and skip
    * any ts the store already logged (restart with an existing side).
    */
  private val lastSideTs = new java.util.concurrent.atomic.AtomicLong(0L)
  private def freshSideTs(side: MorStore): Long = {
    var t = math.max(System.currentTimeMillis(), lastSideTs.get() + 1L)
    while (side.tsCommitted(t)) t += 1L
    lastSideTs.set(t)
    t
  }

  def storeFor(table: String, keys: Seq[String]): BucketedTableStore =
    new BucketedTableStore(spark, s"$storeRoot/$table", keys, numBuckets)

  /** The table's MoR side-store accumulating scatter-routed batches
    * until a drain folds them home (kept OUTSIDE the CoW store's
    * directory — the bucketed layout owns that namespace).
    */
  def morSideFor(table: String, keys: Seq[String]): MorStore =
    new MorStore(spark, s"$storeRoot/_morside/$table", keys)

  /** The table's complete current state: the CoW home with any
    * undrained side-store scatter resolved on top (net per-key ops —
    * deletes drop, upserts replace). With an empty side this is
    * exactly `storeFor(...).read()`.
    */
  def readTable(table: String): DataFrame = {
    val keys = tableKeys.keysFor(table)
      .getOrElse(throw new IllegalArgumentException(s"no keys for $table"))
    val store = storeFor(table, keys)
    if (!adaptiveMerge) store.read()
    else MergePlanner.resolvedView(store, morSideFor(table, keys))
  }

  import CdcPipeline._

  /** Process one CDC file end-to-end. `fileKey` is the path (may be a
    * local absolute path or full URI whose suffix matches the reference
    * layout `{root}/{table}/YYYY/MM/DD/name.parquet`). Ledger entries use
    * the canonical scheme-stripped key ([[CdcPath.ledgerKey]]) so the
    * streaming side (URI-form `_metadata.file_path`) and backfill side
    * (listing paths) agree on processed state.
    */
  def processFile(fileKey: String): Outcome = processFile(fileKey, checkLedger = true)

  private[pipeline] def processFile(fileKey: String, checkLedger: Boolean): Outcome = {
    // STEP 0: route (handler.py:765-783)
    CdcPath.parse(fileKey, pathRoot) match {
      case Left(skip) => Skipped(skip.message)
      case Right(cdcFile) =>
        // key lookup (handler.py:786-789); null ⇒ skip
        tableKeys.keysFor(cdcFile.table) match {
          case None => Skipped(CdcPath.NoKeys.message)
          case Some(keys) =>
            // ledger check (handler.py:800-804)
            if (checkLedger && ledger.isProcessed(CdcPath.ledgerKey(fileKey)))
              Skipped(CdcPath.AlreadyProcessed.message)
            else applyFile(fileKey, cdcFile.table, keys)
        }
    }
  }

  private def applyFile(fileKey: String, table: String, keys: Seq[String]): Outcome = {
    try {
      // STEP 1: stage with ingestion_seq (handler.py:486-546)
      val staging = CdcDedup.readCdcFiles(spark, Seq(fileKey)).persist()
      val store = storeFor(table, keys)
      if (!store.exists)
        throw new IllegalStateException(s"target table '$table' not initialized at ${store.path}")

      // STEP 2: schema evolution (handler.py:250-338). Safe new columns
      // are ADDED to the target schema BEFORE the merge — the reference
      // ALTERs production then refreshes its column list so staged values
      // for the new columns flow through the merge intersection
      // (handler.py:846-850). Un-evolved parquet files read the column as
      // null; merged buckets materialize it.
      val evolution = SchemaEvolution.diff(staging.schema, store.schema)
      store.evolveSchema(evolution)
      // durable notification channel (SNS parity, handler.py:313-336):
      // findings — especially requiresManual — land in _evolution_log;
      // a logging failure must never fail the merge it describes
      // (the reference's publish is try/except-warning too)
      if (evolution.hasChanges)
        try evolutionLog.log(table, CdcPath.ledgerKey(fileKey), evolution)
        catch { case e: Throwable =>
          System.err.println(s"[graft] evolution-log append failed for $table: ${e.getMessage}")
        }

      // STEP 3: dedup via the cascade (handler.py:407-479). On the
      // adaptive path the gate aggregation ALSO carries the merge
      // planner's probe (CdcDedup.dedupAndProbe — exact fusion: the
      // deduped batch has `unique_keys` rows and the same bucket set),
      // so the probe's former second full-batch pass is gone and the
      // adaptive routing costs exactly what the reference's dedup gate
      // already paid (handler.py:423-439).
      val (dedup, fusedProbe) =
        if (adaptiveMerge) {
          val (d, p) = CdcDedup.dedupAndProbe(staging, keys, numBuckets)
          (d, Some(p))
        } else (CdcDedup.dedup(staging, keys, gate = true), None)

      // STEP 4+5: column prep + MERGE (handler.py:876-946). The
      // physical strategy is per-batch adaptive: probe the batch (the
      // fused aggregation above — rows + approx buckets touched),
      // route concentrated batches through the bucket-pruned
      // CoW rewrite and scattered ones to the MoR side-store as an
      // O(batch) delta; any CoW-routed batch drains accumulated
      // scatter first so per-key apply order holds.
      val touched =
        if (!adaptiveMerge) store.merge(dedup, deleteCol, deleteVals)
        else {
          val side = morSideFor(table, keys)
          MergePlanner.choose(fusedProbe.get, numBuckets) match {
            case MergePlanner.MorDelta =>
              // normalizeDelta reproduces the CoW merge's semantics
              // exactly — including the WHEN-NOT-MATCHED insert of
              // unmatched DELETE rows (handler.py:876-946)
              val premapped = dedup.withColumn("__cdc_op",
                when(col(deleteCol).isin(deleteVals.map(lit): _*), lit("D"))
                  .otherwise(lit("U")))
                .drop(deleteCol)
              val delta = MergePlanner.normalizeDelta(
                store, side, premapped, "__cdc_op")
              if (side.isEmpty) {
                val rowSchema = org.apache.spark.sql.types.StructType(
                  delta.schema.filterNot(_.name == side.OpCol))
                side.commitBase(spark.createDataFrame(
                  spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                  rowSchema), freshSideTs(side))
              }
              side.commitDelta(delta, freshSideTs(side))
              0
            case chosen =>
              MergePlanner.drain(store, side)
              store.merge(dedup, deleteCol, deleteVals,
                broadcastStaging = chosen == MergePlanner.BroadcastCow)
          }
        }

      // STEP 7: ledger (handler.py:962-967)
      ledger.markCompleted(CdcPath.ledgerKey(fileKey))
      staging.unpersist()

      // probabilistic maintenance: with small probability per invocation,
      // apply ledger retention (reference: AUTOMATIC_CLEANUP.md:12-63 —
      // CLEANUP_PROBABILITY=0.01, CLEANUP_DAYS_TO_KEEP=30)
      if (cleanupProbability > 0.0 && cleanupRng() < cleanupProbability)
        ledger.cleanup(cleanupRetentionDays)

      Applied(table, touched, evolution)
    } catch {
      case e: Throwable =>
        ledger.markFailed(CdcPath.ledgerKey(fileKey), e.getMessage)
        Failed(table, e)
    }
  }

  /** Backfill driver: apply every unprocessed CDC file under `root`,
    * per-table in path (= binlog) order — replaces the reference's
    * retrigger scripts (retrigger_lambda_for_old_files.py:88-158).
    *
    * The processed set is computed ONCE up front (per-file ledger
    * re-reads would make a whole-history replay quadratic in ledger
    * size); per-file processing then skips the redundant check.
    *
    * Retry semantics match the reference: `failed` files are retried,
    * and MERGE is last-write-wins with no recency guard (the reference's
    * WHEN MATCHED THEN UPDATE is equally unconditional, handler.py:
    * 605-607) — so a file that failed in an earlier run and is retried
    * after newer files re-applies its older values. The reference relies
    * on near-immediate Lambda retries rather than delayed replays for
    * the same reason; schedule backfills accordingly.
    */
  def backfill(files: Seq[String]): Seq[(String, Outcome)] = processFiles(files.sorted)

  /** Micro-batch driver: apply a batch of event-delivered files with ONE
    * ledger scan for the whole batch — the per-event ledger SELECT of the
    * reference (handler.py:800-804), amortized. Given order is preserved
    * (backfill passes path-sorted = binlog order). Intra-batch duplicate
    * deliveries (at-least-once event sources re-deliver) skip after the
    * first successful apply, matching the cross-batch ledger semantics.
    */
  def processFiles(files: Seq[String]): Seq[(String, Outcome)] = {
    val done = scala.collection.mutable.Set.empty[String] ++=
      ledger.processedAmong(files.map(CdcPath.ledgerKey))
    files.map { f =>
      val key = CdcPath.ledgerKey(f)
      if (done.contains(key)) f -> (Skipped(CdcPath.AlreadyProcessed.message): Outcome)
      else {
        val out = processFile(f, checkLedger = false)
        if (out.isInstanceOf[Applied]) done += key
        f -> out
      }
    }
  }

  /** Recursive `.parquet` discovery under a root — the filesystem
    * analogue of the retrigger scripts' S3 listing
    * (retrigger_lambda_for_old_files.py:23-67). Routing/LOAD/ledger
    * filtering happens per file inside [[processFile]].
    */
  def discoverFiles(root: String): Seq[String] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return Seq.empty
    val it = fs.listFiles(rootPath, true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      // exclude hidden/in-flight files AND any hidden ancestor segment
      // (a concurrent writer's _temporary tree must never be ingested)
      val segments = f.getPath.toUri.getPath.split('/').filter(_.nonEmpty)
      val hidden = segments.exists(s => s.startsWith(".") || s.startsWith("_"))
      if (f.isFile && f.getPath.getName.endsWith(".parquet") && !hidden)
        out += f.getPath.toString // fully-qualified: readable on any FS
    }
    out.result()
  }

  /** Discover + backfill in one call. */
  def backfillRoot(root: String): Seq[(String, Outcome)] =
    backfill(discoverFiles(root))

  /** Full-load path: initialize a target table from `LOAD*` (or any) data
    * (reference skips LOAD files in CDC and loads them separately;
    * handler.py:781-783, CHANGELOG.md:9-14).
    */
  def initialLoad(table: String, df: DataFrame): BucketedTableStore = {
    val keys = tableKeys.keysFor(table)
      .getOrElse(throw new IllegalArgumentException(s"no keys for $table"))
    BucketedTableStore.create(spark, s"$storeRoot/$table", keys,
      df.drop((CdcDedup.MetaCols + "__source_file").toSeq: _*), numBuckets)
  }
}

object CdcPipeline {
  sealed trait Outcome
  final case class Skipped(reason: String) extends Outcome
  final case class Applied(table: String, touchedBuckets: Int,
      evolution: SchemaEvolution.EvolutionResult) extends Outcome
  final case class Failed(table: String, error: Throwable) extends Outcome
}
