package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Bounded-state streaming deduplication — the "exactly-once-ish
  * delivery" gate with state that EXPIRES: a key's first arrival is
  * emitted, re-deliveries are dropped while the key's state lives, and
  * the state is evicted once the event-time watermark passes its
  * expiry — so a key can legitimately re-appear later (the
  * re-activation case ledger-style permanent dedup, `FileLedger`/w06,
  * deliberately forbids). This is the semantics of Structured
  * Streaming's `dropDuplicatesWithinWatermark`; at 100 TB the state
  * store holds only keys seen within the watermark delay, not the
  * full history — THAT bound is what makes streaming dedup feasible.
  *
  * [[stream]] is the streaming binding (the built-in operator).
  * [[fold]] is the deterministic batch-by-batch replay of the same
  * contract, used by the driver gate (same architecture as
  * [[CorpusAdmission]]: the fold is oracle-checkable, the spec proves
  * stream ≡ fold on planted batches):
  *
  *  - watermark entering batch i = max event time over batches 1..i−1
  *    minus `delay` (Spark advances the watermark at batch
  *    boundaries; all input rows observe it, dropped or not);
  *  - rows at-or-before the watermark are dropped as late;
  *  - state entries whose expiry (first-seen ts + delay) is
  *    at-or-before the watermark are evicted;
  *  - surviving rows matching live state are dropped as duplicates;
  *  - remaining rows dedup within the batch (first occurrence — rows
  *    carrying a duplicate key in one batch must be identical rows,
  *    or the pick among them is arbitrary) and enter the state.
  *
  * Per batch the fold runs one tiny action (the batch's max event
  * time — one long, the same class of O(1) driver values as the CDC
  * micro-batch file list); kept rows are lineage-cut per batch
  * ([[CorpusAdmission]]'s policy: `checkpoint` when a checkpoint dir
  * is set, `localCheckpoint` otherwise) so batch k's state plan never
  * re-executes batches 1..k−1.
  */
object WatermarkDedup {

  /** Streaming form: watermark + `dropDuplicatesWithinWatermark`. */
  def stream(df: DataFrame, tsCol: String, delay: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Deterministic replay over explicit micro-batches: emits each
    * batch's kept rows tagged `batch_seq` (1-based).
    */
  def fold(batches: Seq[DataFrame], tsCol: String, delaySec: Long,
      keys: Seq[String]): DataFrame = {
    require(batches.nonEmpty && delaySec > 0)
    val keyCols = keys.map(col)
    def micros(c: Column): Column = unix_micros(c)
    def cut(df: DataFrame): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint()
    val delayUs = delaySec * 1000000L
    var wm: Option[Long] = None       // watermark, epoch micros
    var state: DataFrame = null       // keys :+ __expires
    val outs = batches.zipWithIndex.map { case (batch, i) =>
      val maxTs = batch.agg(max(micros(col(tsCol)))).head().get(0)
      val live = (wm, Option(state)) match {
        case (Some(w), Some(st)) => st.filter(col("__expires") > w)
        case (_, st)             => st.orNull
      }
      val fresh = wm.fold(batch)(w => batch.filter(micros(col(tsCol)) > w))
      val kept = cut((if (live == null) fresh
        else fresh.join(live.select(keyCols: _*), keys, "left_anti"))
        .dropDuplicates(keys))
      val entries = kept.select(keyCols :+
        (micros(col(tsCol)) + delayUs).as("__expires"): _*)
      state = if (live == null) entries else live.unionByName(entries)
      if (maxTs != null) {
        val m = maxTs.asInstanceOf[Long] - delayUs
        wm = Some(wm.fold(m)(math.max(m, _)))
      }
      kept.withColumn("batch_seq", lit(i + 1).cast(LongType))
    }
    outs.reduce(_ unionByName _)
  }
}
