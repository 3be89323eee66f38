package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exactly-once processed-file ledger (`cdc_processed_files`).
  *
  * Re-expresses the reference's file tracking
  * (reference: lambda/handler.py:664-703) as a small append-only parquet
  * table: `file_key, status, error_message, processed_at`. Status values
  * `completed | failed | batch_processed` with the processed-check set
  * being {completed, batch_processed} (handler.py:666-668).
  *
  * Scale: the reference sizes this at ~300k rows / ~150 MB steady-state
  * with 30-day retention (AUTOMATIC_CLEANUP.md:68-87) — a driver-side
  * broadcastable table, not a big-data table. Appends are one tiny file
  * per processed input; `cleanup` compacts and applies retention.
  */
final class FileLedger(spark: SparkSession, path: String) {

  import FileLedger._

  def records: DataFrame =
    if (exists) spark.read.schema(Schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Schema)

  private def exists: Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  /** Processed ⇔ a `completed`/`batch_processed` row exists
    * (reference: handler.py:664-676).
    */
  def isProcessed(fileKey: String): Boolean =
    exists && !records
      .filter(col("file_key") === fileKey && col("status").isin(ProcessedStatuses: _*))
      .isEmpty

  /** Bulk variant for backfills: the subset of `fileKeys` already done.
    * Large key lists (reference backfills replay whole history) go
    * through a join instead of a giant IN expression.
    */
  def processedAmong(fileKeys: Seq[String]): Set[String] = {
    if (!exists) return Set.empty
    val processed = records.filter(col("status").isin(ProcessedStatuses: _*))
    val matched =
      if (fileKeys.size <= 1000) processed.filter(col("file_key").isin(fileKeys: _*))
      else {
        val keysDf = spark.createDataFrame(
          spark.sparkContext.parallelize(fileKeys.map(Row(_)), 4),
          StructType(Seq(StructField("file_key", StringType, nullable = false))))
        processed.join(keysDf, "file_key")
      }
    matched.select("file_key").distinct().collect().map(_.getString(0)).toSet
  }

  def markCompleted(fileKey: String): Unit = append(fileKey, "completed", None)

  /** Error message truncated to 500 chars (reference: handler.py:694). */
  def markFailed(fileKey: String, error: String): Unit =
    append(fileKey, "failed", Some(Option(error).getOrElse("").take(500)))

  def markBatchProcessed(fileKeys: Seq[String]): Unit = {
    val now = new Timestamp(System.currentTimeMillis())
    val rows = fileKeys.map(k => Row(k, "batch_processed", null, now))
    write(rows, SaveMode.Append)
  }

  private def append(fileKey: String, status: String, error: Option[String]): Unit =
    write(Seq(Row(fileKey, status, error.orNull, new Timestamp(System.currentTimeMillis()))),
      SaveMode.Append)

  /** Appends go through [[ParquetAppend]] (uniquely-named files moved in
    * atomically) so concurrent per-table streams can share the ledger;
    * Overwrite (maintenance) keeps the standard committer — cleanup/reset
    * are single-writer operations.
    */
  private def write(rows: Seq[Row], mode: SaveMode): Unit =
    if (mode == SaveMode.Overwrite)
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), Schema)
        .write.mode(mode).parquet(path)
    else ParquetAppend.append(spark, path, rows, Schema)

  /** UPDATE sink: reset old `failed` rows to `pending` so they are retried
    * (reference: DEPLOY_FILE_DEDUPLICATION.md:266-270 —
    * `UPDATE cdc_processed_files SET status='pending' WHERE
    * status='failed' AND processed_at < ...`). Read-modify-overwrite on
    * the small ledger.
    */
  def resetFailed(olderThanMinutes: Long = 60): Long = {
    if (!exists) return 0L
    val cutoff = new Timestamp(System.currentTimeMillis() - olderThanMinutes * 60000L)
    val all = records.collect() // small by design
    // count only rows flipped by THIS reset, not rows already pending
    val eligible = all.count(r =>
      r.getString(1) == "failed" && r.getTimestamp(3).before(cutoff))
    val rows = all.map { r =>
      if (r.getString(1) == "failed" && r.getTimestamp(3).before(cutoff))
        Row(r.getString(0), "pending", r.getString(2), r.getTimestamp(3))
      else r
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), Schema)
      .write.mode(SaveMode.Overwrite).parquet(path)
    eligible.toLong
  }

  /** Retention cleanup: drop rows older than `retentionDays` and compact
    * the append-files (reference: AUTOMATIC_CLEANUP.md:279-281 —
    * `DELETE ... WHERE processed_at < now - INTERVAL '30' DAY`).
    */
  def cleanup(retentionDays: Int = 30): Long = {
    if (!exists) return 0L
    val keep = records
      .filter(col("processed_at") >= date_sub(current_timestamp(), retentionDays))
    val kept = keep.collect() // ledger is small by design (~300k rows max)
    val removed = records.count() - kept.length
    spark.createDataFrame(spark.sparkContext.parallelize(kept.toSeq, 1), Schema)
      .write.mode(SaveMode.Overwrite).parquet(path)
    removed
  }
}

object FileLedger {
  val ProcessedStatuses: Seq[String] = Seq("completed", "batch_processed")

  val Schema: StructType = StructType(Seq(
    StructField("file_key", StringType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("error_message", StringType, nullable = true),
    StructField("processed_at", TimestampType, nullable = false)))
}
