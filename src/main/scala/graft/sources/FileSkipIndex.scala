package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{BloomAgg, BloomContains}

/** File-skipping secondary index — per-FILE (min, max, Bloom) stats
  * over a key column, so a point lookup on a 100 TB table opens the
  * one file that can hold the key instead of scanning the table.
  * This is the data-skipping layer table formats keep in their
  * metadata tree (Iceberg manifests, Delta stats), built here as a
  * first-class relation:
  *
  *   index(file) = (min_key, max_key, bloom(keys))
  *
  * ONE distributed aggregation pass builds the whole index
  * (`_metadata.file_path` grouping; [[graft.functions.BloomAgg]]
  * partials OR-merge map-side). Lookups consult the index — an
  * index-sized scan, rows = files — then read ONLY the admitted
  * files. min/max prunes by range (tight when the table is laid out
  * by the key — `Compaction`/Z-order); the Bloom probe additionally
  * kills in-range-but-absent keys, the case range stats cannot see.
  * One-sided error: a file the index rejects provably lacks the key;
  * admitted files are re-filtered exactly, so lookups are EXACT.
  *
  * The index is itself a DataFrame — persist it, store it in a
  * [[SnapshotStore]], or rebuild per session; at 100 TB it is
  * files-sized (thousands of rows), a driver-trivial relation.
  */
object FileSkipIndex {

  /** Build the index for the parquet table at `dir` over `keyCol`.
    * `expectedKeysPerFile` sizes each file's Bloom bit array.
    */
  def build(spark: SparkSession, dir: String, keyCol: String,
      expectedKeysPerFile: Long = 1000000L): DataFrame =
    spark.read.parquet(dir)
      .select(col(keyCol), col("_metadata.file_path").as("__file"))
      .groupBy(col("__file"))
      .agg(min(col(keyCol)).as("min_key"),
        max(col(keyCol)).as("max_key"),
        BloomAgg(xxhash64(col(keyCol)), expectedKeysPerFile).as("bloom"))

  /** Files the index admits for `key`: in [min,max] AND Bloom-hit.
    * Index-sized computation (rows = files).
    */
  def candidateFiles(index: DataFrame, key: Long): Seq[String] =
    index.filter(col("min_key") <= key && col("max_key") >= key &&
        BloomContains(xxhash64(lit(key)), col("bloom")))
      .select(col("__file")).collect().map(_.getString(0)).toSeq

  /** Exact point lookup through the index: read only admitted files,
    * then re-filter exactly (restores exactness over the Bloom's
    * false positives). Returns an empty frame — no file I/O at all —
    * when the index rejects every file.
    */
  def lookup(spark: SparkSession, index: DataFrame, dir: String,
      keyCol: String, key: Long): DataFrame = {
    val files = candidateFiles(index, key)
    if (files.isEmpty)
      spark.read.parquet(dir).filter(lit(false)) // schema-only, pruned scan
    else
      spark.read.parquet(files: _*).filter(col(keyCol) === key)
  }

  /** Files whose [min_key, max_key] OVERLAPS [lo, hi] — the pruning a
    * RANGE predicate gets from the index. Only the min/max stats
    * apply here (a Bloom answers membership, not interval overlap),
    * so range pruning is tight exactly when the layout clusters the
    * key ([[graft.operators.Compaction]] / Z-order) — scattered
    * layouts admit everything, which the smoke measures honestly.
    */
  def candidateFilesRange(index: DataFrame, lo: Long, hi: Long): Seq[String] =
    index.filter(col("min_key") <= hi && col("max_key") >= lo)
      .select(col("__file")).collect().map(_.getString(0)).toSeq

  /** Exact range scan through the index: read only overlapping files,
    * then re-filter to the exact interval (file ranges overhang the
    * predicate at both ends). Zero file I/O when nothing overlaps.
    */
  def rangeScan(spark: SparkSession, index: DataFrame, dir: String,
      keyCol: String, lo: Long, hi: Long): DataFrame = {
    val files = candidateFilesRange(index, lo, hi)
    if (files.isEmpty)
      spark.read.parquet(dir).filter(lit(false))
    else
      spark.read.parquet(files: _*)
        .filter(col(keyCol) >= lo && col(keyCol) <= hi)
  }
}
