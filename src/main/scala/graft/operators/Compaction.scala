package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the maintenance operator every long-running
  * ingest (the reference's per-S3-file CDC merges included) eventually
  * needs: micro-batch writers leave thousands of KB-sized parquet
  * files, and at 100 TB the scan's task-per-file overhead and footer
  * reads dominate. Compaction rewrites a table directory into
  * target-sized files laid out by a sort key, so parquet min/max
  * footer stats prune scans (pair with
  * [[graft.functions.ZInterleave]] for multi-dimensional keys).
  *
  * Layout: `repartitionByRange(numFiles, key)` gives ONE shuffle whose
  * output partitions are disjoint key ranges (range-partitioned by
  * sampled split points — skew-tolerant, no driver-side planning), and
  * `sortWithinPartitions` orders rows inside each file without any
  * global sort. Commit is the repo's standard two-phase swap: write to
  * a temp dir beside the table, then rename old → trash, temp → live
  * (rename-only, no copy; a crash before the second rename leaves the
  * original table intact).
  */
object Compaction {

  final case class Report(filesBefore: Int, filesAfter: Int, rows: Long)

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(spark: SparkSession, dir: String): Array[Path] = {
    val p = new Path(dir)
    fs(spark).listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
  }

  /** Compact the parquet table at `dir` into ceil(rows / targetRows)
    * files, range-laid-out and internally sorted by `sortKey`.
    * Returns (before, after, rows). The swap is rename-only; the
    * replaced generation is left at the dot-prefixed scratch sibling
    * `.<name>._compact_old` until the next compaction (crash-recovery
    * copy, same convention as the bucketed store's backup-rename;
    * dot-prefixed so Spark's listing never sees it).
    */
  def compact(spark: SparkSession, dir: String, sortKey: Column,
      targetRows: Long): Report = {
    require(targetRows > 0, "targetRows must be positive")
    val before = dataFiles(spark, dir).length
    val df = spark.read.parquet(dir)
    val rows = df.count()
    val numFiles = math.max(1, math.ceil(rows.toDouble / targetRows).toInt)

    // dot-prefixed scratch siblings: invisible to Spark's file listing,
    // so a partition dir compacted IN PLACE inside a hive table tree
    // never surfaces its backup as a phantom partition
    val p = new Path(dir)
    val tmp = new Path(p.getParent, "." + p.getName + "._compact_tmp")
    val old = new Path(p.getParent, "." + p.getName + "._compact_old")
    val f = fs(spark)
    f.delete(tmp, true)
    f.delete(old, true)

    df.repartitionByRange(numFiles, sortKey)
      .sortWithinPartitions(sortKey)
      .write.mode("overwrite").parquet(tmp.toString)

    require(f.rename(p, old), s"swap-out failed: $dir")
    require(f.rename(tmp, p), s"swap-in failed: $tmp")

    Report(before, dataFiles(spark, dir).length, rows)
  }

  /** Incremental, partition-wise compaction — the realistic
    * maintenance mode for a hive-partitioned 100 TB table: only
    * partitions whose small-file count exceeds `minFiles` are
    * rewritten (each with its own [[compact]] two-phase swap); cold
    * partitions are untouched, so the maintenance cost tracks the
    * WRITE rate, not the table size. Returns (partitionDir → report)
    * for the partitions actually compacted.
    */
  def compactPartitions(spark: SparkSession, tableDir: String,
      sortKey: Column, targetRows: Long, minFiles: Int): Map[String, Report] = {
    val f = fs(spark)
    def partitionDirs(p: Path): Seq[Path] = {
      val kids = f.listStatus(p).filter(s => s.isDirectory &&
        s.getPath.getName.contains("="))
      if (kids.isEmpty) Seq(p)
      else kids.flatMap(k => partitionDirs(k.getPath)).toSeq
    }
    partitionDirs(new Path(tableDir))
      .filter(d => dataFiles(spark, d.toString).length > minFiles)
      .map(d => d.toString -> compact(spark, d.toString, sortKey, targetRows))
      .toMap
  }

  /** Per-file (min, max) of `keyCol` read back from the compacted
    * layout — the footer-stats view a scan planner prunes with; used
    * by the spec to prove files cover disjoint key ranges.
    */
  def fileKeyRanges(spark: SparkSession, dir: String, keyCol: String): Seq[(Long, Long)] =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(keyCol)).cast("long").as("lo"), max(col(keyCol)).cast("long").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
}
