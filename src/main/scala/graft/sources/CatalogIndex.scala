package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Secondary file-skip indexes AS CATALOG TABLES — the
  * [[FileSkipIndex]] relation stored next to the data it indexes,
  * under the same snapshot/time-travel/vacuum machinery, with
  * VERIFIED COVERAGE: every index row records the table version it
  * was built from, and a lookup uses the index only when that version
  * IS the table's current version — otherwise it falls back to a full
  * scan, still exact. This is asynchronous index maintenance as real
  * warehouses ship it: the index is an accelerator with a provable
  * staleness check, never a correctness dependency. (A data commit
  * and its index refresh are separate generations; the coverage check
  * is what makes the window between them safe.)
  */
object CatalogIndex {

  /** Naming convention for the index table of `t`. */
  def indexTable(t: String): String = t + "__skipidx"

  /** (Re)build the skip index for `table`'s CURRENT version over
    * `keyCol` and commit it as catalog table [[indexTable]] — one
    * index-sized generation (rows = files). Call after a data commit
    * to restore index coverage.
    */
  def refresh(spark: SparkSession, cat: TableCatalog, table: String,
      keyCol: String, commitTsMillis: Long,
      expectedKeysPerFile: Long = 1000000L): Long = {
    val g = cat.latestGeneration().getOrElse(
      throw new IllegalStateException("empty catalog"))
    val v = cat.versionOf(g, table)
    val idx = FileSkipIndex
      .build(spark, cat.versionDir(g, table), keyCol, expectedKeysPerFile)
      .withColumn("__v", lit(v))
      .withColumn("__key_col", lit(keyCol))
    cat.commitAll(Map(indexTable(table) -> idx), commitTsMillis)
  }

  /** True when an index for `table` over `keyCol` exists AND covers
    * the table's current version.
    */
  def covers(cat: TableCatalog, table: String, keyCol: String): Boolean = {
    val g = cat.latestGeneration().getOrElse(return false)
    if (!cat.tableVersions(g).contains(indexTable(table))) return false
    // the DATA table may have been dropped or renamed away while its
    // __skipidx table lingers — versionOf would throw here, crashing
    // lookup() instead of letting it fall through to read()'s clear
    // missing-table error
    if (!cat.tableVersions(g).contains(table)) return false
    val head = cat.readAt(g, indexTable(table)).limit(1).collect()
    head.nonEmpty &&
      head(0).getAs[Long]("__v") == cat.versionOf(g, table) &&
      head(0).getAs[String]("__key_col") == keyCol
  }

  /** Exact point lookup: through the index when it covers the current
    * version (opens only admitted files), full-scan fallback
    * otherwise. Returns (result, usedIndex, filesOpened) —
    * filesOpened is -1 on the fallback path (a full scan opens
    * whatever the table holds).
    */
  def lookup(spark: SparkSession, cat: TableCatalog, table: String,
      keyCol: String, key: Long): (DataFrame, Boolean, Long) = {
    val g = cat.latestGeneration().getOrElse(
      throw new IllegalStateException("empty catalog"))
    if (!covers(cat, table, keyCol))
      (cat.read(table).filter(col(keyCol) === key), false, -1L)
    else {
      val idx = cat.readAt(g, indexTable(table))
        .select(col("__file"), col("min_key"), col("max_key"), col("bloom"))
      val files = FileSkipIndex.candidateFiles(idx, key)
      val df =
        if (files.isEmpty) cat.read(table).filter(lit(false))
        else spark.read.parquet(files: _*).filter(col(keyCol) === key)
      (df, true, files.size.toLong)
    }
  }
}
