package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned parquet table — MVCC table format in miniature
  * (the Iceberg/Delta snapshot-isolation shape, reduced to what the
  * engine needs): every commit writes a complete new generation
  * directory `v=N`, then atomically swings a pointer file; readers
  * resolve the pointer once and scan an immutable directory, so a
  * reader never sees a partial write and a writer never blocks a
  * reader. Old generations stay addressable — `read(version)` and
  * `asOf(timestamp)` are time travel; `expireSnapshots` is the
  * retention pass.
  *
  * Commit protocol (rename-only, same discipline as the bucketed
  * store's two-phase swap):
  *   1. write `v=N` fully (parquet job)
  *   2. append `_log/N.json` (version metadata: commit ts, row count)
  *   3. write `_latest.tmp`, delete `_latest`, rename tmp → `_latest`
  * A crash before step 3 leaves the table at N−1 with an orphan
  * directory the next commit overwrites; a crash inside step 3's
  * delete-rename window is healed by the reader's fallback rule:
  * pointer missing ⇒ newest logged version wins.
  *
  * Commit timestamps are CALLER-provided (a real deployment passes its
  * coordinator clock): determinism for tests and oracles, and no
  * hidden wall-clock reads inside the engine.
  *
  * At 100 TB a generation directory is written by the cluster (the
  * parquet job parallelizes); the pointer swap and log append are
  * O(1) driver-side metadata — the same asymmetry that makes
  * metadata-tree table formats work at that scale.
  */
class SnapshotStore(spark: SparkSession, root: String) {

  private def fs: FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def verDir(v: Long) = new Path(root, s"v=$v")
  private def logDir = new Path(root, "_log")
  private def pointer = new Path(root, "_latest")

  // ── commit ──────────────────────────────────────────────────────────

  /** Commit `df` as the next generation; returns its version. */
  def commit(df: DataFrame, commitTsMillis: Long): Long = {
    val v = latestVersion().map(_ + 1).getOrElse(0L)
    val dest = verDir(v)
    fs.delete(dest, true) // orphan from a crashed commit
    df.write.mode("overwrite").parquet(dest.toString)
    val rows = spark.read.parquet(dest.toString).count()
    writeLog(v, commitTsMillis, rows)
    swingPointer(v)
    committedTsCache += commitTsMillis
    v
  }

  /** Commit timestamps of every logged version — seeded from the log
    * ONCE per store handle, then maintained on commit, so the streaming
    * sink's per-batch redelivery check costs O(1) instead of O(total
    * versions) filesystem round-trips per micro-batch (unbounded growth
    * over a long-running stream — the same fix MorStore and
    * TableCatalog already carry; ADVICE r9).
    */
  private lazy val committedTsCache: scala.collection.mutable.Set[Long] = {
    val s = scala.collection.mutable.Set.empty[Long]
    history().foreach { case (_, ts, _) => s += ts }
    s
  }

  /** O(1) amortized: was any version committed with this ts? */
  def tsCommitted(ts: Long): Boolean = committedTsCache.contains(ts)

  /** Streaming-sink redelivery check with O(1) RESTART seeding (one
    * [[BatchMark]] read + the crash-window tail of the log, not the
    * whole log). Only for monotone gapless batch ids — see
    * [[BatchMark]]; other callers use [[tsCommitted]].
    */
  def batchCommitted(id: Long): Boolean =
    id <= batchSeed._1 || batchSeed._2.contains(id)

  /** Persist the batch high-water mark after a sink commit of `id`. */
  def markBatch(id: Long): Unit = {
    batchSeed._2 += id
    BatchMark.mark(spark.sparkContext.hadoopConfiguration, fs,
      new Path(root), loggedVersions().lastOption.getOrElse(-1L), id)
  }

  // the tail scan reads ONLY the log files above the mark's floor —
  // a history() call here would re-read every version's log entry and
  // defeat the O(1) restart this exists to provide
  private lazy val batchSeed: (Long, scala.collection.mutable.Set[Long]) = {
    val (floor, maxId) = BatchMark.read(fs, new Path(root)).getOrElse((-1L, -1L))
    val s = scala.collection.mutable.Set.empty[Long]
    loggedVersions().filter(_ > floor).foreach(v => s += tsOf(v))
    (maxId, s)
  }

  /** Commit ts of one logged version (single log-file read). */
  private def tsOf(v: Long): Long = {
    val in = fs.open(new Path(logDir, s"$v.json"))
    val s = scala.io.Source.fromInputStream(in).mkString
    in.close()
    s.split(""""ts":""")(1).takeWhile(c => c.isDigit || c == '-').toLong
  }

  private def writeLog(v: Long, ts: Long, rows: Long): Unit = {
    fs.mkdirs(logDir)
    val out = fs.create(new Path(logDir, s"$v.json"), true)
    out.write(s"""{"version":$v,"ts":$ts,"rows":$rows}""".getBytes("UTF-8"))
    out.close()
  }

  private def swingPointer(v: Long): Unit =
    PointerFile.swing(spark.sparkContext.hadoopConfiguration,
      new Path(root), pointer, v.toString, s"v=$v")

  // ── resolve / read ──────────────────────────────────────────────────

  /** Pointer value, else newest logged version (crash-heal rule), else
    * None (empty table).
    */
  def latestVersion(): Option[Long] = {
    if (fs.exists(pointer)) {
      val in = fs.open(pointer)
      val s = scala.io.Source.fromInputStream(in).mkString.trim
      in.close()
      Some(s.toLong)
    } else loggedVersions().lastOption
  }

  /** All committed versions, ascending (from the log). */
  def loggedVersions(): Seq[Long] =
    if (!fs.exists(logDir)) Seq.empty
    else fs.listStatus(logDir).map(_.getPath.getName)
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json").toLong)
      .sorted.toSeq

  /** Commit metadata (version, ts, rows) from the log, ascending. */
  def history(): Seq[(Long, Long, Long)] = loggedVersions().map { v =>
    val in = fs.open(new Path(logDir, s"$v.json"))
    val s = scala.io.Source.fromInputStream(in).mkString
    in.close()
    val get = (k: String) =>
      s.split(s""""$k":""")(1).takeWhile(c => c.isDigit || c == '-').toLong
    (get("version"), get("ts"), get("rows"))
  }

  def readLatest(): DataFrame = read(latestVersion().getOrElse(
    throw new IllegalStateException(s"no snapshot at $root")))

  /** Time travel to an explicit version. */
  def read(version: Long): DataFrame = {
    require(fs.exists(verDir(version)), s"no snapshot v=$version at $root")
    spark.read.parquet(verDir(version).toString)
  }

  /** Time travel to the newest snapshot committed at or before `ts` —
    * the AS OF TIMESTAMP read.
    */
  def asOf(tsMillis: Long): DataFrame = {
    val vs = history().filter(_._2 <= tsMillis)
    require(vs.nonEmpty, s"no snapshot at or before $tsMillis")
    read(vs.last._1)
  }

  // ── retention ───────────────────────────────────────────────────────

  /** Delete all generations except the newest `keep` (the pointer
    * target always survives). Returns the expired versions.
    */
  def expireSnapshots(keep: Int): Seq[Long] = {
    require(keep >= 1, "must keep at least one snapshot")
    val current = latestVersion().toSeq
    val all = loggedVersions()
    val victims = all.dropRight(keep).filterNot(current.contains)
    victims.foreach { v =>
      fs.delete(verDir(v), true)
      fs.delete(new Path(logDir, s"$v.json"), false)
    }
    victims
  }
}
