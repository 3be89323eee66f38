package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-table atomic commit — a catalog generation over N snapshot
  * tables, so a pipeline that rewrites several tables (orders AND
  * their lineitems, a corpus AND its manifest) exposes either the old
  * cut or the new cut of EVERY table, never a mix.
  *
  * [[SnapshotStore]] makes a single table's commit atomic; the
  * catalog lifts the same rename-only pointer discipline one level:
  * table data lives in `tables/<name>/v=N` generation directories,
  * but VISIBILITY is resolved exclusively through catalog generation
  * files — `_catalog/G.json` maps every table to the version that
  * belongs to cut G — behind one `_latest` pointer.
  *
  * Commit protocol:
  *   1. write every changed table's next `v=N` directory fully
  *      (cluster-parallel parquet jobs; crash here leaves orphan
  *      directories the next commit overwrites — invisible, since no
  *      catalog generation references them)
  *   2. write `_catalog/G.json` carrying forward unchanged tables'
  *      versions from generation G−1
  *   3. write `_latest.tmp`, delete `_latest`, rename tmp → `_latest`
  * Readers resolve the pointer once, load one generation file, and
  * scan immutable directories — snapshot isolation across tables for
  * the price of one O(tables) metadata file. At 100 TB the data
  * writes parallelize across the cluster; steps 2-3 stay O(1)
  * driver-side metadata, the asymmetry that makes metadata-tree
  * formats (Iceberg/Delta/Nessie-style multi-table refs) scale.
  *
  * Commit timestamps are caller-provided, like [[SnapshotStore]]'s —
  * no hidden wall-clock reads.
  */
class TableCatalog(spark: SparkSession, root: String) {

  private def fs: FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def tableDir(t: String, v: Long) = new Path(root, s"tables/$t/v=$v")
  private def catDir = new Path(root, "_catalog")
  private def genFile(g: Long) = new Path(catDir, s"$g.json")
  private def pointer = new Path(root, "_latest")

  // ── commit ──────────────────────────────────────────────────────────

  /** Atomically commit all frames in `tables` as one catalog
    * generation; unchanged tables carry forward. Returns the new
    * generation number. Nothing becomes visible until the final
    * pointer rename.
    */
  def commitAll(tables: Map[String, DataFrame], commitTsMillis: Long): Long = {
    val staged = stage(tables)
    publish(staged, commitTsMillis)
  }

  /** Step 1 only — write the generation directories, swing NOTHING.
    * Exposed so crash-recovery behavior is testable: a stage with no
    * [[publish]] must be invisible to every reader.
    */
  private[graft] def stage(tables: Map[String, DataFrame]): Map[String, Long] = {
    tables.keys.foreach { t =>
      require(t.matches("[A-Za-z0-9_.-]+"),
        s"table name '$t' outside [A-Za-z0-9_.-]+ — generation files " +
          "are plain JSON and a quote/comma/brace in a name would corrupt them")
    }
    val prev = latestGeneration().map(tableVersions).getOrElse(Map.empty)
    tables.map { case (t, df) =>
      val v = prev.get(t).map(_ + 1).getOrElse(0L)
      val dest = tableDir(t, v)
      fs.delete(dest, true) // orphan from a crashed commit
      df.write.mode("overwrite").parquet(dest.toString)
      t -> v
    }
  }

  /** Steps 2–3 — make a staged version set visible atomically. */
  private[graft] def publish(
      staged: Map[String, Long], commitTsMillis: Long): Long = {
    val g = latestGeneration().map(_ + 1).getOrElse(0L)
    val carried = latestGeneration().map(tableVersions).getOrElse(Map.empty)
    val versions = carried ++ staged
    val body = versions.toSeq.sortBy(_._1)
      .map { case (t, v) => s""""$t":$v""" }.mkString(",")
    fs.mkdirs(catDir)
    val out = fs.create(genFile(g), true)
    out.write(
      s"""{"generation":$g,"ts":$commitTsMillis,"tables":{$body}}"""
        .getBytes("UTF-8"))
    out.close()
    committedTsCache += commitTsMillis
    swingPointer(g)
    g
  }

  private def swingPointer(g: Long): Unit = {
    val tmp = new Path(root, "_latest.tmp")
    val out = fs.create(tmp, true)
    out.write(g.toString.getBytes("UTF-8"))
    out.close()
    fs.delete(pointer, false)
    require(fs.rename(tmp, pointer), s"catalog pointer swing failed at g=$g")
  }

  // ── resolve / read ──────────────────────────────────────────────────

  /** max(pointer, newest logged generation), else None (empty
    * catalog). Healing PAST the pointer is safe and required: a
    * generation file is only ever written after every table version
    * it references is fully staged (publish step 2 of 3), so a crash
    * between the generation-file write and the pointer swing leaves a
    * complete, readable generation that the pointer merely hasn't
    * caught up to. Without the heal, the next commit would reuse that
    * generation number and overwrite the file — and a redelivered
    * micro-batch whose id is logged in the orphaned file would no-op,
    * silently losing the batch (the exactly-once hole ADVICE r8
    * flagged at CatalogSink:37).
    */
  def latestGeneration(): Option[Long] = {
    val logged = loggedGenerations().lastOption
    if (fs.exists(pointer)) {
      val in = fs.open(pointer)
      val s = scala.io.Source.fromInputStream(in).mkString.trim
      in.close()
      Some(logged.fold(s.toLong)(math.max(s.toLong, _)))
    } else logged
  }

  /** All committed generations, ascending. */
  def loggedGenerations(): Seq[Long] =
    if (!fs.exists(catDir)) Seq.empty
    else fs.listStatus(catDir).map(_.getPath.getName)
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json").toLong)
      .sorted.toSeq

  /** The table→version map of generation `g`. */
  def tableVersions(g: Long): Map[String, Long] = {
    val in = fs.open(genFile(g))
    val s = scala.io.Source.fromInputStream(in).mkString
    in.close()
    val tablesBody = s.split(""""tables":\{""")(1).takeWhile(_ != '}')
    if (tablesBody.trim.isEmpty) Map.empty
    else tablesBody.split(",").map { kv =>
      val Array(k, v) = kv.split(":")
      k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toLong
    }.toMap
  }

  /** Commit ts of generation `g`. */
  def generationTs(g: Long): Long = {
    val in = fs.open(genFile(g))
    val s = scala.io.Source.fromInputStream(in).mkString
    in.close()
    s.split(""""ts":""")(1).takeWhile(c => c.isDigit || c == '-').toLong
  }

  /** Commit timestamps already logged — seeded from the commit log
    * ONCE per catalog handle, then maintained in memory, so a
    * streaming sink's per-batch redelivery check is O(1) instead of
    * one filesystem round-trip per historical generation per batch
    * (ADVICE r8: the scan-the-whole-log-every-batch pattern grows
    * without bound over a long-running stream). Visibility matches
    * [[latestGeneration]] (pointer-heal included) because the seed
    * reads every logged generation file, which by the publish
    * protocol all reference fully staged data.
    */
  private lazy val committedTsCache: scala.collection.mutable.Set[Long] = {
    val s = scala.collection.mutable.Set.empty[Long]
    loggedGenerations().foreach(g => s += generationTs(g))
    s
  }

  /** O(1) amortized: was any generation committed with this ts? */
  def tsCommitted(ts: Long): Boolean = committedTsCache.contains(ts)

  /** Read `table` at catalog generation `g` — every table read at the
    * same `g` is one consistent cross-table cut.
    */
  def readAt(g: Long, table: String): DataFrame = {
    val v = tableVersions(g).getOrElse(table,
      throw new IllegalArgumentException(s"table $table not in generation $g"))
    spark.read.parquet(tableDir(table, v).toString)
  }

  /** Read `table` at the latest generation. */
  def read(table: String): DataFrame = readAt(latestGeneration()
    .getOrElse(throw new IllegalStateException(s"empty catalog at $root")), table)

  /** The newest generation committed at or before `ts` — cross-table
    * AS OF TIMESTAMP.
    */
  def generationAsOf(tsMillis: Long): Long = {
    val gs = loggedGenerations().filter(generationTs(_) <= tsMillis)
    require(gs.nonEmpty, s"no catalog generation at or before $tsMillis")
    gs.last
  }
}
