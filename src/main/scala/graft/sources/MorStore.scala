package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge-on-read table — the write-cheap half of the CoW/MoR
  * trade-off the engine's CDC merge
  * ([[graft.operators.CdcMerge]], copy-on-write: reads stay pure
  * scans, every merge rewrites affected data) leaves open. Here a
  * merge COMMITS ONLY ITS DELTA — O(batch) write regardless of table
  * size — and the read path resolves base ∪ deltas on the fly:
  *
  *   latest  = newest delta row per key (ordered by delta generation)
  *   result  = (base ▷ touched-keys) ∪ latest upserts
  *
  * The resolve's window runs over the DELTAS ONLY (small between
  * compactions) and the anti join's key set is delta-sized (AQE
  * broadcasts it), so read overhead tracks the accumulated delta
  * volume — which [[compact]] folds back into a new base generation
  * (one relational job), resetting read cost. That is exactly the
  * Iceberg/Delta MoR lifecycle: cheap commits, periodic compaction.
  *
  * Delta schema = base schema + `__op` ∈ {U, D}: U upserts the full
  * row (insert-or-replace — a U on a previously deleted key
  * resurrects it), D deletes the key. Commit atomicity reuses the
  * engine's rename-only pointer discipline ([[SnapshotStore]]): a
  * generation is either fully visible or absent; a crash mid-commit
  * leaves the previous cut intact.
  */
class MorStore(spark: SparkSession, root: String, keyCols: Seq[String]) {

  val OpCol = "__op"

  private def fs: FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def genDir(v: Long) = new Path(root, s"g=$v")
  private def logDir = new Path(root, "_log")
  private def pointer = new Path(root, "_latest")

  // ── commit ──────────────────────────────────────────────────────────

  /** Commit a full base generation (initial load or compaction
    * output). Returns the generation.
    */
  def commitBase(df: DataFrame, commitTsMillis: Long): Long =
    commit(df, commitTsMillis, kind = "base")

  /** Commit a CDC delta (schema = base + `__op`). O(|delta|) write —
    * the table is never rewritten.
    */
  def commitDelta(delta: DataFrame, commitTsMillis: Long): Long = {
    require(delta.columns.contains(OpCol),
      s"delta must carry $OpCol in {U, D}")
    commit(delta, commitTsMillis, kind = "delta")
  }

  private def commit(df: DataFrame, ts: Long, kind: String): Long = {
    val g = generations().lastOption.map(_._1 + 1).getOrElse(0L)
    val dest = genDir(g)
    fs.delete(dest, true) // orphan from a crashed commit
    df.write.mode("overwrite").parquet(dest.toString)
    fs.mkdirs(logDir)
    val out = fs.create(new Path(logDir, s"$g.json"), true)
    out.write(s"""{"generation":$g,"ts":$ts,"kind":"$kind"}""".getBytes("UTF-8"))
    out.close()
    val tmp = new Path(root, "_latest.tmp")
    val p = fs.create(tmp, true)
    p.write(g.toString.getBytes("UTF-8"))
    p.close()
    fs.delete(pointer, false)
    require(fs.rename(tmp, pointer), s"pointer swing failed at g=$g")
    g
  }

  /** (generation, kind) pairs ≤ the pointer, ascending — staged
    * generations beyond the pointer are invisible.
    */
  private[graft] def generations(): Seq[(Long, String)] = {
    val logged =
      if (!fs.exists(logDir)) Seq.empty
      else fs.listStatus(logDir).map(_.getPath.getName)
        .filter(_.endsWith(".json")).map(_.stripSuffix(".json").toLong)
        .sorted.toSeq
    val visible =
      if (!fs.exists(pointer)) logged
      else {
        val in = fs.open(pointer)
        val last = scala.io.Source.fromInputStream(in).mkString.trim.toLong
        in.close()
        logged.filter(_ <= last)
      }
    visible.map { g =>
      val in = fs.open(new Path(logDir, s"$g.json"))
      val s = scala.io.Source.fromInputStream(in).mkString
      in.close()
      g -> s.split(""""kind":"""")(1).takeWhile(_ != '"')
    }
  }

  /** Commit timestamp of generation `g` (the streaming sink keys its
    * exactly-once check on it).
    */
  def generationTs(g: Long): Long = {
    val in = fs.open(new Path(logDir, s"$g.json"))
    val s = scala.io.Source.fromInputStream(in).mkString
    in.close()
    s.split(""""ts":""")(1).takeWhile(c => c.isDigit || c == '-').toLong
  }

  // ── read (the MoR resolve) ──────────────────────────────────────────

  /** Current table state: newest base, with every later delta
    * applied in commit order.
    */
  def read(): DataFrame = {
    val gens = generations()
    require(gens.nonEmpty, s"empty MoR table at $root")
    val baseGen = gens.filter(_._2 == "base").map(_._1).lastOption
      .getOrElse(throw new IllegalStateException(s"no base generation at $root"))
    val base = spark.read.parquet(genDir(baseGen).toString)
    val deltaGens = gens.collect { case (g, "delta") if g > baseGen => g }
    if (deltaGens.isEmpty) base
    else {
      val deltas = deltaGens.map { g =>
        spark.read.parquet(genDir(g).toString).withColumn("__gen", lit(g))
      }.reduce(_ unionByName _)
      // newest delta row per key wins; the window spans deltas only
      val latest = deltas.withColumn("__rn", row_number().over(
          Window.partitionBy(keyCols.map(col): _*).orderBy(col("__gen").desc)))
        .filter(col("__rn") === 1).drop("__rn")
      val untouched = base.join(latest.select(keyCols.map(col): _*),
        keyCols, "left_anti")
      untouched.unionByName(
        latest.filter(col(OpCol) === "U").drop(OpCol, "__gen"))
    }
  }

  /** Fold base + deltas into a fresh base generation (compaction):
    * read cost resets to a pure scan; old generations stay
    * addressable until a retention pass removes them.
    */
  def compact(commitTsMillis: Long): Long =
    commitBase(read(), commitTsMillis)
}
