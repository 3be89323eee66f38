package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Persisted streaming-batch high-water mark — the restart-seeding
  * half of the sinks' exactly-once ledger. The in-memory redelivery
  * caches ([[MorStore.tsCommitted]] and friends) are O(1) per batch
  * but seed by reading EVERY logged generation once per store handle:
  * a restarted long-running stream over a 10⁴-generation log pays
  * 10⁴ filesystem round-trips before its first batch (ADVICE r9).
  *
  * The mark is one tiny file, `_maxbatch`, holding
  * `"<floorGen> <maxBatchId>"`, swung atomically after each SINK
  * commit ([[PointerFile]] rename-replace discipline). Restart
  * seeding then reads ONE file plus only the generations NEWER than
  * `floorGen` — the crash window between a commit and its mark, at
  * most one generation in practice.
  *
  * Correctness rests on the Structured Streaming batch-id contract:
  * ids from one checkpoint are monotone and gapless, so "id ≤ the
  * last marked id" implies the batch committed. The mark is written
  * ONLY by streaming sinks — manual commits (wall-clock or fixture
  * timestamps) never touch it, so they can never inflate the
  * high-water mark and swallow future batches. Re-pointing a NEW
  * checkpoint (ids restart at 0) at a store that already carries a
  * mark is the same operator error it always was under set-based
  * ledgers: old ids no-op; use a fresh store or clear the ledger.
  */
private[graft] object BatchMark {

  private def markPath(root: Path) = new Path(root, "_maxbatch")

  /** Record `id` as committed with every generation ≤ `floorGen`
    * ledger-covered. Monotone: an out-of-order mark (possible only
    * from a misconfigured second writer) never lowers the mark.
    */
  def mark(conf: Configuration, fs: FileSystem, root: Path,
      floorGen: Long, id: Long): Unit = {
    val keep = read(fs, root) match {
      case Some((f, m)) if m > id => (f, m)
      case _ => (floorGen, id)
    }
    PointerFile.swing(conf, root, markPath(root),
      s"${keep._1} ${keep._2}", s"maxbatch $root")
  }

  /** (floorGen, maxBatchId) if a mark exists. */
  def read(fs: FileSystem, root: Path): Option[(Long, Long)] = {
    val p = markPath(root)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = scala.io.Source.fromInputStream(in).mkString.trim
      in.close()
      s.split("\\s+") match {
        case Array(f, m) => Some((f.toLong, m.toLong))
        case _ => None
      }
    }
  }
}
