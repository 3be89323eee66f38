package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Options, Path}

/** The one pointer-swing primitive every store shares: write the new
  * value to a temp file, then ATOMICALLY REPLACE the pointer with one
  * OVERWRITE rename (`FileContext.rename(…, Rename.OVERWRITE)` —
  * POSIX `rename(2)` semantics on local/HDFS). The previous
  * delete-then-rename pair had a crash window with NO pointer on disk
  * between the two calls; every store healed it (missing pointer ⇒
  * newest logged generation), but a single atomic replace makes the
  * window zero-width instead of merely survivable — the pointer now
  * always exists once the first commit lands.
  */
private[sources] object PointerFile {

  /** Atomically set `pointer` to `value` via tmp-write + OVERWRITE
    * rename. `tag` only labels the failure message.
    */
  def swing(conf: Configuration, root: Path, pointer: Path, value: String,
      tag: String): Unit = {
    val fs = pointer.getFileSystem(conf)
    val tmp = new Path(root, pointer.getName + ".tmp")
    val out = fs.create(tmp, true)
    out.write(value.getBytes("UTF-8"))
    out.close()
    try FileContext.getFileContext(pointer.toUri, conf)
      .rename(tmp, pointer, Options.Rename.OVERWRITE)
    catch {
      case e: Exception =>
        throw new IllegalStateException(s"pointer swing failed at $tag", e)
    }
  }
}
