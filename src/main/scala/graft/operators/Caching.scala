package graft.operators

import org.apache.spark.sql.DataFrame

import scala.collection.mutable

/** Cache-lifetime scoping for operators that persist intermediate
  * relations (shingle / fingerprint / candidate indexes). Those
  * operators return LAZY frames that still reference the persisted
  * intermediates, so they can never unpersist internally — the
  * lifetime belongs to whoever materializes the result.
  *
  * The default scope ([[CacheScope.processOwned]], supplied
  * implicitly) reproduces the historical contract: caches live until
  * the caller unpersists them or clears the session cache (the bench
  * and driver clear between queries, so one-shot pipelines never
  * accumulate). A LONG-LIVED service embedding these operators wraps
  * each call-plus-materialization in [[CacheScope.scoped]] instead,
  * which releases every relation persisted inside the block on exit —
  * including on failure:
  *
  * {{{
  * val pairs = CacheScope.scoped { implicit cs =>
  *   TextDedup.minhashLshPairs(docs, "doc_id", "text").collect()
  * } // shingle + candidate caches released here, even if collect threw
  * }}}
  *
  * The result must be FULLY materialized inside the block (collect,
  * write, or count-and-discard): after exit the scoped caches are
  * gone, and a plan evaluated later would silently recompute them —
  * correct, just no longer cached.
  */
final class CacheScope private[operators] (autoRelease: Boolean) {
  private val acquired = mutable.ListBuffer.empty[DataFrame]

  /** Persist `df` under this scope's lifetime and return it. */
  private[operators] def persist(df: DataFrame): DataFrame = synchronized {
    val p = df.persist()
    if (autoRelease) acquired += p
    p
  }

  /** Unpersist everything this scope persisted (idempotent). */
  private[graft] def release(): Unit = synchronized {
    acquired.foreach(_.unpersist(blocking = false))
    acquired.clear()
  }

  /** Number of currently-tracked persisted relations (test hook). */
  private[graft] def trackedCount: Int = synchronized(acquired.size)
}

object CacheScope {

  /** Process-owned caches — never auto-released; the implicit default
    * every existing call site resolves to, preserving behavior (and
    * the audited physical plans) exactly.
    */
  implicit val processOwned: CacheScope = new CacheScope(autoRelease = false)

  /** Run `f` with a fresh auto-releasing scope; unpersist everything
    * the block's operator calls persisted, on ANY exit path.
    */
  def scoped[T](f: CacheScope => T): T = {
    val cs = new CacheScope(autoRelease = true)
    try f(cs) finally cs.release()
  }
}
