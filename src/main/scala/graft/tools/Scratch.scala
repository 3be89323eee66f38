package graft.tools

/** Housekeeping for the tmpfs scratch dir build.sbt points
  * `java.io.tmpdir` at when /dev/shm is big enough: temp catalogs and
  * Spark local dirs land there for disk-epoch-free bench figures, but
  * tmpfs is RAM — a SIGKILLed run's litter would otherwise sit in
  * memory until reboot. The Bench/Verify mains sweep anything stale at
  * startup; an active concurrent run's dirs are hours younger than the
  * cutoff, so the sweep can never eat a live run's scratch.
  */
object Scratch {

  /** Delete top-level scratch entries whose ENTIRE tree is older than
    * `maxAgeMs`. Liveness is judged on the newest mtime anywhere in the
    * tree, not the top-level dir's (ADVICE r13): Spark local dirs
    * create their direct children early and then write deep inside, so
    * a >3 h concurrent run's top-level mtime goes stale while its leaf
    * files stay fresh — deepest-mtime keeps it alive. No-op unless the
    * tmpdir actually rides /dev/shm (on-disk /tmp is the OS's problem,
    * as before). Best-effort: a vanished or busy file is skipped, never
    * fatal.
    */
  def sweepStale(maxAgeMs: Long = 3L * 3600 * 1000): Unit = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir", "/tmp"))
    if (tmp.getAbsolutePath.startsWith("/dev/shm")) {
      val cutoff = System.currentTimeMillis() - maxAgeMs
      def newestMtime(f: java.io.File): Long = {
        val own = f.lastModified()
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty)
            .foldLeft(own)((m, c) => math.max(m, newestMtime(c)))
        else own
      }
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      Option(tmp.listFiles()).getOrElse(Array.empty)
        .filter(f => try newestMtime(f) < cutoff catch { case _: Throwable => false })
        .foreach(f => try rm(f) catch { case _: Throwable => () })
    }
  }
}
