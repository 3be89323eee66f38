package graft

import org.scalatest.funsuite.AnyFunSuite

/** The tmpfs scratch sweeper: stale litter reclaimed, live runs and
  * on-disk tmpdirs untouched.
  */
class ScratchSpec extends AnyFunSuite {

  test("sweepStale deletes only stale entries, and only under /dev/shm") {
    val shm = new java.io.File("/dev/shm")
    assume(shm.isDirectory && shm.canWrite, "no writable /dev/shm here")
    val root = java.nio.file.Files
      .createTempDirectory(shm.toPath, "graft-scratchspec").toFile
    try {
      val old = System.currentTimeMillis() - 4L * 3600 * 1000
      val stale = new java.io.File(root, "stale-run")
      val staleChild = new java.io.File(stale, "seg"); staleChild.mkdirs()
      assert(staleChild.setLastModified(old))
      assert(stale.setLastModified(old))
      val fresh = new java.io.File(root, "fresh-run"); fresh.mkdirs()
      // the ADVICE-r13 liveness case: a >3 h run's TOP-LEVEL dir goes
      // stale (Spark creates it early) while files deep inside stay
      // fresh — deepest-mtime must keep the whole tree alive
      val live = new java.io.File(root, "live-run")
      val liveLeaf = new java.io.File(live, "blockmgr/leaf"); liveLeaf.mkdirs()
      assert(live.setLastModified(old))
      assert(new java.io.File(live, "blockmgr").setLastModified(old))
      val prev = System.getProperty("java.io.tmpdir")
      try {
        System.setProperty("java.io.tmpdir", root.getAbsolutePath)
        graft.tools.Scratch.sweepStale()
        assert(!stale.exists(), "stale scratch survived the sweep")
        assert(fresh.exists(), "a live run's scratch was swept")
        assert(live.exists(), "a stale-topped tree with fresh leaves was swept")
        // pointed at an on-disk tmpdir, the sweep must be a no-op —
        // /tmp hygiene is the OS's job, and other processes share it
        val disk = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("/tmp"), "graft-disk").toFile
        val old = new java.io.File(disk, "old"); old.mkdirs()
        assert(old.setLastModified(System.currentTimeMillis() - 4L * 3600 * 1000))
        System.setProperty("java.io.tmpdir", disk.getAbsolutePath)
        graft.tools.Scratch.sweepStale()
        assert(old.exists(), "the sweeper touched a non-tmpfs tmpdir")
      } finally System.setProperty("java.io.tmpdir", prev)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(root)
    }
  }
}
