package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Branch refs over the catalog's shared generation log: isolation of
  * branch commits from main, fast-forward publish (write-audit-publish),
  * non-FF conflict, per-ref crash healing, dropped-branch hygiene, and
  * branch-aware vacuum.
  */
class TableCatalogBranchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshRoot(): String = {
    val d = Files.createTempDirectory("graft-branch-spec").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/cat"
  }

  private def nums(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(_.toLong).toDF("v")
  }

  private def fs: FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  test("branch commits are invisible to main until publishBranch fast-forwards") {
    val cat = new TableCatalog(spark, freshRoot())
    cat.commitAll(Map("t" -> nums(0, 10)), 1000L)
    cat.createBranch("wap")
    assert(cat.branches() == Seq("wap"))
    // branch sees main's state at the branch point
    assert(cat.readRef("wap", "t").count() == 10)
    val bg = cat.commitAllOn("wap", Map("t" -> nums(0, 50)), 2000L)
    assert(bg == 1)
    // isolation: main unchanged, branch advanced
    assert(cat.latestGeneration().contains(0L))
    assert(cat.read("t").count() == 10)
    assert(cat.headOf("wap").contains(1L))
    assert(cat.readRef("wap", "t").count() == 50)
    // publish = fast-forward: main atomically jumps to the branch head
    assert(cat.publishBranch("wap") == 1L)
    assert(cat.latestGeneration().contains(1L))
    assert(cat.read("t").count() == 50)
  }

  test("multi-commit branch publishes as one atomic cut; as-of follows main lineage") {
    val cat = new TableCatalog(spark, freshRoot())
    cat.commitAll(Map("a" -> nums(0, 10), "b" -> nums(0, 10)), 1000L)
    cat.createBranch("audit")
    cat.commitAllOn("audit", Map("a" -> nums(0, 20)), 2000L)
    cat.commitAllOn("audit", Map("b" -> nums(0, 30)), 3000L)
    assert(cat.read("a").count() == 10 && cat.read("b").count() == 10)
    cat.publishBranch("audit")
    // readers see BOTH branch commits at once, never just the first
    assert(cat.read("a").count() == 20 && cat.read("b").count() == 30)
    // generationAsOf walks main's lineage (now through the branch gens)
    assert(cat.generationAsOf(2500L) == 1L)
    assert(cat.generationAsOf(1500L) == 0L)
  }

  test("non-fast-forward publish conflicts without touching main") {
    val cat = new TableCatalog(spark, freshRoot())
    cat.commitAll(Map("t" -> nums(0, 10)), 1000L)
    cat.createBranch("wap")
    cat.commitAllOn("wap", Map("t" -> nums(0, 50)), 2000L)
    // main advances independently — the branch's base is stale
    cat.commitAll(Map("t" -> nums(0, 99)), 3000L)
    intercept[TableCatalog.CommitConflictException] {
      cat.publishBranch("wap")
    }
    assert(cat.read("t").count() == 99, "conflicted publish moved main")
    // recover: re-branch from the new head and replay
    cat.dropBranch("wap")
    cat.createBranch("wap2")
    cat.commitAllOn("wap2", Map("t" -> nums(0, 50)), 4000L)
    cat.publishBranch("wap2")
    assert(cat.read("t").count() == 50)
  }

  test("a typo'd ref cannot silently fork history") {
    val cat = new TableCatalog(spark, freshRoot())
    cat.commitAll(Map("t" -> nums(0, 10)), 1000L)
    intercept[IllegalArgumentException] {
      cat.commitAllOn("no-such-branch", Map("t" -> nums(0, 5)), 2000L)
    }
  }

  test("per-ref crash heal: a branch orphan never yanks main's head") {
    val root = freshRoot()
    val cat = new TableCatalog(spark, root)
    cat.commitAll(Map("t" -> nums(0, 10)), 1000L)
    cat.createBranch("wap")
    cat.commitAllOn("wap", Map("t" -> nums(0, 50)), 2000L)
    // simulate a crash after the branch generation file landed but
    // before the branch pointer swing: rewind the pointer to the
    // branch point (the state the crash window leaves behind)
    val conf = spark.sparkContext.hadoopConfiguration
    fs.delete(new Path(root, "_refs/wap"), false)
    PointerFile.swing(conf, new Path(root),
      new Path(root, "_refs/wap"), "0", "test rewind")
    val fresh = new TableCatalog(spark, root)
    // main must NOT heal onto the branch's generation 1...
    assert(fresh.latestGeneration().contains(0L))
    assert(fresh.read("t").count() == 10)
    // ...but the branch heals forward to its own orphan
    assert(fresh.headOf("wap").contains(1L))
    assert(fresh.readRef("wap", "t").count() == 50)
    // and the next main commit takes a FRESH generation number (no
    // overwrite of the branch's file)
    assert(fresh.commitAll(Map("t" -> nums(0, 11)), 3000L) == 2L)
    assert(fresh.readRef("wap", "t").count() == 50)
  }

  test("dropped branch is dead even though its generations stay logged") {
    val cat = new TableCatalog(spark, freshRoot())
    cat.commitAll(Map("t" -> nums(0, 10)), 1000L)
    cat.createBranch("wap")
    cat.commitAllOn("wap", Map("t" -> nums(0, 50)), 2000L)
    cat.dropBranch("wap")
    assert(cat.branches().isEmpty)
    assert(cat.headOf("wap").isEmpty)
    intercept[IllegalStateException] { cat.readRef("wap", "t") }
    // recreating the name at a point BELOW the dropped generations
    // would resurrect them through the heal — must refuse
    intercept[IllegalArgumentException] { cat.createBranch("wap") }
    // a fresh name is fine
    cat.createBranch("wap2")
    assert(cat.readRef("wap2", "t").count() == 10)
  }

  test("vacuum keeps main's window by lineage and pins live branch heads") {
    val root = freshRoot()
    val cat = new TableCatalog(spark, root)
    cat.commitAll(Map("t" -> nums(0, 10)), 1000L) // g0
    cat.createBranch("slow-audit")
    cat.commitAllOn("slow-audit", Map("t" -> nums(0, 50)), 2000L) // g1
    cat.commitAll(Map("t" -> nums(0, 20)), 3000L) // g2
    cat.commitAll(Map("t" -> nums(0, 30)), 4000L) // g3
    cat.commitAll(Map("t" -> nums(0, 40)), 5000L) // g4
    // main window = {g4, g3}; branch head g1 must survive despite age
    val dropped = cat.vacuum(keepLast = 2)
    assert(dropped == Seq(0L, 2L), dropped.toString)
    assert(cat.read("t").count() == 40)
    assert(cat.readAt(3L, "t").count() == 30)
    assert(cat.readRef("slow-audit", "t").count() == 50)
    // the branch aged past main: publish now is a conflict (its parent
    // chain no longer reaches main's head), never a crash
    intercept[TableCatalog.CommitConflictException] {
      cat.publishBranch("slow-audit")
    }
  }

  test("tags pin a cut through rewrites and vacuum; they never move or take commits") {
    val cat = new TableCatalog(spark, freshRoot())
    cat.commitAll(Map("t" -> nums(0, 10)), 1000L) // g0
    cat.createTag("train-v1")
    assert(cat.tags() == Seq("train-v1") && cat.tagGeneration("train-v1") == 0L)
    cat.commitAll(Map("t" -> nums(0, 20)), 2000L) // g1
    cat.commitAll(Map("t" -> nums(0, 30)), 3000L) // g2
    cat.commitAll(Map("t" -> nums(0, 40)), 4000L) // g3
    // vacuum would drop g0/g1 — the tag pins g0 (and its table data)
    val dropped = cat.vacuum(keepLast = 2)
    assert(dropped == Seq(1L), dropped.toString)
    assert(cat.readTag("train-v1", "t").count() == 10)
    assert(cat.read("t").count() == 40)
    // a tag is not a commit target and cannot be re-pinned
    intercept[IllegalArgumentException] {
      cat.commitAllOn("train-v1", Map("t" -> nums(0, 5)), 5000L)
    }
    intercept[IllegalArgumentException] { cat.createTag("train-v1") }
    // dropping releases the pin: the next vacuum reclaims g0
    cat.dropTag("train-v1")
    assert(cat.vacuum(keepLast = 2).contains(0L))
    intercept[Exception] { cat.readTag("train-v1", "t") }
  }

  test("write-audit-publish: audit rejects on the branch, main never sees bad data") {
    import spark.implicits._
    val cat = new TableCatalog(spark, freshRoot())
    cat.commitAll(Map("t" -> nums(0, 10)), 1000L)
    cat.createBranch("wap")
    // candidate batch carries poison (negative values)
    val poison = Seq(-1L, -2L).toDF("v")
    cat.commitAllOn("wap", Map("t" -> nums(0, 20).unionByName(poison)), 2000L)
    val bad = cat.readRef("wap", "t").filter($"v" < 0).count()
    assert(bad == 2, "audit must see the poison on the branch")
    assert(cat.read("t").filter($"v" < 0).count() == 0,
      "poison leaked to main before publish")
    // audit failed: fix ON the branch, re-audit, then publish
    cat.commitAllOn("wap",
      Map("t" -> cat.readRef("wap", "t").filter($"v" >= 0)), 3000L)
    assert(cat.readRef("wap", "t").filter($"v" < 0).count() == 0)
    cat.publishBranch("wap")
    assert(cat.read("t").count() == 20)
    assert(cat.read("t").filter($"v" < 0).count() == 0)
  }
}
