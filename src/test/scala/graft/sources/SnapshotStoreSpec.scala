package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SnapshotStore: snapshot isolation (readers pin a generation),
  * time travel by version and timestamp, crash-heal pointer rule,
  * retention.
  */
class SnapshotStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshStore(): SnapshotStore = {
    val d = Files.createTempDirectory("graft-snap").toFile
    d.deleteOnExit()
    new SnapshotStore(spark, d.getAbsolutePath + "/t")
  }

  private def gen(n: Int, tag: Long) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, tag)).toDF("k", "generation")
  }

  test("commits are versioned; latest, by-version, and as-of reads resolve correctly") {
    val st = freshStore()
    assert(st.latestVersion().isEmpty)
    assert(st.commit(gen(10, 1L), commitTsMillis = 1000L) == 0L)
    assert(st.commit(gen(20, 2L), commitTsMillis = 2000L) == 1L)
    assert(st.commit(gen(30, 3L), commitTsMillis = 3000L) == 2L)

    assert(st.readLatest().count() == 30)
    assert(st.read(0).agg(max("generation")).head().getLong(0) == 1L)
    assert(st.read(1).count() == 20)
    // as-of: between commits resolves to the earlier one; exact ts inclusive
    assert(st.asOf(2500L).agg(max("generation")).head().getLong(0) == 2L)
    assert(st.asOf(2000L).agg(max("generation")).head().getLong(0) == 2L)
    assert(st.asOf(999999L).count() == 30)
    intercept[IllegalArgumentException](st.asOf(500L))
    assert(st.history().map(_._3) == Seq(10L, 20L, 30L))
  }

  test("snapshot isolation: a reader's generation is immutable across a new commit") {
    val st = freshStore()
    st.commit(gen(10, 1L), 1000L)
    val pinned = st.readLatest() // reader resolves v=0
    st.commit(gen(50, 2L), 2000L)
    // the pinned plan still scans the old immutable directory
    assert(pinned.count() == 10)
    assert(st.readLatest().count() == 50)
  }

  test("crash-heal: missing pointer falls back to newest logged version") {
    val st = freshStore()
    st.commit(gen(10, 1L), 1000L)
    st.commit(gen(20, 2L), 2000L)
    // simulate a crash inside the pointer's delete-rename window
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val root = st.readLatest().inputFiles.head
      .replaceAll("/v=1/.*", "").replaceAll("^file:", "")
    fs.delete(new org.apache.hadoop.fs.Path(root, "_latest"), false)
    assert(st.latestVersion().contains(1L))
    assert(st.readLatest().count() == 20)
  }

  test("schema evolution across generations: each snapshot keeps ITS schema") {
    import spark.implicits._
    val st = freshStore()
    st.commit(Seq((1L, "a")).toDF("k", "v"), 1000L)
    st.commit(Seq((1L, "a", 9L), (2L, "b", 8L)).toDF("k", "v", "extra"), 2000L)
    // old generation reads with the old 2-column schema
    assert(st.read(0).schema.fieldNames.toSeq == Seq("k", "v"))
    assert(st.readLatest().schema.fieldNames.toSeq == Seq("k", "v", "extra"))
    assert(st.asOf(1500L).schema.length == 2)
    assert(st.readLatest().agg(sum("extra")).head().getLong(0) == 17L)
  }

  test("retention expires old generations but never the current one") {
    val st = freshStore()
    (1 to 4).foreach(i => st.commit(gen(i * 10, i.toLong), i * 1000L))
    val expired = st.expireSnapshots(keep = 2)
    assert(expired == Seq(0L, 1L))
    assert(st.loggedVersions() == Seq(2L, 3L))
    assert(st.readLatest().count() == 40)
    assert(st.read(2).count() == 30)
    intercept[IllegalArgumentException](st.read(0))
  }
}
