package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-skipping index: point lookups touch one file of many, absent
  * keys inside the global range are killed by the Bloom probe with
  * ZERO file reads, and lookups through the index are exact.
  */
class FileSkipIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // key-sorted 8-file layout over even keys 0,2,...,19998
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-skipidx").toFile
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/t"
    spark.range(10000)
      .select((col("id") * 2).as("k"), (col("id") % 97).as("v"))
      .repartitionByRange(8, col("k"))
      .write.mode("overwrite").parquet(path)
    path
  }

  private lazy val index = FileSkipIndex.build(spark, dir, "k",
    expectedKeysPerFile = 10000L).persist()

  test("index has one row per file with tight disjoint ranges") {
    val rows = index.orderBy("min_key").collect()
    assert(rows.length == 8)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_key") < b.getAs[Long]("min_key"))
    }
  }

  test("a present key admits exactly one file; lookup is exact") {
    for (key <- Seq(0L, 4242L, 19998L)) {
      assert(FileSkipIndex.candidateFiles(index, key).size == 1)
      val hit = FileSkipIndex.lookup(spark, index, dir, "k", key).collect()
      assert(hit.length == 1 && hit.head.getAs[Long]("k") == key)
      assert(hit.head.getAs[Long]("v") == (key / 2) % 97)
    }
  }

  test("an absent key INSIDE the global range reads zero files (Bloom kill)") {
    // odd keys never exist but sit inside [0, 19998] — min/max alone
    // would admit a file; the Bloom probe must reject
    val absent = Seq(1L, 4243L, 9999L)
    val admitted = absent.map(FileSkipIndex.candidateFiles(index, _).size).sum
    assert(admitted == 0, s"bloom admitted $admitted files for absent keys")
    assert(FileSkipIndex.lookup(spark, index, dir, "k", 4243L).isEmpty)
  }

  test("a key outside the global range reads zero files (range kill)") {
    assert(FileSkipIndex.candidateFiles(index, -5L).isEmpty)
    assert(FileSkipIndex.candidateFiles(index, 1000000L).isEmpty)
  }

  test("a narrow range opens ~1 file; a quarter-span range ~2; both are exact") {
    // keys are 0,2,..,19998 across 8 range files of ~1250 keys each
    for ((lo, hi, maxFiles) <- Seq((5000L, 5100L, 2), (0L, 4998L, 3))) {
      val admitted = FileSkipIndex.candidateFilesRange(index, lo, hi).size
      assert(admitted >= 1 && admitted <= maxFiles,
        s"[$lo,$hi] admitted $admitted files")
      val got = FileSkipIndex.rangeScan(spark, index, dir, "k", lo, hi)
        .orderBy("k").collect().map(_.getAs[Long]("k"))
      val expect = (lo to hi).filter(_ % 2 == 0)
      assert(got.toSeq == expect, s"range [$lo,$hi] rows wrong")
    }
  }

  test("a range beyond the global max reads zero files") {
    assert(FileSkipIndex.candidateFilesRange(index, 20000L, 30000L).isEmpty)
    assert(FileSkipIndex.rangeScan(spark, index, dir, "k", 20000L, 30000L).isEmpty)
    // and a range BELOW the min
    assert(FileSkipIndex.candidateFilesRange(index, -100L, -1L).isEmpty)
  }

  test("boundary keys are inclusive on both ends") {
    val got = FileSkipIndex.rangeScan(spark, index, dir, "k", 2500L, 5000L)
      .agg(min("k"), max("k"), count(lit(1))).head()
    assert(got.getLong(0) == 2500L && got.getLong(1) == 5000L)
    assert(got.getLong(2) == 1251L)
  }
}
