package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZInterleave

/** Compaction: many small files → few range-laid-out files, data
  * preserved exactly, per-file key ranges disjoint (the property that
  * makes footer min/max stats prune), Z-order key composition.
  */
class CompactionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft-compact").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/t"
  }

  test("compaction shrinks file count, preserves rows, files cover disjoint key ranges") {
    import spark.implicits._
    val dir = freshDir()
    // simulate a micro-batch writer: 50 tiny appends
    (0 until 50).foreach { b =>
      (0 until 40).map(i => (b * 40 + i).toLong).toDF("k")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val before = spark.read.parquet(dir)
      .select(input_file_name()).distinct().count()
    assert(before >= 50)

    val rep = Compaction.compact(spark, dir, col("k"), targetRows = 500)
    assert(rep.rows == 2000)
    assert(rep.filesBefore >= 50 && rep.filesAfter <= 5)

    val back = spark.read.parquet(dir)
    assert(back.count() == 2000)
    assert(back.agg(sum("k")).head().getLong(0) == (0L until 2000L).sum)

    // disjoint per-file ranges: sort by lo, each hi < next lo
    val ranges = Compaction.fileKeyRanges(spark, dir, "k").sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2, s"overlap: $hi >= $lo2")
      case _ =>
    }
  }

  test("z-order compaction: every file bounds BOTH dimensions") {
    import spark.implicits._
    val dir = freshDir()
    // 2-d grid in row-major order: a naive single-dim sort would leave
    // the second dimension unbounded per file
    (0 until 64).flatMap(x => (0 until 64).map(y => (x, y)))
      .toDF("x", "y")
      .coalesce(1).write.mode("overwrite").parquet(dir)

    Compaction.compact(spark, dir,
      ZInterleave(col("x"), col("y")), targetRows = 256)

    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    assert(spans.length >= 8)
    // 4096 rows / 256-row files = 16 files = 16 Morton tiles of 16x16
    spans.foreach { case (xs, ys) =>
      assert(xs <= 16 && ys <= 16, s"file spans ($xs, $ys) — not Z-clustered")
    }
  }

  test("partition-wise compaction touches only hot partitions, preserves all rows") {
    import spark.implicits._
    val dir = freshDir()
    // cold partition: one append; hot partition: 30 small appends
    (0 until 100).map(i => (i.toLong, "cold")).toDF("k", "p")
      .coalesce(1).write.partitionBy("p").mode("append").parquet(dir)
    (0 until 30).foreach { b =>
      (0 until 20).map(i => ((b * 20 + i).toLong, "hot")).toDF("k", "p")
        .coalesce(1).write.partitionBy("p").mode("append").parquet(dir)
    }
    val coldFilesBefore = spark.read.parquet(dir).filter($"p" === "cold")
      .select(input_file_name()).distinct().collect().map(_.getString(0)).toSet

    val reports = Compaction.compactPartitions(spark, dir, col("k"),
      targetRows = 300L, minFiles = 5)
    assert(reports.size == 1 && reports.keys.head.endsWith("p=hot"))
    assert(reports.values.head.rows == 600 && reports.values.head.filesAfter <= 2)

    val back = spark.read.parquet(dir)
    assert(back.count() == 700)
    // cold partition files untouched (same physical files serve it)
    val coldFilesAfter = back.filter($"p" === "cold")
      .select(input_file_name()).distinct().collect().map(_.getString(0)).toSet
    assert(coldFilesAfter == coldFilesBefore)
  }

  test("crash before swap-in leaves the original table readable") {
    import spark.implicits._
    val dir = freshDir()
    (0 until 100).map(_.toLong).toDF("k")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // simulate the pre-swap state: tmp exists, live untouched
    val p = new org.apache.hadoop.fs.Path(dir)
    (0 until 100).map(_.toLong).toDF("k")
      .write.mode("overwrite").parquet(
        new org.apache.hadoop.fs.Path(p.getParent,
          "." + p.getName + "._compact_tmp").toString)
    assert(spark.read.parquet(dir).count() == 100)
    // a subsequent compaction clears the leftover tmp and succeeds
    val rep = Compaction.compact(spark, dir, col("k"), targetRows = 50)
    assert(rep.rows == 100 && spark.read.parquet(dir).count() == 100)
  }
}
