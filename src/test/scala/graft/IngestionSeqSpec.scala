package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CdcDedup

/** SURVEY §7.4 risk 1: `ingestion_seq` must equal the Parquet file row
  * order even when the file has many row groups and the scan splits it
  * across tasks — the binlog-order guarantee the whole dedup cascade
  * rests on (reference: handler.py:5-10, 521-527).
  */
class IngestionSeqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("row_index survives multi-row-group files and split scans") {
    import spark.implicits._
    val dir = Files.createTempDirectory("seq").toString
    val n = 200000
    // small row groups force many groups in one file
    (0 until n).map(i => (i.toLong, s"payload-$i"))
      .toDF("expected_seq", "payload")
      .coalesce(1)
      .write.option("parquet.block.size", 64 * 1024)
      .parquet(s"$dir/out")
    val part = new java.io.File(s"$dir/out").listFiles()
      .find(_.getName.endsWith(".parquet")).get

    // tiny split size so one file maps to many scan tasks
    val old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (256 * 1024).toString)
      val df = CdcDedup.readCdcFiles(spark, Seq(part.getAbsolutePath))
      val mismatches = df
        .filter(col("ingestion_seq") =!= col("expected_seq")).count()
      assert(mismatches == 0L)
      assert(df.count() == n)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", old)
  }
}
