package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke for the CDC path: initialize a bucketed store from the
  * sf0.1 lineitem (~600k rows, composite key), then merge a ~1.2M-row
  * CDC batch (2× updates on every row + deletes + inserts) and a small
  * 10k-row batch, timing each. Dev tool: numbers land in COVERAGE.md.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val keys = Seq("l_orderkey", "l_linenumber")
    val root = Files.createTempDirectory("scale").toString

    val store = time("initial load 600k rows / 64 buckets") {
      graft.sources.BucketedTableStore.create(spark, s"$root/li", keys, li, numBuckets = 64)
    }

    // big batch: every row updated twice (dedup must collapse), 10% deleted
    val big = li.select(col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity") + 1).as("l_quantity"), col("l_extendedprice"),
        col("l_partkey"), col("l_suppkey"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
      .withColumn("Op", when(col("l_orderkey") % 10 === 0, "D").otherwise("U"))
      .withColumn("load_timestamp", to_timestamp(lit("2030-01-01 00:00:00")))
      .withColumn("ingestion_seq", lit(1L))
    val bigDup = big.unionAll(big.withColumn("ingestion_seq", lit(2L))
      .withColumn("l_quantity", col("l_quantity") + 1))

    time("dedup 1.2M-row batch -> 600k") {
      val d = graft.operators.CdcDedup.dedup(bigDup, keys, gate = true).persist()
      println(s"[scale] dedup rows: ${d.count()}")
      time("merge 600k-key batch (touches all 64 buckets)") {
        println(s"[scale] touched: ${store.merge(d)}")
      }
    }
    println(s"[scale] store rows after big merge: ${store.read().count()}")

    // small batch: 10k rows touching few keys
    val small = graft.operators.CdcDedup.dedup(
      bigDup.filter(col("l_orderkey") % 61 === 1), keys, gate = true).persist()
    println(s"[scale] small batch rows: ${small.count()}")
    time("merge 10k-row batch (partition-pruned)") {
      println(s"[scale] touched: ${store.merge(small)}")
    }
    spark.stop()
  }
}
