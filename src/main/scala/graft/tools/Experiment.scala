package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Throwaway perf probes; not part of the library surface. */
object Experiment {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = (0 to 1).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"[exp] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }

    val d = Tables(spark, dir, "documents")
    def grams(df: DataFrame) =
      df.select(explode(TextFunctions.wordNgramsAll(col("text"), 2)).as("gram"))

    time("explode only")(grams(d).count())
    time("explode+agg")(grams(d).groupBy("gram").count().count())
    time("explode+agg+topk")(
      grams(d).groupBy(col("gram")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("gram")).limit(100).count())
    time("repartitioned explode+agg+topk")(
      grams(d.repartition(32)).groupBy(col("gram")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("gram")).limit(100).count())
    spark.stop()
  }
}
