package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop profiling entry; not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the driver's t1 smoke: entry() on sf0.001 must return rows
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows: $n")
    require(n > 0)
    spark.stop()
  }
}
