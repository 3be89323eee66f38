package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop profiling entry; not part of the library surface.
  * `runMain graft.tools.Scratch <queryName> [sfDir]` times one
  * SparkEntry query (warm pass + 2 timed); no args = the driver's
  * entry() smoke.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.isEmpty) {
      // the driver's t1 smoke: entry() on sf0.001 must return rows
      val n = graft.SparkEntry.entry(spark).count()
      println(s"[smoke] entry rows: $n")
      require(n > 0)
    } else {
      val name = args(0)
      val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
      val fn = graft.SparkEntry.queries(name)
      (0 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"[scratch] $name run $i: $dt%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
