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
    val dir = "/root/testdata/sf0.01"

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[time] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val staging = time("build staging")(graft.queries.CoreQueries.syntheticOrdersCdc(spark, dir).persist())
    time("staging count")(println(staging.count()))
    val dedup = time("dedup")(graft.operators.CdcDedup.dedup(staging, Seq("o_orderkey"), gate = true))
    time("dedup count")(println(dedup.count()))
    val target = graft.Tables(spark, dir, "orders")
    val merged = time("merge plan")(graft.operators.CdcMerge(target, dedup, Seq("o_orderkey")))
    merged.explain("formatted")
    time("merge count")(println(merged.count()))
    time("merge count again")(println(merged.count()))
    spark.stop()
  }
}
