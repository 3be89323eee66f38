package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Timed runs per query; the reported figure is the median, so a single
    * contended run (another process stealing the box mid-bench) cannot
    * poison a round's numbers — the outlier stays visible in `runs`.
    */
  private val Runs = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state measurement: run every query once untimed first, at
    // the target scale factor, then time the later passes. The first pass
    // absorbs one-time plan codegen/classloading (AQE picks different
    // physical plans per data size, so warming at a smaller SF compiles
    // the wrong generated classes); the cache is cleared between runs so
    // every timed pass still performs all data work.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache() // drop per-query persists between runs
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val runs = (1 to Runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      name -> runs
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + median(v) }
      .mkString("{", ",", "}")
    val rs = results.map { case (k, v) =>
      "\"" + k + "\":" + v.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.values.map(median).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$rs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
