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
    } else if (args(0) == "dump") {
      // subset of the Verify dump for fast oracle iteration:
      // runMain graft.tools.Scratch dump <n1,n2,...> <sfDir> <outDir>
      val names = args(1).split(",").toSeq
      val Seq(sfDir, outDir) = args.slice(2, 4).toSeq
      new java.io.File(outDir).mkdirs()
      names.foreach { name =>
        graft.SparkEntry.queries(name)(spark, sfDir)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      def q(s: String): String = "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      val json = names.map(n => s"${q(n)}: ${q(graft.SparkEntry.oracleSql(n))}")
        .mkString("{", ",", "}")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
      println(s"[dump] wrote ${names.size} results to $outDir")
    } else if (args(0) == "ivf") {
      // sub-step timing for s03: where do the seconds go on a tiny table?
      val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
      graft.SparkEntry.queries("s03_ann_ivf")(spark, dir).count() // warm
      spark.catalog.clearCache()
      def time(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"[ivf] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      time("derivedPlanes(8)") {
        graft.queries.DataPipelineQueries.derivedPlanes(spark, dir, 8)
      }
      time("full s03 run") {
        graft.SparkEntry.queries("s03_ann_ivf")(spark, dir).count()
      }
      spark.catalog.clearCache()
      time("derivedPlanes again") {
        graft.queries.DataPipelineQueries.derivedPlanes(spark, dir, 8)
      }
      // per-job wall clock: which jobs inside the run are slow?
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(j.jobId, System.nanoTime())
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = jobs.getOrDefault(j.jobId, 0L)
          println(f"[ivf-job] job ${j.jobId}: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      })
      time("full s03 run (job-instrumented)") {
        graft.SparkEntry.queries("s03_ann_ivf")(spark, dir).count()
      }
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
