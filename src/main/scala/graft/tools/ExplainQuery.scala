package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` of named SparkEntry queries to files —
  * the before/after plan evidence for optimization rounds. Usage:
  * `runMain graft.tools.ExplainQuery <sfDir> <outDir> <suffix> <query...>`
  * writes `<outDir>/<query>_<suffix>.txt` per query. Dev tool only.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    require(args.length > 3,
      "usage: ExplainQuery <sfDir> <outDir> <suffix> <query...>")
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    args.drop(3).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"[explain] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
