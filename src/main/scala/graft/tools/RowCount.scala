package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the row count of named SparkEntry queries at a data dir — the
  * dev-loop half of the oracle gate (compare against a DuckDB count
  * before committing a new query, without a full Verify pass).
  * Usage: `runMain graft.tools.RowCount <sfDir> <query...>`
  */
object RowCount {
  def main(args: Array[String]): Unit = {
    require(args.length > 1, "usage: RowCount <sfDir> <query...>")
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      println(s"[rows] $name ${graft.SparkEntry.queries(name)(spark, sfDir).count()}")
    }
    spark.stop()
  }
}
