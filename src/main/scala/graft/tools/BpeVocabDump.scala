package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.BpeInduction
import graft.queries.PlatformQueries

/** Prints the d43 tokenizer's learned vocab as a DuckDB VALUES
  * relation — run once whenever the fixed training corpus or merge
  * count changes, and paste the output into `PlatformQueries.d43_sql`.
  */
object BpeVocabDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val (merges, vocab) = BpeInduction.train(
      PlatformQueries.BpeTrainCorpus.toDF("text"), "text",
      k = PlatformQueries.BpeMerges)
    println(s"-- merges learned: ${merges.size}")
    merges.foreach(m => println(s"--   ${m.left} + ${m.right} (${m.pairCount})"))
    val rows = vocab.collect().sortBy(_.word)
      .map(sw => s"('${sw.word}', ${sw.syms.size})")
    println("VALUES " + rows.mkString(", "))
    spark.stop()
  }
}
