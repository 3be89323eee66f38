package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-loop profiling entry; not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[time] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm plan shapes at sf0.001
    graft.queries.DataPipelineQueries.d03_minhash_lsh(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()

    val corpus = graft.queries.DataPipelineQueries.dupDocCorpus(spark, dir)
    val sh = graft.operators.TextDedup.shingles(corpus, "doc_id", "text", 3).persist()
    time("1 sh materialize")(sh.count())
    val sigs = sh.groupBy("id").agg(graft.functions.MinHashAgg(col("shingle"), 128).as("sig"))
    time("2 sigs")(sigs.count())
    val bk = graft.operators.TextDedup.lshBands(corpus, "doc_id", "text", 3, 128, 32).persist()
    time("3 bands materialize")(bk.count())
    val cand = bk.as("a").join(bk.as("b"),
      col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct().persist()
    time("4 candidates")(cand.count())
    spark.catalog.clearCache()
    time("5 full d03 fresh")(graft.queries.DataPipelineQueries.d03_minhash_lsh(spark, dir).count())
    spark.stop()
  }
}
