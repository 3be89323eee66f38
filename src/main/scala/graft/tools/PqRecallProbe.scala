package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.VectorSearch
import graft.queries.DataPipelineQueries.derivedPlanes

/** Scratch: overlap@10 with the exact cosine ranking — slice-derived
  * vs k-means-trained PQ codebooks (s14 vs s20).
  */
object PqRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val e = Tables(spark, dir, "embeddings")
      val planes = derivedPlanes(spark, dir, 8)
      val sliceBooks = (0 until 4).map(sub => planes.map(_.slice(sub * 16, sub * 16 + 16)))
      val trainedBooks = (0 until 4).map { sub =>
        VectorSearch.quantizedKMeansModel(
          e.select(col("vec_id"), slice(col("embedding"), sub * 16 + 1, 16).as("embedding")),
          "vec_id", "embedding", k = 8, iters = 3)
      }
      val q = e.filter(col("vec_id") < 5)
      def sets(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "id").collect().map(r => r.getLong(0) -> r.getLong(1))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val exact = sets(VectorSearch.bruteForceTopK(e, q, "vec_id", "embedding", "vec_id", 10))
      def overlap(books: Seq[Seq[Seq[Double]]], residual: Boolean = false) = {
        val enc = VectorSearch.encodeIvfPq(e, "vec_id", "embedding",
          planes, books, residual = residual)
        val got = sets(VectorSearch.searchIvfPq(enc, q, "vec_id", "embedding",
          planes, books, 10, 2, residual = residual))
        exact.keys.toSeq.map(k => (got.getOrElse(k, Set.empty[Long]) & exact(k)).size).sum.toDouble /
          (exact.size * 10)
      }
      val centsLit = typedLit(planes.map(_.toArray).toArray)
      val resid = VectorSearch.assignCells(e, "vec_id", "embedding", planes)
        .select(col("id").as("vec_id"),
          zip_with(col("__vec").cast("array<double>"),
            element_at(centsLit, col("cell") + 1), (a, b) => a - b).as("embedding"))
      val residBooks = (0 until 4).map { sub =>
        VectorSearch.quantizedKMeansModel(
          resid.select(col("vec_id"), slice(col("embedding"), sub * 16 + 1, 16).as("embedding")),
          "vec_id", "embedding", k = 8, iters = 3)
      }
      println(f"$dir slice=${overlap(sliceBooks)}%.2f trained=${overlap(trainedBooks)}%.2f " +
        f"residual-slice=${overlap(sliceBooks, residual = true)}%.2f " +
        f"residual-trained=${overlap(residBooks, residual = true)}%.2f")
    }
    spark.stop()
  }
}
