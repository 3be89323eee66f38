package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc dev probe (contents change per investigation). Current:
  * d19 containmentPairsPrefix at the 500k growth tier, string-exact
  * verification vs the hashedVerification policy flag — the
  * pair-shingles relation is the operator's dominant shuffle and the
  * flag shrinks its key from the shingle string to 8 bytes.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.headOption.map(_.toInt).getOrElse(500000)
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // the growth tier's d19 corpus: universal 12-word boilerplate tail
    val docs = {
      val unique = (0 until 12).map(j =>
        substring(md5(concat(floor(col("id") / 10).cast("long").cast("string"),
          lit(s"_u$j"))), 1, 7))
      val boiler = (0 until 12).map(j => lit(s"boiler$j"))
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", (unique ++ boiler): _*).as("text"))
    }.repartition(32).persist()
    docs.count()
    Seq(true, false).foreach { hashed =>
      graft.operators.CacheScope.scoped { implicit cs =>
        t(s"d19 $n docs, hashedVerification=$hashed") {
          println(s"[probe]   directed pairs: " + graft.operators.TextDedup
            .containmentPairsPrefix(docs, "doc_id", "text",
              hashedVerification = hashed).count())
        }
      }
      spark.catalog.clearCache()
      docs.persist().count() // re-pin the corpus after the clear
    }
    spark.stop()
  }
}
