package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ad-hoc dev probe (contents change per investigation). Current: stage
  * breakdown of d23 fingerprintContainmentPrefix at 500k docs to find
  * the superlinear bend the growth tier surfaced.
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
    val docs = {
      val unique = (0 until 10).map(j =>
        substring(md5(concat(floor(col("id") / 10).cast("long").cast("string"),
          lit(s"_f$j"))), 1, 7))
      val tailLit = lit("universal boilerplate tail shared by every single document")
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", (unique :+ tailLit): _*).as("text"))
    }.repartition(32).persist()
    docs.count()

    val k = 16; val w = 4; val threshold = 0.8
    val fps = docs.select(col("doc_id").as("id"),
      explode(graft.functions.WinnowedFingerprint(col("text"), k, w)).as("fp"))
      .persist()
    t("fps explode + persist")(println(s"[probe]   fps rows: ${fps.count()}"))
    val dfs = fps.groupBy("fp").agg(count(lit(1)).as("__df"))
    t("dfs agg")(println(s"[probe]   distinct fps: ${dfs.count()}"))
    val sizes = fps.groupBy("id").agg(count(lit(1)).as("n_fp"))
    val win = Window.partitionBy(col("id")).orderBy(col("__df"), col("fp"))
    val prefix = fps.join(dfs, "fp")
      .withColumn("__rk", row_number().over(win))
      .join(sizes, "id")
      .filter(col("__rk") <= floor((lit(1.0) - threshold) * col("n_fp") + 1e-6) + 1)
      .select(col("id").as("id_p"), col("fp"))
      .persist()
    t("prefix window")(println(s"[probe]   prefix rows: ${prefix.count()}"))
    val candidates = prefix
      .join(fps.select(col("id").as("id_oth"), col("fp")), "fp")
      .filter(col("id_p") =!= col("id_oth"))
      .select(least(col("id_p"), col("id_oth")).as("id_a"),
        greatest(col("id_p"), col("id_oth")).as("id_b"))
      .distinct()
      .persist()
    t("candidate join + distinct")(println(s"[probe]   candidates: ${candidates.count()}"))
    val pairFps = fps.join(candidates, col("id") === col("id_a"))
      .select(col("id_a"), col("id_b").as("__cand_b"), col("fp").as("__cand_fp"))
    val inter = fps.join(pairFps,
        col("id") === col("__cand_b") && col("fp") === col("__cand_fp"))
      .select(col("id_a"), col("__cand_b").as("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    t("verification joins + agg")(println(s"[probe]   inter rows: ${inter.count()}"))
    spark.stop()
  }
}
