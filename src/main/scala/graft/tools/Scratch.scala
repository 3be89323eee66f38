package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc dev probe (contents change per investigation). Current:
  * q18 adaptive-merge routing — replay the pipeline steps and print
  * the probe, route, side-store state, and readTable count.
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
    val dir = "/root/testdata/sf0.01"
    import graft.operators.MergePlanner
    val staging = graft.queries.CoreQueries.syntheticOrdersCdc(spark, dir)
    val dedup = graft.operators.CdcDedup.dedup(staging, Seq("o_orderkey"), gate = true)
    println(s"[scratch] dedup rows: ${dedup.count()}")
    println(s"[scratch] dedup ops: ${dedup.groupBy("Op").count().collect().mkString(", ")}")
    val p = MergePlanner.probe(dedup, Seq("o_orderkey"), 16)
    println(s"[scratch] probe: $p touchedFrac=${p.touchedFrac(16)}")
    println(s"[scratch] choose: ${MergePlanner.choose(p, 16)}")
    // now the actual pipeline
    val root = java.nio.file.Files.createTempDirectory("graft-scratch").toString
    val keys = graft.config.TableKeys.parse("""{"orders": "o_orderkey"}""")
    val pipe = new graft.pipeline.CdcPipeline(spark, s"$root/store", keys,
      numBuckets = 16, pathRoot = "fair")
    pipe.initialLoad("orders", graft.Tables(spark, dir, "orders"))
    val side = pipe.morSideFor("orders", Seq("o_orderkey"))
    println(s"[scratch] side empty pre: ${side.isEmpty}")
    // rebuild the q18 fixture file inline (batchFixture is private)
    val tmpOut = java.nio.file.Files.createTempDirectory("graft-scratch-raw").toString
    graft.queries.CoreQueries.syntheticOrdersCdc(spark, dir)
      .repartition(1)
      .sortWithinPartitions(col("o_orderkey"), col("ingestion_seq"))
      .drop("ingestion_seq")
      .write.mode("overwrite").parquet(tmpOut)
    val part = new java.io.File(tmpOut).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val fileKey = new java.io.File(s"$root/in/fair/orders/2030/01/01/batch-001.parquet")
    fileKey.getParentFile.mkdirs()
    java.nio.file.Files.move(part.toPath, fileKey.toPath)
    val outcome = pipe.processFile(fileKey.toString)
    println(s"[scratch] outcome: $outcome")
    println(s"[scratch] side empty post: ${side.isEmpty}")
    if (!side.isEmpty) {
      println(s"[scratch] side gens: ${side.generations()}")
      println(s"[scratch] side net: ${side.netChanges().count()}")
    }
    println(s"[scratch] home count: ${pipe.storeFor("orders", Seq("o_orderkey")).read().count()}")
    println(s"[scratch] readTable count: ${pipe.readTable("orders").count()}")
    println("[scratch] m-group sizes: " + staging
      .groupBy(pmod(col("o_orderkey"), lit(10)).as("m"), col("Op"))
      .count().orderBy(col("m"), col("Op")).collect().mkString(", "))
    // reference: the static CoW merge on a fresh store
    val pipe2 = new graft.pipeline.CdcPipeline(spark, s"$root/store2", keys,
      numBuckets = 16, pathRoot = "fair", adaptiveMerge = false)
    pipe2.initialLoad("orders", graft.Tables(spark, dir, "orders"))
    val st2 = pipe2.storeFor("orders", Seq("o_orderkey"))
    st2.merge(dedup, "Op", Seq("D"))
    val staticRes = st2.read()
    println(s"[scratch] static merge count: ${staticRes.count()}")
    val adaptive = pipe.readTable("orders")
    println("[scratch] static-only keys: " + staticRes.select("o_orderkey")
      .exceptAll(adaptive.select("o_orderkey")).limit(5).collect().mkString(", "))
    println("[scratch] adaptive-only keys: " + adaptive.select("o_orderkey")
      .exceptAll(staticRes.select("o_orderkey")).limit(5).collect().mkString(", "))
    spark.stop()
  }
}
