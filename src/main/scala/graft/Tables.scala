package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-generated testdata tables (see TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark has no native
      // type for — read the raw int64 nanos and truncate to microseconds
      // (integer division: ns epochs exceed double's exact range).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path)
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    } else spark.read.parquet(path)
  }
}
