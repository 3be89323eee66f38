package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (see TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    if (name == "events") {
      // events.ts arrives as either TIMESTAMP(NANOS) parquet (early
      // testdata generations — no native Spark type, so read the raw
      // int64 nanos and truncate) or plain µs TIMESTAMP_NTZ (round-7
      // testdata). Normalize both to session-TZ TIMESTAMP (UTC
      // everywhere), microsecond precision — the type every consumer
      // and oracle assumes.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path)
      raw.schema("ts").dataType match {
        case LongType => // nanos epochs exceed double's exact range: integer division
          raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        case TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(path)
  }

  /** Streaming read of the events table with the SAME ts normalization
    * as the batch loader — one definition so the batch/stream
    * equivalence specs can't diverge on the encoding dispatch.
    */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}
