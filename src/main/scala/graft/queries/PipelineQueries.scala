package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.config.TableKeys
import graft.pipeline.CdcPipeline

/** Driver-checked end-to-end run of the CDC *file* pipeline: the full
  * reference transaction (S3 file → route → stage+ingestion_seq → evolve →
  * dedup → bucketed MERGE → ledger) with the same oracle as the in-memory
  * q17 path — proving file routing, file-row-order ingestion_seq and the
  * bucket-store swap produce identical results.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  val q18_cdc_pipeline_file: Q = (s, dir) => {
    val root = Files.createTempDirectory("graft-q18").toString
    val keys = TableKeys.parse("""{"orders": "o_orderkey"}""")
    val pipe = new CdcPipeline(s, s"$root/store", keys, numBuckets = 16, pathRoot = "fair")

    // full load (the reference's LOAD*/initial path)
    pipe.initialLoad("orders", Tables(s, dir, "orders"))

    // write the synthetic CDC batch as ONE real parquet file, rows ordered
    // (o_orderkey, seq) so file row order encodes the binlog order that
    // ingestion_seq must reproduce (W3 semantics, handler.py:521-527)
    val batch = CoreQueries.syntheticOrdersCdc(s, dir)
      .orderBy(col("o_orderkey"), col("ingestion_seq"))
      .drop("ingestion_seq")
    val tmpOut = s"$root/raw"
    batch.coalesce(1).write.parquet(tmpOut)
    val part = new java.io.File(tmpOut).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val fileKey = new java.io.File(s"$root/fair/orders/2030/01/01/batch-001.parquet")
    fileKey.getParentFile.mkdirs()
    Files.move(part.toPath, fileKey.toPath)

    val outcome = pipe.processFile(fileKey.toString)
    outcome match {
      case CdcPipeline.Applied(_, _, _) => ()
      case other => throw new IllegalStateException(s"pipeline outcome: $other")
    }
    pipe.storeFor("orders", Seq("o_orderkey")).read()
      .orderBy(col("o_orderkey"))
  }

  val queries: Map[String, Q] = Map(
    "q18_cdc_pipeline_file" -> q18_cdc_pipeline_file)

  /** Same end state as the in-memory merge path. */
  val oracles: Map[String, String] = Map(
    "q18_cdc_pipeline_file" -> CoreQueries.q17_sql)
}
