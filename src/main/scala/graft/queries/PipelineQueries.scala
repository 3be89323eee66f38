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

  /** The synthetic CDC input file is INPUT DATA, not
    * pipeline-under-test: it is deterministic for a given testdata dir
    * (syntheticOrdersCdc + total (o_orderkey, seq) order), so it is
    * built once per (dir) and reused — exactly like the driver-generated
    * parquet tables themselves. The store, ledger and merge state stay
    * per-run fresh (a rerun on the same store would ledger-skip).
    * `-v2` versions the generator; bump if syntheticOrdersCdc changes
    * (v2: insert/delete key offsets moved to the billions so they stay
    * disjoint from MakeSf1's copy-shifted keyspace).
    */
  private def batchFixture(s: SparkSession, dir: String): java.io.File = {
    val root = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft-q18-fixture-v2-${math.abs(dir.hashCode)}")
    val fileKey = new java.io.File(s"$root/fair/orders/2030/01/01/batch-001.parquet")
    if (fileKey.isFile) return fileKey
    // ONE real parquet file, rows totally ordered (o_orderkey, seq) so
    // file row order encodes the binlog order that ingestion_seq must
    // reproduce (W3 semantics, handler.py:521-527). repartition(1) +
    // sortWithinPartitions gives the same total order as a global sort
    // without the range-sampling pass.
    val tmpOut = Files.createTempDirectory("graft-q18-raw").toString
    CoreQueries.syntheticOrdersCdc(s, dir)
      .repartition(1)
      .sortWithinPartitions(col("o_orderkey"), col("ingestion_seq"))
      .drop("ingestion_seq")
      .write.mode("overwrite").parquet(tmpOut)
    val part = new java.io.File(tmpOut).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    fileKey.getParentFile.mkdirs()
    // atomic landing: a half-written fixture must never be readable
    Files.move(part.toPath, fileKey.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    fileKey
  }

  val q18_cdc_pipeline_file: Q = (s, dir) => {
    val root = Files.createTempDirectory("graft-q18").toString
    val keys = TableKeys.parse("""{"orders": "o_orderkey"}""")
    val pipe = new CdcPipeline(s, s"$root/store", keys, numBuckets = 16, pathRoot = "fair")

    // full load (the reference's LOAD*/initial path)
    pipe.initialLoad("orders", Tables(s, dir, "orders"))

    val fileKey = batchFixture(s, dir)
    val outcome = pipe.processFile(fileKey.toString)
    outcome match {
      case CdcPipeline.Applied(_, _, _) => ()
      case other => throw new IllegalStateException(s"pipeline outcome: $other")
    }
    // readTable: the complete state under adaptive merge — the q18
    // batch scatters over every bucket, so it routes to the MoR side
    pipe.readTable("orders")
      .orderBy(col("o_orderkey"))
  }

  val queries: Map[String, Q] = Map(
    "q18_cdc_pipeline_file" -> q18_cdc_pipeline_file)

  /** Same end state as the in-memory merge path. */
  val oracles: Map[String, String] = Map(
    "q18_cdc_pipeline_file" -> CoreQueries.q17_sql)
}
