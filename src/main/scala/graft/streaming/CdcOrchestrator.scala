package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.config.TableKeys

/** Multi-table CDC orchestration: one streaming query per configured
  * table, all sharing the session.
  *
  * This is the reference's concurrency model made explicit
  * (reference: FIX_TRANSACTION_CONFLICTS.md:9-15, 210-245 — tables
  * proceed in parallel, writes to one table are serialized): each table
  * gets its own stream+checkpoint, so per-table ordering is guaranteed by
  * the single `foreachBatch` writer while tables run concurrently on the
  * shared scheduler. Null-PK tables are skipped, mirroring
  * `get_table_keys` (handler.py:710-729).
  */
object CdcOrchestrator {

  final case class Running(table: String, query: StreamingQuery)

  /** Start one [[CdcStream]] per keyed table in `tableKeys`.
    *
    * @param schemas  per-table source schema (file streams need a fixed
    *                 schema up front)
    */
  def startAll(
      spark: SparkSession,
      root: String,
      storeRoot: String,
      checkpointRoot: String,
      tableKeys: TableKeys,
      schemas: Map[String, StructType],
      numBuckets: Int = 64,
      trigger: Trigger = Trigger.AvailableNow()): Seq[Running] = {
    tableKeys.entries.toSeq.sortBy(_._1).flatMap {
      case (_, None) => None // null-PK ⇒ CDC skipped for this table
      case (table, Some(keys)) =>
        schemas.get(table).map { schema =>
          val cfg = CdcStream.Config(
            root = root, table = table, keys = keys,
            storeRoot = storeRoot, checkpointRoot = checkpointRoot,
            numBuckets = numBuckets)
          Running(table, CdcStream.start(spark, cfg, schema, trigger))
        }
    }
  }

  /** Block until every stream finishes (AvailableNow) or `timeoutMs`. */
  def awaitAll(running: Seq[Running], timeoutMs: Long = 300000): Unit =
    running.foreach(_.query.awaitTermination(timeoutMs))
}
