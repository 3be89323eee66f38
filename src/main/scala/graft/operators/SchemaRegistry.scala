package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

import graft.config.TableKeys

/** Persistent per-table schema snapshots with change detection.
  *
  * Re-expresses the reference's S3 schema-metadata store
  * (reference: lambda_schema_evolution_integration.py:32-108 —
  * `schema_metadata/{table}_schema.json` with load/save/diff) and its
  * new-table PK auto-detection (:110-159) on top of the same filesystem
  * abstraction as the table stores. Snapshots record the Spark schema
  * JSON plus a wall-clock stamp; diffs report new / removed /
  * type-changed columns and whether the table is brand new.
  */
final class SchemaRegistry(spark: SparkSession, dir: String) {

  import SchemaRegistry._

  private def fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def fileFor(table: String) = new Path(dir, s"${table}_schema.json")

  def save(table: String, schema: StructType): Unit = {
    val payload =
      s"""{"table_name": ${jsonStr(table)},
         | "schema": ${schema.json},
         | "last_updated": ${jsonStr(java.time.Instant.now().toString)}}""".stripMargin
    fs.mkdirs(new Path(dir))
    val out = fs.create(fileFor(table), true)
    out.write(payload.getBytes("UTF-8"))
    out.close()
  }

  def load(table: String): Option[StructType] = {
    val p = fileFor(table)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    in.readFully(bytes)
    in.close()
    // real JSON parse (hand-scanning braces breaks on '{'/'}' inside
    // quoted column names); the "schema" field holds the Spark schema
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    Option(mapper.readTree(new String(bytes, "UTF-8")).get("schema"))
      .map(node => DataType.fromJson(node.toString).asInstanceOf[StructType])
  }

  /** Diff an incoming schema against the stored snapshot (does not save).
    * Mirrors `detect_schema_changes`
    * (lambda_schema_evolution_integration.py:70-108).
    */
  def detectChanges(table: String, incoming: StructType): SchemaChanges =
    load(table) match {
      case None => SchemaChanges(isNewTable = true, Nil, Nil, Nil)
      case Some(prev) =>
        val prevMap = prev.fields.map(f => f.name -> f.dataType).toMap
        val curMap = incoming.fields.map(f => f.name -> f.dataType).toMap
        SchemaChanges(
          isNewTable = false,
          newColumns = incoming.fieldNames.filterNot(prevMap.contains).toSeq,
          removedColumns = prev.fieldNames.filterNot(curMap.contains).toSeq,
          typeChanges = incoming.fields.collect {
            case f if prevMap.get(f.name).exists(_ != f.dataType) =>
              (f.name, prevMap(f.name), f.dataType)
          }.toSeq)
    }

  /** New-table onboarding: detect PK by the reference's fallback name
    * list (`id`, `uuid`, `{table}_id`, `pk_id`) and record the snapshot.
    */
  def onboard(table: String, incoming: StructType): Option[Seq[String]] = {
    val keys = TableKeys.autoDetect(table, incoming.fieldNames.toSeq)
    save(table, incoming)
    keys
  }
}

object SchemaRegistry {
  final case class SchemaChanges(
      isNewTable: Boolean,
      newColumns: Seq[String],
      removedColumns: Seq[String],
      typeChanges: Seq[(String, DataType, DataType)]) {
    def hasChanges: Boolean =
      isNewTable || newColumns.nonEmpty || removedColumns.nonEmpty || typeChanges.nonEmpty
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
