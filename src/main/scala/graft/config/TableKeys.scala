package graft.config

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, NullNode, TextNode}

import scala.jdk.CollectionConverters._

/** Per-table primary-key configuration.
  *
  * Semantics follow the reference's `tables_keys.json` + lookup
  * (reference: lambda/handler.py:710-729; config/tables_keys.json.example):
  * - value may be a single column name, a comma-separated composite
  *   ("a,b" → Seq("a","b")), a JSON array, or null;
  * - null ⇒ the table has no usable PK and CDC is skipped for it;
  * - missing table ⇒ default key `id`.
  */
final case class TableKeys(entries: Map[String, Option[Seq[String]]]) {

  /** Keys for a table: None ⇒ explicitly configured null (skip table). */
  def keysFor(table: String): Option[Seq[String]] =
    entries.getOrElse(table, Some(Seq(TableKeys.DefaultKey)))

  def withTable(table: String, keys: Option[Seq[String]]): TableKeys =
    copy(entries = entries + (table -> keys))

  /** Serialize back to the reference's config shape: single-column keys
    * as a plain string, composites as a JSON array, null for no-PK
    * tables. Keys sorted for diff-stable config files.
    */
  def toJson: String = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    entries.toSeq.sortBy(_._1).foreach {
      case (t, None)            => root.putNull(t)
      case (t, Some(Seq(one)))  => root.put(t, one)
      case (t, Some(many))      =>
        val arr = root.putArray(t)
        many.foreach(arr.add)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }
}

object TableKeys {
  val DefaultKey = "id"

  /** PK auto-detect fallback names for brand-new tables
    * (reference: lambda_schema_evolution_integration.py:141-155).
    */
  def candidateKeyNames(table: String): Seq[String] =
    Seq("id", "uuid", s"${table}_id", "pk_id")

  /** Pick a PK for a new table from its columns using the fallback list. */
  def autoDetect(table: String, columns: Seq[String]): Option[Seq[String]] = {
    val colSet = columns.toSet
    candidateKeyNames(table).find(colSet.contains).map(Seq(_))
  }

  val empty: TableKeys = TableKeys(Map.empty)

  /** Parse the JSON config. Jackson ships with Spark's jars. */
  def parse(json: String): TableKeys = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(json)
    val entries = root.properties().asScala.map { e =>
      val table = e.getKey
      val keys: Option[Seq[String]] = e.getValue match {
        case _: NullNode  => None
        case t: TextNode  => Some(t.asText.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
        case a: ArrayNode => Some(a.asScala.map(_.asText).toSeq)
        case other        => Some(Seq(other.asText))
      }
      table -> keys
    }.toMap
    TableKeys(entries)
  }

  def load(path: String): TableKeys =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
}
