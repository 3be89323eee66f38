package graft.config

import java.nio.file.{Files, Paths}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.types.StructType

import graft.operators.SchemaRegistry

/** The schema-tracker persist loop: observe the current table universe,
  * onboard brand-new tables (PK auto-detect + schema snapshot), refresh
  * drifted snapshots, and persist the updated key config with a
  * timestamped backup of the previous file.
  *
  * Re-expresses the reference's tracker end-to-end
  * (reference: schema_evolution_tracker.py:158-302 —
  * `generate_schema_evolution_report` + `apply_recommendations`): new
  * tables get `auto_configured` or `needs_manual_config` (explicit null
  * key ⇒ CDC skipped until a human configures one); tables present in
  * config but absent from the source are REPORTED, never auto-removed
  * (the reference's recommendations only carry `add` actions); the old
  * config is backed up as `<path>.backup.yyyyMMdd_HHmmss` before the
  * rewrite (tracker.py:254-263).
  */
final class SchemaTracker(
    registry: SchemaRegistry,
    configPath: String,
    clock: () => Instant = () => Instant.now()) {

  import SchemaTracker._

  /** One sync pass over the observed universe (table → current source
    * schema). Writes the config file only when it gained entries; the
    * registry snapshot updates happen unconditionally.
    */
  def sync(observed: Map[String, StructType]): Report = {
    val path = Paths.get(configPath)
    val current =
      if (Files.exists(path)) TableKeys.load(configPath) else TableKeys.empty

    val newTables = observed.keySet.diff(current.entries.keySet).toSeq.sorted
    val removedTables = current.entries.keySet.diff(observed.keySet).toSeq.sorted

    val recommendations = newTables.map { t =>
      val keys = registry.onboard(t, observed(t)) // snapshot + PK detect
      Recommendation(t, keys,
        if (keys.isDefined) "auto_configured" else "needs_manual_config")
    }

    // refresh drifted snapshots for already-known tables so the next
    // detectChanges diffs against today's shape
    val refreshed = observed.keys.toSeq.sorted
      .filterNot(newTables.contains)
      .filter { t =>
        val changes = registry.detectChanges(t, observed(t))
        if (changes.hasChanges) registry.save(t, observed(t))
        changes.hasChanges
      }

    val updated = recommendations.foldLeft(current) { (tk, rec) =>
      tk.withTable(rec.table, rec.keys)
    }
    if (recommendations.nonEmpty) {
      if (Files.exists(path)) {
        val stamp = BackupStamp.format(clock().atZone(ZoneOffset.UTC))
        // never overwrite an earlier backup (two syncs can share a
        // second) — suffix until the name is free
        val target = Iterator.from(0)
          .map(i => Paths.get(s"$configPath.backup.$stamp" + (if (i == 0) "" else s"_$i")))
          .find(!Files.exists(_)).get
        Files.copy(path, target)
      }
      Option(path.getParent).foreach(Files.createDirectories(_))
      Files.writeString(path, updated.toJson)
    }

    Report(newTables, removedTables, recommendations, refreshed, updated)
  }
}

object SchemaTracker {

  private val BackupStamp = DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")

  /** `keys = None` ⇒ no PK candidate found; the table is configured as
    * explicit null (CDC skip) pending manual configuration.
    */
  final case class Recommendation(table: String, keys: Option[Seq[String]], status: String)

  final case class Report(
      newTables: Seq[String],
      removedTables: Seq[String],
      recommendations: Seq[Recommendation],
      refreshedSnapshots: Seq[String],
      updatedKeys: TableKeys)
}
