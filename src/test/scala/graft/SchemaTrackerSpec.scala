package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.{SchemaTracker, TableKeys}
import graft.operators.SchemaRegistry

/** The schema-tracker persist loop: new-table onboarding updates the key
  * config (with timestamped backup) and the registry snapshots
  * (reference: schema_evolution_tracker.py:158-302).
  */
class SchemaTrackerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(): String = Files.createTempDirectory("graft-tracker").toString

  private val users = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))
  private val orders = StructType(Seq(
    StructField("orders_id", LongType), StructField("total", DoubleType)))
  private val misc = StructType(Seq(StructField("x", LongType)))

  test("new table appears → PK auto-detected → config updated + backup written") {
    val dir = tmpDir()
    val configPath = s"$dir/tables_keys.json"
    Files.writeString(Paths.get(configPath), """{"users": "id"}""")
    val registry = new SchemaRegistry(spark, s"$dir/schema_metadata")
    val ticks = Iterator("2026-08-12T10:00:00Z", "2026-08-12T11:00:00Z")
      .map(java.time.Instant.parse)
    val tracker = new SchemaTracker(registry, configPath, clock = () => ticks.next())

    val report = tracker.sync(Map("users" -> users, "orders" -> orders))
    assert(report.newTables == Seq("orders"))
    assert(report.recommendations.map(r => (r.table, r.keys, r.status)) ==
      Seq(("orders", Some(Seq("orders_id")), "auto_configured")))

    // config rewritten with the detected key; previous file backed up
    val reloaded = TableKeys.load(configPath)
    assert(reloaded.keysFor("orders").contains(Seq("orders_id")))
    assert(reloaded.keysFor("users").contains(Seq("id")))
    val backup = s"$configPath.backup.20260812_100000"
    assert(Files.exists(Paths.get(backup)), s"expected $backup")
    assert(TableKeys.load(backup).entries.keySet == Set("users"))
    // snapshot recorded for the onboarded table
    assert(registry.load("orders").contains(orders))

    // steady state: same universe again → nothing recommended, no rewrite
    val before = Files.readString(Paths.get(configPath))
    val again = tracker.sync(Map("users" -> users, "orders" -> orders))
    assert(again.newTables.isEmpty && again.recommendations.isEmpty)
    assert(Files.readString(Paths.get(configPath)) == before)
  }

  test("no PK candidate → explicit null entry (CDC skip) pending manual config") {
    val dir = tmpDir()
    val configPath = s"$dir/tables_keys.json"
    val tracker = new SchemaTracker(new SchemaRegistry(spark, s"$dir/schema_metadata"), configPath)

    val report = tracker.sync(Map("misc" -> misc))
    assert(report.recommendations.map(r => (r.table, r.keys, r.status)) ==
      Seq(("misc", None, "needs_manual_config")))
    // explicit null in the persisted config ⇒ keysFor yields None ⇒ the
    // orchestrator skips the table instead of guessing key `id`
    assert(TableKeys.load(configPath).keysFor("misc").isEmpty)
    // first write of a fresh config needs no backup
    import scala.jdk.CollectionConverters._
    val backups = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.contains(".backup.")).toSeq
    assert(backups.isEmpty)
  }

  test("removed tables reported but never auto-dropped; drifted snapshots refreshed") {
    val dir = tmpDir()
    val configPath = s"$dir/tables_keys.json"
    Files.writeString(Paths.get(configPath), """{"users": "id", "gone": "id"}""")
    val registry = new SchemaRegistry(spark, s"$dir/schema_metadata")
    registry.save("users", users)
    val tracker = new SchemaTracker(registry, configPath)

    val drifted = users.add(StructField("email", StringType))
    val report = tracker.sync(Map("users" -> drifted))
    assert(report.removedTables == Seq("gone"))
    assert(report.refreshedSnapshots == Seq("users"))
    // config untouched (no additions), `gone` still present
    assert(TableKeys.load(configPath).entries.keySet == Set("users", "gone"))
    // snapshot now matches the drifted shape
    assert(!registry.detectChanges("users", drifted).hasChanges)
  }

  test("composite and null round-trip through toJson") {
    val tk = TableKeys.empty
      .withTable("a", Some(Seq("x", "y")))
      .withTable("b", Some(Seq("id")))
      .withTable("c", None)
    val parsed = TableKeys.parse(tk.toJson)
    assert(parsed.keysFor("a").contains(Seq("x", "y")))
    assert(parsed.keysFor("b").contains(Seq("id")))
    assert(parsed.keysFor("c").isEmpty)
  }
}
