package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.EventWindows

/** Windowed event aggregation in batch mode — the same plans run under
  * `readStream` (proved in StreamingWindowSpec); here the driver checks
  * the tumbling variant against a date_trunc oracle.
  */
object StreamingQueries {

  type Q = (SparkSession, String) => DataFrame

  /** 1-hour tumbling windows: counts + cent sums per event type. */
  val w01_tumbling_windows: Q = (s, dir) => {
    EventWindows.windowedStats(Tables(s, dir, "events"), "1 hour")
      .orderBy(col("window_start"), col("event_type"))
  }

  val w01_sql: String =
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
      |       CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
      |       event_type,
      |       COUNT(*) AS n_events,
      |       SUM(CAST(ROUND(value * 100) AS BIGINT)) AS value_cents
      |FROM events
      |GROUP BY 1, 2, 3
      |ORDER BY window_start, event_type""".stripMargin

  /** 1-hour windows sliding every 15 minutes (each event lands in 4
    * windows) — rows-only check; streaming equivalence covered in tests.
    */
  val w02_sliding_windows: Q = (s, dir) => {
    EventWindows.windowedStats(Tables(s, dir, "events"), "1 hour", slide = Some("15 minutes"))
      .orderBy(col("window_start"), col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "w01_tumbling_windows" -> w01_tumbling_windows,
    "w02_sliding_windows" -> w02_sliding_windows)

  val oracles: Map[String, String] = Map(
    "w01_tumbling_windows" -> w01_sql)
}
