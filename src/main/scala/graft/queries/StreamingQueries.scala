package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.{CdcStateStream, EventWindows}

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
      |       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM events
      |GROUP BY 1, 2, 3
      |ORDER BY window_start, event_type""".stripMargin

  /** 1-hour windows sliding every 15 minutes (each event lands in
    * exactly length/slide = 4 windows) — streaming equivalence covered
    * in StreamingWindowSpec.
    */
  val w02_sliding_windows: Q = (s, dir) => {
    EventWindows.windowedStats(Tables(s, dir, "events"), "1 hour", slide = Some("15 minutes"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Sliding-window replay in exact integer microseconds: each event's
    * four window starts are `floor₁₅ₘᵢₙ(ts) − k·15min`, k ∈ 0..3 —
    * unnested via `list_transform(range(...))` (DuckDB has no lateral
    * generate_series over columns), then aggregated like w01. Integer
    * µs arithmetic mirrors Spark's epoch-aligned window assignment with
    * no FP epoch rounding.
    */
  val w02_sql: String =
    """WITH ev AS (
      |  SELECT (epoch_us(ts) // 900000000) * 900000000 AS slot_us,
      |         event_type,
      |         CAST(ROUND(value * 100) AS BIGINT) AS cents
      |  FROM events
      |),
      |exploded AS (
      |  SELECT unnest(list_transform(range(0, 4), k -> slot_us - k * 900000000)) AS ws_us,
      |         event_type, cents
      |  FROM ev
      |)
      |SELECT make_timestamp(ws_us) AS window_start,
      |       make_timestamp(ws_us + 3600000000) AS window_end,
      |       event_type,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(cents) AS BIGINT) AS value_cents
      |FROM exploded
      |GROUP BY 1, 2, 3
      |ORDER BY window_start, event_type""".stripMargin

  /** Per-user 30-minute session windows (session_window aggregation) —
    * the third windowing mode beyond tumbling/sliding.
    */
  val w04_session_windows: Q = (s, dir) => {
    EventWindows.sessionStats(Tables(s, dir, "events"), "30 minutes")
      .orderBy(col("session_start"), col("user_id"))
  }

  /** Gaps-and-islands replay in exact integer microseconds: a new
    * session starts where the gap since the previous event EXCEEDS
    * 30 min — an event exactly gap-after the last one still MERGES
    * (session_window extends through its closed end; proven by the
    * boundary case in StreamingWindowSpec); session id = running count
    * of starts; end = last event + gap.
    */
  val w04_sql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS tus,
      |         CAST(ROUND(value * 100) AS BIGINT) AS cents
      |  FROM events
      |),
      |marked AS (
      |  SELECT user_id, tus, cents,
      |    CASE WHEN LAG(tus) OVER (PARTITION BY user_id ORDER BY tus) IS NULL
      |           OR tus - LAG(tus) OVER (PARTITION BY user_id ORDER BY tus) > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM ev
      |),
      |sess AS (
      |  SELECT user_id, tus, cents,
      |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus
      |                          ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked
      |)
      |SELECT make_timestamp(MIN(tus)) AS session_start,
      |       make_timestamp(MAX(tus) + 1800000000) AS session_end,
      |       user_id,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(cents) AS BIGINT) AS value_cents
      |FROM sess
      |GROUP BY user_id, sid
      |ORDER BY session_start, user_id""".stripMargin

  /** The flatMapGroupsWithState net-change view, run in batch mode over a
    * synthetic change stream (empty initial state): per key the cascade
    * winner is emitted as an upsert unless it is a delete (a delete with
    * no prior state emits nothing) — all SQL-expressible, so the keyed
    * state-transition logic itself sits under the oracle.
    */
  /** Stream-stream interval join: purchases within 30 min after a click
    * by the same user. Oracle replays the range join with both
    * timestamps truncated to µs (Spark's native precision).
    */
  val w05_interval_join: Q = (s, dir) =>
    EventWindows.followWithin(Tables(s, dir, "events"), "click", "purchase", "30 minutes")
      .orderBy(col("lead_id"), col("follow_id"))

  val w05_sql: String =
    """SELECT l.user_id, l.event_id AS lead_id, r.event_id AS follow_id,
      |       (epoch_us(CAST(r.ts AS TIMESTAMP)) - epoch_us(CAST(l.ts AS TIMESTAMP))) // 1000000
      |         AS seconds_after
      |FROM events l JOIN events r
      |  ON l.user_id = r.user_id
      | AND l.event_type = 'click' AND r.event_type = 'purchase'
      | AND CAST(r.ts AS TIMESTAMP) > CAST(l.ts AS TIMESTAMP)
      | AND CAST(r.ts AS TIMESTAMP) <= CAST(l.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
      |ORDER BY lead_id, follow_id""".stripMargin

  /** Delivery dedup: the events table with every 10th event redelivered
    * (and every 100th twice more), deduped by event_id, aggregated per
    * type. The oracle replays with DISTINCT over full rows — equivalent
    * because redeliveries are exact copies of unique-id originals.
    */
  val w06_delivery_dedup: Q = (s, dir) => {
    val e = Tables(s, dir, "events")
    val delivered = e
      .unionAll(e.filter(col("event_id") % 10 === 0))
      .unionAll(e.filter(col("event_id") % 100 === 0))
    EventWindows.dedupEvents(delivered)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .orderBy(col("event_type"))
  }

  val w06_sql: String =
    """WITH delivered AS (
      |  SELECT * FROM events
      |  UNION ALL SELECT * FROM events WHERE event_id % 10 = 0
      |  UNION ALL SELECT * FROM events WHERE event_id % 100 = 0
      |),
      |deduped AS (SELECT DISTINCT * FROM delivered)
      |SELECT event_type, COUNT(*) AS n_events,
      |       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM deduped
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  val w03_state_view: Q = (s, dir) => {
    import s.implicits._
    val changes = Tables(s, dir, "orders").select(
        (col("o_orderkey") % 1000).as("key"),
        when(col("o_orderkey") % 7 === 0, "D")
          .when(col("o_orderkey") % 7 < 4, "U").otherwise("I").as("op"),
        unix_timestamp(col("o_orderdate")).as("loadTs"),
        col("o_orderkey").as("seq"),
        col("o_orderpriority").as("payload"))
      .as[CdcStateStream.Change]
    CdcStateStream.netChanges(changes).toDF()
      .orderBy(col("key"))
  }

  val w03_sql: String =
    """WITH changes AS (
      |  SELECT o_orderkey % 1000 AS key,
      |         CASE WHEN o_orderkey % 7 = 0 THEN 'D'
      |              WHEN o_orderkey % 7 < 4 THEN 'U' ELSE 'I' END AS op,
      |         CAST(FLOOR(date_part('epoch', o_orderdate)) AS BIGINT) AS load_ts,
      |         o_orderkey AS seq,
      |         o_orderpriority AS payload
      |  FROM orders
      |),
      |winners AS (
      |  SELECT key, op, payload FROM (
      |    SELECT *, ROW_NUMBER() OVER (
      |      PARTITION BY key
      |      ORDER BY load_ts DESC,
      |        CASE op WHEN 'D' THEN 3 WHEN 'U' THEN 2 WHEN 'I' THEN 1 ELSE 0 END DESC,
      |        seq DESC) AS rn
      |    FROM changes) t
      |  WHERE rn = 1
      |)
      |SELECT key, 'upsert' AS event, payload
      |FROM winners
      |WHERE op <> 'D'
      |ORDER BY key""".stripMargin

  /** Stream-static enrichment: events joined to the (static) customer →
    * nation dimension on user_id, aggregated per (nation, event_type).
    * The dimension is broadcast — the stream side never shuffles for the
    * join (streaming equivalence proven in StreamingWindowSpec).
    */
  val w08_stream_enrich: Q = (s, dir) => {
    val dim = Tables(s, dir, "customer")
      .join(Tables(s, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    EventWindows.enrichedStats(Tables(s, dir, "events"), dim,
        eventKey = "user_id", dimKey = "c_custkey", attr = "n_name")
      .orderBy(col("n_name"), col("event_type"))
  }

  val w08_sql: String =
    """SELECT n_name, event_type, COUNT(*) AS n_events,
      |       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM events e
      |JOIN customer c ON e.user_id = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY 1, 2
      |ORDER BY n_name, event_type""".stripMargin

  /** Funnel WITH drop-offs: every click, matched to purchases within
    * 30 min (null follow = abandoned) — the left-outer stream-stream
    * interval join. Ordering coalesces the nullable follow id (Spark
    * sorts NULLS FIRST, DuckDB NULLS LAST — coalesce sidesteps the
    * divergence).
    */
  val w09_funnel_dropoff: Q = (s, dir) =>
    EventWindows.followWithin(Tables(s, dir, "events"), "click", "purchase",
        "30 minutes", joinType = "left_outer")
      .orderBy(col("lead_id"), coalesce(col("follow_id"), lit(-1L)))

  val w09_sql: String =
    """SELECT l.user_id, l.event_id AS lead_id, r.event_id AS follow_id,
      |       (epoch_us(CAST(r.ts AS TIMESTAMP)) - epoch_us(CAST(l.ts AS TIMESTAMP))) // 1000000
      |         AS seconds_after
      |FROM (SELECT * FROM events WHERE event_type = 'click') l
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      |  ON l.user_id = r.user_id
      | AND CAST(r.ts AS TIMESTAMP) > CAST(l.ts AS TIMESTAMP)
      | AND CAST(r.ts AS TIMESTAMP) <= CAST(l.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
      |ORDER BY lead_id, COALESCE(follow_id, -1)""".stripMargin

  /** Sequential corpus admission across three micro-batches (originals,
    * exact copies, near-copies): per batch, docs near-dupping the
    * ADMITTED store at jaccard ≥ 0.8 are rejected, survivors appended.
    * Rejection in batch 3 depends on what batch 2 admitted — the
    * sequential state the oracle replays with chained CTEs. The same
    * `CorpusAdmission` runs under `foreachBatch` (StreamingWindowSpec
    * proves stream ≡ this batch fold).
    */
  val w10_corpus_admission: Q = (s, dir) => {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val b1 = d
    val b2 = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
    val b3 = d.filter(col("doc_id") % 10 === 5)
      .select((col("doc_id") + 2000000000L).as("doc_id"),
        concat(lit("zz"), expr("substring(text, 3)")).as("text"))
    val adm = new graft.streaming.CorpusAdmission("doc_id", "text")
    Seq(b1, b2, b3).zipWithIndex
      .map { case (b, i) =>
        adm.admit(b).select(col("doc_id"), lit(i + 1).as("batch_seq"))
      }
      .reduce(_ unionAll _)
      .orderBy(col("doc_id"))
  }

  /** The chained-admission CTE stack (corpus … admitted) shared by
    * every query whose semantics are "the corpus w10 admits": the
    * three batches are exactly DupDocCorpusSql's three branches, the
    * pair CTEs are d02's, and id ranges encode batch membership
    * (b1 < 1000000000 ≤ b2 < 2000000000 ≤ b3). Ends with
    * `admitted(doc_id, batch_seq)`.
    */
  val AdmissionCtesSql: String =
    s"""${DataPipelineQueries.DupDocCorpusSql},
       |${DataPipelineQueries.ShinglesSql},
       |${DataPipelineQueries.JaccardCtesSql},
       |rej2 AS (
       |  SELECT DISTINCT id_b FROM pairs
       |  WHERE jaccard >= 0.8 AND id_a < 1000000000 AND id_b >= 1000000000 AND id_b < 2000000000
       |),
       |adm2 AS (
       |  SELECT doc_id FROM corpus
       |  WHERE doc_id >= 1000000000 AND doc_id < 2000000000
       |    AND doc_id NOT IN (SELECT id_b FROM rej2)
       |),
       |rej3 AS (
       |  SELECT DISTINCT id_b FROM pairs
       |  WHERE jaccard >= 0.8 AND id_b >= 2000000000
       |    AND (id_a < 1000000000 OR id_a IN (SELECT doc_id FROM adm2))
       |),
       |admitted AS (
       |  SELECT doc_id, 1 AS batch_seq FROM corpus WHERE doc_id < 1000000000
       |  UNION ALL
       |  SELECT doc_id, 2 FROM adm2
       |  UNION ALL
       |  SELECT doc_id, 3 FROM corpus
       |  WHERE doc_id >= 2000000000 AND doc_id NOT IN (SELECT id_b FROM rej3)
       |)""".stripMargin

  val w10_sql: String =
    s"""WITH $AdmissionCtesSql
       |SELECT doc_id, CAST(batch_seq AS INT) AS batch_seq FROM admitted
       |ORDER BY doc_id""".stripMargin

  /** Bounded-state watermarked dedup ([[graft.streaming.WatermarkDedup]])
    * over four event micro-batches (delay 6 h):
    *
    *  - b1 = day-1 events;
    *  - b2 = day-2 events + an immediate duplicate delivery of every
    *    `event_id % 5 = 0` row → collapsed by IN-BATCH dedup;
    *  - b3 = day-3 events + the same day-2 rows redelivered at their
    *    original timestamps → every copy dropped, late or duplicate
    *    (watermark entering b3 = day-2 max − 6 h, so a copy is either
    *    at-or-before the watermark — late — or inside it with its
    *    day-2 state alive, expiry = ts + 6 h > watermark; NEITHER
    *    path re-emits or touches state, so the outcome is immune to
    *    where the late/dup boundary falls in the data);
    *  - b4 = day-5 events + the day-2 `% 5` rows re-sent with ts + 3
    *    days → RE-EMITTED: watermark entering b4 = day-3 max − 6 h
    *    (≈ day-3 ~18:00) has passed every day-2 expiry (≤ day-3
    *    06:00, margin ~12 h), so their state was evicted.
    *
    * The oracle states each branch's derived outcome directly (the
    * margins above are the proof; they hold at any SF whose per-day
    * max timestamp lands in the last ~2 h of the day). The streaming
    * binding — `dropDuplicatesWithinWatermark` — is proved ≡ this
    * fold in StreamingWindowSpec.
    */
  val w11_watermark_dedup: Q = (s, dir) => {
    val e = Tables(s, dir, "events").select(col("event_id"), col("ts"))
    def day(d: Int) = e.filter(dayofmonth(col("ts")) === d)
    val dup2 = day(2).filter(col("event_id") % 5 === 0)
    val batches = Seq(
      day(1),
      day(2).unionAll(dup2),
      day(3).unionAll(dup2),
      day(5).unionAll(dup2.withColumn("ts",
        col("ts") + expr("INTERVAL 3 DAYS"))))
    graft.streaming.WatermarkDedup
      .fold(batches, "ts", delaySec = 6 * 3600, keys = Seq("event_id"))
      .select(col("event_id"), col("batch_seq"), col("ts"))
      .orderBy(col("event_id"), col("batch_seq"))
  }

  val w11_sql: String =
    """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |d2dup AS (
      |  SELECT event_id, ts FROM e
      |  WHERE DATE_PART('day', ts) = 2 AND event_id % 5 = 0
      |)
      |SELECT event_id, CAST(batch_seq AS BIGINT) AS batch_seq, ts FROM (
      |  SELECT event_id, 1 AS batch_seq, ts FROM e WHERE DATE_PART('day', ts) = 1
      |  UNION ALL
      |  SELECT event_id, 2, ts FROM e WHERE DATE_PART('day', ts) = 2
      |  UNION ALL
      |  SELECT event_id, 3, ts FROM e WHERE DATE_PART('day', ts) = 3
      |  UNION ALL
      |  SELECT event_id, 4, ts FROM e WHERE DATE_PART('day', ts) = 5
      |  UNION ALL
      |  SELECT event_id, 4, ts + INTERVAL 3 DAY FROM d2dup
      |) t
      |ORDER BY event_id, batch_seq""".stripMargin

  /** w05's LEFT OUTER sibling: every click keeps a row even with no
    * purchase inside the 30-minute horizon (follow_id/seconds_after
    * NULL) — the attribution view that also measures NON-conversion.
    * Runs the same [[EventWindows.followWithin]] plan the streaming
    * side uses; as a stream-stream outer join the unmatched rows emit
    * once the watermark passes lead_ts + horizon (bounded-state proof
    * in StreamingWindowSpec; this batch query is the full fold).
    */
  val w12_follow_outer: Q = (s, dir) =>
    EventWindows.followWithin(Tables(s, dir, "events"), "click", "purchase",
        "30 minutes", joinType = "left_outer")
      .orderBy(col("lead_id"), col("follow_id"))

  val w12_sql: String =
    """SELECT l.user_id, l.event_id AS lead_id, r.event_id AS follow_id,
      |       (epoch_us(CAST(r.ts AS TIMESTAMP)) - epoch_us(CAST(l.ts AS TIMESTAMP))) // 1000000
      |         AS seconds_after
      |FROM (SELECT * FROM events WHERE event_type = 'click') l
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      |  ON l.user_id = r.user_id
      | AND CAST(r.ts AS TIMESTAMP) > CAST(l.ts AS TIMESTAMP)
      | AND CAST(r.ts AS TIMESTAMP) <= CAST(l.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
      |ORDER BY lead_id, follow_id""".stripMargin

  /** Streaming MVCC sink fold ([[graft.streaming.SnapshotSink]]): the
    * events table arrives as three micro-batches (id mod 3), each
    * committing a new snapshot-store generation; batch 1 is then
    * REDELIVERED (the foreachBatch crash-replay case) and must no-op.
    * Output: generation count (must be 3, not 4) + final-table
    * integrity stats — the oracle sees the plain events table, so any
    * lost or doubled batch fails the hash. Stream ≡ this fold is
    * SnapshotSinkSpec's job.
    */
  val w13_snapshot_sink: Q = (s, dir) => {
    val root = java.nio.file.Files.createTempDirectory("graft-snapsink")
      .toFile.getAbsolutePath + "/t"
    val st = new graft.sources.SnapshotStore(s, root)
    val ev = Tables(s, dir, "events").select(col("event_id"), col("user_id"))
    val batches = (0 until 3).map(i => ev.filter(col("event_id") % 3 === i))
    batches.zipWithIndex.foreach { case (b, id) =>
      graft.streaming.SnapshotSink.appendBatch(st, b, id.toLong)
    }
    // crash-replay: batch 1 redelivered — exactly-once makes it a no-op
    graft.streaming.SnapshotSink.appendBatch(st, batches(1), 1L)
    st.readLatest()
      .agg(count(lit(1)).as("n_rows"),
        sum(col("event_id")).as("sum_ids"),
        countDistinct(col("event_id")).as("n_distinct"))
      .select(lit(st.loggedVersions().size.toLong).as("n_versions"),
        col("n_rows"), col("sum_ids"), col("n_distinct"))
  }

  val w13_sql: String =
    """SELECT 3 AS n_versions, COUNT(*) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_ids,
      |  COUNT(DISTINCT event_id) AS n_distinct
      |FROM events""".stripMargin

  /** Streaming fan-out with CROSS-TABLE exactly-once
    * ([[graft.streaming.CatalogSink]]): each micro-batch commits the
    * raw append AND the maintained per-user rollup
    * ([[graft.operators.IncrementalView]] merge) as ONE catalog
    * generation — a reader can join raw against rollup at any
    * generation and they describe the same prefix of the stream.
    * Batch 1 is redelivered (crash replay): the batch-id no-op must
    * skip BOTH tables. Output: generation count (3, not 4) + the
    * cross-table consistency audit; the oracle sees only the events
    * table, so a torn or doubled commit in either table fails the
    * hash.
    */
  val w14_catalog_sink: Q = (s, dir) => {
    import graft.operators.IncrementalView
    val root = java.nio.file.Files.createTempDirectory("graft-catsink")
      .toFile.getAbsolutePath + "/cat"
    val cat = new graft.sources.TableCatalog(s, root)
    val ev = Tables(s, dir, "events").select(col("event_id"), col("user_id"),
      round(col("value") * 100).cast("long").as("cents"))
    val specs = Seq(IncrementalView.countRows("n_events"),
      IncrementalView.sumOf(col("cents"), "sum_cents"))
    val derive = Map[String, (Option[DataFrame], DataFrame) => DataFrame](
      "events_raw" -> ((prev, b) => prev.map(_.unionByName(b)).getOrElse(b)),
      "user_stats" -> ((prev, b) => IncrementalView.merge(prev,
        IncrementalView.aggregate(b, Seq("user_id"), specs), Seq("user_id"), specs)))
    val batches = (0 until 3).map(i => ev.filter(col("event_id") % 3 === i))
    batches.zipWithIndex.foreach { case (b, id) =>
      graft.streaming.CatalogSink.commitBatch(cat, b, id.toLong, derive)
    }
    // crash replay of batch 1: must be a cross-table no-op
    graft.streaming.CatalogSink.commitBatch(cat, batches(1), 1L, derive)
    val g = cat.latestGeneration().get
    val raw = cat.readAt(g, "events_raw")
      .agg(count(lit(1)).as("n_raw"), sum(col("event_id")).as("sum_ids"))
    val stats = cat.readAt(g, "user_stats")
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_events")).as("stats_n_events"),
        sum(col("sum_cents")).as("stats_sum_cents"))
    raw.crossJoin(stats)
      .select(lit(cat.loggedGenerations().size.toLong).as("n_generations"),
        col("n_raw"), col("sum_ids"), col("n_users"),
        col("stats_n_events"), col("stats_sum_cents"))
  }

  val w14_sql: String =
    """SELECT 3 AS n_generations, COUNT(*) AS n_raw,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_ids,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  COUNT(*) AS stats_n_events,
      |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS stats_sum_cents
      |FROM events""".stripMargin

  /** Continuous CDC on the merge-on-read cost model
    * ([[graft.streaming.MorSink]] → [[graft.sources.MorStore]]): an
    * initial load commits the base; two delta micro-batches commit
    * O(batch) each (inserts, value updates, deletes — including a
    * delete of a key a PREVIOUS batch inserted, so cross-generation
    * ordering is load-bearing); batch 1 is redelivered and must
    * no-op; `compactEvery=2` folds the stack mid-stream, so the
    * final read exercises base-after-compaction + nothing pending.
    * The oracle reconstructs the final state relationally from
    * events alone.
    */
  val w15_mor_sink: Q = (s, dir) => {
    val root = java.nio.file.Files.createTempDirectory("graft-morsink-q")
      .toFile.getAbsolutePath + "/t"
    val st = new graft.sources.MorStore(s, root, Seq("event_id"))
    val ev = Tables(s, dir, "events").select(col("event_id"), col("user_id"),
      round(col("value") * 100).cast("long").as("cents"))
    // initial load: ts in the negative range, clear of batch-id space
    st.commitBase(ev.filter(col("event_id") % 3 === 0), -1L)
    val b0 = ev.filter(col("event_id") % 3 === 1)
      .withColumn("cents", col("cents") + 5L).withColumn(st.OpCol, lit("U"))
    val b1 = ev.filter(col("event_id") % 3 === 2)
      .withColumn("cents", col("cents") + 7L).withColumn(st.OpCol, lit("U"))
      .unionByName(ev.filter(col("event_id") % 5 === 0 && col("event_id") % 3 =!= 2)
        .withColumn(st.OpCol, lit("D")))
    graft.streaming.MorSink.appendBatch(st, b0, 0L, compactEvery = 2)
    graft.streaming.MorSink.appendBatch(st, b1, 1L, compactEvery = 2)
    // crash replay of batch 1: must be a no-op (state already compacted)
    graft.streaming.MorSink.appendBatch(st, b1, 1L, compactEvery = 2)
    st.read()
      .groupBy((col("user_id") % 10).as("user_band"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
      .orderBy(col("user_band"))
  }

  val w15_sql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
      |  FROM events
      |), final AS (
      |  SELECT event_id, user_id,
      |    CASE WHEN event_id % 3 = 1 THEN cents + 5
      |         WHEN event_id % 3 = 2 THEN cents + 7
      |         ELSE cents END AS cents
      |  FROM ev
      |  WHERE NOT (event_id % 5 = 0 AND event_id % 3 <> 2)
      |)
      |SELECT user_id % 10 AS user_band, COUNT(*) AS n_rows,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents
      |FROM final
      |GROUP BY user_id % 10
      |ORDER BY user_band""".stripMargin

  val queries: Map[String, Q] = Map(
    "w15_mor_sink" -> w15_mor_sink,
    "w14_catalog_sink" -> w14_catalog_sink,
    "w13_snapshot_sink" -> w13_snapshot_sink,
    "w01_tumbling_windows" -> w01_tumbling_windows,
    "w02_sliding_windows" -> w02_sliding_windows,
    "w03_state_view" -> w03_state_view,
    "w04_session_windows" -> w04_session_windows,
    "w05_interval_join" -> w05_interval_join,
    "w06_delivery_dedup" -> w06_delivery_dedup,
    "w08_stream_enrich" -> w08_stream_enrich,
    "w09_funnel_dropoff" -> w09_funnel_dropoff,
    "w10_corpus_admission" -> w10_corpus_admission,
    "w11_watermark_dedup" -> w11_watermark_dedup,
    "w12_follow_outer" -> w12_follow_outer)

  val oracles: Map[String, String] = Map(
    "w15_mor_sink" -> w15_sql,
    "w14_catalog_sink" -> w14_sql,
    "w13_snapshot_sink" -> w13_sql,
    "w01_tumbling_windows" -> w01_sql,
    "w02_sliding_windows" -> w02_sql,
    "w03_state_view" -> w03_sql,
    "w04_session_windows" -> w04_sql,
    "w05_interval_join" -> w05_sql,
    "w06_delivery_dedup" -> w06_sql,
    "w08_stream_enrich" -> w08_sql,
    "w09_funnel_dropoff" -> w09_sql,
    "w10_corpus_admission" -> w10_sql,
    "w11_watermark_dedup" -> w11_sql,
    "w12_follow_outer" -> w12_sql)
}
