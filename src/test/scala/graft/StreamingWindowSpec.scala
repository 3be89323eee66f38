package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{AsofStream, EventWindows}

/** The windowed-aggregation plan must produce identical results in batch
  * and streaming execution (same code path, `readStream` + watermark).
  */
class StreamingWindowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming tumbling windows ≡ batch tumbling windows") {
    val dir = "/root/testdata/sf0.001"
    val batchEvents = Tables(spark, dir, "events")
    val batch = EventWindows.windowedStats(batchEvents, "1 hour")
      .collect().map(_.toSeq).toSet

    // stream the same parquet through the same plan (complete mode so the
    // final state table carries every window)
        val streamEvents = Tables.eventsStream(spark, dir)
    val q = EventWindows.windowedStats(streamEvents, "1 hour", watermark = Some("1 hour"))
      .writeStream
      .format("memory")
      .queryName("win_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("win_out").collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming sliding windows ≡ batch sliding windows") {
    val dir = "/root/testdata/sf0.001"
    val batch = EventWindows.windowedStats(
        Tables(spark, dir, "events"), "1 hour", slide = Some("15 minutes"))
      .collect().map(_.toSeq).toSet

        val streamEvents = Tables.eventsStream(spark, dir)
    val q = EventWindows.windowedStats(streamEvents, "1 hour",
        slide = Some("15 minutes"), watermark = Some("1 hour"))
      .writeStream.format("memory").queryName("slw_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("slw_out").collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming session windows ≡ batch session windows") {
    val dir = "/root/testdata/sf0.001"
    val batch = EventWindows.sessionStats(
        Tables(spark, dir, "events"), "30 minutes")
      .collect().map(_.toSeq).toSet

        val streamEvents = Tables.eventsStream(spark, dir)
    val q = EventWindows.sessionStats(streamEvents, "30 minutes",
        watermark = Some("1 hour"))
      .writeStream.format("memory").queryName("ssw_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("ssw_out").collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming interval join ≡ batch interval join (append mode)") {
    val dir = "/root/testdata/sf0.001"
    val batch = EventWindows.followWithin(
        Tables(spark, dir, "events"), "click", "purchase", "30 minutes")
      .collect().map(_.toSeq).toSet

        val streamEvents = Tables.eventsStream(spark, dir)
    val q = EventWindows.followWithin(streamEvents, "click", "purchase",
        "30 minutes", watermark = Some("1 hour"))
      .writeStream
      .format("memory")
      .queryName("ivj_out")
      .outputMode("append") // the only mode stream-stream joins support
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("ivj_out").collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming delivery dedup ≡ batch delivery dedup") {
    val dir = "/root/testdata/sf0.001"
    val batchEvents = Tables(spark, dir, "events")
    val dupd = batchEvents.unionAll(
      batchEvents.filter(org.apache.spark.sql.functions.col("event_id") % 10 === 0))
    val batch = EventWindows.dedupEvents(dupd)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq

        val streamEvents = Tables.eventsStream(spark, dir)
    val streamDupd = streamEvents.unionAll(
      streamEvents.filter(org.apache.spark.sql.functions.col("event_id") % 10 === 0))
    val q = EventWindows.dedupEvents(streamDupd, watermark = Some("1 hour"))
      .writeStream
      .format("memory")
      .queryName("dd_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("dd_out")
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming stream-static enrichment ≡ batch enrichment") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val dim = Tables(spark, dir, "customer")
      .join(Tables(spark, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val batch = EventWindows.enrichedStats(
        Tables(spark, dir, "events"), dim, "user_id", "c_custkey", "n_name")
      .collect().map(_.toSeq).toSet

        val streamEvents = Tables.eventsStream(spark, dir)
    val q = EventWindows.enrichedStats(streamEvents, dim,
        "user_id", "c_custkey", "n_name", watermark = Some("1 hour"))
      .writeStream.format("memory").queryName("enr_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("enr_out").collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming left-outer interval join ≡ batch once watermark closes the horizon") {
    import spark.implicits._
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
      .filter(org.apache.spark.sql.functions.col("event_type").isin("click", "purchase"))
      .select($"event_id".cast("long"), $"user_id".cast("long"), $"ts",
        $"event_type", $"value".cast("double"))
      .as[AsofStream.Ev]
    val all = events.collect().sortBy(e => (e.ts.getTime, e.ts.getNanos))
    val batch = EventWindows.followWithin(events.toDF(), "click", "purchase",
        "30 minutes", joinType = "left_outer")
      .collect().map(_.toSeq).toSet
    assert(batch.exists(_(2) == null), "no drop-offs in the batch reference")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AsofStream.Ev]
    val q = EventWindows.followWithin(ms.toDF(), "click", "purchase",
        "30 minutes", watermark = Some("1 hour"), joinType = "left_outer")
      .writeStream.format("memory").queryName("foj_out")
      .outputMode("append").start()
    ms.addData(all.toIndexedSeq)
    q.processAllAvailable()
    // outer (null-follow) rows only materialize once the watermark
    // passes lead_ts + horizon: two noop sentinel batches push it past
    // every lead's bound (the first sets the new watermark, the second
    // runs with it and flushes the remaining state)
    val maxMs = all.last.ts.getTime
    def noop(offsetH: Int) = AsofStream.Ev(-1L, -1L,
      new java.sql.Timestamp(maxMs + offsetH * 3600L * 1000), "noop", 0.0)
    ms.addData(noop(48))
    q.processAllAvailable()
    ms.addData(noop(49))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("foj_out").collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("append-mode windows drop events later than the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamingWindowSpec.WmEv]
    val q = EventWindows.windowedStats(ms.toDF(), "1 hour", watermark = Some("1 hour"))
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()

    def ev(t: String, v: Double) = StreamingWindowSpec.WmEv(
      java.sql.Timestamp.valueOf(t), "click", v)
    // batch 1 advances the watermark to 11:00 (max 12:00 − 1 h)
    ms.addData(ev("2026-01-01 10:15:00", 1.0), ev("2026-01-01 12:00:00", 2.0))
    q.processAllAvailable()
    // batch 2: 09:30 is BEHIND the 11:00 watermark → dropped; 12:30 is live
    ms.addData(ev("2026-01-01 09:30:00", 4.0), ev("2026-01-01 12:30:00", 8.0))
    q.processAllAvailable()
    q.stop()

    val startsEmitted = spark.table("late_out")
      .select("window_start").collect().map(_.getTimestamp(0).toString).toSet
    // the 10:00 window finalized (end 11:00 ≤ watermark) with its on-time
    // event; the late 09:30 event created NO 09:00 window
    assert(startsEmitted.contains("2026-01-01 10:00:00.0"))
    assert(!startsEmitted.contains("2026-01-01 09:00:00.0"))
    // control: the same plan in batch mode COUNTS the 09:30 event — the
    // drop above is the watermark semantic, not a filter in the plan
    val batchStarts = EventWindows.windowedStats(
        Seq(ev("2026-01-01 10:15:00", 1.0), ev("2026-01-01 12:00:00", 2.0),
          ev("2026-01-01 09:30:00", 4.0), ev("2026-01-01 12:30:00", 8.0)).toDF(),
        "1 hour")
      .select("window_start").collect().map(_.getTimestamp(0).toString).toSet
    assert(batchStarts.contains("2026-01-01 09:00:00.0"))
  }

  test("sliding windows place each event in windowLength/slide windows") {
    import spark.implicits._
    val one = Seq(("2026-01-01 10:07:00", "click", 1.0))
      .toDF("ts_s", "event_type", "value")
      .select(org.apache.spark.sql.functions.to_timestamp($"ts_s").as("ts"),
        $"event_type", $"value")
    val out = EventWindows.windowedStats(one, "1 hour", slide = Some("15 minutes"))
      .collect()
    assert(out.length == 4) // 60/15 overlapping windows contain the event
  }

  test("session windows: gap merge, closed-end boundary, per-user isolation") {
    import spark.implicits._
    val ev = Seq(
      // user 1: third event lands exactly AT the session's end — the
      // closed end still MERGES it (the > gap rule, mirrored by the
      // oracle's gaps-and-islands replay)
      (1L, "2026-01-01 10:00:00", 1.0),
      (1L, "2026-01-01 10:10:00", 2.0),
      (1L, "2026-01-01 10:40:00", 4.0),
      // user 2: same instant as user 1's first event — separate session
      (2L, "2026-01-01 10:00:00", 8.0),
      // user 3: 1 µs beyond the gap — a new session
      (3L, "2026-01-01 10:00:00", 1.0),
      (3L, "2026-01-01 10:30:00.000001", 2.0))
      .toDF("user_id", "ts_s", "value")
      .select($"user_id", org.apache.spark.sql.functions.to_timestamp($"ts_s").as("ts"),
        org.apache.spark.sql.functions.lit("click").as("event_type"), $"value")
    val out = EventWindows.sessionStats(ev, "30 minutes")
      .collect()
      .map(r => (r.getLong(2), r.getTimestamp(0).toString, r.getTimestamp(1).toString,
        r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      (1L, "2026-01-01 10:00:00.0", "2026-01-01 11:10:00.0", 3L, 700L),
      (2L, "2026-01-01 10:00:00.0", "2026-01-01 10:30:00.0", 1L, 800L),
      (3L, "2026-01-01 10:00:00.0", "2026-01-01 10:30:00.0", 1L, 100L),
      (3L, "2026-01-01 10:30:00.000001", "2026-01-01 11:00:00.000001", 1L, 200L)))
  }

  /** Batch reference for the as-of proofs: the AsofJoin single-shuffle
    * plan on the same probe/build split (w07's shape plus probe value).
    */
  private def batchAsof(events: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions.col
    val probe = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val build = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("b_event_id"),
        col("ts").as("b_ts"), col("value").as("b_value"))
    graft.operators.AsofJoin.asofLookup(probe, build, Seq("user_id"), "ts",
      Seq("b_event_id", "b_ts", "b_value"))
  }

  test("streaming as-of enrich ≡ batch as-of join (stateful, single batch)") {
    val dir = "/root/testdata/sf0.001"
    val batch = batchAsof(Tables(spark, dir, "events"))
      .collect().map(_.toSeq).toSet

        val streamEvents = Tables.eventsStream(spark, dir)
    val q = AsofStream.enrich(streamEvents, "purchase", "click")
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("asof_out").collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming as-of enrich carries state across in-order micro-batches") {
    import spark.implicits._
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
      .filter(org.apache.spark.sql.functions.col("event_type")
        .isin("purchase", "click"))
      .select($"event_id".cast("long"), $"user_id".cast("long"), $"ts",
        $"event_type", $"value".cast("double"))
      .as[AsofStream.Ev]
    // Sort by (millis, nanos) like the sweep does — a millis-only sort
    // could let microsecond ties straddle the split out of true time
    // order, violating the in-order delivery contract.
    val all = events.collect().sortBy(e => (e.ts.getTime, e.ts.getNanos))
    val (first, second) = all.splitAt(all.length / 2) // time-ordered halves
    val batch = batchAsof(events.toDF()).collect().map(_.toSeq).toSet

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // Spark 4.1 moved MemoryStream under execution.streaming.runtime
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AsofStream.Ev]
    val q = AsofStream.enrich(ms.toDF(), "purchase", "click")
      .writeStream.format("memory").queryName("asof_mb_out")
      .outputMode("append").start()
    ms.addData(first.toIndexedSeq)
    q.processAllAvailable()
    ms.addData(second.toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("asof_mb_out").collect().map(_.toSeq).toSet
    assert(streamed == batch)
    // the split must actually cross state: some purchase in batch 2
    // matches a click from batch 1
    val firstClickIds = first.filter(_.event_type == "click").map(_.event_id).toSet
    val secondPurchases = second.filter(_.event_type == "purchase").map(_.event_id).toSet
    val crossMatches = spark.table("asof_mb_out")
      .collect().filter(r => !r.isNullAt(4))
      .count(r => secondPurchases.contains(r.getLong(0)) &&
        firstClickIds.contains(r.getLong(4)))
    assert(crossMatches > 0, "time split produced no cross-batch matches")
  }

  test("corpus admission: foreachBatch stream equals the sequential batch fold") {
    import spark.implicits._
    // near-dup chain across batches: the batch-2 copy of doc 1 is
    // REJECTED, so the batch-3 near-copy must be checked against doc 1
    // itself (admitted), while the batch-3 fresh doc passes — the
    // sequential-state semantics foreachBatch must reproduce
    val b1 = Seq(
      1L -> "the quick brown fox jumps over the lazy dog and runs far away",
      2L -> "entirely different content about catalyst optimizer rules engine today").toDF("doc_id", "text")
    val b2 = Seq(
      11L -> "the quick brown fox jumps over the lazy dog and runs far away", // dup of 1 → reject
      12L -> "fresh second batch document with its own words and nothing shared").toDF("doc_id", "text")
    val b3 = Seq(
      21L -> "a quick brown fox jumps over the lazy dog and runs far away",   // near-dup of 1 → reject
      22L -> "fresh second batch document with its own words and nothing shared", // dup of 12 → reject
      23L -> "completely novel third batch text that matches nothing else here").toDF("doc_id", "text")

    def admitAll(batches: Seq[org.apache.spark.sql.DataFrame]): Set[Long] = {
      val adm = new graft.streaming.CorpusAdmission("doc_id", "text", threshold = 0.5)
      batches.flatMap(b => adm.admit(b).select("doc_id").collect().map(_.getLong(0))).toSet
    }
    val batchResult = admitAll(Seq(b1, b2, b3))
    assert(batchResult == Set(1L, 2L, 12L, 23L), s"batch fold admitted $batchResult")

    // stream side: same batches through foreachBatch micro-batches
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val adm = new graft.streaming.CorpusAdmission("doc_id", "text", threshold = 0.5)
    val admitted = scala.collection.mutable.Set.empty[Long]
    val q = ms.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        admitted ++= adm.admit(df).select("doc_id").collect().map(_.getLong(0))
        ()
      }
      .start()
    Seq(b1, b2, b3).foreach { b =>
      ms.addData(b.collect().map(r => (r.getLong(0), r.getString(1))).toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    assert(admitted.toSet == batchResult,
      s"stream admitted ${admitted.toSet} != batch $batchResult")
  }

  test("index-served admission under foreachBatch equals the re-shingling admission") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, col}
    // same chain as the corpus-admission test: sequential state across
    // micro-batches, but the stream's state is the PERSISTED LSH index
    // (w29's shape) instead of in-memory admitted frames
    val b1 = Seq(
      1L -> "the quick brown fox jumps over the lazy dog and runs far away",
      2L -> "entirely different content about catalyst optimizer rules engine today").toDF("doc_id", "text")
    val b2 = Seq(
      11L -> "the quick brown fox jumps over the lazy dog and runs far away",
      12L -> "fresh second batch document with its own words and nothing shared").toDF("doc_id", "text")
    val b3 = Seq(
      21L -> "a quick brown fox jumps over the lazy dog and runs far away",
      22L -> "fresh second batch document with its own words and nothing shared",
      23L -> "completely novel third batch text that matches nothing else here").toDF("doc_id", "text")
    val expected = {
      val adm = new graft.streaming.CorpusAdmission("doc_id", "text", threshold = 0.5)
      Seq(b1, b2, b3).flatMap(b =>
        adm.admit(b).select("doc_id").collect().map(_.getLong(0))).toSet
    }
    val root = java.nio.file.Files.createTempDirectory("graft-admstream")
      .toFile.getAbsolutePath + "/cat"
    val cat = new graft.sources.TableCatalog(spark, root)
    val memo = new java.util.IdentityHashMap[org.apache.spark.sql.DataFrame, Map[String, org.apache.spark.sql.DataFrame]]()
    def relsOf(b: org.apache.spark.sql.DataFrame) = memo.synchronized {
      var r = memo.get(b)
      if (r == null) {
        r = graft.operators.TextDedup.lshIndexRelations(b, "doc_id", "text")
        memo.put(b, r)
      }
      r
    }
    val derive: Map[String, (Option[org.apache.spark.sql.DataFrame], org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame] =
      Seq("bands", "shingles", "sizes").map { rel =>
        rel -> ((prev: Option[org.apache.spark.sql.DataFrame], b: org.apache.spark.sql.DataFrame) => {
          val r = relsOf(b)(rel)
          prev.map(_.unionByName(r)).getOrElse(r)
        })
      }.toMap
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val admitted = scala.collection.mutable.Set.empty[Long]
    val q = ms.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val adm =
          if (cat.latestGeneration().isEmpty) df
          else {
            val rejected = graft.operators.TextDedup.lshIndexLookup(
                df, "doc_id", "text",
                cat.read("bands"), cat.read("shingles"), cat.read("sizes"),
                threshold = 0.5)
              .select(col("id_q").as("doc_id")).distinct()
            df.join(broadcast(rejected), Seq("doc_id"), "left_anti")
          }
        val pinned = adm.localCheckpoint()
        graft.streaming.CatalogSink.commitBatch(cat, pinned, id, derive)
        admitted ++= pinned.select("doc_id").collect().map(_.getLong(0))
        ()
      }
      .start()
    Seq(b1, b2, b3).foreach { b =>
      ms.addData(b.collect().map(r => (r.getLong(0), r.getString(1))).toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    assert(admitted.toSet == expected,
      s"index-served stream admitted ${admitted.toSet} != $expected")
    assert(cat.loggedGenerations().size == 3, "one generation per micro-batch")
  }

  test("postings index under foreachBatch: live view equals the surviving corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // w30's maintenance lifecycle driven through a REAL stream:
    //  b0: ingest docs 1-4
    //  b1: mixed micro-batch — fresh doc 5, RECRAWL of doc 2 (new
    //      text replaces rev 0), DELETE of doc 3 — one atomic commit
    //  b2: re-ingest doc 3 (revives the deleted id at a newer rev)
    val b0 = Seq(
      (1L, "alpha beta gamma", "I"),
      (2L, "beta beta delta", "I"),
      (3L, "gamma delta", "I"),
      (4L, "alpha alpha alpha epsilon", "I"))
    val b1 = Seq(
      (5L, "epsilon zeta", "I"),
      (2L, "eta eta theta beta", "R"),
      (3L, "", "D"))
    val b2 = Seq((3L, "iota kappa kappa", "I"))
    val root = java.nio.file.Files.createTempDirectory("graft-poststream")
      .toFile.getAbsolutePath + "/cat"
    val cat = new graft.sources.TableCatalog(spark, root)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    val q = ms.toDF().toDF("doc_id", "text", "op")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val pinned = df.localCheckpoint()
        graft.streaming.PostingsIndex.commitBatch(cat,
          upserts = pinned.filter(col("op") =!= "D").drop("op"),
          deletes = pinned.filter(col("op") === "D").select("doc_id"),
          batchId = id,
          replace = true)
        ()
      }
      .start()
    Seq(b0, b1, b2).foreach { b => ms.addData(b); q.processAllAvailable() }
    q.stop()
    assert(cat.loggedGenerations().size == 3, "one generation per micro-batch")
    // a redelivered micro-batch must no-op against the ledger
    assert(graft.streaming.PostingsIndex.commitBatch(cat,
      b2.toDF("doc_id", "text", "op").drop("op"),
      spark.emptyDataset[Long].toDF("doc_id"), 2L, replace = true) == -1L)
    // final corpus after replay: 1, 2 (recrawled), 4, 5, 3 (revived)
    val corpus = Seq(
      1L -> "alpha beta gamma", 2L -> "eta eta theta beta",
      4L -> "alpha alpha alpha epsilon", 5L -> "epsilon zeta",
      3L -> "iota kappa kappa").toDF("doc_id", "text")
    val expectedTf = corpus.select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val (livePost, liveDl) = graft.streaming.PostingsIndex.live(cat)
    val gotTf = livePost.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("tok"),
        r.getAs[Long]("tf"))).toSet
    assert(gotTf == expectedTf,
      s"live postings diverged: extra=${gotTf -- expectedTf} missing=${expectedTf -- gotTf}")
    val gotDl = liveDl.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dl"))).toSet
    assert(gotDl == Set(1L -> 3L, 2L -> 4L, 4L -> 4L, 5L -> 2L, 3L -> 3L),
      s"live doclen diverged: $gotDl")
  }

  test("watermarked dedup: dropDuplicatesWithinWatermark equals the batch fold") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(t: String) = java.sql.Timestamp.valueOf(t)
    // delay 1 h. Plants exercise every fold rule:
    //  b1: k1@10:00, k2@10:55 emit; watermark -> 09:55
    //  b2: k1@10:00 redelivered (on-time by 5 min, state alive -> dup),
    //      k3@09:30 (late, <= 09:55), k4@11:20 twice (in-batch dup),
    //      k5@12:10 (advances watermark -> 11:10, past k1's 11:00 expiry)
    //  b3: k1@13:00 -> k1 state evicted, RE-EMITS
    val batches = Seq(
      Seq((1L, ts("2026-01-01 10:00:00")), (2L, ts("2026-01-01 10:55:00"))),
      Seq((1L, ts("2026-01-01 10:00:00")), (3L, ts("2026-01-01 09:30:00")),
        (4L, ts("2026-01-01 11:20:00")), (4L, ts("2026-01-01 11:20:00")),
        (5L, ts("2026-01-01 12:10:00"))),
      Seq((1L, ts("2026-01-01 13:00:00"))))
    val expected = Set(
      (1L, "2026-01-01 10:00:00.0", 1L), (2L, "2026-01-01 10:55:00.0", 1L),
      (4L, "2026-01-01 11:20:00.0", 2L), (5L, "2026-01-01 12:10:00.0", 2L),
      (1L, "2026-01-01 13:00:00.0", 3L))

    val folded = graft.streaming.WatermarkDedup.fold(
        batches.map(_.toDF("event_id", "ts")), "ts", 3600L, Seq("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
      .toSet
    assert(folded == expected, s"fold produced $folded")

    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp)]
    val q = graft.streaming.WatermarkDedup.stream(
        ms.toDF().toDF("event_id", "ts"), "ts", "1 hour", Seq("event_id"))
      .writeStream.format("memory").queryName("wmd_out")
      .outputMode("append").start()
    batches.foreach { b => ms.addData(b.toIndexedSeq); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("wmd_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString)).toSet
    assert(streamed == expected.map(e => (e._1, e._2)),
      s"stream produced $streamed")
  }
  test("streaming left-outer follow join ≡ batch within the flushed horizon") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val ev = Tables(spark, dir, "events")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))
    val batch = EventWindows.followWithin(ev, "click", "purchase",
        "30 minutes", joinType = "left_outer")
      .collect().map(key).toSet

    val streamEvents = Tables.eventsStream(spark, dir)
    val q = EventWindows.followWithin(streamEvents, "click", "purchase",
        "30 minutes", watermark = Some("0 seconds"), joinType = "left_outer")
      .writeStream.format("memory").queryName("w12_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("w12_out").collect().map(key).toSet

    // inner matches never wait on the watermark: exact equality
    val batchInner = batch.filter(_._3 >= 0)
    assert(streamed.filter(_._3 >= 0) == batchInner)
    assert(batchInner.nonEmpty)
    // outer (null) rows: emitted iff the watermark passed lead_ts +
    // horizon — everything the stream emitted must be a batch row, and
    // every batch null-row whose lead is ≥ horizon older than the final
    // watermark (= max event ts at delay 0) must have been flushed
    assert(streamed.subsetOf(batch), s"stream-only rows: ${streamed -- batch}")
    val maxTs = ev.agg(max(col("ts"))).head.getTimestamp(0).getTime
    val leadTs = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("ts")).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    val mustFlush = batch.filter(r =>
      r._3 < 0 && leadTs(r._2) + 30 * 60 * 1000L < maxTs)
    assert(mustFlush.nonEmpty, "fixture left no flushable unmatched lead")
    val missing = mustFlush -- streamed
    assert(missing.isEmpty, s"unflushed outer rows past the watermark: $missing")
  }
}

object StreamingWindowSpec {
  /** Row type for the MemoryStream late-data test. */
  case class WmEv(ts: java.sql.Timestamp, event_type: String, value: Double)
}
