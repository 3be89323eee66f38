package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.TableKeys
import graft.operators.{CdcDedup, CdcMerge}
import graft.routing.CdcPath

/** Unit tests for the CDC core: dedup cascade tie levels, MERGE branches,
  * decimal gating, routing, key config (SURVEY §5 test plan).
  */
class CdcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  def stagingDf(rows: Seq[(Long, String, String, String, Long)]): DataFrame = {
    // (id, payload, Op, load_timestamp, ingestion_seq)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", StringType),
      StructField("Op", StringType),
      StructField("load_timestamp", TimestampType),
      StructField("ingestion_seq", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3, ts(r._4), r._5))),
      schema)
  }

  // ─────────────────────────────────────────────── dedup cascade

  test("dedup level 1: newest load_timestamp wins") {
    val df = stagingDf(Seq(
      (1L, "old", "U", "2024-01-01 00:00:00", 1L),
      (1L, "new", "U", "2024-01-02 00:00:00", 2L)))
    val out = CdcDedup.dedup(df, Seq("id")).collect()
    assert(out.length == 1 && out(0).getAs[String]("payload") == "new")
  }

  test("dedup level 2: delete wins a load_timestamp tie") {
    val df = stagingDf(Seq(
      (1L, "upd", "U", "2024-01-01 00:00:00", 2L),
      (1L, "del", "D", "2024-01-01 00:00:00", 1L),
      (1L, "ins", "I", "2024-01-01 00:00:00", 3L)))
    val out = CdcDedup.dedup(df, Seq("id")).collect()
    assert(out.length == 1 && out(0).getAs[String]("Op") == "D")
  }

  test("dedup level 5: ingestion_seq (file row order) breaks full ties") {
    val df = stagingDf(Seq(
      (1L, "first", "U", "2024-01-01 00:00:00", 1L),
      (1L, "last", "U", "2024-01-01 00:00:00", 2L)))
    val out = CdcDedup.dedup(df, Seq("id")).collect()
    assert(out.length == 1 && out(0).getAs[String]("payload") == "last")
  }

  test("dedup levels 3-4: updated/created timestamps with COALESCE-null handling") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", StringType),
      StructField("load_timestamp", TimestampType),
      StructField("updated", TimestampType),
      StructField("ingestion_seq", LongType)))
    val rows = Seq(
      Row(1L, "null-updated", ts("2024-01-01 00:00:00"), null, 2L),
      Row(1L, "has-updated", ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00"), 1L))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val out = CdcDedup.dedup(df, Seq("id")).collect()
    // non-null updated (> epoch-0 coalesce) must win despite lower seq
    assert(out.length == 1 && out(0).getAs[String]("payload") == "has-updated")
  }

  test("dedup bigint-epoch updated column works (heterogeneous type, SURVEY §7.4.4)") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", StringType),
      StructField("updated", LongType),
      StructField("ingestion_seq", LongType)))
    val rows = Seq(Row(1L, "older", 100L, 2L), Row(1L, "newer", 200L, 1L))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val out = CdcDedup.dedup(df, Seq("id")).collect()
    assert(out.length == 1 && out(0).getAs[String]("payload") == "newer")
  }

  test("dedup cross-file tie: later-named file wins a multi-file batch") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", StringType),
      StructField("load_timestamp", TimestampType),
      StructField("ingestion_seq", LongType),
      StructField("__source_file", StringType)))
    // same key, same load_timestamp, seq restarts per file — the
    // sequential-processing semantics require the later file to win
    val rows = Seq(
      Row(1L, "from-file-1", ts("2024-01-01 00:00:00"), 5L, "s3://b/t/2026/01/01/f001.parquet"),
      Row(1L, "from-file-2", ts("2024-01-01 00:00:00"), 0L, "s3://b/t/2026/01/01/f002.parquet"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val out = CdcDedup.dedup(df, Seq("id")).collect()
    assert(out.length == 1 && out(0).getAs[String]("payload") == "from-file-2")
  }

  test("dedup gate: key-unique batch passes through without a window") {
    val df = stagingDf(Seq(
      (1L, "a", "I", "2024-01-01 00:00:00", 1L),
      (2L, "b", "I", "2024-01-01 00:00:00", 2L)))
    assert(!CdcDedup.needsDedup(df, Seq("id")))
    assert(CdcDedup.dedup(df, Seq("id")).count() == 2)
  }

  // ─────────────────────────────────────────────── merge

  def targetDf(rows: Seq[(Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "payload", "amount")
  }

  def mergeStaging(rows: Seq[(Long, String, Double, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, p, a, op) => (id, p, a, op, ts("2024-06-01 00:00:00")) }
      .toDF("id", "payload", "amount", "Op", "load_timestamp")
  }

  test("merge: update, delete, insert branches") {
    val target = targetDf(Seq((1L, "one", 10.0), (2L, "two", 20.0), (3L, "three", 30.0)))
    val staging = mergeStaging(Seq(
      (1L, "one-v2", 11.0, "U"),   // matched update
      (2L, "gone", 0.0, "D"),      // matched delete
      (4L, "four", 40.0, "I")))    // unmatched insert
    val out = CdcMerge(target, staging, Seq("id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "one-v2", 11.0), (3L, "three", 30.0), (4L, "four", 40.0)))
  }

  test("merge: unmatched delete-row is inserted (reference NOT MATCHED quirk)") {
    val target = targetDf(Seq((1L, "one", 10.0)))
    val staging = mergeStaging(Seq((9L, "ghost", 90.0, "D")))
    val out = CdcMerge(target, staging, Seq("id")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "one"), (9L, "ghost")))
  }

  test("merge: rerun of the same batch is a no-op (idempotency invariant)") {
    val target = targetDf(Seq((1L, "one", 10.0), (2L, "two", 20.0)))
    val staging = mergeStaging(Seq((1L, "upd", 11.0, "U"), (3L, "new", 30.0, "I")))
    val once = CdcMerge(target, staging, Seq("id"))
    val twice = CdcMerge(once, staging, Seq("id"))
    assert(once.collect().sortBy(_.getLong(0)).toSeq == twice.collect().sortBy(_.getLong(0)).toSeq)
  }

  test("merge: composite keys") {
    import spark.implicits._
    val target = Seq((1L, 1, "a"), (1L, 2, "b")).toDF("k1", "k2", "v")
    val staging = Seq((1L, 2, "b2", "U"), (2L, 1, "c", "I"))
      .toDF("k1", "k2", "v", "Op")
    val out = CdcMerge(target, staging, Seq("k1", "k2")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq((1L, 1, "a"), (1L, 2, "b2"), (2L, 1, "c")))
  }

  test("merge: delete branch off when Op column absent") {
    import spark.implicits._
    val target = Seq((1L, "one")).toDF("id", "v")
    val staging = Seq((1L, "one-v2")).toDF("id", "v")
    val out = CdcMerge(target, staging, Seq("id")).collect()
    assert(out.length == 1 && out(0).getString(1) == "one-v2")
  }

  test("merge: prod-only columns keep target values on update, null on insert") {
    import spark.implicits._
    val target = Seq((1L, "one", "extra1")).toDF("id", "v", "prod_only")
    val staging = Seq((1L, "one-v2", "U"), (2L, "two", "I")).toDF("id", "v", "Op")
    val out = CdcMerge(target, staging, Seq("id")).collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "one-v2", Some("extra1")), (2L, "two", None)))
  }

  test("merge: non-broadcast (backfill) path produces identical results") {
    val target = targetDf(Seq((1L, "one", 10.0), (2L, "two", 20.0), (3L, "three", 30.0)))
    val staging = mergeStaging(Seq(
      (1L, "one-v2", 11.0, "U"), (2L, "gone", 0.0, "D"), (4L, "four", 40.0, "I")))
    val viaBroadcast = CdcMerge(target, staging, Seq("id"))
      .collect().map(_.toSeq).toSet
    val viaShuffle = CdcMerge(target, staging, Seq("id"), broadcastStaging = false)
      .collect().map(_.toSeq).toSet
    assert(viaBroadcast == viaShuffle)
  }

  // ─────────────────────────────────────────────── decimal gate

  test("decimal gate: mismatched non-key decimal dropped from merge set") {
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("amount", DecimalType(20, 0)),
      StructField("v", StringType)))
    val staging = StructType(Seq(
      StructField("id", LongType),
      StructField("amount", DecimalType(38, 0)),
      StructField("v", StringType)))
    val plan = CdcMerge.prepareMergeColumns(target, staging, Seq("id"))
    assert(plan.cols == Seq("id", "v") && plan.removedDecimalCols == Seq("amount"))
  }

  test("decimal gate: mismatched key decimal is a hard error") {
    val target = StructType(Seq(StructField("id", DecimalType(20, 0)), StructField("v", StringType)))
    val staging = StructType(Seq(StructField("id", DecimalType(38, 0)), StructField("v", StringType)))
    val e = intercept[IllegalArgumentException] {
      CdcMerge.prepareMergeColumns(target, staging, Seq("id"))
    }
    assert(e.getMessage.contains("DECIMAL precision mismatch"))
  }

  // ─────────────────────────────────────────────── routing + config

  test("path router: CDC file parsed, LOAD and non-CDC skipped (handler.py:765-783)") {
    assert(CdcPath.parse("fair/orders/2026/08/12/part-001.parquet") ==
      Right(CdcPath.CdcFile("orders", "2026-08-12", "part-001.parquet")))
    assert(CdcPath.parse("fair/orders/2026/08/12/LOAD00000001.parquet") == Left(CdcPath.LoadFile))
    assert(CdcPath.parse("other/orders/file.parquet") == Left(CdcPath.NotCdcFile))
    assert(CdcPath.parse("fair/orders/2026/8/12/x.parquet") == Left(CdcPath.NotCdcFile))
    // local absolute path prefix allowed
    assert(CdcPath.parse("/tmp/cdc/fair/t1/2026/01/02/f.parquet").isRight)
  }

  test("table keys config: default, composite, null-skip (handler.py:710-729)") {
    val tk = TableKeys.parse("""{"orders": "o_orderkey", "items": "order_id, item_id", "log": null, "arr": ["a","b"]}""")
    assert(tk.keysFor("orders").contains(Seq("o_orderkey")))
    assert(tk.keysFor("items").contains(Seq("order_id", "item_id")))
    assert(tk.keysFor("log").isEmpty)
    assert(tk.keysFor("arr").contains(Seq("a", "b")))
    assert(tk.keysFor("unknown").contains(Seq("id")))
    assert(TableKeys.autoDetect("users", Seq("x", "users_id")).contains(Seq("users_id")))
  }
}
