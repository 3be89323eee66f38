package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.{CdcDedup, CdcMerge}

/** The reference's relational surface (SURVEY §2) as Spark queries over the
  * driver testdata, each with a DuckDB-equivalent oracle.
  *
  * Determinism rules for oracle parity:
  * - double aggregates go through exact integer-cents arithmetic
  *   (`CAST(ROUND(x*100) AS BIGINT)`) or decimal casts of clean 2-dp data,
  *   never raw double sums (FP addition order differs between engines);
  * - every query has a total ORDER BY with a unique tie-break;
  * - column names aliased identically on both sides.
  */
object CoreQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Sum of a clean 2-decimal double column as exact cents. */
  private def cents(c: String) = sum(round(col(c) * 100).cast(LongType))

  // ───────────────────────────────────────────────────────── aggregations

  /** A3/A5/O1 (pricing summary over lineitem; reference validation corpus
    * DATA_VALIDATION_QUERIES.sql:51-61 shape).
    */
  val q01_pricing_summary: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(LongType)).as("sum_qty"),
        cents("l_extendedprice").as("sum_base_price_cents"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01_sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** A4/P8 (conditional aggregates / NULL-style counts;
    * reference: DATA_VALIDATION_QUERIES.sql:72, 84-91).
    */
  val q02_conditional_agg: Q = (s, dir) => {
    Tables(s, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(when(col("c_acctbal") < 0, 1).otherwise(0)).as("n_negative"),
        sum(when(col("c_acctbal") >= 5000, 1).otherwise(0)).as("n_rich"),
        cents("c_acctbal").as("acctbal_cents"))
      .orderBy(col("c_mktsegment"))
  }

  val q02_sql: String =
    """SELECT c_mktsegment,
      |  COUNT(*) AS n_customers,
      |  CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
      |  CAST(SUM(CASE WHEN c_acctbal >= 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_rich,
      |  CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** A6 (GROUP BY time bucket — the engine's tumbling window in batch form;
    * reference: DATA_VALIDATION_QUERIES.sql:215-223).
    */
  val q03_monthly_rollup: Q = (s, dir) => {
    Tables(s, dir, "orders")
      .groupBy(trunc(col("o_orderdate"), "month").as("order_month"))
      .agg(
        count(lit(1)).as("n_orders"),
        cents("o_totalprice").as("total_cents"))
      .orderBy(col("order_month"))
  }

  val q03_sql: String =
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM orders
      |GROUP BY 1
      |ORDER BY order_month""".stripMargin

  /** A7 (checksum aggregate; reference: DATA_VALIDATION_QUERIES.sql:125-133). */
  val q04_checksum: Q = (s, dir) => {
    Tables(s, dir, "orders")
      .agg(
        sum(col("o_orderkey")).as("key_sum"),
        md5(sum(col("o_orderkey")).cast(StringType)).as("key_checksum"))
  }

  val q04_sql: String =
    """SELECT CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
      |  MD5(CAST(SUM(o_orderkey) AS VARCHAR)) AS key_checksum
      |FROM orders""".stripMargin

  /** A2 (dedup gate: COUNT vs COUNT(DISTINCT composite keys);
    * reference: handler.py:423-439).
    */
  val q05_dup_gate: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .agg(
        count(lit(1)).as("total_rows"),
        count_distinct(struct(col("l_orderkey"), col("l_linenumber"))).as("unique_keys"))
  }

  val q05_sql: String =
    """SELECT
      |  (SELECT COUNT(*) FROM lineitem) AS total_rows,
      |  (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS unique_keys""".stripMargin

  /** A8 (multi-aggregate summary in one pass;
    * reference: DATA_VALIDATION_QUERIES.sql:288-297).
    */
  val q06_summary_stats: Q = (s, dir) => {
    Tables(s, dir, "events")
      .agg(
        count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        count_distinct(col("event_type")).as("n_types"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        cents("value").as("value_cents"))
  }

  val q06_sql: String =
    """SELECT COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  COUNT(DISTINCT event_type) AS n_types,
      |  CAST(MIN(ts) AS TIMESTAMP) AS first_ts,
      |  CAST(MAX(ts) AS TIMESTAMP) AS last_ts,
      |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM events""".stripMargin

  // ──────────────────────────────────────────────────────────────── joins

  /** J1-shape equi-join chain + agg (orders ⋈ customer ⋈ nation), small
    * dimensions broadcast (SURVEY §4 "broadcast-sized build side").
    */
  val q07_join_revenue_by_nation: Q = (s, dir) => {
    val orders = Tables(s, dir, "orders")
    val customer = Tables(s, dir, "customer")
    val nation = Tables(s, dir, "nation")
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        cents("o_totalprice").as("revenue_cents"))
      .orderBy(col("n_name"))
  }

  val q07_sql: String =
    """SELECT n_name,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** J2-shape left-semi (EXISTS): customers having at least one
    * high-value order.
    */
  val q08_semi_join: Q = (s, dir) => {
    val customer = Tables(s, dir, "customer")
    val big = Tables(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
    customer
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val q08_sql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |ORDER BY c_custkey""".stripMargin

  /** J2 (DELETE-rewrite anti-join: rows whose key is NOT in the other set;
    * reference: CRITICAL_FIX_DUPLICATES_ON_MERGE.md:46-49).
    */
  val q09_anti_join: Q = (s, dir) => {
    val customer = Tables(s, dir, "customer")
    val orders = Tables(s, dir, "orders")
    customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val q09_sql: String =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** J3 (correlated scalar subquery — decorrelates to agg + equi-join;
    * reference: DATA_VALIDATION_QUERIES.sql:230-239). Expressed via
    * spark.sql so Catalyst's RewriteCorrelatedScalarSubquery handles it.
    */
  val q10_scalar_subquery: Q = (s, dir) => {
    Tables(s, dir, "nation").createOrReplaceTempView("g_nation")
    Tables(s, dir, "customer").createOrReplaceTempView("g_customer")
    s.sql(
      """SELECT n_nationkey, n_name,
        |  (SELECT COUNT(*) FROM g_customer WHERE c_nationkey = n_nationkey) AS n_customers
        |FROM g_nation
        |ORDER BY n_nationkey""".stripMargin)
  }

  val q10_sql: String =
    """SELECT n_nationkey, n_name,
      |  (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_customers
      |FROM nation
      |ORDER BY n_nationkey""".stripMargin

  // ──────────────────────────────── filters / projections / sorts / top-k

  /** P5/P6/P7 + P1 (predicate stack: equality, IN, range, LIKE —
    * all pushed to the parquet scan).
    */
  val q11_predicate_stack: Q = (s, dir) => {
    Tables(s, dir, "part")
      .filter(col("p_type").like("%BRASS%"))
      .filter(col("p_size").isin(5, 15, 25, 35, 45))
      .filter(col("p_retailprice") >= 1000.0 && col("p_retailprice") <= 1500.0)
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"), col("p_size"))
      .orderBy(col("p_partkey"))
  }

  val q11_sql: String =
    """SELECT p_partkey, p_name, p_brand, p_type, p_size
      |FROM part
      |WHERE p_type LIKE '%BRASS%'
      |  AND p_size IN (5, 15, 25, 35, 45)
      |  AND p_retailprice BETWEEN 1000.0 AND 1500.0
      |ORDER BY p_partkey""".stripMargin

  /** P8 / §2.8 scalar functions (CASE/COALESCE/CAST projection). */
  val q12_case_projection: Q = (s, dir) => {
    Tables(s, dir, "orders")
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") >= 200000.0, "big")
          .when(col("o_totalprice") >= 50000.0, "mid")
          .otherwise("small").as("size_class"),
        coalesce(col("o_orderpriority"), lit("NONE")).as("priority"),
        to_date(col("o_orderdate")).as("order_day"),
        round(col("o_totalprice") * 100).cast(LongType).as("price_cents"))
      .orderBy(col("o_orderkey"))
  }

  val q12_sql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice >= 200000.0 THEN 'big'
      |       WHEN o_totalprice >= 50000.0 THEN 'mid'
      |       ELSE 'small' END AS size_class,
      |  COALESCE(o_orderpriority, 'NONE') AS priority,
      |  CAST(o_orderdate AS DATE) AS order_day,
      |  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** O3 (top-k: ORDER BY ... DESC LIMIT k — Spark plans
    * TakeOrderedAndProject; reference: DATA_VALIDATION_QUERIES.sql:246-253).
    */
  val q13_topk: Q = (s, dir) => {
    Tables(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
  }

  val q13_sql: String =
    """SELECT o_orderkey, o_totalprice, o_orderpriority
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 100""".stripMargin

  /** A5 + HAVING (duplicate finder: GROUP BY ... HAVING COUNT(*) > 1;
    * reference: DATA_VALIDATION_QUERIES.sql:98-105).
    */
  val q14_having_duplicates: Q = (s, dir) => {
    Tables(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 10)
      .orderBy(col("cnt").desc, col("user_id").asc, col("event_type").asc)
      .limit(100)
  }

  val q14_sql: String =
    """SELECT user_id, event_type, COUNT(*) AS cnt
      |FROM events
      |GROUP BY user_id, event_type
      |HAVING COUNT(*) > 10
      |ORDER BY cnt DESC, user_id ASC, event_type ASC
      |LIMIT 100""".stripMargin

  // ──────────────────────────────────────────────────────────── set ops

  /** U1 (UNION ALL freshness check across tables;
    * reference: DATA_VALIDATION_QUERIES.sql:154-179).
    */
  val q15_union_freshness: Q = (s, dir) => {
    def branch(table: String, tsCol: String): DataFrame =
      Tables(s, dir, table).agg(
        count(lit(1)).as("n_rows"),
        max(col(tsCol).cast(TimestampType)).as("latest"))
        .select(lit(table).as("table_name"), col("n_rows"), col("latest"))
    branch("orders", "o_orderdate")
      .unionAll(branch("lineitem", "l_shipdate"))
      .unionAll(branch("events", "ts"))
      .orderBy(col("table_name"))
  }

  val q15_sql: String =
    """SELECT 'orders' AS table_name, COUNT(*) AS n_rows, CAST(MAX(o_orderdate) AS TIMESTAMP) AS latest FROM orders
      |UNION ALL
      |SELECT 'lineitem', COUNT(*), CAST(MAX(l_shipdate) AS TIMESTAMP) FROM lineitem
      |UNION ALL
      |SELECT 'events', COUNT(*), CAST(MAX(ts) AS TIMESTAMP) FROM events
      |ORDER BY table_name""".stripMargin

  // ─────────────────────────────────────────────────────── window / dedup

  /** W1/W2 (the dedup core: ROW_NUMBER over PARTITION BY key ORDER BY
    * cascade, rn=1; reference: handler.py:407-479): latest event per user.
    */
  val q16_latest_per_key: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  val q16_sql: String =
    """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
      |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  // ─────────────────────────────────────────────── the CDC pipeline itself

  /** Synthetic CDC staging batch over `orders`, exercising every dedup
    * cascade level and every MERGE branch (see FIXTURES.md §1):
    * - keys %10∈{0,1}: two U versions, newer load_timestamp must win;
    * - key  %10=2: U and D tied on load_timestamp — D must win (delete);
    * - key  %10=3: two U tied on load_timestamp+Op — higher ingestion_seq wins;
    * - key  %10=4 (+1e8): brand-new keys — inserts;
    * - key  %10=5 (+2e8): unmatched deletes — inserted (reference quirk,
    *   no predicate on WHEN NOT MATCHED; handler.py:608-613).
    */
  def syntheticOrdersCdc(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val m = col("o_orderkey") % 10
    def ts(v: String) = to_timestamp(lit(v))
    def branch(
        filter0: org.apache.spark.sql.Column,
        key: org.apache.spark.sql.Column,
        status: org.apache.spark.sql.Column,
        price: org.apache.spark.sql.Column,
        op: String, loadTs: String, seq: Int): DataFrame =
      o.filter(filter0).select(
        key.as("o_orderkey"),
        col("o_custkey"),
        status.as("o_orderstatus"),
        price.as("o_totalprice"),
        col("o_orderdate"),
        col("o_orderpriority"),
        lit(op).as("Op"),
        ts(loadTs).as("load_timestamp"),
        lit(seq.toLong).as("ingestion_seq"))

    val k = col("o_orderkey")
    val p = col("o_totalprice")
    val st = col("o_orderstatus")
    branch(m < 2, k, st, p + 1000.0, "U", "2030-01-01 00:00:00", 1)
      .unionAll(branch(m < 2, k, st, p + 999.0, "U", "2029-01-01 00:00:00", 2))
      .unionAll(branch(m === 2, k, st, p, "U", "2030-01-01 00:00:00", 1))
      .unionAll(branch(m === 2, k, st, p, "D", "2030-01-01 00:00:00", 2))
      .unionAll(branch(m === 3, k, st, p + 111.0, "U", "2030-01-01 00:00:00", 1))
      .unionAll(branch(m === 3, k, st, p + 222.0, "U", "2030-01-01 00:00:00", 2))
      // insert/delete keys sit in the BILLIONS so they stay disjoint
      // from any generated keyspace: MakeSf1's copy shift is 10⁷ per
      // copy (≤ 2.6·10⁸ at its 26-copy cap), and a colliding "fresh"
      // key silently flips an insert into an update at bigger SFs
      .unionAll(branch(m === 4, k + 4000000000L, lit("N"), p, "I", "2030-01-01 00:00:00", 1))
      .unionAll(branch(m === 5, k + 5000000000L, lit("X"), p, "D", "2030-01-01 00:00:00", 1))
  }

  /** The flagship: stage → dedup (cascade) → MERGE (update/delete/insert),
    * end-to-end through [[CdcDedup]] and [[CdcMerge]] — the reference's
    * core transaction (SURVEY §3.1, §7.2).
    */
  val q17_cdc_merge: Q = (s, dir) => {
    val target = Tables(s, dir, "orders")
    // persist: the staging batch is read by the dedup gate and the window
    val staging = syntheticOrdersCdc(s, dir).persist()
    val dedup = CdcDedup.dedup(staging, Seq("o_orderkey"), gate = true)
    CdcMerge(target, dedup, Seq("o_orderkey"))
      .orderBy(col("o_orderkey"))
  }

  /** The synthetic CDC staging batch (syntheticOrdersCdc) as a SQL CTE
    * body named `staging_raw` — shared by the q17 merge oracle and the
    * q37 SCD2 oracle so the fixture cannot drift between them.
    */
  val StagingRawSql: String =
    """staging_raw AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority,
      |         'U' AS op, TIMESTAMP '2030-01-01 00:00:00' AS load_ts, 1 AS seq
      |  FROM orders WHERE o_orderkey % 10 < 2
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 999.0, o_orderdate, o_orderpriority,
      |         'U', TIMESTAMP '2029-01-01 00:00:00', 2
      |  FROM orders WHERE o_orderkey % 10 < 2
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
      |         'U', TIMESTAMP '2030-01-01 00:00:00', 1
      |  FROM orders WHERE o_orderkey % 10 = 2
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
      |         'D', TIMESTAMP '2030-01-01 00:00:00', 2
      |  FROM orders WHERE o_orderkey % 10 = 2
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 111.0, o_orderdate, o_orderpriority,
      |         'U', TIMESTAMP '2030-01-01 00:00:00', 1
      |  FROM orders WHERE o_orderkey % 10 = 3
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 222.0, o_orderdate, o_orderpriority,
      |         'U', TIMESTAMP '2030-01-01 00:00:00', 2
      |  FROM orders WHERE o_orderkey % 10 = 3
      |  UNION ALL
      |  SELECT o_orderkey + 4000000000, o_custkey, 'N', o_totalprice, o_orderdate, o_orderpriority,
      |         'I', TIMESTAMP '2030-01-01 00:00:00', 1
      |  FROM orders WHERE o_orderkey % 10 = 4
      |  UNION ALL
      |  SELECT o_orderkey + 5000000000, o_custkey, 'X', o_totalprice, o_orderdate, o_orderpriority,
      |         'D', TIMESTAMP '2030-01-01 00:00:00', 1
      |  FROM orders WHERE o_orderkey % 10 = 5
      |)""".stripMargin

  val q17_sql: String =
    s"""WITH $StagingRawSql,
      |dedup AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority, op
      |  FROM (
      |    SELECT *, ROW_NUMBER() OVER (
      |      PARTITION BY o_orderkey
      |      ORDER BY load_ts DESC,
      |        CASE op WHEN 'D' THEN 3 WHEN 'U' THEN 2 WHEN 'I' THEN 1 ELSE 0 END DESC,
      |        seq DESC) AS rn
      |    FROM staging_raw) t
      |  WHERE rn = 1
      |),
      |merged AS (
      |  SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus, t.o_totalprice, t.o_orderdate, t.o_orderpriority
      |  FROM orders t
      |  WHERE NOT EXISTS (SELECT 1 FROM dedup s WHERE s.o_orderkey = t.o_orderkey)
      |  UNION ALL
      |  SELECT t.o_orderkey, s.o_custkey, s.o_orderstatus, s.o_totalprice, s.o_orderdate, s.o_orderpriority
      |  FROM orders t JOIN dedup s ON s.o_orderkey = t.o_orderkey
      |  WHERE s.op NOT IN ('D')
      |  UNION ALL
      |  SELECT s.o_orderkey, s.o_custkey, s.o_orderstatus, s.o_totalprice, s.o_orderdate, s.o_orderpriority
      |  FROM dedup s
      |  WHERE NOT EXISTS (SELECT 1 FROM orders t WHERE t.o_orderkey = s.o_orderkey)
      |)
      |SELECT * FROM merged ORDER BY o_orderkey""".stripMargin

  /** All core queries + oracles. */
  val queries: Map[String, Q] = Map(
    "q01_pricing_summary" -> q01_pricing_summary,
    "q02_conditional_agg" -> q02_conditional_agg,
    "q03_monthly_rollup" -> q03_monthly_rollup,
    "q04_checksum" -> q04_checksum,
    "q05_dup_gate" -> q05_dup_gate,
    "q06_summary_stats" -> q06_summary_stats,
    "q07_join_revenue_by_nation" -> q07_join_revenue_by_nation,
    "q08_semi_join" -> q08_semi_join,
    "q09_anti_join" -> q09_anti_join,
    "q10_scalar_subquery" -> q10_scalar_subquery,
    "q11_predicate_stack" -> q11_predicate_stack,
    "q12_case_projection" -> q12_case_projection,
    "q13_topk" -> q13_topk,
    "q14_having_duplicates" -> q14_having_duplicates,
    "q15_union_freshness" -> q15_union_freshness,
    "q16_latest_per_key" -> q16_latest_per_key,
    "q17_cdc_merge" -> q17_cdc_merge)

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01_sql,
    "q02_conditional_agg" -> q02_sql,
    "q03_monthly_rollup" -> q03_sql,
    "q04_checksum" -> q04_sql,
    "q05_dup_gate" -> q05_sql,
    "q06_summary_stats" -> q06_sql,
    "q07_join_revenue_by_nation" -> q07_sql,
    "q08_semi_join" -> q08_sql,
    "q09_anti_join" -> q09_sql,
    "q10_scalar_subquery" -> q10_sql,
    "q11_predicate_stack" -> q11_sql,
    "q12_case_projection" -> q12_sql,
    "q13_topk" -> q13_sql,
    "q14_having_duplicates" -> q14_sql,
    "q15_union_freshness" -> q15_sql,
    "q16_latest_per_key" -> q16_sql,
    "q17_cdc_merge" -> q17_sql)
}
