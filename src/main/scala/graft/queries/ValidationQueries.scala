package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** The reference's 18-validation corpus
  * (reference: DATA_VALIDATION_QUERIES.sql:1-311) ported onto the
  * testdata tables. Validations already embodied by q01-q16 (counts,
  * conditional aggregates, duplicate finder, month buckets, checksum,
  * freshness-union, top-k) are not duplicated; this module covers the
  * remainder: catalog/schema introspection (V11/V12/V14/V18), per-table
  * checksums (V8 over many tables), status breakdowns (V9), freshness
  * with an explicit minute-difference (V10), date-range distribution with
  * distinct users (V13), NULL-count audit (V5), and the §2.8 scalar
  * function set (LEFT/POSITION/ROUND/INTERVAL/DATEDIFF).
  *
  * Determinism: "now" is a fixed literal (the reference compares two live
  * systems; the rebuild compares two engines — wall-clock must not leak
  * into hashed output); minute differences use an explicit epoch-floor
  * formula because engine DATEDIFF boundary semantics differ.
  */
object ValidationQueries {

  type Q = (SparkSession, String) => DataFrame

  private val ScalarTables =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  /** V1+V14+V18: per-table row/column counts with a summary row —
    * the catalog sweep, schema read from the engine, not hardcoded.
    */
  val v01_table_summary: Q = (s, dir) => {
    val perTable: Seq[DataFrame] = ScalarTables.map { t =>
      val df = Tables(s, dir, t)
      df.agg(count(lit(1)).as("row_count"))
        .select(lit(t).as("table_name"), col("row_count"),
          lit(df.schema.length).cast(LongType).as("column_count"))
    }
    perTable.reduce(_.unionAll(_))
      .orderBy(col("table_name"))
  }

  val v01_sql: String = {
    val branches = ScalarTables.map { t =>
      s"""SELECT '$t' AS table_name, COUNT(*) AS row_count,
         |  (SELECT COUNT(*) FROM pragma_table_info('$t')) AS column_count
         |FROM $t""".stripMargin
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
  }

  /** V8 across tables: row count + key checksum per keyed table. */
  val v02_checksums: Q = (s, dir) => {
    val keyed = Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
      "part" -> "p_partkey", "supplier" -> "s_suppkey", "events" -> "event_id")
    keyed.map { case (t, k) =>
      Tables(s, dir, t).agg(
          count(lit(1)).as("row_count"),
          sum(col(k).cast(LongType)).as("sum_ids"))
        .select(lit(t).as("table_name"), col("row_count"), col("sum_ids"),
          md5(col("sum_ids").cast(StringType)).as("checksum"))
    }.reduce(_.unionAll(_)).orderBy(col("table_name"))
  }

  val v02_sql: String = {
    val keyed = Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
      "part" -> "p_partkey", "supplier" -> "s_suppkey", "events" -> "event_id")
    keyed.map { case (t, k) =>
      s"""SELECT '$t' AS table_name, COUNT(*) AS row_count,
         |  CAST(SUM(CAST($k AS BIGINT)) AS BIGINT) AS sum_ids,
         |  MD5(CAST(SUM(CAST($k AS BIGINT)) AS VARCHAR)) AS checksum
         |FROM $t""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
  }

  /** V9: record count by status/category with first/last seen. */
  val v03_status_breakdown: Q = (s, dir) => {
    Tables(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        min(col("ts")).as("first_seen"),
        max(col("ts")).as("last_seen"))
      .orderBy(col("cnt").desc, col("event_type"))
  }

  val v03_sql: String =
    """SELECT event_type, COUNT(*) AS cnt,
      |  CAST(MIN(ts) AS TIMESTAMP) AS first_seen,
      |  CAST(MAX(ts) AS TIMESTAMP) AS last_seen
      |FROM events
      |GROUP BY event_type
      |ORDER BY cnt DESC, event_type""".stripMargin

  /** V10: freshness — minutes between each table's newest record and a
    * fixed "now" (epoch-floor minute difference; see module doc).
    */
  val v04_freshness: Q = (s, dir) => {
    val now = "2026-01-01 00:00:00"
    def branch(t: String, tsCol: String): DataFrame =
      Tables(s, dir, t).agg(
          count(lit(1)).as("total_rows"),
          max(col(tsCol).cast(TimestampType)).as("latest_record"))
        .select(lit(t).as("table_name"), col("total_rows"), col("latest_record"),
          floor((unix_timestamp(to_timestamp(lit(now))) - unix_timestamp(col("latest_record"))) / 60)
            .as("minutes_old"))
    branch("orders", "o_orderdate")
      .unionAll(branch("lineitem", "l_shipdate"))
      .unionAll(branch("events", "ts"))
      .orderBy(col("table_name"))
  }

  val v04_sql: String = {
    def branch(t: String, tsCol: String) =
      s"""SELECT '$t' AS table_name, COUNT(*) AS total_rows,
         |  CAST(MAX($tsCol) AS TIMESTAMP) AS latest_record,
         |  CAST(FLOOR((CAST(FLOOR(date_part('epoch', TIMESTAMP '2026-01-01 00:00:00')) AS BIGINT)
         |      - CAST(FLOOR(date_part('epoch', CAST(MAX($tsCol) AS TIMESTAMP))) AS BIGINT)) / 60) AS BIGINT) AS minutes_old
         |FROM $t""".stripMargin
    Seq(branch("orders", "o_orderdate"), branch("lineitem", "l_shipdate"),
      branch("events", "ts")).mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
  }

  /** V11/V12: full schema introspection — table, column, type, position —
    * read from the engine catalog (df.schema), checked against DuckDB's
    * view of the same parquet (type names normalized).
    */
  val v05_schema_info: Q = (s, dir) => {
    val rows: Seq[Row] = ScalarTables.flatMap { t =>
      Tables(s, dir, t).schema.fields.zipWithIndex.map { case (f, i) =>
        // parquet NTZ timestamps surface as timestamp_ntz in Spark 4 and
        // TIMESTAMP in DuckDB — one wall-clock type, one catalog name
        val typeName = f.dataType.simpleString.replace("timestamp_ntz", "timestamp")
        Row(t, f.name, typeName, f.nullable, i + 1)
      }
    }
    val schema = StructType(Seq(
      StructField("table_name", StringType), StructField("column_name", StringType),
      StructField("data_type", StringType), StructField("is_nullable", BooleanType),
      StructField("ordinal_position", IntegerType)))
    s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
      .orderBy(col("table_name"), col("ordinal_position"))
  }

  val v05_sql: String = {
    val branches = ScalarTables.map { t =>
      s"""SELECT '$t' AS table_name, name AS column_name,
         |  CASE type
         |    WHEN 'BIGINT' THEN 'bigint' WHEN 'INTEGER' THEN 'int'
         |    WHEN 'VARCHAR' THEN 'string' WHEN 'DOUBLE' THEN 'double'
         |    WHEN 'FLOAT' THEN 'float' WHEN 'TIMESTAMP' THEN 'timestamp'
         |    WHEN 'FLOAT[]' THEN 'array<float>' ELSE lower(type) END AS data_type,
         |  (NOT "notnull") AS is_nullable,
         |  cid + 1 AS ordinal_position
         |FROM pragma_table_info('$t')""".stripMargin
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY table_name, ordinal_position")
  }

  /** V5: NULL-value audit over key business columns. */
  val v06_null_counts: Q = (s, dir) => {
    Tables(s, dir, "events").agg(
      count(lit(1)).as("total_rows"),
      sum(when(col("user_id").isNull, 1).otherwise(0)).as("null_user_id"),
      sum(when(col("event_type").isNull, 1).otherwise(0)).as("null_event_type"),
      sum(when(col("props").isNull, 1).otherwise(0)).as("null_props"),
      sum(when(col("value").isNull, 1).otherwise(0)).as("null_value"))
  }

  val v06_sql: String =
    """SELECT COUNT(*) AS total_rows,
      |  CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
      |  CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_type,
      |  CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
      |  CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value
      |FROM events""".stripMargin

  /** V13: month distribution with distinct-entity counts, range-bounded. */
  val v07_date_distribution: Q = (s, dir) => {
    Tables(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01"))
      .groupBy(trunc(col("o_orderdate"), "month").as("month"))
      .agg(count(lit(1)).as("row_count"),
        count_distinct(col("o_custkey")).as("unique_customers"))
      .orderBy(col("month").desc)
  }

  val v07_sql: String =
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |  COUNT(*) AS row_count,
      |  COUNT(DISTINCT o_custkey) AS unique_customers
      |FROM orders
      |WHERE o_orderdate >= '1997-01-01'
      |GROUP BY 1
      |ORDER BY month DESC""".stripMargin

  /** §2.8 scalar-function sweep: LEFT/substring, POSITION/locate, ROUND,
    * date +INTERVAL, day difference — every remaining scalar from the
    * reference's generated SQL and ops docs
    * (DEPLOY_FILE_DEDUPLICATION.md:201; AUTOMATIC_CLEANUP.md:247).
    */
  val v08_scalar_functions: Q = (s, dir) => {
    Tables(s, dir, "part")
      .filter(col("p_partkey") <= 1000)
      .select(
        col("p_partkey"),
        substring(col("p_name"), 1, 8).as("name_left8"),
        locate(" ", col("p_name")).as("first_space"),
        round(col("p_size").cast(DoubleType) / 7.0, 2).as("size_ratio"),
        upper(substring(col("p_brand"), 1, 5)).as("brand_upper"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy(col("p_partkey"))
  }

  val v08_sql: String =
    """SELECT p_partkey,
      |  substr(p_name, 1, 8) AS name_left8,
      |  CAST(position(' ' IN p_name) AS INT) AS first_space,
      |  ROUND(CAST(p_size AS DOUBLE) / 7.0, 2) AS size_ratio,
      |  upper(substr(p_brand, 1, 5)) AS brand_upper,
      |  concat_ws('-', p_brand, p_type) AS brand_type
      |FROM part
      |WHERE p_partkey <= 1000
      |ORDER BY p_partkey""".stripMargin

  /** P6: INTERVAL arithmetic + explicit day difference on dates. */
  val v09_interval_arith: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .filter(col("l_orderkey") <= 400)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_shipdate") + expr("INTERVAL 30 DAYS")).as("ship_plus_30d"),
        datediff(to_date(lit("2000-01-01")), to_date(col("l_shipdate"))).as("days_to_y2k"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val v09_sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  l_shipdate + INTERVAL 30 DAY AS ship_plus_30d,
      |  CAST(date_diff('day', CAST(l_shipdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_y2k
      |FROM lineitem
      |WHERE l_orderkey <= 400
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** J4 (the reference's cross-system comparison join,
    * validate_data_redshift_firebolt.py:102-116): two per-key count
    * relations full-outer-joined with indicator semantics and zero-fill.
    * Here: per-customer order counts vs per-customer lineitem-order
    * counts — mismatch rows surface exactly like the count-diff report.
    */
  val v10_fullouter_compare: Q = (s, dir) => {
    val orders = Tables(s, dir, "orders")
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("order_cnt"))
    val bigOrders = Tables(s, dir, "orders").filter(col("o_totalprice") > 100000.0)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("big_cnt"))
    orders.join(bigOrders, Seq("custkey"), "full_outer")
      .na.fill(0, Seq("order_cnt", "big_cnt"))
      .withColumn("diff", col("order_cnt") - col("big_cnt"))
      .filter(col("diff") > 0)
      .orderBy(col("custkey"))
  }

  val v10_sql: String =
    """WITH a AS (SELECT o_custkey AS custkey, COUNT(*) AS order_cnt FROM orders GROUP BY 1),
      |b AS (SELECT o_custkey AS custkey, COUNT(*) AS big_cnt FROM orders
      |      WHERE o_totalprice > 100000.0 GROUP BY 1)
      |SELECT COALESCE(a.custkey, b.custkey) AS custkey,
      |       COALESCE(order_cnt, 0) AS order_cnt,
      |       COALESCE(big_cnt, 0) AS big_cnt,
      |       COALESCE(order_cnt, 0) - COALESCE(big_cnt, 0) AS diff
      |FROM a FULL OUTER JOIN b ON a.custkey = b.custkey
      |WHERE COALESCE(order_cnt, 0) - COALESCE(big_cnt, 0) > 0
      |ORDER BY custkey""".stripMargin

  /** U2 (set difference, schema_evolution_tracker.py:111-118): customers
    * present in the base table but absent from the active-order set.
    */
  val v11_set_difference: Q = (s, dir) => {
    val all = Tables(s, dir, "customer").select(col("c_custkey").as("custkey"))
    val active = Tables(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    all.except(active).orderBy(col("custkey"))
  }

  val v11_sql: String =
    """SELECT c_custkey AS custkey FROM customer
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY custkey""".stripMargin

  /** Multiset (bag) set ops — EXCEPT ALL / INTERSECT ALL keep
    * MULTIPLICITY, which the v11 DISTINCT forms erase: a customer with
    * 3 'O' orders and 1 'F' order appears 2× in the except-all
    * (3 − 1) and 1× in the intersect-all (min(3, 1)). Spark plans both
    * as a single aggregate computing per-key counts then a generate —
    * one shuffle, no join; the same shape DuckDB executes.
    */
  val v13_multiset_ops: Q = (s, dir) => {
    val open = Tables(s, dir, "orders")
      .filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey"))
    val finished = Tables(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    open.exceptAll(finished).groupBy("custkey")
      .agg(count(lit(1)).as("surplus_open"))
      .join(
        open.intersectAll(finished).groupBy("custkey")
          .agg(count(lit(1)).as("common_min")),
        Seq("custkey"), "full")
      .select(col("custkey"),
        coalesce(col("surplus_open"), lit(0L)).as("surplus_open"),
        coalesce(col("common_min"), lit(0L)).as("common_min"))
      .orderBy(col("custkey"))
  }

  val v13_sql: String =
    """WITH open AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'),
      |fin AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'),
      |ex AS (
      |  SELECT custkey, CAST(COUNT(*) AS BIGINT) AS surplus_open
      |  FROM (SELECT custkey FROM open EXCEPT ALL SELECT custkey FROM fin)
      |  GROUP BY custkey
      |),
      |ia AS (
      |  SELECT custkey, CAST(COUNT(*) AS BIGINT) AS common_min
      |  FROM (SELECT custkey FROM open INTERSECT ALL SELECT custkey FROM fin)
      |  GROUP BY custkey
      |)
      |SELECT COALESCE(ex.custkey, ia.custkey) AS custkey,
      |       COALESCE(ex.surplus_open, 0) AS surplus_open,
      |       COALESCE(ia.common_min, 0) AS common_min
      |FROM ex FULL JOIN ia ON ia.custkey = ex.custkey
      |ORDER BY custkey""".stripMargin

  /** Per-column drift profile between two table versions — a
    * beyond-reference EXTENSION of the reference validation runner's
    * table-level compare (validate_data_redshift_firebolt.py:132-185
    * compares aggregate stats — count/distinct/min/max — per table; this
    * drills to per-column mismatch counts, which that runner cannot
    * see): a synthetic
    * "remote" copy of orders with planted drift (price +1 cent on
    * %97=0, priority nulled on %101=0, rows %103=0 missing), full-outer
    * joined on the key, then per-column mismatch counts with
    * null-aware comparison (IS DISTINCT FROM ≡ not <=>). One row out;
    * price compares in integer cents so the count replays exactly.
    */
  val v12_column_drift: Q = (s, dir) => {
    val l = Tables(s, dir, "orders").select(
      col("o_orderkey"), round(col("o_totalprice") * 100).cast("long").as("l_cents"),
      col("o_orderpriority").as("l_prio"))
    val r = Tables(s, dir, "orders")
      .filter(col("o_orderkey") % 103 =!= 0)
      .select(col("o_orderkey").as("r_key"),
        (round(col("o_totalprice") * 100).cast("long") +
          when(col("o_orderkey") % 97 === 0, 1L).otherwise(0L)).as("r_cents"),
        when(col("o_orderkey") % 101 === 0, lit(null).cast("string"))
          .otherwise(col("o_orderpriority")).as("r_prio"))
    l.join(r, col("o_orderkey") === col("r_key"), "full_outer")
      .agg(
        count(when(col("o_orderkey").isNotNull && col("r_key").isNotNull, 1)).as("n_both"),
        count(when(col("r_key").isNull, 1)).as("n_only_left"),
        count(when(col("o_orderkey").isNull, 1)).as("n_only_right"),
        count(when(col("o_orderkey").isNotNull && col("r_key").isNotNull &&
          !(col("l_cents") <=> col("r_cents")), 1)).as("n_price_drift"),
        count(when(col("o_orderkey").isNotNull && col("r_key").isNotNull &&
          !(col("l_prio") <=> col("r_prio")), 1)).as("n_prio_drift"))
  }

  val v12_sql: String =
    """WITH l AS (
      |  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS l_cents,
      |         o_orderpriority AS l_prio
      |  FROM orders
      |),
      |r AS (
      |  SELECT o_orderkey AS r_key,
      |         CAST(ROUND(o_totalprice * 100) AS BIGINT)
      |           + CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END AS r_cents,
      |         CASE WHEN o_orderkey % 101 = 0 THEN NULL ELSE o_orderpriority END AS r_prio
      |  FROM orders WHERE o_orderkey % 103 <> 0
      |)
      |SELECT CAST(COUNT(CASE WHEN o_orderkey IS NOT NULL AND r_key IS NOT NULL THEN 1 END) AS BIGINT) AS n_both,
      |       CAST(COUNT(CASE WHEN r_key IS NULL THEN 1 END) AS BIGINT) AS n_only_left,
      |       CAST(COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS BIGINT) AS n_only_right,
      |       CAST(COUNT(CASE WHEN o_orderkey IS NOT NULL AND r_key IS NOT NULL
      |                        AND l_cents IS DISTINCT FROM r_cents THEN 1 END) AS BIGINT) AS n_price_drift,
      |       CAST(COUNT(CASE WHEN o_orderkey IS NOT NULL AND r_key IS NOT NULL
      |                        AND l_prio IS DISTINCT FROM r_prio THEN 1 END) AS BIGINT) AS n_prio_drift
      |FROM l FULL OUTER JOIN r ON l.o_orderkey = r.r_key""".stripMargin

  /** Key-skew diagnostics over lineitem's order key
    * ([[graft.operators.SkewJoin.keySkewReport]]): group-size
    * distribution (exact p50/p99 via the size histogram — the global
    * window never sees |keys| rows), max group, uniformity ratio in
    * ppm, and the 5 heaviest keys. This is the measurement that
    * decides when q19's salted join / AQE skew split is warranted.
    */
  val v14_key_skew: Q = (s, dir) =>
    graft.operators.SkewJoin.keySkewReport(
      Tables(s, dir, "lineitem"), "l_orderkey", topK = 5)

  val v14_sql: String =
    """WITH cnts AS (
      |  SELECT CAST(l_orderkey AS BIGINT) AS key, COUNT(*) AS cnt
      |  FROM lineitem GROUP BY 1
      |),
      |tot AS (SELECT COUNT(*) AS n_keys, SUM(cnt) AS n_rows,
      |               MAX(cnt) AS max_group FROM cnts),
      |cum AS (
      |  SELECT cnt, SUM(freq) OVER (ORDER BY cnt) AS cum
      |  FROM (SELECT cnt, COUNT(*) AS freq FROM cnts GROUP BY 1)
      |),
      |top AS (
      |  SELECT key, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rn
      |  FROM cnts QUALIFY rn <= 5
      |)
      |SELECT metric, CAST(value AS BIGINT) AS value FROM (
      |  SELECT 'n_keys' AS metric, n_keys AS value FROM tot
      |  UNION ALL SELECT 'n_rows', n_rows FROM tot
      |  UNION ALL SELECT 'max_group', max_group FROM tot
      |  UNION ALL SELECT 'skew_ppm', (max_group * 1000000 * n_keys) // n_rows FROM tot
      |  UNION ALL SELECT 'p50_group',
      |    (SELECT MIN(cnt) FROM cum, tot WHERE cum * 100 >= n_keys * 50)
      |  UNION ALL SELECT 'p99_group',
      |    (SELECT MIN(cnt) FROM cum, tot WHERE cum * 100 >= n_keys * 99)
      |  UNION ALL SELECT 'top' || rn || '_key', key FROM top
      |  UNION ALL SELECT 'top' || rn || '_cnt', cnt FROM top
      |) t
      |ORDER BY metric""".stripMargin

  val queries: Map[String, Q] = Map(
    "v14_key_skew" -> v14_key_skew,
    "v12_column_drift" -> v12_column_drift,
    "v10_fullouter_compare" -> v10_fullouter_compare,
    "v11_set_difference" -> v11_set_difference,
    "v13_multiset_ops" -> v13_multiset_ops,
    "v01_table_summary" -> v01_table_summary,
    "v02_checksums" -> v02_checksums,
    "v03_status_breakdown" -> v03_status_breakdown,
    "v04_freshness" -> v04_freshness,
    "v05_schema_info" -> v05_schema_info,
    "v06_null_counts" -> v06_null_counts,
    "v07_date_distribution" -> v07_date_distribution,
    "v08_scalar_functions" -> v08_scalar_functions,
    "v09_interval_arith" -> v09_interval_arith)

  val oracles: Map[String, String] = Map(
    "v14_key_skew" -> v14_sql,
    "v12_column_drift" -> v12_sql,
    "v10_fullouter_compare" -> v10_sql,
    "v11_set_difference" -> v11_sql,
    "v13_multiset_ops" -> v13_sql,
    "v01_table_summary" -> v01_sql,
    "v02_checksums" -> v02_sql,
    "v03_status_breakdown" -> v03_sql,
    "v04_freshness" -> v04_sql,
    "v05_schema_info" -> v05_sql,
    "v06_null_counts" -> v06_sql,
    "v07_date_distribution" -> v07_sql,
    "v08_scalar_functions" -> v08_sql,
    "v09_interval_arith" -> v09_sql)
}
