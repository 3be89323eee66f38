package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.Tables
import graft.functions.ZInterleave
import graft.operators.{Sampling, Scoring}

/** Round-8 second-half surface: model-inference scoring, storage-layout
  * (Z-order) clustering, ANALYZE-style catalog statistics, sketch
  * cardinality gating, and weighted sampling — the remaining pieces a
  * 100 TB training-data platform runs beside the query engine proper.
  *
  * Shared discipline with the rest of the suite: scores and decisions
  * are integer-exact (or pure functions of md5-derived integers), so
  * every query here hash-matches a DuckDB replay; engine-private
  * float formatting never reaches an output column.
  */
object AnalyticsQueries {

  type Q = (SparkSession, String) => DataFrame

  /** The DuckDB replica of [[graft.functions.TextFunctions.tokens]] —
    * same string as the t01 oracle family uses.
    */
  private val ToksSql =
    """list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')"""

  // ───────────────────────────── t16: linear classifier inference

  /** fastText-style quality-model inference over the corpus: broadcast
    * vocabulary join + one hash aggregate; integer-exact logits (see
    * [[Scoring]]).
    */
  val t16_classifier_score: Q = (s, dir) => {
    Scoring.classifierScore(Tables(s, dir, "documents"), "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))
  }

  val t16_sql: String = {
    val bias = Scoring.DefaultBiasMilli
    s"""WITH vocab(tok, w_milli) AS (VALUES ${Scoring.vocabValuesSql()}),
       |base AS (
       |  SELECT doc_id, CAST(len($ToksSql) AS BIGINT) AS n_tokens FROM documents
       |),
       |toks AS (
       |  SELECT doc_id, unnest($ToksSql) AS tok FROM documents
       |),
       |hits AS (
       |  SELECT t.doc_id, COUNT(*) AS matched, SUM(v.w_milli) AS sum_w
       |  FROM toks t JOIN vocab v ON t.tok = v.tok
       |  GROUP BY t.doc_id
       |)
       |SELECT b.doc_id, b.n_tokens,
       |  COALESCE(h.matched, 0) AS matched,
       |  CAST(b.n_tokens * ($bias) + COALESCE(h.sum_w, 0) AS BIGINT) AS score_num,
       |  (b.n_tokens * ($bias) + COALESCE(h.sum_w, 0)) > 0 AS accept
       |FROM base b LEFT JOIN hits h USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // ───────────────────────────── t17: sketch-cardinality gate

  /** HLL approx-distinct audited against the exact count per language —
    * the sketch-vs-truth gate a metadata/stats collector runs before
    * trusting sketches for 100 TB planning decisions. The approx value
    * itself is engine-private (different HLL implementations), so the
    * output carries the exact count plus the within-tolerance verdict —
    * both engines' sketches must land inside the same ±15% band
    * (3× the requested 5% rsd) for the row to agree, the s05/t14
    * gate pattern.
    */
  val t17_distinct_gate: Q = (s, dir) => {
    Tables(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("exact_distinct"),
        approx_count_distinct(md5(col("text")), 0.05).as("approx"))
      .select(col("lang"), col("n_docs"), col("exact_distinct"),
        (abs(col("approx") - col("exact_distinct")) <=
          col("exact_distinct") * 0.15).as("within_gate"))
      .orderBy(col("lang"))
  }

  val t17_sql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT md5(text)) AS exact_distinct,
      |  (abs(approx_count_distinct(md5(text)) - COUNT(DISTINCT md5(text)))
      |     <= COUNT(DISTINCT md5(text)) * 0.15) AS within_gate
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ───────────────────────────── d34: Z-order layout clustering

  /** Z-order (Morton) layout audit over orders: interleave
    * (customer, order-day) into a Morton code ([[ZInterleave]],
    * codegen'd), bucket by the code's top 14 bits (512×512 tiles), and
    * report each tile's row count and per-dimension min/max spans.
    * Every bucket bounds BOTH dimensions (span ≤ 511 vs the global
    * ~1500 × ~2400 domain) — the property that makes parquet min/max
    * footer stats prune scans on either predicate when a 100 TB table
    * is written in this order. The same codes feed
    * [[graft.operators.Compaction]] to actually lay files out.
    */
  val d34_zorder_layout: Q = (s, dir) => {
    val epoch = to_date(lit("1970-01-01"))
    val z = Tables(s, dir, "orders").select(
      (col("o_custkey") % 65536).cast(IntegerType).as("x"),
      (datediff(to_date(col("o_orderdate")), epoch) % 65536)
        .cast(IntegerType).as("y"))
      .withColumn("zval", ZInterleave(col("x"), col("y")))
    z.groupBy(shiftright(col("zval"), 18).as("zbucket"))
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .select(col("zbucket"), col("n_rows"),
        col("min_x"), col("max_x"), (col("max_x") - col("min_x")).as("x_span"),
        col("min_y"), col("max_y"), (col("max_y") - col("min_y")).as("y_span"))
      .orderBy(col("zbucket"))
  }

  val d34_sql: String =
    """WITH dims AS (
      |  SELECT CAST(o_custkey % 65536 AS INTEGER) AS x,
      |         CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') % 65536 AS INTEGER) AS y
      |  FROM orders
      |), z AS (
      |  SELECT x, y,
      |    CAST(list_sum(list_transform(range(0, 16), i ->
      |      (CAST((x >> i) & 1 AS BIGINT) << (2*i))
      |      + (CAST((y >> i) & 1 AS BIGINT) << (2*i + 1)))) AS BIGINT) AS zval
      |  FROM dims
      |)
      |SELECT zval >> 18 AS zbucket, COUNT(*) AS n_rows,
      |  MIN(x) AS min_x, MAX(x) AS max_x, MAX(x) - MIN(x) AS x_span,
      |  MIN(y) AS min_y, MAX(y) AS max_y, MAX(y) - MIN(y) AS y_span
      |FROM z
      |GROUP BY zval >> 18
      |ORDER BY zbucket""".stripMargin

  // ───────────────────────────── d35: weighted sample w/o replacement

  /** Efraimidis-Spirakis weighted sampling, 5 docs per source weighted
    * by length — deterministic (md5-derived uniforms), exact
    * without-replacement semantics, one WindowGroupLimit-prunable rank
    * window (see [[Sampling.weightedSample]]).
    */
  val d35_weighted_sample: Q = (s, dir) => {
    Sampling.weightedSample(
        Tables(s, dir, "documents"), "doc_id", "n_chars", "source", k = 5)
      .select(col("source"), col("sample_rank").cast(LongType).as("sample_rank"),
        col("doc_id"), col("n_chars"))
      .orderBy(col("source"), col("sample_rank"))
  }

  val d35_sql: String =
    """WITH keyed AS (
      |  SELECT source, doc_id, n_chars,
      |    ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
      |       / 1152921504606846976.0) / n_chars AS ares_key
      |  FROM documents WHERE n_chars > 0
      |), ranked AS (
      |  SELECT source, doc_id, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY ares_key DESC, doc_id) AS sample_rank
      |  FROM keyed
      |)
      |SELECT source, CAST(sample_rank AS BIGINT) AS sample_rank, doc_id, n_chars
      |FROM ranked WHERE sample_rank <= 5
      |ORDER BY source, sample_rank""".stripMargin

  // ───────────────────────────── v16: single-pass column profile

  private val ProfileNumCols = Seq("o_orderkey", "o_custkey", "o_totalprice")
  private val ProfileStrCols = Seq("o_orderstatus", "o_orderpriority")

  /** ANALYZE-style catalog statistics in ONE scan: per-column non-null
    * count, exact NDV, and min/max for every column of orders —
    * numerics (and the date, as epoch days) as doubles, strings as
    * strings. One aggregate (Catalyst expands the multi-distinct into
    * a single Expand + one shuffle — the honest exact-NDV shape) and a
    * `stack` generator melts the stats row into (column, stats) rows.
    * This is the statistics pass a planner runs to size joins and pick
    * broadcast sides at 100 TB.
    */
  val v16_column_profile: Q = (s, dir) => {
    val orders = Tables(s, dir, "orders")
    val epoch = to_date(lit("1970-01-01"))
    val aggs: Seq[org.apache.spark.sql.Column] =
      ProfileNumCols.flatMap { c => Seq(
        count(col(c)).as(s"${c}_nn"),
        countDistinct(col(c)).as(s"${c}_ndv"),
        min(col(c)).cast(DoubleType).as(s"${c}_min_num"),
        max(col(c)).cast(DoubleType).as(s"${c}_max_num"))
      } ++ ProfileStrCols.flatMap { c => Seq(
        count(col(c)).as(s"${c}_nn"),
        countDistinct(col(c)).as(s"${c}_ndv"),
        min(col(c)).as(s"${c}_min_str"),
        max(col(c)).as(s"${c}_max_str"))
      } ++ Seq(
        count(col("o_orderdate")).as("o_orderdate_nn"),
        countDistinct(col("o_orderdate")).as("o_orderdate_ndv"),
        datediff(to_date(min(col("o_orderdate"))), epoch)
          .cast(DoubleType).as("o_orderdate_min_num"),
        datediff(to_date(max(col("o_orderdate"))), epoch)
          .cast(DoubleType).as("o_orderdate_max_num"))
    val one = orders.agg(aggs.head, aggs.tail: _*)
    val numEntry = (c: String) =>
      s"'$c', ${c}_nn, ${c}_ndv, ${c}_min_num, ${c}_max_num, CAST(NULL AS STRING), CAST(NULL AS STRING)"
    val strEntry = (c: String) =>
      s"'$c', ${c}_nn, ${c}_ndv, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), ${c}_min_str, ${c}_max_str"
    val entries = (ProfileNumCols :+ "o_orderdate").map(numEntry) ++
      ProfileStrCols.map(strEntry)
    one.selectExpr(
      s"stack(${entries.length}, ${entries.mkString(", ")}) AS " +
        "(column_name, non_null, ndv, min_num, max_num, min_str, max_str)")
      .orderBy(col("column_name"))
  }

  val v16_sql: String = {
    def numBranch(c: String, minExpr: String, maxExpr: String) =
      s"""SELECT '$c' AS column_name, COUNT($c) AS non_null,
         |  COUNT(DISTINCT $c) AS ndv,
         |  CAST($minExpr AS DOUBLE) AS min_num, CAST($maxExpr AS DOUBLE) AS max_num,
         |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         |FROM orders""".stripMargin
    def strBranch(c: String) =
      s"""SELECT '$c' AS column_name, COUNT($c) AS non_null,
         |  COUNT(DISTINCT $c) AS ndv,
         |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
         |  MIN($c) AS min_str, MAX($c) AS max_str
         |FROM orders""".stripMargin
    val branches =
      ProfileNumCols.map(c => numBranch(c, s"MIN($c)", s"MAX($c)")) ++
        Seq(numBranch("o_orderdate",
          "CAST(MIN(o_orderdate) AS DATE) - DATE '1970-01-01'",
          "CAST(MAX(o_orderdate) AS DATE) - DATE '1970-01-01'")) ++
        ProfileStrCols.map(strBranch)
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  // ───────────────────────────── q39: integer-exact anomaly detection

  /** Per-user spend-anomaly audit — the data-quality outlier pass a
    * pipeline runs before trusting a feed: an event is anomalous iff
    * its value sits more than 2 population standard deviations from
    * its user's mean. The 2σ test is evaluated WITHOUT any float:
    * |x−μ| > 2σ  ⟺  (n·x−S)² > 4·(n·SS−S²) over integer cents
    * (multiply through by n²), carried in decimal(38,0) (DuckDB
    * HUGEINT) so the identity survives 100 TB-scale magnitudes — the
    * same integer-exactness discipline as domainMix. One shuffle: the
    * per-user stats ride a window, the verdict is a projection, the
    * final rollup reuses the same partitioning.
    */
  val q39_anomaly_zscore: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val w = Window.partitionBy(col("user_id"))
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), round(col("value") * 100).cast(LongType).as("c"))
    val st = ev
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sv", sum(col("c")).over(w))
      .withColumn("ssv", sum(d(col("c")) * d(col("c"))).over(w))
    val lhs0 = d(col("n")) * d(col("c")) - d(col("sv"))
    val flag = lhs0 * lhs0 >
      lit(4) * (d(col("n")) * col("ssv") - d(col("sv")) * d(col("sv")))
    st.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(flag, 1L).otherwise(0L)).as("n_outliers"))
      .orderBy(col("user_id"))
  }

  val q39_sql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
      |), st AS (
      |  SELECT user_id, c,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n,
      |    SUM(c) OVER (PARTITION BY user_id) AS sv,
      |    SUM(CAST(c AS HUGEINT) * c) OVER (PARTITION BY user_id) AS ssv
      |  FROM ev
      |)
      |SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN (CAST(n AS HUGEINT) * c - sv) * (CAST(n AS HUGEINT) * c - sv)
      |             > 4 * (CAST(n AS HUGEINT) * ssv - CAST(sv AS HUGEINT) * sv)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM st
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q39_anomaly_zscore" -> q39_anomaly_zscore,
    "t16_classifier_score" -> t16_classifier_score,
    "t17_distinct_gate" -> t17_distinct_gate,
    "d34_zorder_layout" -> d34_zorder_layout,
    "d35_weighted_sample" -> d35_weighted_sample,
    "v16_column_profile" -> v16_column_profile)

  val oracles: Map[String, String] = Map(
    "q39_anomaly_zscore" -> q39_sql,
    "t16_classifier_score" -> t16_sql,
    "t17_distinct_gate" -> t17_sql,
    "d34_zorder_layout" -> d34_sql,
    "d35_weighted_sample" -> d35_sql,
    "v16_column_profile" -> v16_sql)
}
