package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.functions.{Redaction, TextFunctions}
import graft.operators.{AsofJoin, Boilerplate, Collocations, Propagation, Quantiles, Sampling, SequencePacking, SkewJoin, TextDedup, VectorSearch}

/** Round-4 curation/enrichment operators as driver-checked queries:
  * as-of join, domain-mixture resampling, sequence packing, exact
  * length quantiles, PII redaction. Same determinism rules as
  * [[DataPipelineQueries]]: no raw floating-point aggregate reaches a
  * hashed output — every decision is integer or pass-through.
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  /** DuckDB mirror of TextFunctions.tokens (shared with t01/t04). */
  private val ToksExpr =
    """list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')"""

  // ── w07: as-of join ─────────────────────────────────────────────────

  /** Each purchase enriched with the latest strictly-prior click by the
    * same user (event id, time, value; nulls when none) — the
    * attribution query, as a single-shuffle as-of join
    * ([[AsofJoin.asofLookup]]) instead of a per-user range join. The
    * oracle replays it with DuckDB's native ASOF LEFT JOIN over
    * tie-collapsed build rows.
    */
  val w07_asof_join: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("b_event_id"),
        col("ts").as("b_ts"), col("value").as("b_value"))
    AsofJoin.asofLookup(purchases, clicks, Seq("user_id"), "ts",
        Seq("b_event_id", "b_ts", "b_value"), strict = true)
      .orderBy(col("event_id"))
  }

  val w07_sql: String =
    """WITH a AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      |  FROM events WHERE event_type = 'purchase'
      |),
      |b AS (
      |  SELECT user_id, ts, b_event_id, b_ts, b_value FROM (
      |    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
      |           event_id AS b_event_id, CAST(ts AS TIMESTAMP) AS b_ts,
      |           value AS b_value,
      |           ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS TIMESTAMP)
      |                              ORDER BY event_id DESC) AS rn
      |    FROM events WHERE event_type = 'click')
      |  WHERE rn = 1
      |)
      |SELECT a.event_id, a.user_id, a.ts, a.value,
      |       b.b_event_id, b.b_ts, b.b_value
      |FROM a ASOF LEFT JOIN b
      |  ON a.user_id = b.user_id AND a.ts > b.ts
      |ORDER BY a.event_id""".stripMargin

  // ── d12: domain-mixture resampling ──────────────────────────────────

  /** Per-language mixture weights (percent) and the corpus budget used
    * by d12 — English-heavy, like a typical pre-training mixture.
    */
  val MixWeights: Map[String, Long] =
    Map("en" -> 40L, "de" -> 15L, "es" -> 15L, "fr" -> 15L, "zh" -> 15L)

  // single source of truth for the d12 corpus budget — interpolated into
  // BOTH the Spark call and the oracle SQL so they cannot desynchronize
  private val MixBudgetNum = 1L
  private val MixBudgetDen = 2L

  /** Resample documents toward the target language mixture at half the
    * corpus budget ([[Sampling.domainMix]]) — membership a pure integer
    * function of doc_id, the data path a single broadcast-join filter.
    */
  val d12_domain_mix: Q = (s, dir) =>
    Sampling.domainMix(Tables(s, dir, "documents"), "doc_id", "lang",
        MixWeights, budgetNum = MixBudgetNum, budgetDen = MixBudgetDen)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  val d12_sql: String = {
    val values = MixWeights.toSeq.sorted
      .map { case (k, w) => s"('$k', $w)" }.mkString(", ")
    s"""WITH c AS (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
       |),
       |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
       |w(lang, wpct) AS (VALUES $values),
       |thr AS (
       |  SELECT c.lang,
       |         LEAST(1000000, CAST(w.wpct AS HUGEINT) * ((tot.total * $MixBudgetNum) // $MixBudgetDen)
       |                        * 1000000 // (100 * c.n)) AS thr
       |  FROM c, tot, w WHERE w.lang = c.lang
       |)
       |SELECT d.doc_id, d.lang
       |FROM documents d JOIN thr ON thr.lang = d.lang
       |WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
       |        % 1000000 < thr.thr
       |ORDER BY d.doc_id""".stripMargin
  }

  // ── d13: sequence packing ───────────────────────────────────────────

  private val PackCtx = 512
  private val PackShards = 8

  /** Pack tokenized documents into 512-token training windows across 8
    * hash shards ([[SequencePacking.pack]]) — shard-local running sums,
    * pure integer outputs.
    */
  val d13_sequence_packing: Q = (s, dir) =>
    SequencePacking.pack(Tables(s, dir, "documents"), "doc_id",
        TextFunctions.tokenCount(col("text")), ctx = PackCtx, shards = PackShards)
      .orderBy(col("doc_id"))

  val d13_sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, doc_id % $PackShards AS shard,
       |         CAST(len($ToksExpr) AS BIGINT) AS n_tokens
       |  FROM documents
       |),
       |c AS (
       |  SELECT doc_id, shard, n_tokens,
       |         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
       |           - n_tokens AS start
       |  FROM t
       |)
       |SELECT doc_id, shard, n_tokens,
       |       CAST(shard * ${SequencePacking.PackIdSpace} + start // $PackCtx AS BIGINT) AS pack_id,
       |       CAST(start % $PackCtx AS BIGINT) AS pack_offset
       |FROM c ORDER BY doc_id""".stripMargin

  // ── t07: exact length deciles ───────────────────────────────────────

  /** Exact per-language deciles of document length
    * ([[Quantiles.exactQuantiles]], q = 10) — rank-based, integer
    * outputs; approx_percentile is the documented 100 TB path.
    */
  val t07_quantiles: Q = (s, dir) =>
    Quantiles.exactQuantiles(Tables(s, dir, "documents"),
        Seq("lang"), "n_chars", "doc_id", q = 10)
      .orderBy(col("lang"), col("quantile"))

  val t07_sql: String =
    """WITH r AS (
      |  SELECT lang, n_chars, doc_id,
      |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
      |         COUNT(*) OVER (PARTITION BY lang) AS cnt
      |  FROM documents
      |)
      |SELECT lang, CAST(p AS INT) AS quantile, n_chars
      |FROM r, range(1, 10) t(p)
      |WHERE rn = (p * cnt + 9) // 10
      |ORDER BY lang, quantile""".stripMargin

  // ── t08: PII redaction ──────────────────────────────────────────────

  /** PII scrub over a corpus with deterministically-planted e-mails
    * (doc_id %7=0) and phone numbers (%11=0): placeholder replacement
    * plus per-doc hit counts ([[Redaction]]). The synthetic documents
    * carry no organic PII, so planting makes the assertion real; both
    * engines plant and scrub with identical expressions.
    */
  val t08_pii_redaction: Q = (s, dir) => {
    // spread the 4-regex-passes-per-row projection across all cores —
    // the single-file corpus otherwise scans as one partition and the
    // whole scrub runs in one task (same fix as d14/t10)
    val planted = Tables(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com now"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call +1-555-"),
            (col("doc_id") % 10000).cast("string"))).otherwise(lit("")))
        .as("text"))
    planted.select(col("doc_id"),
        Redaction.emailCount(col("text")).as("n_emails"),
        Redaction.phoneCount(col("text")).as("n_phones"),
        Redaction.redact(col("text")).as("redacted"))
      .orderBy(col("doc_id"))
  }

  val t08_sql: String = {
    val email = Redaction.EmailPattern
    val phone = Redaction.PhonePattern
    s"""WITH p AS (
       |  SELECT doc_id, text ||
       |    CASE WHEN doc_id % 7 = 0
       |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
       |         ELSE '' END ||
       |    CASE WHEN doc_id % 11 = 0
       |         THEN ' call +1-555-' || CAST(doc_id % 10000 AS VARCHAR)
       |         ELSE '' END AS text
       |  FROM documents
       |)
       |SELECT doc_id,
       |       CAST(len(regexp_extract_all(text, '$email')) AS INT) AS n_emails,
       |       CAST(len(regexp_extract_all(text, '$phone')) AS INT) AS n_phones,
       |       regexp_replace(regexp_replace(text, '$email', '<EMAIL>', 'g'),
       |                      '$phone', '<PHONE>', 'g') AS redacted
       |FROM p ORDER BY doc_id""".stripMargin
  }

  // ── q19: salted skew join ───────────────────────────────────────────

  /** Revenue rollup of the events stream against the customer dimension
    * through [[SkewJoin.saltedJoin]] (8 salt buckets): the hot-key
    * treatment for fact×dim joins where one key dominates — every user's
    * events spread over 8 reducers, the dimension replicated 8×. Salting
    * is invisible to the result, so the oracle is the plain join.
    */
  val q19_skew_join: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("value"))
    val dim = Tables(s, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    SkewJoin.saltedJoin(ev, dim, Seq("user_id"), saltBuckets = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast(LongType)).as("value_cents"))
      .orderBy(col("c_mktsegment"))
  }

  val q19_sql: String =
    """SELECT c.c_mktsegment,
      |       CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM events e JOIN customer c ON c.c_custkey = e.user_id
      |GROUP BY c.c_mktsegment
      |ORDER BY c.c_mktsegment""".stripMargin

  // ── q54: hybrid hot-key skew join ───────────────────────────────────

  /** [[SkewJoin.hybridSkewJoin]] — the production refinement of q19's
    * blanket salting: the three heaviest user_ids (from an exact
    * pre-count here; at 100 TB a [[graft.operators.CountMin]] probe or
    * [[SkewJoin.keySkewReport]] top-k supplies them without a second
    * full scan) take the salted path with the dimension replicated 8×
    * FOR THOSE KEYS ONLY, while the cold majority joins untouched —
    * blanket salting taxes every key with an 8× dimension to fix a
    * handful. The result must be EXACTLY the plain join (each row
    * takes one path; a hot key leaking into both would double its
    * n_events), so the oracle is the unsalted join with a distinct
    * count that pins multiplicities per segment.
    */
  val q54_hybrid_skew_join: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("value"))
    val dim = Tables(s, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    // tiny driver collect: 3 rows, the hot-key list the salter needs
    val hot = ev.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("user_id")).limit(3)
      .collect().map(r => Seq[Any](r.getLong(0))).toSeq
    SkewJoin.hybridSkewJoin(ev, dim, Seq("user_id"), hot, saltBuckets = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(round(col("value") * 100).cast(LongType)).as("value_cents"))
      .orderBy(col("c_mktsegment"))
  }

  val q54_sql: String =
    """SELECT c.c_mktsegment,
      |       CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
      |       CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM events e JOIN customer c ON c.c_custkey = e.user_id
      |GROUP BY c.c_mktsegment
      |ORDER BY c.c_mktsegment""".stripMargin

  // ── q56: sketch-planned skew join ───────────────────────────────────

  /** The 100 TB completion of q54's hot-key story: hot keys come from
    * a [[graft.operators.CountMin]] probe
    * ([[SkewJoin.sketchPlannedJoin]]) instead of an exact per-key
    * pre-count — one map-side-combined sketch pass over the fact side
    * (shuffle state ≤ depth×width cells, never the key universe) and
    * a broadcast probe of the DIMENSION's keys, the only keys an
    * equi-join result can contain. The skew is planted
    * deterministically (60% of events collapse onto user 7) so the
    * detector has something real to find; the threshold is 16× the
    * uniform share, derived from two cheap counts. CM error is
    * one-sided, so a hash collision can only over-salt a cold key —
    * the oracle (the plain unsalted join, multiplicities pinned by the
    * distinct count) is invariant to whatever the sketch decides.
    */
  val q56_sketch_skew_join: Q = (s, dir) => {
    val ev = Tables(s, dir, "events").select(
      when(col("user_id") % 5 < 3, lit(7L))
        .otherwise(col("user_id")).as("user_id"),
      col("value"))
    val dim = Tables(s, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    // two scalar counts (table-stats reads at scale), then the sketch
    val avgShare = math.max(1L,
      ev.count() / math.max(1L, ev.select(col("user_id")).distinct().count()))
    SkewJoin.sketchPlannedJoin(ev, dim, "user_id",
        minHotCount = 16L * avgShare, saltBuckets = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(round(col("value") * 100).cast(LongType)).as("value_cents"))
      .orderBy(col("c_mktsegment"))
  }

  val q56_sql: String =
    """WITH e AS (
      |  SELECT CASE WHEN user_id % 5 < 3 THEN 7 ELSE user_id END AS user_id,
      |         value
      |  FROM events
      |)
      |SELECT c.c_mktsegment,
      |       CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
      |       CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM e JOIN customer c ON c.c_custkey = e.user_id
      |GROUP BY c.c_mktsegment
      |ORDER BY c.c_mktsegment""".stripMargin

  // ── d49: fuzzy name matching (edit-distance join) ───────────────────

  /** Entity-resolution fuzzy matching
    * ([[graft.operators.EditDistanceJoin]]): a "dirty feed" of part
    * names — one deterministic typo per name, the edit TYPE cycling
    * substitution / deletion / insertion by key — must re-link to its
    * clean source through the symmetric-deletion candidate join
    * (candidates are string-length linear, never all-pairs; the
    * codegen'd `levenshtein` verifies). This is the name/title dedup
    * case the shingle family can't serve: one typo shifts every
    * following n-gram, but the deletion neighborhood still collides.
    * Both relations restrict to partkey % 10 = 0 so the oracle's
    * brute-force cross join stays replayable at every scale; the
    * oracle finds EVERY pair within distance 1 (including accidental
    * near-misses between unrelated names), so a lossy candidate
    * scheme loses rows and fails the hash.
    */
  val d49_fuzzy_name_match: Q = (s, dir) => {
    val base = Tables(s, dir, "part").filter(col("p_partkey") % 10 === 0)
      .select(col("p_partkey").as("id"), col("p_name").as("name"))
    val dirty = base.select((col("id") + 1000000L).as("id"),
      when(col("id") % 3 === 0, concat(lit("x"), expr("substring(name, 2)")))
        .when(col("id") % 3 === 1,
          concat(expr("substring(name, 1, 1)"), expr("substring(name, 3)")))
        .otherwise(concat(lit("z"), col("name"))).as("name"))
    graft.operators.EditDistanceJoin
      .joinWithin1(base, "id", "name", dirty, "id", "name")
      .select(col("l_id"), col("r_id"), col("dist"))
      .orderBy(col("l_id"), col("r_id"))
  }

  val d49_sql: String =
    """WITH base AS (
      |  SELECT p_partkey AS id, p_name AS name FROM part
      |  WHERE p_partkey % 10 = 0
      |), dirty AS (
      |  SELECT id + 1000000 AS id,
      |    CASE id % 3
      |      WHEN 0 THEN 'x' || substr(name, 2)
      |      WHEN 1 THEN substr(name, 1, 1) || substr(name, 3)
      |      ELSE 'z' || name END AS name
      |  FROM base
      |)
      |SELECT b.id AS l_id, d.id AS r_id,
      |       CAST(levenshtein(b.name, d.name) AS INTEGER) AS dist
      |FROM base b CROSS JOIN dirty d
      |WHERE levenshtein(b.name, d.name) <= 1
      |ORDER BY l_id, r_id""".stripMargin

  // ── d50: edit-distance join at threshold 2 ──────────────────────────

  /** d49 at threshold TWO ([[graft.operators.EditDistanceJoin
    * .joinWithin]] k=2, the ≤2-deletion neighborhoods): the dirty
    * feed takes TWO edits per name (a deletion + a substitution, or a
    * substitution + an appended character, by key parity), so the
    * k=1 machinery would MISS every planted link and only the
    * quadratic-free 2-deletion pigeonhole recovers them. Same
    * restricted brute-force oracle discipline as d49 — every pair
    * within distance 2 counts, accidental near-misses included.
    */
  val d50_fuzzy_match_k2: Q = (s, dir) => {
    val base = Tables(s, dir, "part").filter(col("p_partkey") % 10 === 0)
      .select(col("p_partkey").as("id"), col("p_name").as("name"))
    val dirty = base.select((col("id") + 1000000L).as("id"),
      when(col("id") % 2 === 0,
        // delete char 2, substitute (new) char 4 with 'q'
        concat(expr("substring(name, 1, 1)"), expr("substring(name, 3, 2)"),
          lit("q"), expr("substring(name, 6)")))
        .otherwise( // substitute first char, append 'q'
          concat(lit("x"), expr("substring(name, 2)"), lit("q"))).as("name"))
    graft.operators.EditDistanceJoin
      .joinWithin(base, "id", "name", dirty, "id", "name", k = 2)
      .select(col("l_id"), col("r_id"), col("dist"))
      .orderBy(col("l_id"), col("r_id"))
  }

  val d50_sql: String =
    """WITH base AS (
      |  SELECT p_partkey AS id, p_name AS name FROM part
      |  WHERE p_partkey % 10 = 0
      |), dirty AS (
      |  SELECT id + 1000000 AS id,
      |    CASE WHEN id % 2 = 0
      |      THEN substr(name, 1, 1) || substr(name, 3, 2) || 'q' || substr(name, 6)
      |      ELSE 'x' || substr(name, 2) || 'q' END AS name
      |  FROM base
      |)
      |SELECT b.id AS l_id, d.id AS r_id,
      |       CAST(levenshtein(b.name, d.name) AS INTEGER) AS dist
      |FROM base b CROSS JOIN dirty d
      |WHERE levenshtein(b.name, d.name) <= 2
      |ORDER BY l_id, r_id""".stripMargin

  // ── t09: per-language quality-percentile gate ───────────────────────

  /** Keep documents at or above their language's 2nd-decile quality —
    * the relative-threshold filter curation pipelines use instead of a
    * global cutoff (each language's quality distribution differs).
    * Composes t01's integer quality score with t07's rank-based decile;
    * the 5-row threshold table broadcasts back onto a codegen filter.
    */
  val t09_quality_filter: Q = (s, dir) => {
    // persist the skinny (id, lang, score) frame: it feeds BOTH the
    // threshold pass and the final filter join, and qualityScore is the
    // expensive tokenizing expression — without the persist the corpus
    // is re-scored per reference. ~24 B/row cached vs a second full
    // text scan at 100 TB. The returned frame stays lazy, so the CALLER
    // owns the cache lifetime (unpersist after materializing, or
    // clearCache between runs as Bench/Verify do) — same contract as
    // TextDedup's persisted shingle relations.
    val scored = Tables(s, dir, "documents").select(col("doc_id"), col("lang"),
      floor(TextFunctions.qualityScore(col("text")) * 1e6).cast(LongType)
        .as("quality_micro"))
      .persist()
    val thr = Quantiles.exactQuantiles(scored, Seq("lang"), "quality_micro",
        "doc_id", q = 10)
      .filter(col("quantile") === 2)
      .select(col("lang"), col("quality_micro").as("__thr"))
    scored.join(broadcast(thr), "lang")
      .filter(col("quality_micro") >= col("__thr"))
      .select(col("doc_id"), col("lang"), col("quality_micro"))
      .orderBy(col("doc_id"))
  }

  val t09_sql: String = {
    // quality formula interpolated from TextFunctions — the same single
    // SQL copy the t01 oracle uses, so the score can't drift between
    // the two gates
    s"""WITH t AS (
       |  SELECT doc_id, lang, text, ${TextFunctions.ToksSql} AS toks
       |  FROM documents
       |),
       |m AS (
       |  SELECT doc_id, lang,
       |         ${TextFunctions.QualityMetricsSql}
       |  FROM t
       |),
       |q AS (
       |  SELECT doc_id, lang,
       |         ${TextFunctions.QualityMicroSql} AS quality_micro
       |  FROM m
       |),
       |r AS (
       |  SELECT lang, quality_micro,
       |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY quality_micro, doc_id) AS rn,
       |         COUNT(*) OVER (PARTITION BY lang) AS cnt
       |  FROM q
       |),
       |thr AS (SELECT lang, quality_micro AS thr FROM r WHERE rn = (2 * cnt + 9) // 10)
       |SELECT q.doc_id, q.lang, q.quality_micro
       |FROM q JOIN thr ON thr.lang = q.lang
       |WHERE q.quality_micro >= thr.thr
       |ORDER BY q.doc_id""".stripMargin
  }

  // ── q20: ROLLUP grouping sets ───────────────────────────────────────

  /** Hierarchical revenue rollup over orders — detail, per-status
    * subtotal, grand total in ONE aggregation pass (Spark `rollup` =
    * grouping-sets expand + a single hash aggregate with map-side
    * partials; never one job per level). `grouping_id` and DuckDB's
    * `GROUPING` share the bitmask convention, so the oracle replays
    * levels exactly; sums are integer cents.
    */
  val q20_rollup: Q = (s, dir) =>
    Tables(s, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast(LongType)).as("revenue_cents"))
      .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))

  val q20_sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
      |       CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin

  // ── d14: document chunking ──────────────────────────────────────────

  private val ChunkSize = 200
  private val ChunkStride = 150

  /** Split documents into overlapping character windows (200 chars,
    * stride 150) — the chunking step in embedding/RAG pipelines. The
    * chunk count is a pure function of the length, so the explode is a
    * codegen `sequence` + `substr` projection (NOT a higher-order
    * lambda over an outer column, which Spark evaluates interpreted per
    * element), one narrow pass at any corpus size. Empty documents are
    * excluded on both engines (integer-division floor/truncation agrees
    * only for non-negative operands).
    */
  val d14_chunking: Q = (s, dir) =>
    Tables(s, dir, "documents")
      .filter(length(col("text")) > 0)
      // single small parquet → 1 input partition; spread the explode
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          expr(s"(length(text) - 1) div $ChunkStride").cast("int"))).as("cno"))
      .select(col("doc_id"), col("cno"),
        expr(s"substr(text, cno * $ChunkStride + 1, $ChunkSize)").as("chunk"))
      .orderBy(col("doc_id"), col("cno"))

  val d14_sql: String =
    s"""WITH t AS (SELECT doc_id, text FROM documents WHERE length(text) > 0),
       |c AS (
       |  SELECT doc_id, text,
       |         unnest(range(0, (length(text) - 1) // $ChunkStride + 1)) AS cno
       |  FROM t
       |)
       |SELECT doc_id, CAST(cno AS INT) AS cno,
       |       substr(text, cno * $ChunkStride + 1, $ChunkSize) AS chunk
       |FROM c ORDER BY doc_id, cno""".stripMargin

  // ── t10: out-of-vocabulary rate ─────────────────────────────────────

  /** Vocabulary size for the OOV gate — small because the synthetic
    * corpus has a small word inventory; a real corpus uses 10⁴-10⁵.
    */
  private val VocabK = 20

  /** Per-document out-of-vocabulary token count against the corpus
    * top-[[VocabK]] vocabulary — the cheap LM-free proxy for "does this
    * document look like the corpus" used in quality filtering. The
    * vocabulary is a map-side-combined count + deterministic top-k
    * (count DESC, token ASC) broadcast back as an anti join: one
    * shuffle for the per-doc counts, nothing corpus-sized ever moves.
    */
  val t10_oov: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
    val toks = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(VocabK)
      .select(col("tok").as("__v"))
    val oov = toks.join(broadcast(vocab), col("tok") === col("__v"), "left_anti")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_oov"))
    docs.select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tokens"))
      .join(oov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .orderBy(col("doc_id"))
  }

  val t10_sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, $ToksExpr AS toks FROM documents
       |),
       |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |vocab AS (
       |  SELECT tok FROM (
       |    SELECT tok, COUNT(*) AS n FROM tok
       |    GROUP BY tok ORDER BY n DESC, tok LIMIT $VocabK)
       |),
       |oov AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_oov FROM tok
       |  WHERE tok NOT IN (SELECT tok FROM vocab)
       |  GROUP BY doc_id
       |)
       |SELECT t.doc_id, CAST(len(t.toks) AS INT) AS n_tokens,
       |       CAST(COALESCE(o.n_oov, 0) AS BIGINT) AS n_oov
       |FROM t LEFT JOIN oov o ON o.doc_id = t.doc_id
       |ORDER BY t.doc_id""".stripMargin

  // ── d15: edit-distance near-dup ─────────────────────────────────────

  private val EditMaxDist = 2
  private val EditMaxLen = 220

  /** Short-document near-dup pairs by edit distance ≤ 2
    * ([[graft.operators.TextDedup.editDistancePairs]]) over the planted
    * corpus — catches the prefix-mutated copies ('zz' + substring) that
    * hash/shingle dedup treats as distinct content, the classic
    * title/caption dedup. Blocking is lossless length banding; the
    * oracle replays the same semantics as a length-filtered all-pairs
    * join (exact at gate scale; the banded Spark path is the one that
    * survives 100 TB).
    */
  val d15_edit_distance: Q = (s, dir) =>
    graft.operators.TextDedup.editDistancePairs(
        DataPipelineQueries.dupDocCorpus(s, dir), "doc_id", "text",
        maxDist = EditMaxDist, maxLen = EditMaxLen)
      .orderBy(col("id_a"), col("id_b"))

  val d15_sql: String =
    s"""WITH ${DataPipelineQueries.DupDocCorpusSql},
       |short AS (
       |  SELECT doc_id, text, length(text) AS len FROM corpus
       |  WHERE length(text) <= $EditMaxLen
       |)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST(levenshtein(a.text, b.text) AS INT) AS dist
       |FROM short a JOIN short b
       |  ON a.doc_id < b.doc_id AND abs(a.len - b.len) <= $EditMaxDist
       |WHERE levenshtein(a.text, b.text) <= $EditMaxDist
       |ORDER BY id_a, id_b""".stripMargin

  // ── t11: TF-IDF top term ────────────────────────────────────────────

  /** Each document's most characteristic term by an integer TF-IDF
    * surrogate: score = tf · ((10³·N) div df) — monotone in tf and in
    * 1/df, and pure 64-bit integer so both engines rank identically
    * (float idf logs would make near-ties engine-dependent). The 10³
    * granularity keeps the product inside Long headroom out to ~10¹⁰
    * docs × 10⁵ tf — the d12 lesson: size integer surrogates for the
    * target corpus, not the test corpus. The shape
    * is the inverted-index build every retrieval/curation stack runs:
    * explode → per-(doc,term) count with map-side partials → term
    * document frequencies (a second aggregate over the SAME shuffled-
    * by-term frame, not a rescan) → join back, one window for the
    * per-doc argmax. All joins key on term or doc — no broadcast of
    * corpus-sized state, so the plan survives a vocabulary that
    * doesn't fit one executor.
    */
  val t11_tfidf: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
    val total = docs.agg(count(lit(1)).as("__n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df_docs")) // tf rows are distinct (doc, term)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(total))
      .withColumn("score", col("tf") * expr("(1000 * __n_docs) div df_docs"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("token"), col("tf"), col("df_docs"), col("score"))
      .orderBy(col("doc_id"))
  }

  val t11_sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, ${TextFunctions.ToksSql} AS toks FROM documents
       |),
       |tf AS (
       |  SELECT doc_id, u.tok AS token, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM t, unnest(toks) u(tok)
       |  GROUP BY doc_id, u.tok
       |),
       |dfreq AS (
       |  SELECT token, CAST(COUNT(*) AS BIGINT) AS df_docs FROM tf GROUP BY token
       |),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df_docs,
       |         tf.tf * ((1000 * n.n_docs) // dfreq.df_docs) AS score,
       |         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
       |                            ORDER BY tf.tf * ((1000 * n.n_docs) // dfreq.df_docs) DESC,
       |                                     tf.token) AS rn
       |  FROM tf JOIN dfreq USING (token), n
       |)
       |SELECT doc_id, token, tf, df_docs, CAST(score AS BIGINT) AS score
       |FROM scored WHERE rn = 1
       |ORDER BY doc_id""".stripMargin

  // ── s06: per-label embedding centroids ──────────────────────────────

  /** Per-label centroid sums over the quantized embedding corpus
    * ([[graft.operators.VectorSearch.quantizedCentroids]]) — the
    * k-means/IVF building block. The custom `vector_sum` aggregate
    * keeps the shuffle at |labels|·dims longs; the posexplode here
    * runs on the aggregated handful of rows, never the corpus, purely
    * to give the oracle a flat integer surface.
    */
  val s06_centroids: Q = (s, dir) =>
    graft.operators.VectorSearch.quantizedCentroids(
        Tables(s, dir, "embeddings"), "label", "embedding")
      .select(col("label"), col("n_vecs"),
        posexplode(col("dim_sums")).as(Seq("pos", "dim_sum")))
      .select(col("label"), col("pos"), col("dim_sum"), col("n_vecs"))
      .orderBy(col("label"), col("pos"))

  val s06_sql: String =
    """WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
      |sc AS (SELECT MAX(list_max(list_transform(vec, x -> ABS(x)))) AS scale FROM v),
      |q AS (
      |  SELECT label,
      |         list_transform(vec, x -> CAST(ROUND(x / sc.scale * 127) AS INT)) AS qvec
      |  FROM v, sc
      |),
      |u AS (SELECT label, qvec, unnest(range(1, len(qvec) + 1)) AS i FROM q),
      |e AS (SELECT label, CAST(i - 1 AS INT) AS pos, qvec[i] AS qval FROM u),
      |n AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM q GROUP BY label)
      |SELECT e.label, e.pos, CAST(SUM(e.qval) AS BIGINT) AS dim_sum, n.n_vecs
      |FROM e JOIN n ON n.label = e.label
      |GROUP BY e.label, e.pos, n.n_vecs
      |ORDER BY e.label, e.pos""".stripMargin

  // ── q21: bucketed range join ────────────────────────────────────────

  private val RangeHorizonUs = 600L * 1000000L // 10 minutes

  /** Purchases within 10 minutes AFTER each click, across all users —
    * the keyless time-band join ([[graft.operators.RangeJoin]]) that a
    * naive inequality join turns into an all-pairs nested loop. The
    * bucketed plan shuffles on the time-slice key instead; the
    * per-click aggregate keeps the hashed output integer (counts +
    * cents).
    */
  val q21_range_join: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("ts").as("p_ts"), col("value").as("p_value"))
    graft.operators.RangeJoin.bucketed(
        clicks, purchases, "click_ts", "p_ts", RangeHorizonUs)
      .groupBy(col("click_id"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(round(col("p_value") * 100).cast(LongType)).as("purchase_cents"))
      .orderBy(col("click_id"))
  }

  val q21_sql: String =
    """WITH e AS (
      |  SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events
      |),
      |c AS (SELECT event_id AS click_id, ts AS click_ts FROM e WHERE event_type = 'click'),
      |p AS (SELECT ts AS p_ts, value AS p_value FROM e WHERE event_type = 'purchase')
      |SELECT c.click_id,
      |       CAST(COUNT(*) AS BIGINT) AS n_purchases,
      |       CAST(SUM(CAST(ROUND(p.p_value * 100) AS BIGINT)) AS BIGINT) AS purchase_cents
      |FROM c JOIN p
      |  ON p.p_ts >= c.click_ts AND p.p_ts < c.click_ts + INTERVAL 600 SECOND
      |GROUP BY c.click_id
      |ORDER BY c.click_id""".stripMargin

  // ── q22: PIVOT ──────────────────────────────────────────────────────

  /** Revenue matrix status × priority via Spark's `pivot` with an
    * EXPLICIT value list — the to-wide reshape of reporting queries.
    * Listing the pivot values matters at scale: without them Spark runs
    * an extra distinct job over the corpus to discover the columns.
    * Single hash aggregate, map-side partials; cells are integer cents
    * (absent combos stay NULL in both engines).
    */
  val q22_pivot: Q = (s, dir) =>
    Tables(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(sum(round(col("o_totalprice") * 100).cast(LongType)))
      .withColumnRenamed("1-URGENT", "urgent_cents")
      .withColumnRenamed("2-HIGH", "high_cents")
      .withColumnRenamed("3-MEDIUM", "medium_cents")
      .withColumnRenamed("4-NOT SPECIFIED", "unspec_cents")
      .withColumnRenamed("5-LOW", "low_cents")
      .orderBy(col("o_orderstatus"))

  val q22_sql: String = {
    def cell(p: String, alias: String) =
      s"CAST(SUM(CASE WHEN o_orderpriority = '$p' THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS $alias"
    s"""SELECT o_orderstatus,
       |       ${cell("1-URGENT", "urgent_cents")},
       |       ${cell("2-HIGH", "high_cents")},
       |       ${cell("3-MEDIUM", "medium_cents")},
       |       ${cell("4-NOT SPECIFIED", "unspec_cents")},
       |       ${cell("5-LOW", "low_cents")}
       |FROM orders
       |GROUP BY o_orderstatus
       |ORDER BY o_orderstatus""".stripMargin
  }

  // ── q23: lead/lag gap analysis ──────────────────────────────────────

  /** Per-user inter-event gap statistics via `lag` over the (ts,
    * event_id)-ordered per-user window — the sessionization precursor
    * and the last §2.5 window shape (offset functions) not yet
    * surfaced as a query. ONE shuffle on user_id serves both the lag
    * and the aggregate; gaps are integer seconds (µs div 10⁶), so the
    * oracle replays them exactly. Single-event users keep NULL
    * min/max gaps in both engines.
    */
  val q23_event_gaps: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables(s, dir, "events")
      .withColumn("__prev_us", unix_micros(lag(col("ts"), 1).over(w)))
      // pure integer division — Column./ would detour through double
      .withColumn("__gap_s", expr("(unix_micros(ts) - __prev_us) div 1000000"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(col("__gap_s")).as("n_gaps"),
        min(col("__gap_s")).as("min_gap_s"),
        max(col("__gap_s")).as("max_gap_s"))
      .orderBy(col("user_id"))
  }

  val q23_sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      |),
      |g AS (
      |  SELECT user_id,
      |         (epoch_us(ts) - epoch_us(LAG(ts, 1) OVER (
      |            PARTITION BY user_id ORDER BY ts, event_id))) // 1000000 AS gap_s
      |  FROM e
      |)
      |SELECT user_id,
      |       CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
      |       CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
      |       CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
      |FROM g
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ── q25: explicit GROUPING SETS ─────────────────────────────────────

  /** Disjoint grouping sets in one pass — (status), (priority), and the
    * grand total, WITHOUT the hierarchical nesting ROLLUP implies (q20).
    * One scan expands each row into its grouping sets before the
    * aggregate; the grouping_id bitmask keys the strata exactly as
    * DuckDB's GROUPING() does, so null group values are unambiguous.
    */
  val q25_grouping_sets: Q = (s, dir) => {
    Tables(s, dir, "orders").createOrReplaceTempView("g_orders")
    s.sql("""SELECT o_orderstatus, o_orderpriority,
            |       CAST(grouping_id() AS INT) AS gid,
            |       COUNT(*) AS n_orders,
            |       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS revenue_cents
            |FROM g_orders
            |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
            |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin)
  }

  val q25_sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
      |       CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin

  // ── q24: running-frame window aggregate ─────────────────────────────

  /** Cumulative revenue per customer in order-date order — the explicit
    * ROWS UNBOUNDED PRECEDING frame (the one §2.5 window shape not yet
    * under the gate: q16/q23 cover ranking and offsets; this covers
    * running aggregates). ONE shuffle on o_custkey; the frame is
    * computed in-partition by a single running sum — never a per-row
    * range self-join. Cents stay integer end to end.
    */
  val q24_running_total: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("__cents"))
      .withColumn("cum_cents", sum(col("__cents")).over(w))
      .drop("__cents")
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  val q24_sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
      |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
      |FROM orders
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // ── d22: token-stutter removal ──────────────────────────────────────

  /** Collapse consecutive duplicate TOKENS within each document (OCR/ASR
    * stutter, decode loops) — the token-granularity sibling of d20's
    * line de-repetition. Planted: %4=1 docs get their first word
    * tripled (collapses back to the original text), %4=3 docs get a
    * trailing "zz zz zz" (collapses to one "zz"). Zero-shuffle; see
    * [[TextDedup.dropRepeatedTokens]].
    */
  val d22_token_derep: Q = (s, dir) => {
    val first = element_at(split(col("text"), " "), 1)
    val corpus = Tables(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 4 === 1,
          concat(first, lit(" "), first, lit(" "), col("text")))
        .when(col("doc_id") % 4 === 3, concat(col("text"), lit(" zz zz zz")))
        .otherwise(col("text")).as("text"))
    TextDedup.dropRepeatedTokens(corpus, "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"), col("n_kept"),
        md5(col("clean_text")).as("clean_hash"))
      .orderBy(col("doc_id"))
  }

  val d22_sql: String =
    """WITH corpus AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 4 = 1
      |                THEN split_part(text, ' ', 1) || ' ' || split_part(text, ' ', 1) || ' ' || text
      |              WHEN doc_id % 4 = 3 THEN text || ' zz zz zz'
      |              ELSE text END AS text
      |  FROM documents
      |),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM corpus),
      |kept AS (SELECT doc_id, l, list_filter(l, (x, i) -> i = 1 OR x <> l[i - 1]) AS k FROM toks)
      |SELECT doc_id,
      |       CAST(len(l) AS INT) AS n_tokens,
      |       CAST(len(k) AS INT) AS n_kept,
      |       md5(array_to_string(k, ' ')) AS clean_hash
      |FROM kept
      |ORDER BY doc_id""".stripMargin

  // ── q28: bounded sliding window frame ───────────────────────────────

  /** Bounded ROWS frame (2 PRECEDING .. CURRENT ROW) — a different
    * window evaluator than q24's running frame (sliding buffer vs
    * cumulative): per-customer moving 3-order spend and the frame's
    * min order value. Integer cents, deterministic (o_orderdate,
    * o_orderkey) order, so both engines replay the exact frame sums.
    */
  val q28_sliding_frame: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, 0)
    Tables(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("__cents"))
      .withColumn("last3_cents", sum(col("__cents")).over(w))
      .withColumn("last3_min_cents", min(col("__cents")).over(w))
      .drop("__cents")
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  val q28_sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS last3_cents,
      |       CAST(MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS last3_min_cents
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // ── q27: NOT IN vs NOT EXISTS under NULLs ───────────────────────────

  /** Three-valued-logic corner both engines must agree on: a NULL in a
    * NOT IN subquery set makes the predicate never-TRUE (every row
    * drops), while NOT EXISTS simply never matches the NULL row (no
    * rows drop beyond the clean set). One row out with all three
    * counts; the poisoned count MUST be 0 and the clean counts equal —
    * an engine that compiles NOT IN to a plain anti-join gets this
    * wrong, which is why it's under the gate.
    */
  val q27_notin_nulls: Q = (s, dir) => {
    Tables(s, dir, "orders").createOrReplaceTempView("ni_orders")
    Tables(s, dir, "customer").createOrReplaceTempView("ni_customer")
    s.sql("""SELECT
            |  (SELECT COUNT(*) FROM ni_orders
            |   WHERE o_custkey NOT IN (
            |     SELECT c_custkey FROM ni_customer WHERE c_acctbal < 0)) AS n_clean,
            |  (SELECT COUNT(*) FROM ni_orders o
            |   WHERE NOT EXISTS (
            |     SELECT 1 FROM ni_customer c
            |     WHERE c.c_custkey = o.o_custkey AND c.c_acctbal < 0)) AS n_not_exists,
            |  (SELECT COUNT(*) FROM ni_orders
            |   WHERE o_custkey NOT IN (
            |     SELECT c_custkey FROM ni_customer WHERE c_acctbal < 0
            |     UNION ALL SELECT CAST(NULL AS BIGINT))) AS n_null_poisoned
            |""".stripMargin)
  }

  val q27_sql: String =
    """SELECT
      |  CAST((SELECT COUNT(*) FROM orders
      |        WHERE o_custkey NOT IN (
      |          SELECT c_custkey FROM customer WHERE c_acctbal < 0)) AS BIGINT) AS n_clean,
      |  CAST((SELECT COUNT(*) FROM orders o
      |        WHERE NOT EXISTS (
      |          SELECT 1 FROM customer c
      |          WHERE c.c_custkey = o.o_custkey AND c.c_acctbal < 0)) AS BIGINT) AS n_not_exists,
      |  CAST((SELECT COUNT(*) FROM orders
      |        WHERE o_custkey NOT IN (
      |          SELECT c_custkey FROM customer WHERE c_acctbal < 0
      |          UNION ALL SELECT CAST(NULL AS BIGINT))) AS BIGINT) AS n_null_poisoned""".stripMargin

  // ── q26: JSON metadata extraction ───────────────────────────────────

  /** Semi-structured sidecar parsing: each event's `props` JSON is
    * parsed ONCE in the projection (`get_json_object`, codegen'd) and
    * the extracted value reused by every aggregate — never re-parsed
    * per aggregate. The training-pipeline shape: metadata arrives as
    * JSON strings alongside the payload; filters/apportioning need
    * typed values out of it at full scan speed.
    */
  val q26_json_extract: Q = (s, dir) =>
    Tables(s, dir, "events")
      .select(col("event_type"), col("user_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        countDistinct(when(col("k") > 50, col("user_id"))).as("n_users_high_k"))
      .orderBy(col("event_type"))

  val q26_sql: String =
    """SELECT event_type,
      |       CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       CAST(COUNT(DISTINCT CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50
      |                                THEN user_id END) AS BIGINT) AS n_users_high_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ── s07: metadata-filtered ANN ──────────────────────────────────────

  /** Vector search restricted by a metadata predicate — PRE-filter, not
    * post-filter: the label predicate lands on the corpus scan (parquet
    * pushdown) before any distance is computed, so (a) the scored set
    * shrinks by the selectivity, and (b) the top-k is always k deep —
    * post-filtering an unfiltered top-k can come up short. At 100 TB
    * the same shape rides partition pruning when the corpus is laid
    * out by the filter column.
    */
  val s07_ann_filtered: Q = (s, dir) => {
    val e = Tables(s, dir, "embeddings")
    VectorSearch.bruteForceTopK(
        corpus = e.filter(col("label") === 1),
        queries = e.filter(col("vec_id") < 5),
        idCol = "vec_id", vecCol = "embedding", queryIdCol = "vec_id", k = 10)
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }

  val s07_sql: String =
    """SELECT query_id, rank, id FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS id,
      |         ROW_NUMBER() OVER (
      |           PARTITION BY q.vec_id
      |           ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                           CAST(c.embedding AS DOUBLE[])) DESC,
      |                    c.vec_id ASC) AS rank
      |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id AND c.label = 1
      |  WHERE q.vec_id < 5) t
      |WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** Hard-negative mining ([[VectorSearch.hardNegatives]]): per query,
    * the 5 most similar corpus vectors with a DIFFERENT label — the
    * contrastive-training negatives that carry gradient. Same
    * broadcast-query/single-corpus-scan shape as s01/s07; the label
    * inequality rides the broadcast join.
    */
  val s08_hard_negatives: Q = (s, dir) => {
    val e = Tables(s, dir, "embeddings")
    VectorSearch.hardNegatives(
        corpus = e, queries = e.filter(col("vec_id") < 5),
        idCol = "vec_id", vecCol = "embedding", labelCol = "label",
        queryIdCol = "vec_id", k = 5)
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }

  val s08_sql: String =
    """SELECT query_id, rank, id FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS id,
      |         ROW_NUMBER() OVER (
      |           PARTITION BY q.vec_id
      |           ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                           CAST(c.embedding AS DOUBLE[])) DESC,
      |                    c.vec_id ASC) AS rank
      |  FROM embeddings q JOIN embeddings c ON c.label <> q.label
      |  WHERE q.vec_id < 5) t
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  // ── d18: cross-document line dedup (boilerplate removal) ────────────

  /** C4-style line-level dedup: split documents on newlines, drop every
    * line that occurs in ≥ 2 DISTINCT documents (boilerplate:
    * subscribe banners, copyright footers), reassemble the survivors in
    * original order. The testdata has no newlines, so boilerplate is
    * planted deterministically (%10=7 → banner prefix line, %10=3 →
    * footer suffix line) — the oracle plants identically. ONE shuffle
    * to count lines + one join back keyed on the line; reassembly is a
    * per-doc sort of (pos, line) structs — never a global order. At
    * 100 TB both sides of the count join are corpus-sized: this is the
    * sort-merge-join shape (C4 runs exactly this on MapReduce), not a
    * broadcast.
    */
  val d18_line_dedup: Q = (s, dir) => {
    val corpus = Tables(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 10 === 7,
          concat(lit("subscribe to our newsletter for updates\n"), col("text")))
        .when(col("doc_id") % 10 === 3,
          concat(col("text"), lit("\nall rights reserved contact us for details")))
        .otherwise(col("text")).as("text"))
    TextDedup.lineDedup(corpus, "doc_id", "text")
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        md5(col("clean_text")).as("clean_hash"))
      .orderBy(col("doc_id"))
  }

  val d18_sql: String =
    """WITH corpus AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 10 = 7 THEN 'subscribe to our newsletter for updates' || chr(10) || text
      |              WHEN doc_id % 10 = 3 THEN text || chr(10) || 'all rights reserved contact us for details'
      |              ELSE text END AS text
      |  FROM documents
      |),
      |lines AS (
      |  SELECT doc_id, p.pos, ls[p.pos] AS line
      |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM corpus) t
      |  CROSS JOIN LATERAL (SELECT unnest(range(1, len(ls) + 1)) AS pos) p
      |),
      |counts AS (SELECT line, COUNT(DISTINCT doc_id) AS n_docs FROM lines GROUP BY line)
      |SELECT l.doc_id,
      |       CAST(COUNT(*) AS BIGINT) AS n_lines,
      |       CAST(COUNT(CASE WHEN c.n_docs < 2 THEN 1 END) AS BIGINT) AS n_kept,
      |       md5(COALESCE(string_agg(CASE WHEN c.n_docs < 2 THEN l.line END, chr(10) ORDER BY l.pos), '')) AS clean_hash
      |FROM lines l JOIN counts c ON c.line = l.line
      |GROUP BY l.doc_id
      |ORDER BY l.doc_id""".stripMargin

  // ── d20: intra-document de-repetition ───────────────────────────────

  /** Collapse consecutive duplicate lines WITHIN each document
    * (generation loops, stuttered scraper output) — the intra-doc
    * sibling of d18's cross-doc boilerplate dedup. The testdata is
    * single-line, so repetition is planted deterministically: %3=0 docs
    * become [A,A,B,B,A] (collapses to [A,B,A] — the trailing A proves
    * non-consecutive repeats survive), %3=1 docs [A,B,B] → [A,B], the
    * rest stay untouched. Zero-shuffle per-row array work; see
    * [[TextDedup.dropRepeatedLines]].
    */
  val d20_derepetition: Q = (s, dir) => {
    val a = substring(col("text"), 1, 50)
    val b = substring(col("text"), 51, 50)
    val corpus = Tables(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 3 === 0, concat_ws("\n", a, a, b, b, a))
        .when(col("doc_id") % 3 === 1, concat_ws("\n", a, b, b))
        .otherwise(col("text")).as("text"))
    TextDedup.dropRepeatedLines(corpus, "doc_id", "text")
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        md5(col("clean_text")).as("clean_hash"))
      .orderBy(col("doc_id"))
  }

  val d20_sql: String =
    """WITH corpus AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 3 = 0
      |                THEN substr(text, 1, 50) || chr(10) || substr(text, 1, 50) || chr(10) ||
      |                     substr(text, 51, 50) || chr(10) || substr(text, 51, 50) || chr(10) ||
      |                     substr(text, 1, 50)
      |              WHEN doc_id % 3 = 1
      |                THEN substr(text, 1, 50) || chr(10) || substr(text, 51, 50) || chr(10) ||
      |                     substr(text, 51, 50)
      |              ELSE text END AS text
      |  FROM documents
      |),
      |lined AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM corpus),
      |kept AS (SELECT doc_id, l, list_filter(l, (x, i) -> i = 1 OR x <> l[i - 1]) AS k FROM lined)
      |SELECT doc_id,
      |       CAST(len(l) AS INT) AS n_lines,
      |       CAST(len(k) AS INT) AS n_kept,
      |       md5(array_to_string(k, chr(10))) AS clean_hash
      |FROM kept
      |ORDER BY doc_id""".stripMargin

  // ── d24/d25: corpus boilerplate mining ──────────────────────────────

  /** Corpus-frequent word 3-grams (document frequency ≥ 5): the mining
    * half of template/boilerplate removal — recurring phrases across
    * documents are site chrome, license headers, generation artifacts.
    * ONE map-side-combined aggregation over the compiled gram stream
    * (the distinct-doc count plans as a two-phase partial distinct on
    * (gram, doc)); no window, no join, no all-pairs anywhere. See
    * [[graft.operators.Boilerplate.frequentNgrams]].
    */
  val d24_frequent_ngrams: Q = (s, dir) =>
    Boilerplate.frequentNgrams(Tables(s, dir, "documents"),
        "doc_id", "text", n = 3, minDf = 5L)
      .orderBy(col("gram"))

  /** DuckDB gram replay shared by d24/d25 — same tokenization as ToksSql
    * and the same short-doc clamp as the WordGrams kernel.
    */
  private def ngramPosSql(n: Int): String =
    s"""toks AS (
       |  SELECT doc_id, ${TextFunctions.ToksSql} AS toks FROM documents
       |),
       |occ AS (
       |  SELECT doc_id, len(toks) AS n_toks, g.pos AS pos, g.gram AS gram
       |  FROM (
       |    SELECT doc_id, toks,
       |      unnest(CASE WHEN len(toks) = 0 THEN []
       |                  ELSE list_transform(range(0, GREATEST(len(toks) - $n, 0) + 1),
       |                    i -> {'pos': i, 'gram': array_to_string(toks[i + 1 : i + $n], ' ')}) END) AS g
       |    FROM toks) t
       |)""".stripMargin

  val d24_sql: String =
    s"""WITH ${ngramPosSql(3)}
       |SELECT gram, COUNT(DISTINCT doc_id) AS doc_freq,
       |       CAST(COUNT(*) AS BIGINT) AS n_occurrences
       |FROM occ
       |GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 5
       |ORDER BY gram""".stripMargin

  /** Boilerplate passage spans: token intervals covered by any frequent
    * 3-gram (d24's mined set), overlapping/adjacent intervals merged
    * per document — the span-level extraction C4-style pipelines strip
    * before near-dup detection. The frequent-gram relation is the Zipf
    * head (small by construction → AQE broadcasts the occurrence
    * join); interval merge is the classic running-max window, shuffled
    * by doc id only. See [[graft.operators.Boilerplate.passageSpans]].
    */
  val d25_passage_spans: Q = (s, dir) =>
    Boilerplate.passageSpans(Tables(s, dir, "documents"),
        "doc_id", "text", n = 3, minDf = 5L)
      .select(col("id").as("doc_id"), col("span_start"), col("span_end"),
        col("n_tokens"))
      .orderBy(col("doc_id"), col("span_start"))

  val d25_sql: String =
    s"""WITH ${ngramPosSql(3)},
       |freq AS (SELECT gram FROM occ GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 5),
       |iv AS (
       |  SELECT doc_id, pos AS s, LEAST(pos + 3, n_toks) AS e
       |  FROM occ WHERE gram IN (SELECT gram FROM freq)
       |),
       |m AS (
       |  SELECT doc_id, s, e,
       |         CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |              THEN 1 ELSE 0 END AS ns
       |  FROM iv
       |),
       |sp AS (
       |  SELECT doc_id, s, e,
       |         SUM(ns) OVER (PARTITION BY doc_id ORDER BY s, e
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
       |  FROM m
       |)
       |SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end,
       |       MAX(e) - MIN(s) AS n_tokens
       |FROM sp GROUP BY doc_id, span
       |ORDER BY doc_id, span_start""".stripMargin

  // ── d26: token-budget domain sampling ───────────────────────────────

  /** Data mixing under a token budget: per source domain, admit
    * documents in quality order (micro-integer [[TextFunctions
    * .qualityScore]], doc_id tie-break) until the cumulative token
    * count would exceed the budget — how a training mix caps each
    * domain's contribution. The running sum is rank-based so the
    * admitted set is deterministic and engine-portable. Cumulative ≤
    * budget (not "first overflowing doc included"): the budget is a
    * hard cap.
    *
    * Runs through the histogram-prefiltered scale path
    * ([[Sampling.tokenBudgetAdmit]]): a coarse per-(domain,
    * quality-bucket) token histogram rejects already-over-budget
    * buckets with a pure filter, and the exact window touches only the
    * survivors, partitioned by (domain, bucket) — never a whole domain
    * in one task. Exactly equivalent to the naive per-domain full sort
    * (bucket order refines quality order), which is what the oracle
    * replays — and what `BoilerplateSpec` cross-checks in-engine.
    */
  val d26_token_budget: Q = (s, dir) => {
    Sampling.tokenBudgetAdmit(
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            TextFunctions.tokenCount(col("text")).cast(LongType).as("n_tokens"),
            floor(TextFunctions.qualityScore(col("text")) * 1e6).cast(LongType)
              .as("quality_micro")),
        domainCol = "source", idCol = "doc_id",
        qualityCol = "quality_micro", tokensCol = "n_tokens",
        budget = 800L, bucketWidth = 100000L)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))
      .orderBy(col("doc_id"))
  }

  val d26_sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, source, text, ${TextFunctions.ToksSql} AS toks
       |  FROM documents
       |),
       |m AS (
       |  SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens,
       |         ${TextFunctions.QualityMetricsSql}
       |  FROM t
       |),
       |q AS (
       |  SELECT doc_id, source, n_tokens,
       |         ${TextFunctions.QualityMicroSql} AS quality_micro
       |  FROM m
       |),
       |c AS (
       |  SELECT doc_id, source, n_tokens,
       |         CAST(SUM(n_tokens) OVER (PARTITION BY source
       |           ORDER BY quality_micro DESC, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM q
       |)
       |SELECT doc_id, source, n_tokens, cum_tokens
       |FROM c WHERE cum_tokens <= 800
       |ORDER BY doc_id""".stripMargin

  // ── q29: rank-function window suite ─────────────────────────────────

  /** NTILE / PERCENT_RANK / CUME_DIST over per-nation customer balances
    * — the rank-function family in one windowed pass (one shuffle by
    * nation, in-partition sort). The order key (acctbal, custkey) is
    * unique, so every rank value — including the two double-valued
    * functions — is deterministic and engine-exact (both are ratios of
    * integers; IEEE division of identical integers is identical).
    */
  val q29_rank_functions: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        ntile(4).over(w).as("balance_quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("c_custkey"))
  }

  val q29_sql: String =
    """SELECT c_custkey, c_nationkey,
      |       CAST(NTILE(4) OVER w AS INT) AS balance_quartile,
      |       PERCENT_RANK() OVER w AS pct_rank,
      |       CUME_DIST() OVER w AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ── t12: readability profile ────────────────────────────────────────

  /** Surface readability metrics per document: sentence count (split on
    * [.!?] runs), tokens-per-sentence (milli-integer), long-word ratio
    * (>6 chars, micro-integer) — the classic complexity screens next to
    * t01's quality stats. Pure per-row expressions, zero shuffles; all
    * outputs integer-exact so the gate is bit-identical.
    */
  val t12_readability: Q = (s, dir) => {
    val toks = TextFunctions.tokens(col("text"))
    // sentences = non-empty [.!?]-separated segments with any letters
    val sentences = size(filter(
      split(col("text"), "[.!?]+"),
      x => trim(x) =!= ""))
    val nTok = size(toks)
    val nLong = size(filter(toks, t => length(t) > 6))
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        sentences.as("n_sentences"),
        nTok.as("n_tokens"),
        // Spark `/` on integers is double division — floor-cast restores
        // the integer quotient (exact: counts are far below 2^53)
        when(sentences > 0,
            floor((nTok.cast(LongType) * 1000L) / sentences).cast(LongType))
          .otherwise(0L).as("tokens_per_sentence_milli"),
        when(nTok > 0,
            floor((nLong.cast(LongType) * 1000000L) / nTok).cast(LongType))
          .otherwise(0L).as("long_word_ppm"))
      .orderBy(col("doc_id"))
  }

  val t12_sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, text, ${TextFunctions.ToksSql} AS toks,
       |         len(list_filter(string_split_regex(text, '[.!?]+'), x -> trim(x) <> '')) AS n_sentences
       |  FROM documents
       |)
       |SELECT doc_id,
       |       CAST(n_sentences AS INT) AS n_sentences,
       |       CAST(len(toks) AS INT) AS n_tokens,
       |       CASE WHEN n_sentences > 0
       |            THEN CAST(len(toks) AS BIGINT) * 1000 // n_sentences
       |            ELSE 0 END AS tokens_per_sentence_milli,
       |       CASE WHEN len(toks) > 0
       |            THEN CAST(len(list_filter(toks, x -> length(x) > 6)) AS BIGINT) * 1000000 // len(toks)
       |            ELSE 0 END AS long_word_ppm
       |FROM t
       |ORDER BY doc_id""".stripMargin

  // ── q30: lateral top-n per group (SQL surface) ──────────────────────

  /** Top-2 customers by balance per nation through a correlated LATERAL
    * subquery — submitted via `spark.sql` (the one gated query that
    * enters through the SQL parser rather than the DataFrame API, so
    * the SQL surface itself is under the oracle gate). Catalyst rewrites
    * the lateral into the same shuffle-once ranked-window plan q13/q16
    * use — decorrelation is the optimizer's job, not the author's.
    * Balances are pass-through values (no aggregation), so doubles are
    * hash-safe.
    */
  val q30_lateral_topn: Q = (s, dir) => {
    Tables(s, dir, "nation").createOrReplaceTempView("nation")
    Tables(s, dir, "customer").createOrReplaceTempView("customer")
    s.sql("""
      SELECT n.n_name, t.c_custkey, t.c_acctbal
      FROM nation n JOIN LATERAL (
        SELECT c_custkey, c_acctbal FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
      ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""")
  }

  val q30_sql: String =
    """SELECT n.n_name, t.c_custkey, t.c_acctbal
      |FROM nation n, LATERAL (
      |  SELECT c_custkey, c_acctbal FROM customer c
      |  WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
      |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin

  // ── t13: unigram corpus-likelihood quality proxy ────────────────────

  /** Per-document unigram "LM" score — the KenLM-style quality proxy
    * with an integer surrogate: every token contributes
    * ⌊log₂(1 + corpus_frequency)⌋, so documents of common, fluent
    * vocabulary score high per token and OOV/junk tokens contribute 0
    * bits. (The real per-token log-prob differs by the constant
    * −log₂ N_corpus per token — a consumer-side affine shift that adds
    * nothing to the ordering but would put a float in the output.)
    * Shape: explode → ONE map-side-combined corpus-frequency aggregate →
    * sort-merge join back (both sides corpus-scale — the t11/d18 shape,
    * never a broadcast of the vocabulary) → per-doc integer sums. Docs
    * with no tokens are absent (explode semantics, like t11).
    */
  val t13_doc_loglik: Q = (s, dir) => {
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("token"))
    val cf = toks.groupBy(col("token")).agg(count(lit(1)).as("cf"))
    toks.join(cf, "token")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(length(bin(col("cf") + 1)) - 1).as("loglik_bits"))
      .orderBy(col("doc_id"))
  }

  val t13_sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, u.tok AS token
       |  FROM (SELECT doc_id, ${TextFunctions.ToksSql} AS toks FROM documents),
       |       unnest(toks) u(tok)
       |),
       |cf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cf FROM t GROUP BY token)
       |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |       CAST(SUM(length(bin(cf.cf + 1)) - 1) AS BIGINT) AS loglik_bits
       |FROM t JOIN cf USING (token)
       |GROUP BY t.doc_id
       |ORDER BY t.doc_id""".stripMargin

  // ── q31: value window functions + RANGE frame ───────────────────────

  /** Value-window functions over each customer's order history:
    * first/second/latest order value (FIRST_VALUE / NTH_VALUE /
    * LAST_VALUE over the unbounded frame, deterministic
    * (date, key) order) plus a trailing-30-day spend via a RANGE frame
    * keyed on integer epoch days — the by-VALUE frame evaluator (peers
    * included by value distance), distinct from q24's cumulative and
    * q28's bounded ROWS frames. One shuffle by customer serves all
    * four windows; sums are integer cents.
    */
  val q31_value_windows: Q = (s, dir) => {
    val W = org.apache.spark.sql.expressions.Window
    val full = W.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val trail = W.partitionBy(col("o_custkey"))
      .orderBy(col("epoch_day")).rangeBetween(-30, 0)
    Tables(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        datediff(col("o_orderdate"), lit("1970-01-01").cast("date")).as("epoch_day"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        first(col("cents")).over(full).as("first_cents"),
        nth_value(col("cents"), 2).over(full).as("second_cents"),
        last(col("cents")).over(full).as("last_cents"),
        sum(col("cents")).over(trail).as("trail30_cents"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q31_sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |       FIRST_VALUE(cents) OVER w AS first_cents,
      |       NTH_VALUE(cents, 2) OVER w AS second_cents,
      |       LAST_VALUE(cents) OVER w AS last_cents,
      |       CAST(SUM(cents) OVER (
      |         PARTITION BY o_custkey ORDER BY epoch_day
      |         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail30_cents
      |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
      |             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
      |             CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS epoch_day
      |      FROM orders)
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ── t15: collocation mining (integer-gated PMI) ─────────────────────

  /** [[Collocations.pmiPairs]] over the documents table: bigrams with
    * count ≥ 5 and lift > 7/5 (= 1.4), gated by the integer
    * cross-product form `5·c_xy·N > 7·c_x·c_y` — no logarithm, both
    * engines compare identical 64-bit products. On this synthetic
    * corpus the near-uniform bulk sits at lift ≈ 1.0 and
    * planted-boilerplate pairs at ≈ 1.43-1.56, so 1.4 sits under the
    * whole collocation band.
    */
  val t15_collocations: Q = (s, dir) =>
    Collocations.pmiPairs(Tables(s, dir, "documents"), "text",
      minCount = 5, liftNum = 7, liftDen = 5)

  val t15_sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, ${TextFunctions.ToksSql} AS toks FROM documents
       |),
       |uni AS (
       |  SELECT w, COUNT(*) AS c
       |  FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1
       |),
       |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
       |bi AS (
       |  SELECT w1, w2, COUNT(*) AS c_xy
       |  FROM (SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
       |               unnest(list_transform(range(1, len(toks)), i -> toks[i + 1])) AS w2
       |        FROM t)
       |  GROUP BY 1, 2
       |)
       |SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
       |       CAST(u1.c AS BIGINT) AS c_x, CAST(u2.c AS BIGINT) AS c_y
       |FROM bi JOIN uni u1 ON u1.w = bi.w1 JOIN uni u2 ON u2.w = bi.w2, n
       |WHERE c_xy >= 5 AND 5 * c_xy * n.n > 7 * u1.c * u2.c
       |ORDER BY c_xy DESC, w1, w2""".stripMargin

  // ── d30: epoch upsampling (mixture reweighting) ─────────────────────

  /** [[Sampling.epochUpsample]] over the documents table with a literal
    * recipe — src0 ×3, src1 ×2, src2 dropped, everything else ×1: the
    * deterministic upsampling-with-replacement half of mixture
    * reweighting (the downsampling half is d12's domainMix). Zero
    * shuffles: a when-chain factor and a per-row generator; the oracle
    * replays the expansion with a VALUES recipe and a lateral range.
    */
  val d30_epoch_upsample: Q = (s, dir) => {
    Sampling.epochUpsample(
        Tables(s, dir, "documents").select(col("doc_id"), col("source")),
        "source", Map("src0" -> 3, "src1" -> 2, "src2" -> 0))
      .select(col("doc_id"), col("source"), col("epoch"))
      .orderBy(col("doc_id"), col("epoch"))
  }

  val d30_sql: String =
    """WITH w(source, epochs) AS (VALUES ('src0', 3), ('src1', 2), ('src2', 0)),
      |e AS (
      |  SELECT d.doc_id, d.source, COALESCE(w.epochs, 1) AS epochs
      |  FROM documents d LEFT JOIN w USING (source)
      |)
      |SELECT doc_id, source, CAST(r.epoch AS INT) AS epoch
      |FROM e, UNNEST(range(1, e.epochs + 1)) AS r(epoch)
      |ORDER BY doc_id, epoch""".stripMargin

  // ── q32: cube / grouping-id multi-level aggregation ────────────────

  /** Multi-level totals in ONE pass: `CUBE(returnflag, linestatus)`
    * emits the base cells plus each margin and the grand total, tagged
    * by `grouping_id` (bitmask, first grouping column = MSB — Spark and
    * DuckDB agree) and a single-column `grouping` flag. One shuffle on
    * the grouping-set-expanded keys (Catalyst's Expand feeds one
    * hash aggregate — NOT four scans union'd); all measures are
    * integer-exact (cents / whole-unit casts). The ORDER BY never
    * compares NULL to a value inside a level: a grouped-out column is
    * constant-NULL within its `gid` level, so engine NULL-ordering
    * divergence (Spark NULLS FIRST vs DuckDB NULLS LAST on ASC) cannot
    * reorder rows.
    */
  val q32_cube_grouping: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast(LongType).as("__qty"),
        round(col("l_extendedprice") * 100).cast(LongType).as("__cents"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast(LongType).as("gid"),
        grouping(col("l_returnflag")).cast("int").as("flag_grouped"),
        count(lit(1)).as("n_items"),
        sum(col("__qty")).as("sum_qty"),
        sum(col("__cents")).as("sum_price_cents"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
  }

  val q32_sql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |       CAST(GROUPING(l_returnflag) AS INT) AS flag_grouped,
      |       COUNT(*) AS n_items,
      |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  // ── q33: pivot (wide-format aggregation) ────────────────────────────

  /** Order counts and cents pivoted to one column pair per order
    * status — the wide-format report shape. Values are ENUMERATED
    * (`pivot(col, values)`), so Spark skips the extra
    * distinct-values job and plans exactly one aggregation pass
    * (per-cell conditional aggregates, same as the oracle's CASE
    * form — pivot is syntax, not a different algorithm). Integer
    * counts/cents only.
    */
  val q33_pivot_status: Q = (s, dir) => {
    Tables(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast(LongType).as("__cents"))
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)).as("n"), sum(col("__cents")).as("cents"))
      .orderBy(col("o_orderpriority"))
  }

  val q33_sql: String =
    """SELECT o_orderpriority,
      |       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O_n,
      |       CAST(SUM(CASE WHEN o_orderstatus = 'O'
      |         THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS O_cents,
      |       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F_n,
      |       CAST(SUM(CASE WHEN o_orderstatus = 'F'
      |         THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS F_cents,
      |       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P_n,
      |       CAST(SUM(CASE WHEN o_orderstatus = 'P'
      |         THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS P_cents
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ── q34: unpivot (wide → long melt) ─────────────────────────────────

  /** The inverse of q33: per-returnflag quantity/price totals melted to
    * `(l_returnflag, measure, value)` rows via `Dataset.unpivot` — the
    * long-format shape feeding generic metric sinks. Unpivot is a
    * zero-shuffle Expand over the (tiny, already-aggregated) wide
    * relation; both measures are integer units.
    */
  val q34_unpivot_measures: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast(LongType)).as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast(LongType)).as("sum_cents"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_cents")), "measure", "value")
      .orderBy(col("l_returnflag"), col("measure"))
  }

  val q34_sql: String =
    """WITH w AS (
      |  SELECT l_returnflag,
      |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l_returnflag, measure, value FROM (
      |  SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w
      |  UNION ALL
      |  SELECT l_returnflag, 'sum_cents', sum_cents FROM w
      |) t
      |ORDER BY l_returnflag, measure""".stripMargin

  // ── d28: leakage-safe group split ───────────────────────────────────

  /** Train/val/test assignment with the SOURCE DOMAIN as the split
    * unit ([[Sampling.groupSplit]]): hashing the group key — not the
    * doc id — keeps every document of a domain on one side, so
    * within-domain near-duplicates can never leak from train into
    * eval. 80/10/10 over the group hash space; zero shuffle, one md5
    * per row, oracle replays the identical bucket arithmetic.
    */
  val d28_group_split: Q = (s, dir) => {
    Sampling.groupSplit(Tables(s, dir, "documents"), "source",
        trainPct = 80, valPct = 10)
      .select(col("doc_id"), col("source"), col("split"))
      .orderBy(col("doc_id"))
  }

  val d28_sql: String =
    """SELECT doc_id, source,
      |       CASE WHEN b < 80 THEN 'train'
      |            WHEN b < 90 THEN 'val'
      |            ELSE 'test' END AS split
      |FROM (
      |  SELECT doc_id, source,
      |         CAST(('0x' || substr(md5(CAST(source AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
      |  FROM documents
      |)
      |ORDER BY doc_id""".stripMargin

  // ── d29: deterministic shard shuffle ────────────────────────────────

  /** Reproducible corpus shuffle into 8 training shards
    * ([[Sampling.shardShuffle]]): shard membership and in-shard order
    * both come from md5 of the doc id (independent hex slices), so the
    * permutation is a pure function of ids — reruns, task retries, and
    * the oracle agree row for row. The one shuffle is partitioned by
    * shard with an in-shard sort: the exact distribution a shard
    * writer materializes, with shard count ∝ corpus size at 100 TB so
    * per-task sort volume stays constant.
    */
  val d29_shard_shuffle: Q = (s, dir) => {
    Sampling.shardShuffle(
        Tables(s, dir, "documents").select(col("doc_id")), "doc_id", 8)
      .select(col("doc_id"), col("shard"), col("shard_pos"))
      .orderBy(col("doc_id"))
  }

  val d29_sql: String =
    """SELECT doc_id, shard,
      |       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY okey, doc_id) AS INT) AS shard_pos
      |FROM (
      |  SELECT doc_id,
      |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS okey,
      |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 16, 8)) AS BIGINT) % 8 AS shard
      |  FROM documents
      |)
      |ORDER BY doc_id""".stripMargin

  // ── t14: sketch error-bound gate ────────────────────────────────────

  /** Gates the SKETCH paths (t07's documented 100 TB siblings) that no
    * hash oracle can replay value-for-value — sketches are
    * engine-specific by design, so their CONTRACT, the error bound, is
    * what must hold. Per (lang × {p50, p90}): `percentile_approx`
    * (accuracy 1000) over n_chars must land within rank tolerance
    * cnt/1000 + 1 of the exact target rank; plus one
    * `approx_count_distinct` (rsd 0.01) over events.user_id within 5%
    * relative error. Each output row carries the EXACT value (rank-based
    * quantile / exact NDV — integer, engine-portable, hash-gated by the
    * oracle like any other query) alongside `within_bound`; the oracle
    * asserts TRUE for the bound column, so a sketch drifting outside
    * its contract fails the driver gate as a hash mismatch.
    *
    * Scan shape: one sketch aggregation (mergeable, no per-group sort),
    * one exact-quantile pass (the t07 operator), one rank-probe scan
    * with the ~10-row approx table broadcast — all corpus-linear; at
    * 100 TB only the sketch pass remains (the exact passes ARE the
    * thing being replaced; here they double as the gate's witness).
    */
  val t14_sketch_bounds: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
    // sketch pass: per-lang p50/p90 in ONE mergeable aggregation
    val approx = Quantiles.approxQuantiles(docs, Seq("lang"), "n_chars",
        Seq(0.5, 0.9), accuracy = 1000)
      .select(col("lang"), posexplode(col("quantiles")))
      // pos 0 → 5th decile, pos 1 → 9th (align with exactQuantiles ids)
      .select(col("lang"), (col("pos") * 4 + 5).as("quantile"),
        col("col").cast(LongType).as("__av"))
    // witness pass: the exact rank-based quantile (t07's operator)
    val exact = Quantiles.exactQuantiles(docs, Seq("lang"), "n_chars",
        "doc_id", q = 10)
      .filter(col("quantile").isin(5, 9))
      .select(col("lang"), col("quantile"), col("n_chars").as("exact_value"))
    // rank probe: where does the sketch's value land in the real
    // distribution? approx_v's occupied rank interval is [lo+1, hi];
    // the bound holds iff it intersects target ± tol
    val probe = docs.join(broadcast(approx), "lang")
      .groupBy(col("lang"), col("quantile"), col("__av"))
      .agg(
        sum(when(col("n_chars") < col("__av"), 1L).otherwise(0L)).as("__lo"),
        sum(when(col("n_chars") <= col("__av"), 1L).otherwise(0L)).as("__hi"),
        count(lit(1)).as("__cnt"))
      .withColumn("__target", expr("(quantile * __cnt + 9) div 10"))
      .withColumn("__tol", expr("__cnt div 1000 + 1"))
      .select(col("lang"), col("quantile"),
        (col("__lo") + 1 <= col("__target") + col("__tol") &&
          col("__hi") >= col("__target") - col("__tol")).as("within_bound"))
    val pctl = exact.join(probe, Seq("lang", "quantile"))
      .select(concat(lit("pctl_"), col("lang"), lit("_"),
          col("quantile").cast("string")).as("metric"),
        col("exact_value").cast(LongType).as("exact_value"),
        col("within_bound"))
    val ev = Tables(s, dir, "events")
    val ndv = ev.agg(
        countDistinct(col("user_id")).as("__exact"),
        approx_count_distinct(col("user_id"), rsd = 0.01).as("__approx"))
      .select(lit("ndv_user").as("metric"),
        col("__exact").cast(LongType).as("exact_value"),
        (abs(col("__approx") - col("__exact")).cast("double") / col("__exact")
          <= 0.05).as("within_bound"))
    pctl.unionAll(ndv).orderBy(col("metric"))
  }

  val t14_sql: String =
    """WITH r AS (
      |  SELECT lang, n_chars, doc_id,
      |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
      |         COUNT(*) OVER (PARTITION BY lang) AS cnt
      |  FROM documents
      |),
      |pctl AS (
      |  SELECT 'pctl_' || lang || '_' || CAST(p AS VARCHAR) AS metric,
      |         CAST(n_chars AS BIGINT) AS exact_value, TRUE AS within_bound
      |  FROM r, (VALUES (5), (9)) t(p)
      |  WHERE rn = (p * cnt + 9) // 10
      |)
      |SELECT metric, exact_value, within_bound FROM pctl
      |UNION ALL
      |SELECT 'ndv_user', CAST(COUNT(DISTINCT user_id) AS BIGINT), TRUE FROM events
      |ORDER BY metric""".stripMargin

  // ── d31: template centrality over the shared-line graph ────────────

  /** Upper df cap for shared-line edges: a line shared by MORE docs than
    * this is mass boilerplate (d18's territory, and a quadratic pair
    * bomb — df docs generate df·(df−1)/2 edges); the graph keeps only
    * lines shared by 2..cap docs, where sharing is a meaningful
    * template signal.
    */
  private val LineDfCap = 20

  /** Degree-damped integer propagation ([[Propagation.propagate]], 3
    * rounds) over the graph whose edges connect documents sharing a
    * duplicated line — template-cluster centrality: a doc scores high
    * when its neighbors are themselves well-connected, i.e. it sits
    * DEEP inside a templated/mirrored cluster, a transitive signal
    * plain pair counts miss. The testdata is single-line, so shared
    * lines are planted deterministically: every doc gains a block
    * banner keyed by doc_id div 5, and docs with doc_id % 3 ≠ 0 a
    * second banner keyed by (doc_id+2) div 5 — overlapping 5-blocks
    * chain into larger clusters, so propagation has real structure to
    * walk. Edge keys are md5(line) (8-byte-ish portable hash keys, not
    * raw strings — the d19 join-key discipline); all scores are BIGINT
    * fixed-point (unit 10⁶, damping 850/1000, floor division), so three
    * rounds replay bit-identically in the oracle's unrolled CTEs.
    */
  val d31_template_centrality: Q = (s, dir) => {
    val g1 = expr("doc_id div 5").cast("string")
    val g2 = expr("(doc_id + 2) div 5").cast("string")
    val corpus = Tables(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 3 === 0,
          concat(col("text"), lit("\nshared banner alpha "), g1))
        .otherwise(concat(col("text"), lit("\nshared banner alpha "), g1,
          lit("\nshared banner beta "), g2)).as("text"))
    val lines = corpus
      .select(col("doc_id"), explode(split(col("text"), "\n")).as("line"))
      .select(col("doc_id"), md5(col("line")).as("lh"))
      .distinct()
    val keep = lines.groupBy(col("lh")).agg(count(lit(1)).as("__df"))
      .filter(col("__df").between(2, LineDfCap))
      .select(col("lh"))
    val keyed = lines.join(keep, "lh")
    val edges = keyed.as("a").join(keyed.as("b"),
        col("a.lh") === col("b.lh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .distinct()
    Propagation.propagate(edges, "a", "b", iters = 3)
      .select(col("id").as("doc_id"), col("deg"), col("score"))
      .orderBy(col("doc_id"))
  }

  /** One unrolled propagation round: every node sends score÷deg to each
    * neighbor; new score = 150000 + (850·Σincoming)÷1000 — all BIGINT
    * floor division, mirroring [[Propagation.propagate]] exactly.
    */
  private def propRound(i: Int): String = {
    val prev = s"p${i - 1}"
    s"""in$i AS (
       |  SELECT e.dst, CAST(SUM(p.score // p.deg) AS BIGINT) AS s
       |  FROM bidir e JOIN $prev p ON p.id = e.src GROUP BY e.dst
       |),
       |p$i AS (
       |  SELECT d.id, d.deg,
       |         CAST(150000 + (850 * COALESCE(i.s, 0)) // 1000 AS BIGINT) AS score
       |  FROM deg d LEFT JOIN in$i i ON i.dst = d.id
       |)""".stripMargin
  }

  val d31_sql: String =
    s"""WITH corpus AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 3 = 0
       |           THEN text || chr(10) || 'shared banner alpha ' || CAST(doc_id // 5 AS VARCHAR)
       |           ELSE text || chr(10) || 'shared banner alpha ' || CAST(doc_id // 5 AS VARCHAR)
       |                     || chr(10) || 'shared banner beta ' || CAST((doc_id + 2) // 5 AS VARCHAR)
       |         END AS text
       |  FROM documents
       |),
       |lines AS (
       |  SELECT DISTINCT doc_id, md5(l) AS lh
       |  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM corpus) t
       |),
       |keep AS (
       |  SELECT lh FROM (SELECT lh, COUNT(*) AS df FROM lines GROUP BY lh) t
       |  WHERE df BETWEEN 2 AND $LineDfCap
       |),
       |edges AS (
       |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
       |  FROM lines a
       |  JOIN keep k ON k.lh = a.lh
       |  JOIN lines b ON b.lh = a.lh AND a.doc_id < b.doc_id
       |),
       |bidir AS (SELECT a AS src, b AS dst FROM edges UNION ALL SELECT b, a FROM edges),
       |deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg FROM bidir GROUP BY src),
       |p0 AS (SELECT id, deg, CAST(1000000 AS BIGINT) AS score FROM deg),
       |${propRound(1)},
       |${propRound(2)},
       |${propRound(3)}
       |SELECT id AS doc_id, deg, score FROM p3 ORDER BY doc_id""".stripMargin

  // ── q35: percentile family ──────────────────────────────────────────

  /** ANSI ordered-set aggregates over lineitem per return flag:
    * PERCENTILE_DISC medians/tails (actual data values — pass-through,
    * no interpolation arithmetic to drift cross-engine) plus a
    * DETERMINISTIC mode (count DESC, value ASC — both engines' native
    * `mode` leaves ties unspecified, so the tie rule is spelled out as
    * a ranked aggregation). The oracle replays percentile_disc from
    * first principles (smallest value whose cumulative row count
    * reaches ⌈p·n⌉) rather than trusting another engine's quantile
    * variant to share semantics.
    */
  val q35_percentile_family: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    val pct = li.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("median_qty"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)").as("p90_price"))
    val mw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag"))
      .orderBy(col("__n").desc, col("l_linestatus").asc)
    val mode = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__rn", row_number().over(mw))
      .filter(col("__rn") === 1)
      .select(col("l_returnflag"), col("l_linestatus").as("mode_status"))
    pct.join(mode, "l_returnflag")
      .select(col("l_returnflag"), col("n_rows"), col("median_qty"),
        col("p90_price"), col("mode_status"))
      .orderBy(col("l_returnflag"))
  }

  val q35_sql: String =
    """WITH ranked AS (
      |  SELECT l_returnflag, l_quantity, l_extendedprice,
      |         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rq,
      |         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rp,
      |         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem
      |),
      |pct AS (
      |  SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n_rows,
      |         MIN(CASE WHEN rq = (n + 1) // 2 THEN l_quantity END) AS median_qty,
      |         MIN(CASE WHEN rp = (9 * n + 9) // 10 THEN l_extendedprice END) AS p90_price
      |  FROM ranked GROUP BY l_returnflag
      |),
      |mode AS (
      |  SELECT l_returnflag, l_linestatus AS mode_status FROM (
      |    SELECT l_returnflag, l_linestatus,
      |           ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |             ORDER BY COUNT(*) DESC, l_linestatus ASC) AS rn
      |    FROM lineitem GROUP BY l_returnflag, l_linestatus) t
      |  WHERE rn = 1
      |)
      |SELECT p.l_returnflag, p.n_rows, p.median_qty, p.p90_price, m.mode_status
      |FROM pct p JOIN mode m ON m.l_returnflag = p.l_returnflag
      |ORDER BY p.l_returnflag""".stripMargin

  // ── q36: array construction + functions ─────────────────────────────

  /** Array surface over grouped data: per order priority, the sorted
    * distinct status list built by `collect_set` + `sort_array` (the
    * deterministic form — bare collect_set order is partitioning
    * luck), then the array function family over it: size, membership,
    * indexing, join-to-string. The output projects SCALARS only — the
    * `array_join`ed string pins the array's full ordering and contents
    * deterministically, while the driver-side pandas hasher cannot sort
    * raw array cells (round-7 `err`: unhashable numpy.ndarray), so the
    * bare array column stays internal.
    */
  val q36_array_functions: Q = (s, dir) => {
    Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(sort_array(collect_set(col("o_orderstatus"))).as("statuses"),
        count(lit(1)).as("n_orders"))
      .select(col("o_orderpriority"),
        size(col("statuses")).as("n_statuses"),
        array_contains(col("statuses"), "F").as("has_f"),
        element_at(col("statuses"), 1).as("first_status"),
        array_join(col("statuses"), "|").as("joined"),
        col("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  val q36_sql: String =
    """WITH g AS (
      |  SELECT o_orderpriority,
      |         list_sort(list_distinct(list(o_orderstatus))) AS statuses,
      |         CAST(COUNT(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY o_orderpriority
      |)
      |SELECT o_orderpriority,
      |       CAST(len(statuses) AS INT) AS n_statuses,
      |       list_contains(statuses, 'F') AS has_f,
      |       statuses[1] AS first_status,
      |       array_to_string(statuses, '|') AS joined,
      |       n_orders
      |FROM g
      |ORDER BY o_orderpriority""".stripMargin

  // ── q37: SCD2 history reconstruction from CDC events ────────────────

  /** Type-2 slowly-changing-dimension rows from the synthetic CDC batch
    * (the classic CDC consumer): per key, events ordered by the dedup
    * cascade's exact tie rules (load_ts, delete-wins op priority,
    * ingestion_seq) become versioned rows with effective ranges —
    * `effective_to` = the NEXT event's load_ts via LEAD (NULL = open),
    * `is_current` marks the open non-delete version. One key shuffle
    * for both window functions; all range arithmetic is timestamp
    * pass-through (no interpolation to drift cross-engine).
    */
  val q37_scd2_ranges: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderkey"))
      .orderBy(col("load_timestamp"),
        when(col("Op") === "D", 3).when(col("Op") === "U", 2).otherwise(1),
        col("ingestion_seq"))
    CoreQueries.syntheticOrdersCdc(s, dir)
      .withColumn("version_no", row_number().over(w))
      .withColumn("effective_to", lead(col("load_timestamp"), 1).over(w))
      .select(col("o_orderkey"), col("version_no"), col("Op").as("op"),
        col("o_totalprice"), col("load_timestamp").as("effective_from"),
        col("effective_to"),
        (col("effective_to").isNull && col("Op") =!= "D").as("is_current"))
      .orderBy(col("o_orderkey"), col("version_no"))
  }

  val q37_sql: String =
    s"""WITH ${CoreQueries.StagingRawSql},
       |hist AS (
       |  SELECT o_orderkey,
       |         ROW_NUMBER() OVER w AS version_no,
       |         op, o_totalprice, load_ts AS effective_from,
       |         LEAD(load_ts, 1) OVER w AS effective_to
       |  FROM staging_raw
       |  WINDOW w AS (PARTITION BY o_orderkey
       |               ORDER BY load_ts,
       |                        CASE op WHEN 'D' THEN 3 WHEN 'U' THEN 2 ELSE 1 END,
       |                        seq)
       |)
       |SELECT o_orderkey, version_no, op, o_totalprice, effective_from, effective_to,
       |       (effective_to IS NULL AND op <> 'D') AS is_current
       |FROM hist
       |ORDER BY o_orderkey, version_no""".stripMargin

  // ── q38: map construction + posexplode ──────────────────────────────

  /** The MapType half of the complex-type surface (q36 covers arrays):
    * per order priority, a status→count map built with
    * `map_from_entries` over a `sort_array`ed entry list (deterministic
    * entry order — bare collect_list order is partitioning luck), then
    * the map function family over it — `size`, keyed lookup
    * (`element_at(map, 'F')`), `map_keys` — and `posexplode` back to
    * one row per entry with its 0-based position. All output columns
    * are SCALAR (q36's lesson: the driver-side hasher cannot sort raw
    * complex cells); the joined-keys string pins the map's full entry
    * order. The oracle replays the map relationally — entry order =
    * status ASC, pos = rank−1 — because DuckDB's MAP surface differs;
    * matching output on scalars is the cross-engine contract.
    */
  val q38_map_functions: Q = (s, dir) => {
    val counts = Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"))
    val mapped = counts.groupBy(col("o_orderpriority"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("o_orderstatus"), col("cnt"))))).as("status_map"))
    mapped.select(col("o_orderpriority"),
        size(col("status_map")).as("n_statuses"),
        element_at(col("status_map"), "F").as("f_cnt"),
        array_join(map_keys(col("status_map")), "|").as("keys_joined"),
        posexplode(col("status_map")))
      .select(col("o_orderpriority"), col("pos"),
        col("key").as("status"), col("value").as("cnt"),
        col("n_statuses"), col("f_cnt"), col("keys_joined"))
      .orderBy(col("o_orderpriority"), col("pos"))
  }

  val q38_sql: String =
    """WITH c AS (
      |  SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM orders GROUP BY 1, 2
      |),
      |k AS (
      |  SELECT o_orderpriority,
      |         CAST(COUNT(*) AS INT) AS n_statuses,
      |         MAX(CASE WHEN o_orderstatus = 'F' THEN cnt END) AS f_cnt,
      |         string_agg(o_orderstatus, '|' ORDER BY o_orderstatus) AS keys_joined
      |  FROM c GROUP BY o_orderpriority
      |)
      |SELECT c.o_orderpriority,
      |       CAST(ROW_NUMBER() OVER (PARTITION BY c.o_orderpriority
      |                               ORDER BY c.o_orderstatus) - 1 AS INT) AS pos,
      |       c.o_orderstatus AS status, c.cnt,
      |       k.n_statuses, k.f_cnt, k.keys_joined
      |FROM c JOIN k ON k.o_orderpriority = c.o_orderpriority
      |ORDER BY c.o_orderpriority, pos""".stripMargin

  // ── v15: referential-integrity orphan audit ─────────────────────────

  /** FK orphan audit across two edges of the star schema — the
    * validation every CDC target needs after out-of-order applies
    * (child rows arriving before/outliving their parent). The testdata
    * is referentially intact, so breakage is planted deterministically:
    * customers with c_custkey % 7 = 3 and orders with o_orderkey % 11 = 5
    * are dropped from the parent side, making the children referencing
    * them orphans. One LEFT ANTI join per FK (each plans as a broadcast
    * or SMJ existence probe — never a fan-out), integer counts only.
    */
  val v15_referential_orphans: Q = (s, dir) => {
    val cust = Tables(s, dir, "customer").filter(col("c_custkey") % 7 =!= 3)
    val ords = Tables(s, dir, "orders")
    val li = Tables(s, dir, "lineitem")
    val ordsKept = ords.filter(col("o_orderkey") % 11 =!= 5)
    val orphanOrders = ords
      .join(cust.select(col("c_custkey")), col("o_custkey") === col("c_custkey"), "left_anti")
    val orphanLines = li
      .join(ordsKept.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left_anti")
    val r1 = ords.agg(count(lit(1)).as("n_child"))
      .crossJoin(orphanOrders.agg(count(lit(1)).as("n_orphans")))
      .select(lit("orders->customer").as("fk"), col("n_child"), col("n_orphans"))
    val r2 = li.agg(count(lit(1)).as("n_child"))
      .crossJoin(orphanLines.agg(count(lit(1)).as("n_orphans")))
      .select(lit("lineitem->orders").as("fk"), col("n_child"), col("n_orphans"))
    r1.unionAll(r2).orderBy(col("fk"))
  }

  val v15_sql: String =
    """SELECT fk, n_child, n_orphans FROM (
      |  SELECT 'orders->customer' AS fk,
      |         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_child,
      |         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
      |          WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                            WHERE c.c_custkey % 7 <> 3 AND c.c_custkey = o.o_custkey)) AS n_orphans
      |  UNION ALL
      |  SELECT 'lineitem->orders',
      |         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
      |         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
      |          WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                            WHERE o.o_orderkey % 11 <> 5 AND o.o_orderkey = l.l_orderkey))
      |) t
      |ORDER BY fk""".stripMargin

  // ── registry ────────────────────────────────────────────────────────

  // ── d48: decontamination by span EXCISION ───────────────────────────

  /** Targeted decontamination — excise the leaked PASSAGES instead of
    * dropping whole documents (d07/d40 drop; at 100 TB a doc that
    * quotes one eval paragraph is mostly good data). Eval-set 8-gram
    * shingles drive [[graft.operators.Boilerplate.matchSpans]]
    * (pattern-joined occurrences -> per-doc interval merge) and
    * [[graft.operators.Boilerplate.exciseSpans]] rebuilds the text
    * without the covered tokens. The output carries BOTH the span
    * accounting (sum of merged span lengths) and the post-excision
    * token counts, while the oracle derives remaining = total -
    * excised — so a disagreement between the merge and the strip
    * lambda cannot cancel out.
    */
  val d48_excise_contamination: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
    val evalSet = docs.filter(col("doc_id") % 37 === 0)
    val pool = docs.filter(col("doc_id") % 37 =!= 0)
    val patterns = TextDedup.shingles(evalSet, "doc_id", "text", n = 8)
      .select(col("shingle").as("gram"))
    val excised = Boilerplate.matchSpans(pool, "doc_id", "text", 8, patterns)
      .groupBy(col("id")).agg(sum(col("n_tokens")).as("n_excised"))
    val clean = Boilerplate.exciseSpans(pool, "doc_id", "text", 8, patterns)
      .select(col("id"),
        TextFunctions.tokenCount(col("clean_text")).cast(LongType).as("n_remaining"))
    pool.select(col("doc_id").as("id"), col("lang"),
        TextFunctions.tokenCount(col("text")).cast(LongType).as("n_tokens"))
      .join(excised, Seq("id"), "left")
      .join(clean, Seq("id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(coalesce(col("n_excised"), lit(0L))).as("sum_excised"),
        sum(col("n_remaining")).as("sum_remaining"),
        sum(when(col("n_excised").isNotNull, 1L).otherwise(0L)).as("n_touched"))
      .orderBy(col("lang"))
  }

  val d48_sql: String =
    s"""WITH ${ngramPosSql(8)},
       |evalg AS (SELECT DISTINCT gram FROM occ WHERE doc_id % 37 = 0),
       |iv AS (
       |  SELECT doc_id, pos AS s, LEAST(pos + 8, n_toks) AS e
       |  FROM occ WHERE doc_id % 37 <> 0 AND gram IN (SELECT gram FROM evalg)
       |),
       |m AS (
       |  SELECT doc_id, s, e,
       |         CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |              THEN 1 ELSE 0 END AS ns
       |  FROM iv
       |),
       |sp AS (
       |  SELECT doc_id, s, e,
       |         SUM(ns) OVER (PARTITION BY doc_id ORDER BY s, e
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
       |  FROM m
       |),
       |spans AS (
       |  SELECT doc_id, MIN(s) AS s, MAX(e) AS e FROM sp GROUP BY doc_id, span
       |),
       |perdoc AS (
       |  SELECT doc_id, CAST(SUM(e - s) AS BIGINT) AS n_excised
       |  FROM spans GROUP BY doc_id
       |)
       |SELECT d.lang, COUNT(*) AS n_docs,
       |  CAST(SUM(len(t.toks)) AS BIGINT) AS sum_tokens,
       |  CAST(SUM(COALESCE(p.n_excised, 0)) AS BIGINT) AS sum_excised,
       |  CAST(SUM(len(t.toks)) - SUM(COALESCE(p.n_excised, 0)) AS BIGINT) AS sum_remaining,
       |  CAST(SUM(CASE WHEN p.n_excised IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_touched
       |FROM toks t
       |JOIN documents d ON d.doc_id = t.doc_id
       |LEFT JOIN perdoc p ON p.doc_id = t.doc_id
       |WHERE d.doc_id % 37 <> 0
       |GROUP BY d.lang
       |ORDER BY d.lang""".stripMargin

  // ── d60: exact substring dedup, canonical survivor ──────────────────

  /** Corpus-level EXACT duplicated-substring dedup with a canonical
    * survivor ([[Boilerplate.canonicalDupSpans]], n = 8): every
    * 8-token span shared by ≥ 2 documents is marked for excision in
    * all but the minimal carrier doc, so each duplicated substring
    * survives exactly once in the corpus — the keep-one-copy step of
    * suffix-style training-data dedup, where the winnowed-fingerprint
    * family (d21/d23/d56) is the approximate detector and THIS is the
    * exact one. Output: per affected doc, the integer token
    * accounting (merged span count, excised tokens, remainder);
    * n_remaining derives arithmetically from the disjoint merged
    * spans — no second pass over the text. d25 mines frequent
    * boilerplate (df ≥ 5, ALL occurrences marked), d48 excises against
    * an EXTERNAL eval set; d60's pattern set is the corpus against
    * itself, minus one elected carrier per gram.
    */
  val d60_substring_dedup: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
    val perdoc = Boilerplate.canonicalDupSpans(docs, "doc_id", "text", n = 8)
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("n_tokens")).as("n_excised"))
    docs.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast(LongType).as("n_tokens"))
      .join(perdoc, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("n_spans"), col("n_excised"),
        (col("n_tokens") - col("n_excised")).as("n_remaining"))
      .orderBy(col("doc_id"))
  }

  val d60_sql: String =
    s"""WITH ${ngramPosSql(8)},
       |own AS (
       |  SELECT gram, MIN(doc_id) AS owner FROM occ
       |  GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
       |),
       |iv AS (
       |  SELECT o.doc_id, o.pos AS s, LEAST(o.pos + 8, o.n_toks) AS e
       |  FROM occ o JOIN own w ON o.gram = w.gram AND o.doc_id <> w.owner
       |),
       |m AS (
       |  SELECT doc_id, s, e,
       |         CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |              THEN 1 ELSE 0 END AS ns
       |  FROM iv
       |),
       |sp AS (
       |  SELECT doc_id, s, e,
       |         SUM(ns) OVER (PARTITION BY doc_id ORDER BY s, e
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
       |  FROM m
       |),
       |spans AS (
       |  SELECT doc_id, MIN(s) AS s, MAX(e) AS e FROM sp GROUP BY doc_id, span
       |),
       |perdoc AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
       |         CAST(SUM(e - s) AS BIGINT) AS n_excised
       |  FROM spans GROUP BY doc_id
       |)
       |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens, p.n_spans,
       |       p.n_excised, CAST(len(t.toks) AS BIGINT) - p.n_excised AS n_remaining
       |FROM toks t JOIN perdoc p ON p.doc_id = t.doc_id
       |ORDER BY t.doc_id""".stripMargin

  // ── d61: the canonically-deduped corpus, rebuilt and hash-pinned ────

  /** d60's excision EXECUTED — the cleaned corpus materialized, not
    * just accounted: for every document that loses tokens, the
    * rebuilt text ([[Boilerplate.canonicalExcise]]: non-owned
    * duplicated coverage dropped, remainder re-joined) hash-pinned
    * next to its before/after token counts. The md5 over the rebuilt
    * string makes the REASSEMBLY oracle-gated — a span-merge bug and
    * a reassembly bug cannot cancel the way two count errors could
    * (the d48 lesson, applied to the rebuild side). Docs excised to
    * NOTHING hash the empty string — pinned by the planted near-total
    * copies, whose remainder is 0-2 tokens.
    */
  val d61_canonical_excise: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
    val spans = Boilerplate.canonicalDupSpans(docs, "doc_id", "text", n = 8)
    val affected = spans.select(col("id")).distinct()
    Boilerplate.canonicalExcise(docs, "doc_id", "text", n = 8)
      .join(affected, Seq("id"), "left_semi")
      .join(docs.select(col("doc_id").as("id"),
        TextFunctions.tokenCount(col("text")).cast(LongType).as("n_before")), Seq("id"))
      .select(col("id").as("doc_id"), col("n_before"),
        TextFunctions.tokenCount(col("clean_text")).cast(LongType).as("n_after"),
        md5(col("clean_text")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  val d61_sql: String =
    s"""WITH ${ngramPosSql(8)},
       |tk AS (
       |  SELECT doc_id, g.pos AS pos, g.tok AS tok
       |  FROM (
       |    SELECT doc_id,
       |      unnest(CASE WHEN len(toks) = 0 THEN []
       |                  ELSE list_transform(range(0, len(toks)),
       |                    i -> {'pos': i, 'tok': toks[i + 1]}) END) AS g
       |    FROM toks) t
       |),
       |own AS (
       |  SELECT gram, MIN(doc_id) AS owner FROM occ
       |  GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
       |),
       |iv AS (
       |  SELECT o.doc_id, o.pos AS s, LEAST(o.pos + 8, o.n_toks) AS e
       |  FROM occ o JOIN own w ON o.gram = w.gram AND o.doc_id <> w.owner
       |),
       |covered AS (
       |  SELECT DISTINCT doc_id, r.r AS pos
       |  FROM iv, LATERAL (SELECT unnest(range(iv.s, iv.e)) AS r) r
       |),
       |clean AS (
       |  SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos) AS ctext,
       |         CAST(COUNT(*) AS BIGINT) AS n_after
       |  FROM tk t ANTI JOIN covered c ON c.doc_id = t.doc_id AND c.pos = t.pos
       |  GROUP BY t.doc_id
       |)
       |SELECT a.doc_id, CAST(len(tt.toks) AS BIGINT) AS n_before,
       |       COALESCE(cl.n_after, 0) AS n_after,
       |       md5(COALESCE(cl.ctext, '')) AS clean_md5
       |FROM (SELECT DISTINCT doc_id FROM iv) a
       |JOIN toks tt ON tt.doc_id = a.doc_id
       |LEFT JOIN clean cl ON cl.doc_id = a.doc_id
       |ORDER BY a.doc_id""".stripMargin

  // ── d62: canonical re-election under forget ─────────────────────────

  /** Dedup under DELETION — the question d60 leaves open: ownership
    * is a MIN aggregate, so what happens when the canonical owner is
    * forgotten? [[Boilerplate.canonicalReelection]] answers with one
    * FUSED gram aggregate electing both the before- and after-forget
    * owners (forget slice: doc_id % 17 = 3): a forgotten owner's
    * grams re-elect their next-lowest LIVE carrier, and a pair that
    * loses one member drops below df 2 — no longer duplicated, its
    * coverage RESURFACES entirely. Output: per live doc that had
    * coverage, before/after excised tokens and the restored delta
    * (monotone ≥ 0 by construction — the spec proves it against the
    * independent model). The oracle replays the fused election and
    * BOTH island merges.
    */
  val d62_canonical_reelection: Q = (s, dir) => {
    Boilerplate.canonicalReelection(Tables(s, dir, "documents"),
        "doc_id", "text", n = 8, liveId = _ % 17 =!= 3)
      .filter(col("excised_before") > 0)
      .select(col("id").as("doc_id"), col("excised_before"),
        col("excised_after"),
        (col("excised_before") - col("excised_after")).as("n_restored"))
      .orderBy(col("doc_id"))
  }

  val d62_sql: String =
    s"""WITH ${ngramPosSql(8)},
       |own AS (
       |  SELECT gram, MIN(doc_id) AS o0, COUNT(DISTINCT doc_id) AS d0,
       |         MIN(CASE WHEN doc_id % 17 <> 3 THEN doc_id END) AS o1,
       |         COUNT(DISTINCT CASE WHEN doc_id % 17 <> 3 THEN doc_id END) AS d1
       |  FROM occ GROUP BY gram
       |),
       |ivb AS (
       |  SELECT o.doc_id, o.pos AS s, LEAST(o.pos + 8, o.n_toks) AS e
       |  FROM occ o JOIN own w ON o.gram = w.gram
       |  WHERE o.doc_id % 17 <> 3 AND w.d0 >= 2 AND o.doc_id <> w.o0
       |),
       |iva AS (
       |  SELECT o.doc_id, o.pos AS s, LEAST(o.pos + 8, o.n_toks) AS e
       |  FROM occ o JOIN own w ON o.gram = w.gram
       |  WHERE o.doc_id % 17 <> 3 AND w.d1 >= 2 AND o.doc_id <> w.o1
       |),
       |mb AS (
       |  SELECT doc_id, s, e,
       |         CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |              THEN 1 ELSE 0 END AS ns
       |  FROM ivb
       |),
       |spb AS (
       |  SELECT doc_id, s, e,
       |         SUM(ns) OVER (PARTITION BY doc_id ORDER BY s, e
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
       |  FROM mb
       |),
       |pb AS (
       |  SELECT doc_id, CAST(SUM(e - s) AS BIGINT) AS excised_before
       |  FROM (SELECT doc_id, MIN(s) AS s, MAX(e) AS e FROM spb
       |        GROUP BY doc_id, span) t
       |  GROUP BY doc_id
       |),
       |ma AS (
       |  SELECT doc_id, s, e,
       |         CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |              THEN 1 ELSE 0 END AS ns
       |  FROM iva
       |),
       |spa AS (
       |  SELECT doc_id, s, e,
       |         SUM(ns) OVER (PARTITION BY doc_id ORDER BY s, e
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
       |  FROM ma
       |),
       |pa AS (
       |  SELECT doc_id, CAST(SUM(e - s) AS BIGINT) AS excised_after
       |  FROM (SELECT doc_id, MIN(s) AS s, MAX(e) AS e FROM spa
       |        GROUP BY doc_id, span) t
       |  GROUP BY doc_id
       |)
       |SELECT pb.doc_id, pb.excised_before,
       |       COALESCE(pa.excised_after, 0) AS excised_after,
       |       pb.excised_before - COALESCE(pa.excised_after, 0) AS n_restored
       |FROM pb LEFT JOIN pa ON pa.doc_id = pb.doc_id
       |WHERE pb.excised_before > 0
       |ORDER BY pb.doc_id""".stripMargin

  // ── w44: novelty-gated admission (exact-dup fraction vs the index) ──

  /** The DEDUP decision at the ingestion boundary — d48's span
    * machinery pointed at the ALREADY-INDEXED corpus, deciding what
    * enters at all: generation 0 commits the base slice (doc_id % 3
    * = 0) ungated, then the incoming batch is admitted only where its
    * 8-gram coverage against the BASE corpus stays at or below 500
    * permille of its tokens (integer `div` arithmetic — exact,
    * engine-portable), and the per-doc dup accounting (n_tokens,
    * n_dup, dup_permille) rides the SAME atomic generation as the six
    * text relations, so "why was this admitted" is answerable from
    * the index forever (the w43 contract, with novelty instead of LM
    * quality as the gate). Intra-batch duplicates deliberately do NOT
    * gate each other — the gate is vs the INDEX; batch-internal dedup
    * is d01/d09's job upstream. Require-pinned like w43: redelivery
    * is a no-op, no rejected document is lexically servable, every
    * admitted document is searchable in its own generation, and the
    * riders hold exactly the admitted / rejected sets. TWO riders
    * ride the generation: "novelty" (the admitted accounting) and
    * "rejects" — the REJECTION LOG (id, tokens, dup coverage,
    * permille), the DLQ discipline (w18/w19) applied to a quality
    * gate: what was refused, and why, is index history too (the
    * planted dup structure is bimodal — near-total copies — so
    * without the reject rider the gate's action would be invisible
    * in the admitted side's zeros). Output: the per-language report
    * reading BOTH riders, the oracle replaying base-gram coverage →
    * island merge → permille gate → two-sided report.
    */
  val w44_novelty_admission: Q = (s, dir) => {
    import graft.streaming.UnifiedIndex
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    val base = docs.filter(col("doc_id") % 3 === 0)
    val incoming = docs.filter(col("doc_id") % 3 =!= 0)
    val patterns = TextDedup.shingles(base, "doc_id", "text", n = 8)
      .select(col("shingle").as("gram"))
    val dup = Boilerplate.matchSpans(incoming, "doc_id", "text", 8, patterns)
      .groupBy(col("id").as("doc_id"))
      .agg(sum(col("n_tokens")).cast(LongType).as("n_dup"))
    // skinny scored frame feeds the gate, the require-pins and the
    // rider — persisted so the span join runs once (the w43 contract)
    val scored = incoming
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast(LongType).as("n_tokens"))
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("dup_permille",
        when(col("n_tokens") > 0,
          expr("(n_dup * 1000) div n_tokens")).otherwise(lit(0L)))
      .persist()
    val admittedIds = scored.filter(col("dup_permille") <= 500)
    val adm = docs.join(admittedIds.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val cat = new graft.sources.TableCatalog(s,
      java.nio.file.Files.createTempDirectory("graft-novgate")
        .toFile.getAbsolutePath + "/cat")
    UnifiedIndex.commitBatch(cat, base, 0L)
    val rider = admittedIds.select(col("doc_id").as("id"),
      col("n_tokens"), col("n_dup"), col("dup_permille"))
    val rejects = scored.filter(col("dup_permille") > 500)
      .select(col("doc_id").as("id"),
        col("n_tokens"), col("n_dup"), col("dup_permille"))
    UnifiedIndex.commitBatch(cat, adm, 1L,
      extraMembers = Map("novelty" -> rider, "rejects" -> rejects))
    require(UnifiedIndex.commitBatch(cat, adm, 1L,
      extraMembers = Map("novelty" -> rider, "rejects" -> rejects)) == -1L,
      "redelivered gated batch was re-applied")
    // no rejected document serves lexically
    require(UnifiedIndex.postingsLive(cat)._2.select(col("doc_id")).distinct()
      .join(scored.filter(col("dup_permille") > 500), Seq("doc_id"), "left_semi")
      .isEmpty, "a rejected document is lexically searchable")
    // every admitted document (and the whole base) is searchable
    require(adm.select(col("doc_id").as("id"))
      .unionAll(base.select(col("doc_id").as("id")))
      .exceptAll(cat.read("sizes").select(col("id"))).isEmpty,
      "an admitted or base document is not searchable")
    // the riders ARE the admitted / rejected sets
    val live = UnifiedIndex.memberLive(cat, "novelty", "id")
    require(graft.operators.Constraints.sameMultiset(
      live.select(col("id")), admittedIds.select(col("doc_id").as("id"))),
      "rider and admitted set diverge")
    val rejLive = UnifiedIndex.memberLive(cat, "rejects", "id")
    require(graft.operators.Constraints.sameMultiset(
      rejLive.select(col("id")), rejects.select(col("id"))),
      "reject log and rejected set diverge")
    val langs = docs.select(col("doc_id").as("id"), col("lang"))
    val admRep = live.join(langs, Seq("id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_admitted"),
        sum(col("n_tokens")).as("sum_tokens"))
    val rejRep = rejLive.join(langs, Seq("id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rejected"),
        sum(col("n_dup")).as("sum_dup_rejected"),
        min(col("dup_permille")).as("min_rejected_permille"))
    admRep.join(rejRep, Seq("lang"), "left")
      .select(col("lang"), col("n_admitted"), col("sum_tokens"),
        coalesce(col("n_rejected"), lit(0L)).as("n_rejected"),
        coalesce(col("sum_dup_rejected"), lit(0L)).as("sum_dup_rejected"),
        coalesce(col("min_rejected_permille"), lit(0L)).as("min_rejected_permille"))
      .orderBy(col("lang"))
  }

  val w44_sql: String =
    s"""WITH ${ngramPosSql(8)},
       |bg AS (SELECT DISTINCT gram FROM occ WHERE doc_id % 3 = 0),
       |iv AS (
       |  SELECT doc_id, pos AS s, LEAST(pos + 8, n_toks) AS e
       |  FROM occ WHERE doc_id % 3 <> 0 AND gram IN (SELECT gram FROM bg)
       |),
       |m AS (
       |  SELECT doc_id, s, e,
       |         CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |              THEN 1 ELSE 0 END AS ns
       |  FROM iv
       |),
       |sp AS (
       |  SELECT doc_id, s, e,
       |         SUM(ns) OVER (PARTITION BY doc_id ORDER BY s, e
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
       |  FROM m
       |),
       |spans AS (
       |  SELECT doc_id, MIN(s) AS s, MAX(e) AS e FROM sp GROUP BY doc_id, span
       |),
       |perdoc AS (
       |  SELECT doc_id, CAST(SUM(e - s) AS BIGINT) AS n_dup FROM spans GROUP BY doc_id
       |),
       |sc AS (
       |  SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
       |         CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup,
       |         CAST(CASE WHEN len(t.toks) > 0
       |              THEN (COALESCE(p.n_dup, 0) * 1000) // len(t.toks)
       |              ELSE 0 END AS BIGINT) AS dup_permille
       |  FROM toks t LEFT JOIN perdoc p ON p.doc_id = t.doc_id
       |  WHERE t.doc_id % 3 <> 0
       |)
       |SELECT d.lang,
       |       CAST(COUNT(*) FILTER (WHERE sc.dup_permille <= 500) AS BIGINT)
       |         AS n_admitted,
       |       CAST(COALESCE(SUM(sc.n_tokens)
       |         FILTER (WHERE sc.dup_permille <= 500), 0) AS BIGINT) AS sum_tokens,
       |       CAST(COUNT(*) FILTER (WHERE sc.dup_permille > 500) AS BIGINT)
       |         AS n_rejected,
       |       CAST(COALESCE(SUM(sc.n_dup)
       |         FILTER (WHERE sc.dup_permille > 500), 0) AS BIGINT) AS sum_dup_rejected,
       |       CAST(COALESCE(MIN(sc.dup_permille)
       |         FILTER (WHERE sc.dup_permille > 500), 0) AS BIGINT) AS min_rejected_permille
       |FROM sc JOIN documents d ON d.doc_id = sc.doc_id
       |GROUP BY d.lang
       |HAVING COUNT(*) FILTER (WHERE sc.dup_permille <= 500) > 0
       |ORDER BY d.lang""".stripMargin

  val queries: Map[String, Q] = Map(
    "w07_asof_join" -> w07_asof_join,
    "d12_domain_mix" -> d12_domain_mix,
    "d13_sequence_packing" -> d13_sequence_packing,
    "t07_quantiles" -> t07_quantiles,
    "t08_pii_redaction" -> t08_pii_redaction,
    "q19_skew_join" -> q19_skew_join,
    "q54_hybrid_skew_join" -> q54_hybrid_skew_join,
    "q56_sketch_skew_join" -> q56_sketch_skew_join,
    "d49_fuzzy_name_match" -> d49_fuzzy_name_match,
    "d50_fuzzy_match_k2" -> d50_fuzzy_match_k2,
    "t09_quality_filter" -> t09_quality_filter,
    "d14_chunking" -> d14_chunking,
    "t10_oov" -> t10_oov,
    "q20_rollup" -> q20_rollup,
    "d15_edit_distance" -> d15_edit_distance,
    "t11_tfidf" -> t11_tfidf,
    "s06_centroids" -> s06_centroids,
    "q21_range_join" -> q21_range_join,
    "q22_pivot" -> q22_pivot,
    "q23_event_gaps" -> q23_event_gaps,
    "q24_running_total" -> q24_running_total,
    "q25_grouping_sets" -> q25_grouping_sets,
    "q26_json_extract" -> q26_json_extract,
    "q27_notin_nulls" -> q27_notin_nulls,
    "s07_ann_filtered" -> s07_ann_filtered,
    "d18_line_dedup" -> d18_line_dedup,
    "d20_derepetition" -> d20_derepetition,
    "d22_token_derep" -> d22_token_derep,
    "q28_sliding_frame" -> q28_sliding_frame,
    "d24_frequent_ngrams" -> d24_frequent_ngrams,
    "d25_passage_spans" -> d25_passage_spans,
    "d48_excise_contamination" -> d48_excise_contamination,
    "d60_substring_dedup" -> d60_substring_dedup,
    "d61_canonical_excise" -> d61_canonical_excise,
    "d62_canonical_reelection" -> d62_canonical_reelection,
    "w44_novelty_admission" -> w44_novelty_admission,
    "d26_token_budget" -> d26_token_budget,
    "q29_rank_functions" -> q29_rank_functions,
    "t12_readability" -> t12_readability,
    "s08_hard_negatives" -> s08_hard_negatives,
    "q30_lateral_topn" -> q30_lateral_topn,
    "t13_doc_loglik" -> t13_doc_loglik,
    "q31_value_windows" -> q31_value_windows,
    "d28_group_split" -> d28_group_split,
    "d29_shard_shuffle" -> d29_shard_shuffle,
    "t14_sketch_bounds" -> t14_sketch_bounds,
    "t15_collocations" -> t15_collocations,
    "d30_epoch_upsample" -> d30_epoch_upsample,
    "q32_cube_grouping" -> q32_cube_grouping,
    "q33_pivot_status" -> q33_pivot_status,
    "q34_unpivot_measures" -> q34_unpivot_measures,
    "d31_template_centrality" -> d31_template_centrality,
    "q35_percentile_family" -> q35_percentile_family,
    "q36_array_functions" -> q36_array_functions,
    "q37_scd2_ranges" -> q37_scd2_ranges,
    "q38_map_functions" -> q38_map_functions,
    "v15_referential_orphans" -> v15_referential_orphans)

  val oracles: Map[String, String] = Map(
    "w07_asof_join" -> w07_sql,
    "d12_domain_mix" -> d12_sql,
    "d13_sequence_packing" -> d13_sql,
    "t07_quantiles" -> t07_sql,
    "t08_pii_redaction" -> t08_sql,
    "q19_skew_join" -> q19_sql,
    "q54_hybrid_skew_join" -> q54_sql,
    "q56_sketch_skew_join" -> q56_sql,
    "d49_fuzzy_name_match" -> d49_sql,
    "d50_fuzzy_match_k2" -> d50_sql,
    "t09_quality_filter" -> t09_sql,
    "d14_chunking" -> d14_sql,
    "t10_oov" -> t10_sql,
    "q20_rollup" -> q20_sql,
    "d15_edit_distance" -> d15_sql,
    "t11_tfidf" -> t11_sql,
    "s06_centroids" -> s06_sql,
    "q21_range_join" -> q21_sql,
    "q22_pivot" -> q22_sql,
    "q23_event_gaps" -> q23_sql,
    "q24_running_total" -> q24_sql,
    "q25_grouping_sets" -> q25_sql,
    "q26_json_extract" -> q26_sql,
    "q27_notin_nulls" -> q27_sql,
    "s07_ann_filtered" -> s07_sql,
    "d18_line_dedup" -> d18_sql,
    "d20_derepetition" -> d20_sql,
    "d22_token_derep" -> d22_sql,
    "q28_sliding_frame" -> q28_sql,
    "d24_frequent_ngrams" -> d24_sql,
    "d25_passage_spans" -> d25_sql,
    "d48_excise_contamination" -> d48_sql,
    "d60_substring_dedup" -> d60_sql,
    "d61_canonical_excise" -> d61_sql,
    "d62_canonical_reelection" -> d62_sql,
    "w44_novelty_admission" -> w44_sql,
    "d26_token_budget" -> d26_sql,
    "q29_rank_functions" -> q29_sql,
    "t12_readability" -> t12_sql,
    "s08_hard_negatives" -> s08_sql,
    "q30_lateral_topn" -> q30_sql,
    "t13_doc_loglik" -> t13_sql,
    "q31_value_windows" -> q31_sql,
    "d28_group_split" -> d28_sql,
    "d29_shard_shuffle" -> d29_sql,
    "t14_sketch_bounds" -> t14_sql,
    "t15_collocations" -> t15_sql,
    "d30_epoch_upsample" -> d30_sql,
    "q32_cube_grouping" -> q32_sql,
    "q33_pivot_status" -> q33_sql,
    "q34_unpivot_measures" -> q34_sql,
    "d31_template_centrality" -> d31_sql,
    "q35_percentile_family" -> q35_sql,
    "q36_array_functions" -> q36_sql,
    "q37_scd2_ranges" -> q37_sql,
    "q38_map_functions" -> q38_sql,
    "v15_referential_orphans" -> v15_sql)
}
