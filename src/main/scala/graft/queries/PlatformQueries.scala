package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.BpeInduction

/** Round-9 surface: the BPE encode path under the oracle gate, MoR
  * tables as catalog members, range-predicate file skipping, a
  * graph-shaped recursive CTE, and filter-aware ANN probing.
  */
object PlatformQueries {

  type Q = (SparkSession, String) => DataFrame

  // ───────────────────────────── d43: BPE tokenization (encode path)

  /** Fixed training corpus for the d43 tokenizer — a literal, so the
    * learned merge sequence is a pure function of THIS code (the
    * corpus tables vary by scale factor; the tokenizer must not).
    * Words are drawn from the synthetic documents' generator pool so
    * vocab hits dominate, with several pool words deliberately left
    * out to exercise the OOV fallback.
    */
  private[graft] val BpeTrainCorpus: Seq[String] = Seq(
    "the scan the column the window the order the sort",
    "scan column window order part agg line key",
    "join merge query group hash slow stream filter",
    "fast table data batch spark scan column window",
    "the scan order sort part agg join merge",
    "query group hash slow stream filter fast table data batch spark the")

  private[graft] val BpeMerges = 40

  /** Subword-tokenize the corpus with a BPE vocab trained by
    * [[BpeInduction.train]] on the fixed literal corpus above — the
    * encode path is purely relational (corpus explodes to words, the
    * Zipf-bounded vocab BROADCASTS, one left join + one aggregate;
    * plan-guarded in PlanSpec), which is what makes it the 100 TB
    * path: no per-row merge loop ever touches the corpus. The oracle
    * embeds the learned (word → subword-count) table as a VALUES
    * relation, so any drift in the trainer's merge dynamics — tie
    * order, greedy application, round count — shifts the embedded
    * counts off the recomputed ones and fails the hash. OOV words
    * (absent from the fixed vocab) count their characters.
    */
  val d43_bpe_tokenize: Q = (s, dir) => {
    import s.implicits._
    val (_, vocab) = BpeInduction.train(
      BpeTrainCorpus.toDF("text"), "text", k = BpeMerges)
    val docs = Tables(s, dir, "documents")
    BpeInduction.tokenCounts(docs, "doc_id", "text", vocab)
      .join(docs.select(col("doc_id").as("id"), col("lang")), Seq("id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_subwords")).as("n_subwords"),
        sum(col("n_oov_words")).as("n_oov_words"))
      .orderBy(col("lang"))
  }

  /** The VALUES relation is the vocab [[BpeInduction.train]] learns
    * from [[BpeTrainCorpus]] with k=40 (regenerate with
    * `runMain graft.tools.BpeVocabDump` after any trainer change).
    */
  val d43_sql: String =
    """WITH vocab(word, n_syms) AS (
      |  VALUES ('agg', 1), ('batch', 1), ('column', 1), ('data', 1),
      |    ('fast', 2), ('filter', 5), ('group', 5), ('hash', 2),
      |    ('join', 3), ('key', 3), ('line', 3), ('merge', 2),
      |    ('order', 1), ('part', 2), ('query', 3), ('scan', 1),
      |    ('slow', 3), ('sort', 3), ('spark', 3), ('stream', 4),
      |    ('table', 2), ('the', 1), ('window', 1)
      |), words AS (
      |  SELECT doc_id, lang,
      |         unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |                x -> x <> '')) AS word
      |  FROM documents
      |)
      |SELECT w.lang,
      |  CAST(COUNT(DISTINCT w.doc_id) AS BIGINT) AS n_docs,
      |  CAST(COUNT(*) AS BIGINT) AS n_words,
      |  CAST(SUM(COALESCE(v.n_syms, LENGTH(w.word))) AS BIGINT) AS n_subwords,
      |  CAST(SUM(CASE WHEN v.n_syms IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov_words
      |FROM words w LEFT JOIN vocab v ON v.word = w.word
      |GROUP BY w.lang
      |ORDER BY w.lang""".stripMargin

  // ───────────────────────────── w16: MoR member in a catalog cut

  /** A CDC fact table on MERGE-ON-READ cost inside a MULTI-TABLE
    * atomic catalog — w14's cross-table generation composed with
    * w15's O(batch) commit. Three micro-batches each commit the fact
    * member's CDC delta (inserts + deletes of earlier keys) AND the
    * rewritten rollup snapshot as ONE catalog generation
    * ([[graft.streaming.CatalogSink.commitBatchMixed]]); batch 2 is
    * then replayed and must no-op. The output joins the rollup
    * against the RESOLVED fact at the final cut, so any tear between
    * the members — a delta visible without its rollup, a replay
    * double-applied to one side — breaks the per-band equality the
    * oracle recomputes from the raw events.
    */
  val w16_mor_catalog: Q = (s, dir) => {
    val root = java.nio.file.Files.createTempDirectory("graft-morcat")
      .toFile.getAbsolutePath + "/cat"
    val cat = new graft.sources.TableCatalog(s, root)
    cat.morStore("fact", Seq("event_id"))
    val ev = Tables(s, dir, "events").select(col("event_id"), col("user_id"),
      round(col("value") * 100).cast("long").as("cents"))
    def u(df: DataFrame) = df.withColumn("__op", lit("U"))
    def del(df: DataFrame) = df.withColumn("__op", lit("D"))
    val b0 = u(ev.filter(col("event_id") % 3 === 0))
    val b1 = u(ev.filter(col("event_id") % 3 === 1)).unionByName(
      del(ev.filter(col("event_id") % 3 === 0 && col("event_id") % 5 === 0)))
    val b2 = u(ev.filter(col("event_id") % 3 === 2)).unionByName(
      del(ev.filter(col("event_id") % 3 === 1 && col("event_id") % 7 === 0)))
    val derive = Map[String, (Option[DataFrame], DataFrame) => DataFrame](
      "rollup" -> ((prev, batch) => {
        val net = batch.groupBy((col("user_id") % 10).as("user_band"))
          .agg(sum(when(col("__op") === "U", 1L).otherwise(-1L)).as("n_live"),
            sum(when(col("__op") === "U", col("cents"))
              .otherwise(-col("cents"))).as("sum_cents"))
        prev.map(_.unionByName(net).groupBy("user_band")
            .agg(sum("n_live").as("n_live"), sum("sum_cents").as("sum_cents")))
          .getOrElse(net)
      }))
    val morDerive = Map[String, DataFrame => DataFrame]("fact" -> (b => b))
    import graft.streaming.CatalogSink.commitBatchMixed
    commitBatchMixed(cat, b0, 0L, derive, morDerive)
    commitBatchMixed(cat, b1, 1L, derive, morDerive)
    val g2 = commitBatchMixed(cat, b2, 2L, derive, morDerive)
    require(commitBatchMixed(cat, b2, 2L, derive, morDerive) == -1L,
      "replayed batch must no-op")
    val fact = cat.readAt(g2, "fact")
      .groupBy((col("user_id") % 10).as("user_band"))
      .agg(count(lit(1)).as("n_fact"), sum(col("cents")).as("fact_cents"))
    cat.readAt(g2, "rollup").filter(col("n_live") > 0)
      .join(fact, Seq("user_band"))
      .select(col("user_band"), col("n_live"), col("sum_cents"),
        col("n_fact"), col("fact_cents"))
      .orderBy(col("user_band"))
  }

  /** The oracle computes the surviving event set once and projects it
    * as BOTH the rollup and the fact columns — equal by construction
    * exactly when the two catalog members describe the same cut.
    */
  val w16_sql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
      |  FROM events
      |), live AS (
      |  SELECT * FROM ev
      |  WHERE NOT (event_id % 3 = 0 AND event_id % 5 = 0)
      |    AND NOT (event_id % 3 = 1 AND event_id % 7 = 0)
      |)
      |SELECT user_id % 10 AS user_band,
      |  COUNT(*) AS n_live, CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  COUNT(*) AS n_fact, CAST(SUM(cents) AS BIGINT) AS fact_cents
      |FROM live
      |GROUP BY user_id % 10
      |ORDER BY user_band""".stripMargin

  val queries: Map[String, Q] = Map(
    "d43_bpe_tokenize" -> d43_bpe_tokenize,
    "w16_mor_catalog" -> w16_mor_catalog)

  val oracles: Map[String, String] = Map(
    "d43_bpe_tokenize" -> d43_sql,
    "w16_mor_catalog" -> w16_sql)
}
