package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{BloomPrune, GlobalIndex, TextDedup}
import graft.sources.TableCatalog

/** Round-8 second-session surface: Bloom-pruned joins (the
  * middle regime between broadcast and shuffle), contiguous global
  * indexing, the pivot and NTILE SQL surfaces, integer-exact BM25
  * retrieval, and cross-table atomic snapshots.
  */
object EngineQueries {

  type Q = (SparkSession, String) => DataFrame

  /** DuckDB replica of [[TextFunctions.tokens]] (same string as the
    * t01 oracle family).
    */
  private val ToksSql =
    """list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')"""

  // ───────────────────────────── d40: Bloom-pruned decontamination

  /** Decontamination when the eval-gram set outgrows a row broadcast:
    * the corpus gram stream is prefiltered by the eval grams' Bloom
    * image ([[BloomPrune.semiJoin]]) BEFORE any shuffle — only
    * probable matches (true hits + fpp) reach the exact semi join, so
    * at 100 TB the shuffle carries a sliver of the corpus instead of
    * all of it. The filter's one-sided error keeps the result exact
    * (the semi join re-checks real gram strings), so the oracle is
    * the plain relational semi join. Output: per-language clean /
    * contaminated accounting over the pool.
    */
  val d40_bloom_decontaminate: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
    val evalSet = docs.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text"))
    val pool = docs.filter(col("doc_id") % 37 =!= 0)
    val evalGrams = TextDedup.shingles(evalSet, "doc_id", "text", n = 8)
      .select(col("shingle"))
    val poolGrams = TextDedup.shingles(pool, "doc_id", "text", n = 8)
    val contaminated = BloomPrune.semiJoin(
        poolGrams, evalGrams, Seq("shingle"), expectedItems = 1000000L)
      .select(col("id").as("doc_id")).distinct()
    pool.join(contaminated.withColumn("__contam", lit(1L)), Seq("doc_id"), "left")
      .groupBy(col("lang"))
      .agg(
        sum(when(col("__contam").isNull, 1L).otherwise(0L)).as("n_clean"),
        sum(when(col("__contam").isNotNull, 1L).otherwise(0L)).as("n_contaminated"),
        sum(when(col("__contam").isNull, col("doc_id"))).as("sum_clean_ids"))
      .orderBy(col("lang"))
  }

  /** 8-gram relation over (doc_id, text) source `src` — DuckDB mirror
    * of [[TextDedup.shingles]] (per-doc distinct grams).
    */
  private def gramsSql(src: String, n: Int): String =
    s"""SELECT doc_id AS id, unnest(grams) AS shingle FROM (
       |    SELECT doc_id,
       |           CASE WHEN len(toks) = 0 THEN []
       |                ELSE list_distinct(list_transform(range(0, GREATEST(len(toks) - $n, 0) + 1),
       |                  i -> array_to_string(toks[i + 1 : i + $n], ' '))) END AS grams
       |    FROM (SELECT doc_id, $ToksSql AS toks
       |          FROM $src) t
       |  ) g""".stripMargin

  val d40_sql: String =
    s"""WITH eval_docs AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 37 = 0
       |), pool AS (
       |  SELECT * FROM documents WHERE doc_id % 37 <> 0
       |), eval_grams AS (
       |  SELECT DISTINCT shingle FROM (${gramsSql("eval_docs", 8)})
       |), pool_grams AS (
       |  ${gramsSql("pool", 8)}
       |), contam AS (
       |  SELECT DISTINCT id AS doc_id FROM pool_grams
       |  WHERE shingle IN (SELECT shingle FROM eval_grams)
       |)
       |SELECT p.lang,
       |  CAST(SUM(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
       |  CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       |  CAST(SUM(CASE WHEN c.doc_id IS NULL THEN p.doc_id END) AS BIGINT) AS sum_clean_ids
       |FROM pool p LEFT JOIN contam c USING (doc_id)
       |GROUP BY p.lang
       |ORDER BY p.lang""".stripMargin

  // ───────────────────────────── d41: contiguous global index

  /** Global sample numbering by (n_chars, doc_id) via the two-phase
    * offset assignment ([[GlobalIndex.assign]] — one range shuffle,
    * no single-partition window). Verified against the oracle's
    * `ROW_NUMBER() OVER (ORDER BY …)` through an order-sensitive
    * checksum: Σ idx·doc_id per language only matches if every single
    * document received exactly the rank the global sort gives it.
    */
  val d41_global_index: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    GlobalIndex.assign(docs, Seq("n_chars", "doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("idx")).as("min_idx"),
        max(col("idx")).as("max_idx"),
        sum(col("idx")).as("sum_idx"),
        sum(col("idx") * col("doc_id")).as("idx_dot_id"))
      .orderBy(col("lang"))
  }

  val d41_sql: String =
    """WITH r AS (
      |  SELECT doc_id, lang,
      |    ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1 AS idx
      |  FROM documents
      |)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(MIN(idx) AS BIGINT) AS min_idx,
      |  CAST(MAX(idx) AS BIGINT) AS max_idx,
      |  CAST(SUM(idx) AS BIGINT) AS sum_idx,
      |  CAST(SUM(idx * doc_id) AS BIGINT) AS idx_dot_id
      |FROM r
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ───────────────────────────── q42: pivot (status × priority matrix)

  /** The pivot surface: order revenue as a priority × status matrix —
    * `groupBy(priority).pivot(status, explicit values)` (explicit
    * values keep the plan a single pass with no distinct-values
    * pre-job). Money pivots as integer cents; absent cells are 0.
    */
  val q42_pivot: Q = (s, dir) =>
    Tables(s, dir, "orders")
      .select(col("o_orderpriority"),
        col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast(LongType).as("cents"))
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("cents")))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("f_cents"),
        coalesce(col("O"), lit(0L)).as("o_cents"),
        coalesce(col("P"), lit(0L)).as("p_cents"))
      .orderBy(col("o_orderpriority"))

  val q42_sql: String =
    """SELECT o_orderpriority,
      |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F'
      |    THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS f_cents,
      |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O'
      |    THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS o_cents,
      |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P'
      |    THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS p_cents
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ───────────────────────────── q43: NTILE equi-depth binning

  /** Equi-depth deciles of document length per language — NTILE(10)
    * over the (n_chars, doc_id) total order, then per-bin boundaries
    * and mass. The SQL-standard remainder rule (first bins get the
    * extra row) is identical in Spark and DuckDB, so bin membership
    * is exact, not approximate. This is the feature-binning /
    * length-bucketing pass before packing or stratification.
    */
  val q43_ntile_bins: Q = (s, dir) => {
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
    Tables(s, dir, "documents")
      .select(col("lang"), col("n_chars"), col("doc_id"))
      .withColumn("decile", ntile(10).over(w).cast(LongType))
      .groupBy(col("lang"), col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("lo_chars"),
        max(col("n_chars")).as("hi_chars"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"), col("decile"))
  }

  val q43_sql: String =
    """WITH d AS (
      |  SELECT lang, n_chars,
      |    CAST(NTILE(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS decile
      |  FROM documents
      |)
      |SELECT lang, decile, COUNT(*) AS n_docs,
      |  MIN(n_chars) AS lo_chars, MAX(n_chars) AS hi_chars,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM d
      |GROUP BY lang, decile
      |ORDER BY lang, decile""".stripMargin

  // ───────────────────────────── t19: integer-exact BM25 retrieval

  private val Bm25Terms = Seq("vector", "stream", "merge", "window", "filter", "scan")

  /** BM25-shaped keyword retrieval, integer-exact end to end. The
    * textbook score idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) with
    * k1=6/5, b=3/4 is cleared of floats by multiplying numerator and
    * denominator by 10·Σdl:
    *
    *   contrib = rarity · 22·tf·Σdl  div  (10·Σdl·tf + 3·Σdl + 9·dl·N)
    *
    * with rarity = 1000·(N−df) div N standing in for the
    * transcendental idf (t13's surrogate discipline). Every quantity
    * is a corpus integer, so ranking replays bit-identically in the
    * oracle. Shape: one token explode; the tf side filters to the
    * query terms BEFORE its aggregation (the corpus-side shuffle only
    * carries query-term hits); per-term df is a 6-row broadcast;
    * top-k is TakeOrderedAndProject, never a global window. BIGINT
    * carries the products up to Σdl ≈ 4·10¹³ (≫ any single corpus
    * shard); past that the same expressions move to decimal(38,0).
    */
  /** The shared integer-exact BM25 scoring tail over (doc_id, tok,
    * tf) + (doc_id, dl) relations — ONE implementation serving both
    * t19 (scan-time tf) and t23 (tf from the stored postings): their
    * oracle contract is bit-identical ranking, so a constant tweak
    * edited in one copy but not the other would silently break the
    * t23 gate. df/totals derive here so every caller prices terms the
    * same way.
    */
  private def bm25Tail(tf: DataFrame, dl: DataFrame): DataFrame = {
    val totals = dl.agg(sum(col("dl")).as("sumdl"), count(lit(1)).as("n_docs"))
    val dft = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dft), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(totals))
      .withColumn("rarity", expr("(1000 * (n_docs - df)) div n_docs"))
      .withColumn("contrib", expr(
        "(rarity * 22 * tf * sumdl) div (10 * sumdl * tf + 3 * sumdl + 9 * dl * n_docs)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("matched_terms"), sum(col("contrib")).as("score_num"))
      .orderBy(col("score_num").desc, col("doc_id"))
      .limit(20)
  }

  val t19_bm25_topk: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
    val toks = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val tf = toks.filter(col("tok").isin(Bm25Terms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    bm25Tail(tf, dl)
  }

  val t19_sql: String = bm25OracleSql("documents")

  /** One oracle body for every BM25 query (t19 scan-time, t23
    * index-served, t27 index-with-deletes): the contract across all
    * three is BIT-IDENTICAL ranking over their corpus, so the SQL
    * differs only in which corpus relation feeds the tokenizer.
    */
  private def bm25OracleSql(corpusRel: String): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest($ToksSql) AS tok FROM $corpusRel
       |)$Bm25OracleTailSql""".stripMargin

  /** The scoring tail of [[bm25OracleSql]] from the `toks` CTE down —
    * exposed separately so composed oracles (w32: BM25 over the
    * ADMITTED corpus) can prepend their own corpus-defining CTE stack
    * and still share the one scoring body bit-for-bit.
    */
  private def Bm25OracleTailSql: String = {
    val termsList = Bm25Terms.map(t => s"'$t'").mkString(", ")
    s""", dl AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
       |), totals AS (
       |  SELECT CAST(SUM(dl) AS BIGINT) AS sumdl, CAST(COUNT(*) AS BIGINT) AS n_docs FROM dl
       |), tf AS (
       |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
       |  WHERE tok IN ($termsList) GROUP BY doc_id, tok
       |), dft AS (
       |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
       |), scored AS (
       |  SELECT tf.doc_id,
       |    ((1000 * (n_docs - df)) // n_docs) * 22 * tf * sumdl
       |      // (10 * sumdl * tf + 3 * sumdl + 9 * dl * n_docs) AS contrib
       |  FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id), totals
       |)
       |SELECT doc_id, COUNT(*) AS matched_terms,
       |  CAST(SUM(contrib) AS BIGINT) AS score_num
       |FROM scored
       |GROUP BY doc_id
       |ORDER BY score_num DESC, doc_id
       |LIMIT 20""".stripMargin
  }

  // ───────────────────────────── t23: BM25 served from a persisted index

  /** t19 SERVED FROM A PERSISTED INVERTED INDEX — the search-engine
    * split t19 leaves open: t19 tokenizes the corpus at query time;
    * here the index (postings = (tok, doc_id, tf) for EVERY token,
    * doc lengths beside it) is built INCREMENTALLY — two document
    * micro-batches, each committing postings + doclen as ONE atomic
    * catalog generation ([[graft.streaming.CatalogSink.commitBatch]];
    * a torn commit would let a doc score with no length row or vice
    * versa), with one batch replayed (exactly-once no-op,
    * require-guarded). The query then scores ENTIRELY from the stored
    * relations: tf filters postings to the query terms (at scale the
    * postings sort/partition by `tok`, so term files prune via the
    * v22 skipping machinery), df/Σdl/N are index-relation aggregates,
    * and raw document text is NEVER read at query time. Oracle =
    * t19's replay — index-serving must reproduce the scan-time
    * ranking bit-identically.
    */
  val t23_bm25_index_serve: Q = (s, dir) => {
    val root = java.nio.file.Files.createTempDirectory("graft-bm25idx")
      .toFile.getAbsolutePath + "/cat"
    val cat = new TableCatalog(s, root)
    val docs = Tables(s, dir, "documents")
    def toksOf(df: DataFrame) = df.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    // each doc lands in exactly one batch, so maintenance is a pure
    // append of the batch's postings/lengths — no per-key merge
    val derive = Map[String, (Option[DataFrame], DataFrame) => DataFrame](
      "postings" -> ((prev, b) => {
        val p = toksOf(b).groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("tf"))
        prev.map(_.unionByName(p)).getOrElse(p)
      }),
      "doclen" -> ((prev, b) => {
        val d = toksOf(b).groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
        prev.map(_.unionByName(d)).getOrElse(d)
      }))
    (0 until 2).foreach { i =>
      graft.streaming.CatalogSink.commitBatch(cat,
        docs.filter(col("doc_id") % 2 === i), i.toLong, derive)
    }
    require(graft.streaming.CatalogSink.commitBatch(cat,
      docs.filter(col("doc_id") % 2 === 1), 1L, derive) == -1L,
      "redelivered index batch was re-applied")
    require(cat.loggedGenerations().size == 2,
      s"expected 2 index generations, got ${cat.loggedGenerations().size}")
    // ── serve: stored relations only, text never touched ──
    bm25Tail(
      cat.read("postings").filter(col("tok").isin(Bm25Terms: _*)),
      cat.read("doclen"))
  }

  // ───────────────────────────── t27: postings maintenance under deletes

  /** t23's persisted index under DELETIONS — the maintenance story an
    * append-only inverted index leaves open: a right-to-be-forgotten
    * (or recrawl-replaced) document must leave the index AND its
    * statistics. Rewriting term-partitioned postings per delete is the
    * one thing an inverted index cannot afford (a doc touches as many
    * term files as it has distinct tokens), so deletion is MoR-style —
    * the s22 tombstone shape applied to text retrieval: batch 2
    * commits a `tombstones` id relation in the SAME catalog (one
    * atomic generation; postings/doclen carry forward untouched), and
    * the serve path anti-joins it on doc_id before scoring. df, Σdl
    * and N then come out right FOR FREE because [[bm25Tail]] derives
    * all three from the relations it is fed — there is no separate
    * stats object to invalidate. The tombstone side stays
    * broadcast-sized (deleted ids, not postings rows), so at 100 TB
    * the anti-join never shuffles the index. Oracle = t19's replay on
    * the SURVIVING corpus — a leaked posting, a stale df, or a
    * tombstoned doc still scoring all shift the ranking and fail the
    * hash; a periodic compaction (rewrite postings minus tombstones,
    * reset the tombstone relation) is the same trade [[MorStore
    * .compact]] prices.
    */
  val t27_bm25_index_delete: Q = (s, dir) => {
    val root = java.nio.file.Files.createTempDirectory("graft-bm25del")
      .toFile.getAbsolutePath + "/cat"
    val cat = new TableCatalog(s, root)
    val docs = Tables(s, dir, "documents")
    def toksOf(df: DataFrame) = df.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    val derive = Map[String, (Option[DataFrame], DataFrame) => DataFrame](
      "postings" -> ((prev, b) => {
        val p = toksOf(b).groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("tf"))
        prev.map(_.unionByName(p)).getOrElse(p)
      }),
      "doclen" -> ((prev, b) => {
        val d = toksOf(b).groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
        prev.map(_.unionByName(d)).getOrElse(d)
      }))
    (0 until 2).foreach { i =>
      graft.streaming.CatalogSink.commitBatch(cat,
        docs.filter(col("doc_id") % 2 === i), i.toLong, derive)
    }
    // batch 2: the deletion — ids only, committed atomically beside
    // the (untouched) postings; a replay of the delete batch no-ops
    val deriveDel = Map[String, (Option[DataFrame], DataFrame) => DataFrame](
      "tombstones" -> ((prev, b) => {
        val t = b.select(col("doc_id"))
        prev.map(_.unionByName(t)).getOrElse(t)
      }))
    val deleted = docs.filter(col("doc_id") % 5 === 0)
    graft.streaming.CatalogSink.commitBatch(cat, deleted, 2L, deriveDel)
    require(graft.streaming.CatalogSink.commitBatch(cat, deleted, 2L,
      deriveDel) == -1L, "redelivered delete batch was re-applied")
    val tomb = broadcast(cat.read("tombstones"))
    val livePostings = cat.read("postings")
      .join(tomb, Seq("doc_id"), "left_anti")
    val liveDl = cat.read("doclen").join(tomb, Seq("doc_id"), "left_anti")
    bm25Tail(livePostings.filter(col("tok").isin(Bm25Terms: _*)), liveDl)
  }

  // ───────────────────────────── w30: streaming postings maintenance

  /** The t23/t27 postings index under CONTINUOUS maintenance — the
    * retrieval-serving story's last open edge (the LSH dedup index got
    * its streaming sink as w29): a stream of document micro-batches
    * keeps the inverted index current through ingests, a RECRAWL that
    * replaces documents' previous revisions, and deletes, each batch
    * ONE atomic exactly-once generation
    * ([[graft.streaming.PostingsIndex.commitBatch]] — postings/doclen
    * appends and the replaced/deleted ids' tombstones land together;
    * torn, a recrawled doc would score twice or a deleted one at all).
    * Revisions make replacement append-only: index rows carry the
    * committing batch id, tombstones carry (doc_id, kill_below), and
    * the serve mask is rev < MAX(kill_below) — so the recrawl never
    * rewrites a term file, and a post-delete re-ingest would revive
    * the id naturally. Serving stays index-only ([[graft.streaming
    * .PostingsIndex.live]]: stored relations + broadcast tombstone
    * anti-joins — raw text never read at query time, the index never
    * shuffled for a maintenance event, PlanSpec-guarded). df/Σdl/N
    * follow every replace/delete for free because [[bm25Tail]]
    * derives them from the relations it is fed. Oracle = t19's replay
    * on the stream's FINAL surviving corpus (recrawled texts, deleted
    * docs gone): a stale revision still scoring, a lost new posting,
    * or a leaked deleted doc all shift the ranking and fail the hash
    * — the recrawl prepends two QUERY TERMS ("vector stream ") so
    * replaced revisions move the top-20 by construction.
    */
  val w30_streaming_postings: Q = (s, dir) => {
    import graft.streaming.PostingsIndex
    val root = java.nio.file.Files.createTempDirectory("graft-bm25stream")
      .toFile.getAbsolutePath + "/cat"
    val cat = new TableCatalog(s, root)
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val none = docs.limit(0)
    // batches 0-1: fresh ingest by parity
    (0 until 2).foreach { i =>
      PostingsIndex.commitBatch(cat, docs.filter(col("doc_id") % 2 === i),
        none, i.toLong)
    }
    require(PostingsIndex.commitBatch(cat,
      docs.filter(col("doc_id") % 2 === 1), none, 1L) == -1L,
      "redelivered ingest batch was re-applied")
    // batch 2: recrawl — new text REPLACES the docs' rev-0/1 postings
    val recrawl = docs.filter(col("doc_id") % 10 === 3)
      .withColumn("text", concat(lit("vector stream "), col("text")))
    PostingsIndex.commitBatch(cat, recrawl, none, 2L, replace = true)
    // batch 3: right-to-be-forgotten deletes (ids only)
    val dels = docs.filter(col("doc_id") % 7 === 0).select(col("doc_id"))
    PostingsIndex.commitBatch(cat, none, dels, 3L)
    require(PostingsIndex.commitBatch(cat, none, dels, 3L) == -1L,
      "redelivered delete batch was re-applied")
    require(cat.loggedGenerations().size == 4,
      s"expected 4 generations, got ${cat.loggedGenerations().size}")
    // ── serve: stored relations only, text never touched ──
    val (tf, dl) = PostingsIndex.live(cat)
    bm25Tail(tf.filter(col("tok").isin(Bm25Terms: _*)), dl)
  }

  // ───────────────────────────── t28: phrase search (positional postings)

  /** EXACT-PHRASE retrieval from positional postings — the index
    * member tf-postings (t19/t23/w30) cannot express: "new york" and
    * "york new" share identical term statistics, only POSITIONS
    * separate them (the Lucene positional-postings layout,
    * [[graft.operators.InvertedIndex.positions]]). The query phrase is
    * chosen FROM THE DATA — the corpus's most frequent word trigram
    * (ties by gram ascending), derived on the Spark side entirely from
    * the positional relation (a 3-way self-join on position adjacency
    * — the same joins phrase serving uses, so the selection pass
    * exercises the machinery it feeds) and in the oracle from
    * non-distinct trigram expansion; both reduce to one deterministic
    * 1-row argmax. Serving then runs
    * [[graft.operators.InvertedIndex.phraseCount]]: per-term posting
    * lists filtered first, chained on shifted-position equi-joins —
    * posting-list-sized inputs, never corpus-sized. Output: every doc
    * containing the phrase with its occurrence count; one lost or
    * off-by-one position anywhere shifts a count and fails the hash.
    */
  val t28_phrase_search: Q = (s, dir) => {
    import graft.operators.InvertedIndex
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val pos = InvertedIndex.positions(docs, "doc_id", "text").persist()
    def shifted(i: Int) = pos.select(col("doc_id"),
      (col("pos") - i).as("p"), col("tok").as(s"t$i"))
    val grams = shifted(0)
      .join(shifted(1), Seq("doc_id", "p"))
      .join(shifted(2), Seq("doc_id", "p"))
      .select(col("doc_id"),
        concat_ws(" ", col("t0"), col("t1"), col("t2")).as("gram"))
    // 1-row driver collect: the corpus's top trigram is the query
    val top = grams.groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram")).limit(1)
      .collect()(0).getString(0)
    InvertedIndex.phraseCount(pos, top.split(" ").toSeq)
      .orderBy(col("doc_id"))
  }

  val t28_sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS t
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id, unnest(
      |    CASE WHEN len(t) < 3 THEN []
      |         ELSE list_transform(range(0, len(t) - 3 + 1),
      |                i -> array_to_string(t[i + 1 : i + 3], ' ')) END) AS gram
      |  FROM toks
      |), top AS (
      |  SELECT gram FROM grams GROUP BY gram
      |  ORDER BY COUNT(*) DESC, gram LIMIT 1
      |)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      |FROM grams
      |WHERE gram = (SELECT gram FROM top)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // ──────── t30: phrase search served from a STORED positional index

  /** t28 with the positional relation as a PERSISTED INDEX MEMBER —
    * the t19→t23 split applied to positions: the corpus is tokenized
    * exactly once, at index build ([[graft.operators.InvertedIndex
    * .positions]] committed as one catalog generation), and BOTH
    * halves of the query — the
    * data-derived phrase selection (top-trigram argmax through the
    * position-adjacency self-joins) and the serving count
    * ([[graft.operators.InvertedIndex.phraseCount]]) — read only the
    * stored relation; raw text is never touched at query time
    * (PlanSpec-pinned: no documents scan). At 100 TB the positions
    * relation sorts/partitions by `tok` like the tf postings, so the
    * per-term filters prune via the same skipping machinery. Oracle =
    * t28's replay verbatim — index-serving is an execution strategy,
    * and any stored-position drift (an off-by-one rev, a lost token)
    * shifts a count and breaks the shared hash.
    */
  val t30_phrase_index_serve: Q = (s, dir) => {
    import graft.operators.InvertedIndex
    import graft.streaming.CatalogSink
    val root = java.nio.file.Files.createTempDirectory("graft-posidx")
      .toFile.getAbsolutePath + "/cat"
    val cat = new TableCatalog(s, root)
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    CatalogSink.commitBatch(cat, docs, 0L, Map(
      "positions" -> ((_, _) => InvertedIndex.positions(docs, "doc_id", "text"))))
    val pos = cat.read("positions").persist()
    def shifted(i: Int) = pos.select(col("doc_id"),
      (col("pos") - i).as("p"), col("tok").as(s"t$i"))
    val grams = shifted(0)
      .join(shifted(1), Seq("doc_id", "p"))
      .join(shifted(2), Seq("doc_id", "p"))
      .select(concat_ws(" ", col("t0"), col("t1"), col("t2")).as("gram"))
    val top = grams.groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram")).limit(1)
      .collect()(0).getString(0)
    val out = InvertedIndex.phraseCount(pos, top.split(" ").toSeq)
      .orderBy(col("doc_id"))
    pos.unpersist()
    out
  }

  // ──── t31: proximity served from the stored positional index

  /** t29's proximity signal through t30's STORED positional member —
    * the last scan-built retrieval signal moves behind the index: the
    * corpus is tokenized once at build, and the windowed pair
    * aggregation ([[graft.operators.InvertedIndex.proximity]]) reads
    * only the stored relation, so per-query cost is the two terms'
    * posting lists however large the corpus (PlanSpec-pinned: no
    * documents scan). Oracle = t29's replay verbatim (index-serving
    * is an execution strategy; a stored-position drift shifts a
    * distance and breaks the shared hash).
    */
  val t31_proximity_index_serve: Q = (s, dir) => {
    import graft.operators.InvertedIndex
    import graft.streaming.CatalogSink
    val root = java.nio.file.Files.createTempDirectory("graft-proxidx")
      .toFile.getAbsolutePath + "/cat"
    val cat = new TableCatalog(s, root)
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    CatalogSink.commitBatch(cat, docs, 0L, Map(
      "positions" -> ((_, _) => InvertedIndex.positions(docs, "doc_id", "text"))))
    InvertedIndex.proximity(cat.read("positions"), "vector", "stream",
        window = 5)
      .orderBy(col("doc_id"))
  }

  // ──────── w34: positional index under streaming maintenance

  /** t30's positional index MAINTAINED BY A STREAM — w30's
    * revision/tombstone contract applied to the relation where stale
    * revisions are not just wasted rows but WRONG ANSWERS: a recrawl
    * shifts every token position, so an unmasked old revision feeds
    * the adjacency joins phantom starts and the phrase counts drift.
    * Lifecycle: two ingest batches, a recrawl wave (docs %10=3
    * re-ingested with two prepended tokens — every position moves by
    * 2, and the recrawled texts now CONTAIN new adjacencies), a
    * delete wave (%7=0), one batch redelivered (exactly-once no-op,
    * require-guarded). Serving reads only the live view
    * ([[graft.streaming.PostingsIndex.livePositions]] — broadcast
    * kill-floor anti-join): the phrase argmax AND the occurrence
    * counts both run on it, raw text untouched at query time. Oracle
    * = t28's replay on the stream's final surviving corpus — one
    * unmasked stale position anywhere shifts the argmax or a count
    * and fails the hash.
    */
  val w34_positional_maintenance: Q = (s, dir) => {
    import graft.operators.InvertedIndex
    import graft.streaming.PostingsIndex
    val root = java.nio.file.Files.createTempDirectory("graft-posmnt")
      .toFile.getAbsolutePath + "/cat"
    val cat = new TableCatalog(s, root)
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val none = docs.limit(0)
    val noneIds = docs.select(col("doc_id")).limit(0)
    PostingsIndex.commitPositionsBatch(cat, docs.filter(col("doc_id") % 2 === 0), noneIds, 0L)
    PostingsIndex.commitPositionsBatch(cat, docs.filter(col("doc_id") % 2 === 1), noneIds, 1L)
    val recrawl = docs.filter(col("doc_id") % 10 === 3)
      .withColumn("text", concat(lit("vector stream "), col("text")))
    PostingsIndex.commitPositionsBatch(cat, recrawl, noneIds, 2L, replace = true)
    require(PostingsIndex.commitPositionsBatch(cat, recrawl, noneIds, 2L,
      replace = true) == -1L, "redelivered recrawl batch was re-applied")
    PostingsIndex.commitPositionsBatch(cat, none,
      docs.filter(col("doc_id") % 7 === 0).select(col("doc_id")), 3L)
    val pos = PostingsIndex.livePositions(cat).persist()
    def shifted(i: Int) = pos.select(col("doc_id"),
      (col("pos") - i).as("p"), col("tok").as(s"t$i"))
    val top = shifted(0)
      .join(shifted(1), Seq("doc_id", "p"))
      .join(shifted(2), Seq("doc_id", "p"))
      .select(concat_ws(" ", col("t0"), col("t1"), col("t2")).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram")).limit(1)
      .collect()(0).getString(0)
    val out = InvertedIndex.phraseCount(pos, top.split(" ").toSeq)
      .orderBy(col("doc_id"))
    pos.unpersist()
    out
  }

  /** t28's replay with the corpus rewritten to the stream's final
    * surviving state (recrawled texts in, deletes out) — the w30
    * oracle-surgery discipline on the positional family.
    */
  val w34_sql: String = t28_sql.replace("FROM documents",
    """FROM (SELECT doc_id,
      |        CASE WHEN doc_id % 10 = 3
      |             THEN 'vector stream ' || text ELSE text END AS text
      | FROM documents WHERE doc_id % 7 <> 0) surv""".stripMargin)

  // ───────────────── t29: proximity-scored retrieval (positions)

  /** PROXIMITY retrieval from the positional relation — the ranking
    * signal between bag-of-words (t19: position-blind) and exact
    * phrase (t28: adjacency-only): documents where the two query
    * terms co-occur within a 5-token window, scored by the integer
    * proximity mass Σ (window + 1 − dist) over all close pairs
    * ([[graft.operators.InvertedIndex.proximity]] — the cover-density
    * scoring family, cleared of floats so the oracle replays
    * bit-identically). Per-term posting lists filter BEFORE the join,
    * so inputs are posting-list-sized; the only shuffle is the doc_id
    * equi-join; the window filter drops far pairs pre-aggregation.
    * Output: every co-occurrence doc with pair count, closest
    * distance, and mass — one off-by-one position anywhere (a lost
    * token, a 0-vs-1-based drift) shifts a distance and fails the
    * hash.
    */
  val t29_proximity_search: Q = (s, dir) => {
    import graft.operators.InvertedIndex
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val pos = InvertedIndex.positions(docs, "doc_id", "text")
    InvertedIndex.proximity(pos, "vector", "stream", window = 5)
      .orderBy(col("doc_id"))
  }

  val t29_sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, $ToksSql AS t FROM documents
       |), posed AS (
       |  SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos, t FROM toks
       |), ptok AS (
       |  SELECT doc_id, pos, t[pos] AS tok FROM posed
       |), pa AS (SELECT doc_id, pos AS pa FROM ptok WHERE tok = 'vector'),
       |pb AS (SELECT doc_id, pos AS pb FROM ptok WHERE tok = 'stream'),
       |close_pairs AS (
       |  SELECT a.doc_id, ABS(a.pa - b.pb) AS dist
       |  FROM pa a JOIN pb b ON a.doc_id = b.doc_id
       |  WHERE ABS(a.pa - b.pb) <= 5
       |)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_close_pairs,
       |  CAST(MIN(dist) AS BIGINT) AS min_dist,
       |  CAST(SUM(6 - dist) AS BIGINT) AS prox_score
       |FROM close_pairs
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // ───────────────────────────── t32: field-weighted BM25F

  /** BM25F — field-weighted retrieval, the multi-field half of the
    * BM25 family (Robertson's simple-BM25F: per-field weights fold
    * into a weighted term frequency and a weighted document length
    * BEFORE the saturation curve, so a title hit saturates jointly
    * with body hits instead of scoring as an independent query). The
    * document's title is its first 3 tokens (weight 3), the body the
    * rest (weight 1) — a deterministic split both engines derive from
    * the text alone. Because weights are integers, wtf = Σw per
    * (doc, term) and wdl = Σw per doc stay corpus integers and the
    * ENTIRE t19 integer-exact scoring tail applies verbatim — one
    * shared implementation, so BM25 and BM25F cannot drift. Shape:
    * the positional projection (one posexplode) replaces t19's plain
    * explode; the tf side filters to query terms BEFORE aggregation;
    * everything else is t19's plan — no extra shuffle for the field
    * dimension, which is the point at 100 TB (field weighting is a
    * map-side expression, not a join against a field table).
    */
  val t32_bm25f_fields: Q = (s, dir) => {
    import graft.operators.InvertedIndex
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val weighted = InvertedIndex.positions(docs, "doc_id", "text")
      .withColumn("w", when(col("pos") <= 3, lit(3L)).otherwise(lit(1L)))
    val dl = weighted.groupBy(col("doc_id")).agg(sum(col("w")).as("dl"))
    val tf = weighted.filter(col("tok").isin(Bm25Terms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(sum(col("w")).as("tf"))
    bm25Tail(tf, dl)
  }

  /** t19's scoring tail over WEIGHTED tf/dl — COUNT(*) becomes SUM(w)
    * with w from the same position split, nothing else moves.
    */
  val t32_sql: String = {
    val termsList = Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, $ToksSql AS t FROM documents
       |), posed AS (
       |  SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos, t FROM toks
       |), wtok AS (
       |  SELECT doc_id, t[pos] AS tok,
       |         CASE WHEN pos <= 3 THEN 3 ELSE 1 END AS w
       |  FROM posed
       |), dl AS (
       |  SELECT doc_id, CAST(SUM(w) AS BIGINT) AS dl FROM wtok GROUP BY doc_id
       |), totals AS (
       |  SELECT CAST(SUM(dl) AS BIGINT) AS sumdl, CAST(COUNT(*) AS BIGINT) AS n_docs FROM dl
       |), tf AS (
       |  SELECT doc_id, tok, CAST(SUM(w) AS BIGINT) AS tf FROM wtok
       |  WHERE tok IN ($termsList) GROUP BY doc_id, tok
       |), dft AS (
       |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
       |), scored AS (
       |  SELECT tf.doc_id,
       |    ((1000 * (n_docs - df)) // n_docs) * 22 * tf * sumdl
       |      // (10 * sumdl * tf + 3 * sumdl + 9 * dl * n_docs) AS contrib
       |  FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id), totals
       |)
       |SELECT doc_id, COUNT(*) AS matched_terms,
       |  CAST(SUM(contrib) AS BIGINT) AS score_num
       |FROM scored
       |GROUP BY doc_id
       |ORDER BY score_num DESC, doc_id
       |LIMIT 20""".stripMargin
  }

  // ──────────────── t33: BM25F served from the stored positional member

  /** t32 WITHOUT A SCAN — the stored positional member already holds
    * (doc_id, pos, tok), and field membership is a FUNCTION OF
    * POSITION, so the positional index SUBSUMES field-weighted
    * serving: no per-field postings, no second index, no schema
    * change — the BM25F weights derive at serve time from the same
    * relation phrase/proximity queries read, under the same kill
    * floors (a forgotten doc drops out of field-weighted ranking in
    * the generation it stops phrase-matching). The tf postings member
    * alone could NOT serve this (it stores Σtf, the position split is
    * gone) — exactly the argument that put positions in the unified
    * commit. Lifecycle: one ingest generation, a forget wave, then
    * the weighted t32 scoring over `positionsLive`. Oracle = t32's
    * replay over the surviving corpus: one unmasked position row or a
    * lost field weight shifts wtf/wdl and fails the hash.
    */
  val t33_bm25f_index_serve: Q = (s, dir) => {
    import graft.streaming.UnifiedIndex
    val root = java.nio.file.Files.createTempDirectory("graft-bm25fidx")
      .toFile.getAbsolutePath + "/cat"
    val cat = new TableCatalog(s, root)
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    UnifiedIndex.commitBatch(cat, d, 0L)
    UnifiedIndex.delete(cat, d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id")), 1L)
    val weighted = UnifiedIndex.positionsLive(cat)
      .withColumn("w", when(col("pos") <= 3, lit(3L)).otherwise(lit(1L)))
    val dl = weighted.groupBy(col("doc_id")).agg(sum(col("w")).as("dl"))
    val tf = weighted.filter(col("tok").isin(Bm25Terms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(sum(col("w")).as("tf"))
    bm25Tail(tf, dl)
  }

  /** t32's weighted replay over the forget's survivors. */
  val t33_sql: String = t32_sql.replace("FROM documents",
    "FROM (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0) surv")

  // ───────────────────────────── t34: collocation mining (integer PMI)

  /** COLLOCATION EXTRACTION — the phrase-vocabulary miner a tokenizer/
    * phrase-merge pipeline runs over a corpus (Mikolov-style word2vec
    * phrase scoring is this same ratio): bigrams whose observed count
    * beats what their parts' frequencies predict, ranked by an
    * integer PMI surrogate `(c_ab · N · 1000) div (c_a · c_b)` —
    * transcendentals monotone-eliminated exactly like BM25's idf
    * (t13's surrogate discipline), so the ranking replays
    * bit-identically in the oracle. Shape: bigram pairs are a PURE
    * PROJECTION of the token array (transform over 0-based adjacent
    * indexes — no self-join, no window, no shuffle to FORM pairs);
    * one groupBy counts them; the HAVING ≥ 3 prune lands BEFORE the
    * frequency joins, so only the frequent-bigram sliver joins the
    * vocabulary counts (term-keyed) and the 1-row total broadcast.
    * BIGINT carries c_ab·N·1000 to ~10¹⁸; past that the same
    * expressions move to decimal(38,0) — the standard caveat.
    */
  val t34_collocations: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
    val toksArr = docs.select(TextFunctions.tokens(col("text")).as("t"))
    val uniCnt = toksArr.select(explode(col("t")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val n = uniCnt.agg(sum(col("c")).as("n"))
    val bcnt = toksArr.filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS a, t[i] AS b))"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= 3)
    bcnt
      .join(uniCnt.select(col("tok").as("a"), col("c").as("ca")), "a")
      .join(uniCnt.select(col("tok").as("b"), col("c").as("cb")), "b")
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("cab"),
        expr("(cab * n * 1000) div (ca * cb)").as("pmi_k"))
      .orderBy(col("pmi_k").desc, col("a"), col("b"))
      .limit(20)
  }

  val t34_sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, $ToksSql AS t FROM documents
       |), uni AS (
       |  SELECT unnest(t) AS tok FROM toks
       |), ucnt AS (
       |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY tok
       |), tot AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM uni
       |), big AS (
       |  SELECT t[pos] AS a, t[pos + 1] AS b
       |  FROM (SELECT doc_id, unnest(range(1, len(t))) AS pos, t FROM toks) z
       |), bcnt AS (
       |  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cab FROM big
       |  GROUP BY a, b HAVING COUNT(*) >= 3
       |)
       |SELECT a, b, cab, (cab * n * 1000) // (ca.c * cb.c) AS pmi_k
       |FROM bcnt JOIN ucnt ca ON ca.tok = a JOIN ucnt cb ON cb.tok = b, tot
       |ORDER BY pmi_k DESC, a, b
       |LIMIT 20""".stripMargin

  // ───────────────────────────── w31: scheduled postings compaction

  /** w30's maintained index with the COMPACTION TRIGGER in the loop —
    * d58/w30 leave folding tombstones a manual event; here
    * [[graft.streaming.IndexMaintenance.compactPostingsIfNeeded]]
    * runs after every maintenance commit and the dead-row fraction
    * decides: the mid-stream bulk delete (⅓ of the corpus) crosses
    * the 0.3 threshold and schedules EXACTLY one atomic compaction
    * transact; the later trickle delete (~10% of survivors) stays
    * below it and keeps serving through the tombstone mask. The
    * require-pinned trigger pattern (None, None, Some, None) is the
    * policy's contract — a trigger firing on the trickle would thrash
    * generations, one missing the bulk delete would let the serve-path
    * broadcast grow unboundedly. Compaction is an execution event, so
    * the oracle is t19's replay on the surviving corpus — identical
    * whether rows are masked or physically gone; a compaction that
    * dropped a live revision or resurrected a dead one breaks the
    * hash.
    */
  val w31_postings_autocompact: Q = (s, dir) => {
    import graft.streaming.{IndexMaintenance, PostingsIndex}
    val root = java.nio.file.Files.createTempDirectory("graft-bm25auto")
      .toFile.getAbsolutePath + "/cat"
    val cat = new TableCatalog(s, root)
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val none = docs.limit(0)
    val batches = Seq[(DataFrame, DataFrame)](
      (docs.filter(col("doc_id") % 2 === 0), none),
      (docs.filter(col("doc_id") % 2 === 1), none),
      // bulk delete: ~33% dead → the trigger must fire once
      (none, docs.filter(col("doc_id") % 3 === 0).select(col("doc_id"))),
      // trickle delete: ~10% of survivors → below threshold, masked
      (none, docs.filter(col("doc_id") % 10 === 7).select(col("doc_id"))))
    val fired = batches.zipWithIndex.map { case ((up, del), i) =>
      PostingsIndex.commitBatch(cat, up, del, i.toLong)
      IndexMaintenance.compactPostingsIfNeeded(cat, 100L + i).nonEmpty
    }
    require(fired == Seq(false, false, true, false),
      s"trigger pattern diverged: $fired")
    require(cat.read("tombstones").count() > 0,
      "the trickle delete should still be serving through the mask")
    val (tf, dl) = PostingsIndex.live(cat)
    bm25Tail(tf.filter(col("tok").isin(Bm25Terms: _*)), dl)
  }

  // ─────────── w36: scheduled DEFRAGMENTATION of an append chain

  /** THE OTHER compaction trigger: w31 folds when the DEAD fraction
    * crosses the threshold; a delete-free feed never trips that, yet
    * its append-member chains fragment one segment per micro-batch —
    * every serve lists and opens each segment directory (the classic
    * small-files problem), so at stream lifetimes the chain length is
    * itself a serve cost. [[graft.streaming.IndexMaintenance]]'s
    * segment ceiling prices exactly that: four ingest-only batches
    * (no tombstone relation ever exists), the ceiling at 4 fires ONE
    * pure-defragmentation fold — require-pinned (None, None, None,
    * Some), chain length 1 after — and BM25 serves from the folded
    * index. Defragmentation is an execution event, so the oracle is
    * t19's replay over the full corpus: a fold that lost or
    * duplicated one posting row anywhere shifts a tf/df and fails the
    * hash.
    */
  val w36_postings_defrag: Q = (s, dir) => {
    import graft.streaming.{IndexMaintenance, PostingsIndex}
    val root = java.nio.file.Files.createTempDirectory("graft-defrag")
      .toFile.getAbsolutePath + "/cat"
    val cat = new TableCatalog(s, root)
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val noneIds = docs.select(col("doc_id")).limit(0)
    val members = Seq("postings", "doclen")
    val fired = (0 until 4).map { i =>
      PostingsIndex.commitBatch(cat, docs.filter(col("doc_id") % 4 === i),
        noneIds, i.toLong)
      IndexMaintenance.compactPostingsIfNeeded(cat, 100L + i,
        maxSegments = 4).nonEmpty
    }
    require(fired == Seq(false, false, false, true),
      s"defrag trigger pattern diverged: $fired")
    // a folded member IS a snapshot — one directory, zero chain
    require(IndexMaintenance.fragmentation(cat, members) == 0,
      "the fold must reset every chain to a single snapshot directory")
    val (tf, dl) = PostingsIndex.live(cat)
    bm25Tail(tf.filter(col("tok").isin(Bm25Terms: _*)), dl)
  }

  // ─────────────── w32: one transaction, two index families

  /** CROSS-INDEX ATOMIC ADMISSION — the w29 dedup gate (LSH index)
    * and the w30 retrieval index (BM25 postings) maintained by the
    * SAME micro-batch commit: five relations (bands/shingles/sizes +
    * postings/doclen) land as ONE atomic catalog generation per
    * batch. The property this buys is MEMBERSHIP CONSISTENCY between
    * index families — a document the gate admits is searchable in the
    * same generation, and a crash between "deduped" and "indexed"
    * cannot strand a doc in one index but not the other (with
    * separate commits, a replayed batch would re-shingle docs the
    * postings already serve, or serve docs the gate never admitted).
    * require-pinned after every generation: the id set of `sizes`
    * equals the id set of `doclen` (both families index exactly the
    * ≥1-token admitted docs). Admission itself is w10's chained
    * semantics served from the persisted index (w29); the final
    * answer is BM25 over whatever got admitted, so the oracle is the
    * admission CTE chain composed with t19's scoring tail — one stale
    * index row, one torn generation, or one doc in only one family
    * shifts the ranking and fails the shared hash.
    */
  val w32_unified_index_admission: Q = (s, dir) => {
    import graft.streaming.UnifiedIndex
    val root = java.nio.file.Files.createTempDirectory("graft-uniidx")
      .toFile.getAbsolutePath + "/cat"
    val cat = new TableCatalog(s, root)
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val batches = Seq(
      d,
      d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000000L).as("doc_id"), col("text")),
      d.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 2000000000L).as("doc_id"),
          concat(lit("zz"), expr("substring(text, 3)")).as("text")))
    batches.zipWithIndex.foreach { case (b, i) =>
      val adm =
        if (i == 0) b.persist()
        else {
          val rejected = TextDedup.lshIndexLookup(b, "doc_id", "text",
              cat.read("bands"), cat.read("shingles"), cat.read("sizes"))
            .select(col("id_q").as("doc_id")).distinct()
          b.join(broadcast(rejected), Seq("doc_id"), "left_anti").persist()
        }
      adm.count() // pin the admission BEFORE the index advances
      UnifiedIndex.commitBatch(cat, adm, i.toLong)
      if (i == 1) // exactly-once covers ALL families in one check
        require(UnifiedIndex.commitBatch(cat, adm, 1L) == -1L,
          "redelivered unified batch was re-applied")
      // the O(aggregate) detector — the production-shaped per-batch
      // pin (r11 item 6); the exceptAll forensic stays in the spec
      // suite, which proves both flag the same torn states
      require(UnifiedIndex.membershipConsistentFast(cat),
        s"cross-index membership diverged after batch $i")
      adm.unpersist()
    }
    bm25Tail(cat.read("postings").filter(col("tok").isin(Bm25Terms: _*)),
      cat.read("doclen"))
  }

  // ─────────── w33: cross-family forget + one compaction for both

  /** THE DELETE SIDE of w32's unified index: one tombstone set
    * removes a document from BOTH families atomically
    * ([[graft.streaming.UnifiedIndex.delete]] — a GDPR erasure that
    * lands in the dedup gate but not retrieval would keep serving the
    * forgotten text), both serves mask through the SAME broadcast
    * anti-join ([[graft.streaming.UnifiedIndex.lshLive]]/
    * [[graft.streaming.UnifiedIndex.postingsLive]]), and ONE
    * fraction-triggered transact folds the tombstones out of all
    * FIVE relations at once
    * ([[graft.streaming.IndexMaintenance.compactUnifiedIfNeeded]] — a
    * per-family compaction pair could tear). Trigger pattern
    * require-pinned: the bulk erasure (⅓) fires exactly one
    * compaction, the later trickle (~10%) keeps serving masked. The
    * LSH side is pinned in-query (an exact copy of a live doc matches
    * its original; NO served match is ever a tombstoned id — data-
    * independent, so corpus-internal duplicate groups can't flake
    * it); the retrieval side is the oracle: BM25 over exactly the
    * surviving corpus, identical whether dead rows are masked or
    * folded.
    */
  val w33_unified_forget: Q = (s, dir) => {
    import graft.streaming.{IndexMaintenance, UnifiedIndex}
    val root = java.nio.file.Files.createTempDirectory("graft-uniforget")
      .toFile.getAbsolutePath + "/cat"
    val cat = new TableCatalog(s, root)
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    // one ingest generation: the multi-batch commit lockstep is w32's
    // pinned property — re-proving it here would only re-buy w32's
    // per-batch index-build wall inside a second bench heavy
    UnifiedIndex.commitBatch(cat, d, 0L)
    // bulk erasure (~33% dead): the shared trigger must fire ONCE
    UnifiedIndex.delete(cat, d.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id")), 2L)
    require(IndexMaintenance.compactUnifiedIfNeeded(cat, 100L).nonEmpty,
      "bulk erasure must trigger the cross-family compaction")
    // matched tombstones fold away; what MAY survive is exactly the
    // erase ledger for never-admitted ids (empty-text docs have no
    // index rows — their erase requests stay durable by design), so
    // the pin is "no survivor masks an admitted row", not emptiness
    require(cat.read("tombstones").join(cat.read("sizes"),
        Seq("id"), "left_semi").isEmpty,
      "compaction left a tombstone that still masks admitted rows")
    require(UnifiedIndex.membershipConsistent(cat),
      "compaction tore the families apart")
    // trickle erasure (~10% of survivors): below threshold, serve masked
    UnifiedIndex.delete(cat, d.filter(col("doc_id") % 10 === 2)
      .select(col("doc_id")), 3L)
    require(IndexMaintenance.compactUnifiedIfNeeded(cat, 101L).isEmpty,
      "trickle erasure must NOT trigger compaction")
    // LSH-side mask pin: copies of live docs match their originals;
    // no served candidate is EVER a tombstoned id (folded or masked)
    val (bands, shingles, sizes) = UnifiedIndex.lshLive(cat)
    val probes = d.filter(col("doc_id") % 20 === 0) // mixes all delete classes
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
    val matches = TextDedup.lshIndexLookup(probes, "doc_id", "text",
      bands, shingles, sizes).persist()
    require(matches.filter(col("id_c") % 3 === 1
        || col("id_c") % 10 === 2).isEmpty,
      "a tombstoned id was served as a dedup candidate")
    require(matches.filter(col("id_c") === col("id_q") - 1000000000L)
        .count() == d.filter(col("doc_id") % 20 === 0
          && col("doc_id") % 3 =!= 1 && col("doc_id") % 10 =!= 2
          && length(trim(col("text"))) > 0).count(),
      "a live doc's exact copy failed to match its original")
    matches.unpersist()
    val (tf, dl) = UnifiedIndex.postingsLive(cat)
    bm25Tail(tf.filter(col("tok").isin(Bm25Terms: _*)), dl)
  }

  // ─────────── w38: reproducible retrieval snapshots (index AS OF)

  /** INDEX TIME TRAVEL — serve the unified index AS OF a past
    * generation, with the kill floors that were ACTIVE THEN
    * ([[graft.streaming.UnifiedIndex.postingsLiveAt]]). The
    * training-data-lineage use: a sampled batch's provenance is "what
    * did retrieval serve at generation g", and because every
    * maintenance event is a pure append (recrawls mask, never rewrite;
    * compaction is a new generation, never an edit), that question has
    * an exact answer after any amount of later churn. Lifecycle:
    * ingest → snapshot the generation → recrawl wave → forget wave →
    * serve BOTH heads: the AS-OF serve must carry zero recrawl
    * revisions (max rev pinned 0) and the head/AS-OF id sets must
    * differ by exactly the lifecycle algebra (ids only at head are
    * newly-tokenized recrawls; ids only at AS-OF are the forgotten) —
    * both pins data-independent. Output is the AS-OF BM25, so the
    * oracle is t19's replay over the ORIGINAL corpus verbatim: one
    * leaked recrawl revision or floor applied retroactively shifts
    * the ranking and fails the hash.
    */
  val w38_index_asof: Q = (s, dir) => {
    import graft.streaming.UnifiedIndex
    val root = java.nio.file.Files.createTempDirectory("graft-idxasof")
      .toFile.getAbsolutePath + "/cat"
    val cat = new TableCatalog(s, root)
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    UnifiedIndex.commitBatch(cat, d, 0L)
    val g0 = cat.latestGeneration().get
    UnifiedIndex.commitBatch(cat,
      d.filter(col("doc_id") % 10 === 4)
        .withColumn("text", concat(lit("merge window "), col("text"))),
      1L, replace = true)
    UnifiedIndex.delete(cat, d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id")), 2L)
    val (asofTf, asofDl) = UnifiedIndex.postingsLiveAt(cat, g0)
    val (_, headDl) = UnifiedIndex.postingsLive(cat)
    // the snapshot predates the recrawl: no served revision above 0
    require(asofDl.agg(max(col("rev"))).head().getLong(0) == 0L,
      "a later recrawl revision leaked into the AS-OF serve")
    // head vs AS-OF id algebra: only newly-tokenized recrawls appear,
    // only forgotten docs disappear (data-independent either way)
    val asofIds = asofDl.select(col("doc_id"))
    val headIds = headDl.select(col("doc_id"))
    require(headIds.join(asofIds, Seq("doc_id"), "left_anti")
      .filter(col("doc_id") % 10 =!= 4).isEmpty,
      "an id absent from the snapshot serves at head without a recrawl")
    require(asofIds.join(headIds, Seq("doc_id"), "left_anti")
      .filter(col("doc_id") % 7 =!= 0).isEmpty,
      "an id left the head serve without a forget")
    bm25Tail(asofTf.filter(col("tok").isin(Bm25Terms: _*)), asofDl)
  }

  // ─────────── w41: tag-pinned retrieval cuts (index AS-OF × tags × vacuum)

  /** NAMED, VACUUM-PROOF RETRIEVAL CUTS — w38 answers "what did
    * retrieval serve at generation g" by raw generation id; this
    * closes the loop with the catalog's immutable tags (v30): the cut
    * a training run sampled is pinned BY NAME
    * ([[graft.sources.TableCatalog.createTag]]) and the pin is a
    * RETENTION contract — vacuum reclaims every untagged pre-fold
    * generation, including append-chain segments nothing else
    * references, but must keep every segment of the tagged cut's
    * chains, so "the index as this model's training run saw it"
    * survives recrawl + forget + compaction + vacuum. Extra teeth vs
    * w38: the tag lands AFTER a forget wave but BEFORE the fold — the
    * tagged cut has ACTIVE kill floors, so the tag-time serve must
    * replay the floors that were live then (masking, not folding),
    * while the head serves the folded post-recrawl state. Lifecycle:
    * ingest → forget wave → TAG → recrawl wave → fold → vacuum to the
    * head. Pins: the untagged root generation is reclaimed while the
    * tagged one survives by name; the tag serve carries zero recrawl
    * revisions and zero forgotten ids (its floors applied, later churn
    * invisible); the head serves the recrawl revision. Output is the
    * tag-time BM25 top-k, so the oracle is t19's replay over the
    * tag-time logical corpus (original text, forgotten ids removed) —
    * one reclaimed chain segment, leaked recrawl revision, or
    * retroactively-applied fold shifts the ranking and fails the hash.
    */
  val w41_tagged_retrieval_cut: Q = (s, dir) => {
    import graft.streaming.{IndexMaintenance, UnifiedIndex}
    val root = java.nio.file.Files.createTempDirectory("graft-tagcut")
      .toFile.getAbsolutePath + "/cat"
    val cat = new TableCatalog(s, root)
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    UnifiedIndex.commitBatch(cat, d, 0L)
    val g0 = cat.latestGeneration().get
    // forget wave, THEN the tag: the pinned cut masks via live floors
    UnifiedIndex.delete(cat, d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id")), 1L)
    val gTag = cat.createTag("train-v1")
    require(gTag > g0 && cat.tagGeneration("train-v1") == gTag,
      "the tag must pin the post-forget head")
    // later churn: a recrawl wave, then the fold rewrites the head
    UnifiedIndex.commitBatch(cat,
      d.filter(col("doc_id") % 10 === 4)
        .withColumn("text", concat(lit("merge window "), col("text"))),
      2L, replace = true)
    require(IndexMaintenance.compactUnifiedIfNeeded(cat, 3L,
      threshold = 1e-9).nonEmpty, "the post-recrawl fold must fire")
    // retention: keep the folded head only — the untagged root dies,
    // the tagged cut (and transitively its chain segments) survives
    val dropped = cat.vacuum(keepLast = 1)
    require(dropped.contains(g0),
      "vacuum kept the untagged pre-forget generation")
    require(!dropped.contains(gTag), "vacuum reclaimed a tagged cut")
    // the tag serve AFTER vacuum: its floors applied, later churn
    // invisible — data-independent pins, then the ranked output
    val (asofTf, asofDl) =
      UnifiedIndex.postingsLiveAt(cat, cat.tagGeneration("train-v1"))
    require(asofDl.agg(max(col("rev"))).head().getLong(0) == 0L,
      "a post-tag recrawl revision leaked into the tagged serve")
    require(asofDl.filter(col("doc_id") % 7 === 0).isEmpty,
      "the tagged cut failed to mask its own forget wave")
    val (_, headDl) = UnifiedIndex.postingsLive(cat)
    require(headDl.filter(col("doc_id") % 10 === 4
        && col("doc_id") % 7 =!= 0).agg(min(col("rev"))).head().getLong(0) == 2L,
      "the post-vacuum head is not serving the recrawl revision")
    bm25Tail(asofTf.filter(col("tok").isin(Bm25Terms: _*)), asofDl)
  }

  /** w10's admission CTE chain (who is in the corpus) composed with
    * t19's BM25 scoring tail (how the corpus ranks) — both shared
    * verbatim with their owning queries, so a divergence in EITHER
    * semantic breaks exactly one hash pair.
    */
  val w32_sql: String =
    s"""WITH ${StreamingQueries.AdmissionCtesSql},
       |adm_corpus AS (
       |  SELECT c.doc_id, c.text FROM corpus c JOIN admitted a USING (doc_id)
       |),
       |toks AS (
       |  SELECT doc_id, unnest($ToksSql) AS tok FROM adm_corpus
       |)$Bm25OracleTailSql""".stripMargin

  // ─────────── w35: the positional family inside the unified commit

  /** POSITIONS INSIDE THE w32 TRANSACTION — round 11 shipped the
    * positional index on its own commit
    * ([[graft.streaming.PostingsIndex.commitPositionsBatch]]), leaving
    * exactly the torn window w32 exists to close: a crash between the
    * five-relation commit and the positions commit strands a document
    * BM25-searchable but invisible to every phrase query. Now ONE
    * [[graft.streaming.UnifiedIndex.commitBatch]] carries all SIX
    * relations (bands/shingles/sizes + postings/doclen/positions) as
    * one atomic generation, the batch tokenized ONCE for all three
    * text-side members (posexplode — positions project the cached
    * relation postings/doclen aggregate). Lifecycle: one ingest
    * generation (the multi-batch lockstep is w32's pinned property), a
    * redelivery (exactly-once covers all six in one batch-id check,
    * require-pinned), the torn-state pin via the O(aggregate) fast
    * membership detector across all THREE families (the production-
    * shaped per-batch check; the exceptAll forensic stays in the spec
    * suite, which proves both flag the same tears), a cross-family
    * forget, then phrase serving from the LIVE positional member
    * ([[graft.streaming.UnifiedIndex.positionsLive]]) under the SAME
    * tombstone set the BM25/LSH serves mask with — a forgotten doc
    * stops matching phrases in the generation it stops ranking.
    * Oracle = t28's phrase replay (argmax trigram + occurrence
    * counts) over the surviving corpus — one unmasked position, one
    * torn family, or one doc in five relations but not the sixth
    * shifts the argmax or a count and fails the hash.
    */
  val w35_unified_phrase: Q = (s, dir) => {
    import graft.operators.InvertedIndex
    import graft.streaming.UnifiedIndex
    val root = java.nio.file.Files.createTempDirectory("graft-uniphrase")
      .toFile.getAbsolutePath + "/cat"
    val cat = new TableCatalog(s, root)
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    UnifiedIndex.commitBatch(cat, d, 0L)
    require(UnifiedIndex.commitBatch(cat, d, 0L) == -1L,
      "redelivered six-relation batch was re-applied")
    require(UnifiedIndex.membershipConsistentFast(cat),
      "a family tore inside the unified commit")
    UnifiedIndex.delete(cat, d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id")), 1L)
    val pos = UnifiedIndex.positionsLive(cat).persist()
    def shifted(i: Int) = pos.select(col("doc_id"),
      (col("pos") - i).as("p"), col("tok").as(s"t$i"))
    val top = shifted(0)
      .join(shifted(1), Seq("doc_id", "p"))
      .join(shifted(2), Seq("doc_id", "p"))
      .select(concat_ws(" ", col("t0"), col("t1"), col("t2")).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram")).limit(1)
      .collect()(0).getString(0)
    val out = InvertedIndex.phraseCount(pos, top.split(" ").toSeq)
      .orderBy(col("doc_id"))
    pos.unpersist()
    out
  }

  /** t28's replay over the forget's surviving corpus — the w34
    * oracle-surgery discipline on the unified family.
    */
  val w35_sql: String = t28_sql.replace("FROM documents",
    "FROM (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0) surv")

  // ─────────── w37: recrawl INSIDE the unified transaction

  /** RECRAWL AS ONE ATOMIC GENERATION ACROSS ALL SIX RELATIONS — the
    * lifecycle r11 explicitly deferred ("recrawl/replace lifecycles
    * belong to the separate revisioned postings family"): now every
    * unified index row carries its committing batch id as a REVISION,
    * tombstones carry (id, kill_below), and
    * [[graft.streaming.UnifiedIndex.commitBatch]] with `replace=true`
    * lands a document's NEW revision in bands/shingles/sizes/postings/
    * doclen/positions AND the kill floor masking every older revision
    * in the SAME generation — so there is no state where a recrawled
    * doc ranks under its new text but phrase-matches its old one (or
    * gates dedup on stale shingles), and no term file is ever
    * rewritten for it. Forget ([[graft.streaming.UnifiedIndex.delete]])
    * rides the same relation at kill_below = ∞, masking even
    * revisions admitted AFTER the request. Lifecycle: full ingest →
    * recrawl wave (two prepended query terms, so stale revisions move
    * the ranking by construction) → redelivery of the recrawl (one
    * batch-id check covers six appends + the floor) → forget wave
    * overlapping the recrawled ids → per-revision membership lockstep
    * (fast detector) → in-query pins that exactly ONE revision serves
    * per live doc and every live recrawled doc phrase-matches its new
    * prefix → a forced compaction that folds every dead revision and
    * every satisfied floor (require-pinned: no finite floor survives,
    * no survivor masks an admitted row) → BM25 from the live
    * relations. Oracle = t19's replay over the final logical corpus
    * (recrawled texts in, forgotten docs out): one stale revision
    * still scoring anywhere shifts tf/df/dl and fails the hash.
    */
  val w37_unified_recrawl: Q = (s, dir) => {
    import graft.streaming.{IndexMaintenance, UnifiedIndex}
    val root = java.nio.file.Files.createTempDirectory("graft-unirecrawl")
      .toFile.getAbsolutePath + "/cat"
    val cat = new TableCatalog(s, root)
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    UnifiedIndex.commitBatch(cat, d, 0L)
    // recrawl wave: new text REPLACES the docs' rev-0 rows everywhere
    val recrawl = d.filter(col("doc_id") % 10 === 4)
      .withColumn("text", concat(lit("merge window "), col("text")))
    UnifiedIndex.commitBatch(cat, recrawl, 1L, replace = true)
    require(UnifiedIndex.commitBatch(cat, recrawl, 1L, replace = true) == -1L,
      "redelivered recrawl batch was re-applied")
    // forget wave, overlapping recrawled ids (doc_id ≡ 14 mod 70):
    // the ∞ floor must dominate the recrawl floor
    UnifiedIndex.delete(cat, d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id")), 2L)
    require(UnifiedIndex.membershipConsistentFast(cat),
      "a family tore across revisions")
    // exactly ONE revision serves per live doc — a stale rev-0 row
    // surviving beside its rev-1 replacement doubles a doclen
    val (_, dlLive) = UnifiedIndex.postingsLive(cat)
    require(dlLive.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).isEmpty, "a stale revision is still serving")
    // the positional member follows the SAME floors: every live
    // recrawled doc phrase-matches its new prefix (and a forgotten
    // one never does)
    val phraseDocs = graft.operators.InvertedIndex.phraseCount(
      UnifiedIndex.positionsLive(cat), Seq("merge", "window"))
    val liveRecrawled = recrawl.select(col("doc_id"))
      .filter(col("doc_id") % 7 =!= 0)
    require(liveRecrawled.join(phraseDocs, Seq("doc_id"), "left_anti").isEmpty,
      "a live recrawled doc lost its new-revision phrase")
    require(phraseDocs.filter(col("doc_id") % 7 === 0).isEmpty,
      "a forgotten doc still phrase-matches")
    // fold: every dead revision destroyed, every satisfied floor gone
    require(IndexMaintenance.compactUnifiedIfNeeded(cat, 100L,
      threshold = 1e-9).nonEmpty, "the fold must fire at this dead fraction")
    require(cat.read("tombstones")
      .filter(col("kill_below") =!= UnifiedIndex.ForgetFloor).isEmpty,
      "a finite recrawl floor survived its compaction")
    require(cat.read("tombstones").join(cat.read("sizes"),
        Seq("id"), "left_semi").isEmpty,
      "compaction left a tombstone that still masks admitted rows")
    require(UnifiedIndex.membershipConsistent(cat),
      "compaction tore the families apart")
    val (tf, dl) = UnifiedIndex.postingsLive(cat)
    bm25Tail(tf.filter(col("tok").isin(Bm25Terms: _*)), dl)
  }

  // ───────────────────────────── v20: cross-table atomic snapshot

  /** Cross-table snapshot consistency ([[TableCatalog]]): generation
    * 0 commits the pre-1997 cut of orders AND exactly their
    * lineitems in ONE atomic catalog commit; generation 1 commits the
    * full tables. Reading both tables AT generation 0 then joining
    * must produce a fully consistent cut — no orphan lineitem, no
    * order missing its lines — which the oracle replays by filtering
    * the live tables with the same predicate. A torn commit (one
    * table new, the other old) would surface as a count/revenue
    * mismatch.
    */
  val v20_catalog_snapshot: Q = (s, dir) => {
    val root = java.nio.file.Files.createTempDirectory("graft-catalog")
      .toFile.getAbsolutePath + "/cat"
    val cat = new TableCatalog(s, root)
    val orders = Tables(s, dir, "orders")
    val li = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val ordersPre = orders.filter(col("o_orderdate") < "1997-01-01")
    val liPre = li.join(ordersPre.select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    cat.commitAll(Map("orders" -> ordersPre, "lineitem" -> liPre),
      commitTsMillis = 1000L)
    cat.commitAll(Map("orders" -> orders, "lineitem" -> li),
      commitTsMillis = 2000L)
    val g = cat.generationAsOf(1500L)
    cat.readAt(g, "orders")
      .join(cat.readAt(g, "lineitem"),
        col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_orderkey")).as("n_orders"),
        count(col("l_linenumber")).as("n_lines"),
        coalesce(sum(round(col("l_extendedprice") * 100).cast(LongType)), lit(0L))
          .as("sum_cents"))
      .orderBy(col("o_orderstatus"))
  }

  val v20_sql: String =
    """WITH o AS (
      |  SELECT * FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1997-01-01'
      |)
      |SELECT o.o_orderstatus,
      |  COUNT(DISTINCT o.o_orderkey) AS n_orders,
      |  COUNT(l.l_linenumber) AS n_lines,
      |  CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)), 0) AS BIGINT) AS sum_cents
      |FROM o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |GROUP BY o.o_orderstatus
      |ORDER BY o.o_orderstatus""".stripMargin

  // ───────────────────────────── d42: incremental view maintenance

  /** Materialized rollup maintained incrementally
    * ([[graft.operators.IncrementalView]]): orders arrive as three
    * year-sliced append batches; the per-(status, priority) revenue
    * view is refreshed per batch — each refresh aggregates ONE batch
    * and merges into group-cardinality-sized state, never rescanning
    * history. The oracle aggregates the full table directly, so any
    * drift between the algebraic fold and the ground truth (a lost
    * batch, a double merge, a non-mergeable aggregate) fails the
    * hash.
    */
  val d42_incremental_view: Q = (s, dir) => {
    import graft.operators.IncrementalView
    import graft.operators.IncrementalView._
    val orders = Tables(s, dir, "orders")
      .withColumn("cents", round(col("o_totalprice") * 100).cast(LongType))
    val batches = Seq(
      orders.filter(col("o_orderdate") < "1996-01-01"),
      orders.filter(col("o_orderdate") >= "1996-01-01" &&
        col("o_orderdate") < "1997-01-01"),
      orders.filter(col("o_orderdate") >= "1997-01-01"))
    val specs = Seq(
      countRows("n_orders"),
      sumOf(col("cents"), "sum_cents"),
      minOf(col("cents"), "min_cents"),
      maxOf(col("cents"), "max_cents"))
    IncrementalView.refreshAll(batches,
        Seq("o_orderstatus", "o_orderpriority"), specs)
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  val d42_sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  CAST(MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS min_cents,
      |  CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
      |FROM orders
      |GROUP BY o_orderstatus, o_orderpriority
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  // ───────────────────────────── q44: correlated LATERAL top-n

  /** The LATERAL join surface: per nation, the top-2 customers by
    * account balance via a correlated LATERAL subquery with ORDER BY
    * + LIMIT (Catalyst decorrelates it to a ranked join — no
    * per-nation driver loop). Money compared as integer cents.
    */
  val q44_lateral_topn: Q = (s, dir) => {
    Tables(s, dir, "nation").createOrReplaceTempView("nation")
    Tables(s, dir, "customer").createOrReplaceTempView("customer")
    s.sql(
      """SELECT n_name, c.c_name, c.c_acctbal_cents
        |FROM nation n JOIN LATERAL (
        |  SELECT c_name, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS c_acctbal_cents
        |  FROM customer WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        |ORDER BY n_name, c_acctbal_cents DESC, c_name""".stripMargin)
  }

  val q44_sql: String =
    """SELECT n_name, c.c_name, c.c_acctbal_cents
      |FROM nation n JOIN LATERAL (
      |  SELECT c_name, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS c_acctbal_cents
      |  FROM customer WHERE c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c ON TRUE
      |ORDER BY n_name, c_acctbal_cents DESC, c_name""".stripMargin

  // ───────────────────────────── q45: explicit GROUPING SETS

  /** Explicit GROUPING SETS — the general form q20's ROLLUP is sugar
    * for: three chosen cuts (status×priority, status alone, priority
    * alone) in ONE aggregation pass over one Expand, with
    * `GROUPING()` markers disambiguating the NULL that means "rolled
    * up" from a NULL in the data. Both engines implement the
    * SQL-standard semantics, so the oracle replays the same text.
    */
  val q45_grouping_sets: Q = (s, dir) => {
    Tables(s, dir, "orders").createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
        |  COUNT(*) AS n_orders,
        |  SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS sum_cents
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), (o_orderpriority))
        |ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority""".stripMargin)
  }

  val q45_sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |                        (o_orderstatus), (o_orderpriority))
      |ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority""".stripMargin

  // ───────────────────────────── d44: merge-on-read CDC apply

  /** Merge-on-read lifecycle ([[graft.sources.MorStore]]) — the
    * write-cheap counterpart to q17's copy-on-write merge: orders
    * lands as the base; three CDC deltas commit O(batch) each
    * (deletes of keys ≡0 mod 7, price-bump upserts of keys ≡0 mod 5
    * — which RESURRECT the 35-divisible deletes, ordering is load-
    * bearing — and inserts of fresh keys for ≡0 mod 11); the read
    * resolves base ∪ deltas on the fly, then a compaction folds the
    * stack and the audit re-reads the compacted table — so the
    * oracle (which replays the FINAL state relationally) also proves
    * resolve ≡ compact. Output: per-status row count and cents.
    */
  val d44_mor_cdc: Q = (s, dir) => {
    val root = java.nio.file.Files.createTempDirectory("graft-mor-cdc")
      .toFile.getAbsolutePath + "/t"
    val st = new graft.sources.MorStore(s, root, Seq("k"))
    val base = Tables(s, dir, "orders").select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
      round(col("o_totalprice") * 100).cast(LongType).as("cents"))
    st.commitBase(base, 1000L)
    st.commitDelta(base.filter(col("k") % 7 === 0)
      .withColumn(st.OpCol, lit("D")), 2000L)
    st.commitDelta(base.filter(col("k") % 5 === 0)
      .withColumn("cents", col("cents") + 1000L)
      .withColumn(st.OpCol, lit("U")), 3000L)
    st.commitDelta(base.filter(col("k") % 11 === 0)
      .select((col("k") + 1000000000L).as("k"), lit("O").as("st"),
        lit(12345L).as("cents"))
      .withColumn(st.OpCol, lit("U")), 4000L)
    st.compact(5000L)
    st.read()
      .groupBy(col("st"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
      .orderBy(col("st"))
  }

  val d44_sql: String =
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st,
      |         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |), final AS (
      |  SELECT k, st,
      |         CASE WHEN k % 5 = 0 THEN cents + 1000 ELSE cents END AS cents
      |  FROM base WHERE (k % 5 = 0) OR (k % 7 <> 0)
      |  UNION ALL
      |  SELECT k + 1000000000, 'O', 12345 FROM base WHERE k % 11 = 0
      |)
      |SELECT st, COUNT(*) AS n_rows, CAST(SUM(cents) AS BIGINT) AS sum_cents
      |FROM final
      |GROUP BY st
      |ORDER BY st""".stripMargin

  // ───────────────────────────── d45: incremental distinct (HLL union)

  /** Incremental DISTINCT maintenance — the aggregate
    * [[graft.operators.IncrementalView]]'s algebraic kit cannot
    * carry: exact distinct is not mergeable, but its HLL sketch is,
    * so the view state holds one sketch per group and each append
    * batch folds in via `hll_union_agg` (the same [[AggSpec]]
    * machinery — sketch build as the batch aggregate, sketch union
    * as the merge). Estimates are engine-private, so the output
    * carries the exact count plus the within-±15%-band verdict the
    * t17 gate pattern established; the oracle runs its own sketch
    * against the same band.
    */
  val d45_incremental_distinct: Q = (s, dir) => {
    import graft.operators.IncrementalView
    import graft.operators.IncrementalView.AggSpec
    val orders = Tables(s, dir, "orders")
    val batches = Seq(
      orders.filter(col("o_orderdate") < "1996-01-01"),
      orders.filter(col("o_orderdate") >= "1996-01-01" &&
        col("o_orderdate") < "1997-01-01"),
      orders.filter(col("o_orderdate") >= "1997-01-01"))
    val specs = Seq(
      AggSpec("cust_sketch", hll_sketch_agg(col("o_custkey")).as("cust_sketch"),
        c => hll_union_agg(col(c))),
      IncrementalView.countRows("n_orders"))
    val mv = IncrementalView.refreshAll(batches, Seq("o_orderstatus"), specs)
    val exact = orders.groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("exact_distinct"))
    mv.join(exact, "o_orderstatus")
      .select(col("o_orderstatus"), col("n_orders"), col("exact_distinct"),
        (abs(hll_sketch_estimate(col("cust_sketch")) - col("exact_distinct")) <=
          col("exact_distinct") * 0.15).as("within_gate"))
      .orderBy(col("o_orderstatus"))
  }

  val d45_sql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  COUNT(DISTINCT o_custkey) AS exact_distinct,
      |  (abs(approx_count_distinct(o_custkey) - COUNT(DISTINCT o_custkey))
      |     <= COUNT(DISTINCT o_custkey) * 0.15) AS within_gate
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ───────────────────────────── q47: recursive CTE date spine

  /** The WITH RECURSIVE surface: a 48-month calendar spine generated
    * by recursion (pure integer year-month keys, so both engines
    * recurse identically), LEFT-joined to monthly order rollups —
    * the calendar-spine report where empty months must appear with
    * zeros, which no GROUP BY over the data alone can produce.
    */
  val q47_recursive_spine: Q = (s, dir) => {
    Tables(s, dir, "orders").createOrReplaceTempView("orders_rc")
    s.sql(
      """WITH RECURSIVE spine(n) AS (
        |  SELECT 0
        |  UNION ALL
        |  SELECT n + 1 FROM spine WHERE n < 47
        |),
        |months AS (
        |  SELECT CAST((1995 + n DIV 12) * 100 + (n % 12) + 1 AS BIGINT) AS ym FROM spine
        |),
        |m AS (
        |  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
        |         COUNT(*) AS n_orders,
        |         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS sum_cents
        |  FROM orders_rc GROUP BY 1
        |)
        |SELECT months.ym, COALESCE(m.n_orders, 0) AS n_orders,
        |       COALESCE(m.sum_cents, 0) AS sum_cents
        |FROM months LEFT JOIN m ON months.ym = m.ym
        |ORDER BY months.ym""".stripMargin)
  }

  val q47_sql: String =
    """WITH RECURSIVE spine(n) AS (
      |  SELECT 0
      |  UNION ALL
      |  SELECT n + 1 FROM spine WHERE n < 47
      |),
      |months AS (
      |  SELECT CAST((1995 + n // 12) * 100 + (n % 12) + 1 AS BIGINT) AS ym FROM spine
      |),
      |m AS (
      |  SELECT CAST(year(CAST(o_orderdate AS DATE)) * 100
      |              + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS ym,
      |         COUNT(*) AS n_orders,
      |         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |  FROM orders GROUP BY 1
      |)
      |SELECT months.ym, COALESCE(m.n_orders, 0) AS n_orders,
      |       COALESCE(m.sum_cents, 0) AS sum_cents
      |FROM months LEFT JOIN m ON months.ym = m.ym
      |ORDER BY months.ym""".stripMargin

  // ───────────────────────────── q48: NOT IN three-valued logic

  /** The classic NULL-semantics trap, pinned: `x NOT IN (subquery)`
    * with a NULL in the subquery is never TRUE (x = NULL is UNKNOWN,
    * so the conjunction over the set is at best UNKNOWN) — the
    * with-null count must be 0 while the clean NOT IN equals NOT
    * EXISTS. Engines that shortcut NOT IN to an anti join without
    * the null guard diverge exactly here; Spark plans the null-aware
    * anti join, DuckDB its standard mark join, and both land on the
    * same counts.
    */
  val q48_not_in_nulls: Q = (s, dir) => {
    Tables(s, dir, "orders").createOrReplaceTempView("orders_nn")
    Tables(s, dir, "customer").createOrReplaceTempView("customer_nn")
    s.sql(
      """SELECT
        |  (SELECT COUNT(*) FROM orders_nn
        |   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer_nn
        |                           WHERE c_custkey % 100 = 0)) AS not_in_clean,
        |  (SELECT COUNT(*) FROM orders_nn
        |   WHERE o_custkey NOT IN (SELECT CASE WHEN c_custkey % 100 = 0
        |                                  THEN c_custkey END
        |                           FROM customer_nn)) AS not_in_with_null,
        |  (SELECT COUNT(*) FROM orders_nn o
        |   WHERE NOT EXISTS (SELECT 1 FROM customer_nn c
        |                     WHERE c.c_custkey = o.o_custkey
        |                       AND c.c_custkey % 100 = 0)) AS not_exists""".stripMargin)
  }

  val q48_sql: String =
    """SELECT
      |  (SELECT COUNT(*) FROM orders
      |   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
      |                           WHERE c_custkey % 100 = 0)) AS not_in_clean,
      |  (SELECT COUNT(*) FROM orders
      |   WHERE o_custkey NOT IN (SELECT CASE WHEN c_custkey % 100 = 0
      |                                  THEN c_custkey END
      |                           FROM customer)) AS not_in_with_null,
      |  (SELECT COUNT(*) FROM orders o
      |   WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                     WHERE c.c_custkey = o.o_custkey
      |                       AND c.c_custkey % 100 = 0)) AS not_exists""".stripMargin

  // ───────────────────────────── v22: file-skip index point lookups

  /** Point lookups through the file-skipping index
    * ([[graft.sources.FileSkipIndex]]): orders is laid out by key
    * into 8 range files; the per-file (min, max, Bloom) index then
    * routes each lookup to the single file that can hold the key —
    * plus one deliberately absent key that must read ZERO files (the
    * Bloom kill). Output: the five looked-up rows; the oracle
    * replays the same keys against the raw table, so a row lost to
    * over-eager skipping (or a phantom from an FP without the exact
    * re-filter) fails the hash. The per-file admit/skip counts are
    * spec territory (`FileSkipIndexSpec`), not output.
    */
  val v22_fileskip_lookup: Q = (s, dir) => {
    val tmp = java.nio.file.Files.createTempDirectory("graft-skiplookup")
      .toFile.getAbsolutePath + "/orders"
    val orders = Tables(s, dir, "orders").select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
      round(col("o_totalprice") * 100).cast(LongType).as("cents"))
    orders.repartitionByRange(8, col("k"))
      .write.mode("overwrite").parquet(tmp)
    val index = graft.sources.FileSkipIndex
      .build(s, tmp, "k", expectedKeysPerFile = 1000000L).persist()
    // five deterministic present keys + one absent (zero-file path)
    val keys = orders.filter(col("k") % 10 === 3).orderBy(col("k"))
      .limit(5).select(col("k")).collect().map(_.getLong(0)).toSeq
    val maxKey = orders.agg(max(col("k"))).head().getLong(0)
    val hits = (keys :+ (maxKey + 1000L)).map(k =>
      graft.sources.FileSkipIndex.lookup(s, index, tmp, "k", k))
    hits.reduce(_ unionByName _)
      .select(col("k"), col("st"), col("cents"))
      .orderBy(col("k"))
  }

  val v22_sql: String =
    """WITH keys AS (
      |  SELECT o_orderkey AS k FROM orders
      |  WHERE o_orderkey % 10 = 3 ORDER BY k LIMIT 5
      |)
      |SELECT o_orderkey AS k, o_orderstatus AS st,
      |       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      |FROM orders WHERE o_orderkey IN (SELECT k FROM keys)
      |ORDER BY k""".stripMargin

  // ───────────────────────────── q46: bucketed co-located join

  /** Shuffle-free repeated joins via BUCKETING — the standing answer
    * to "this fact-to-fact join runs every day at 100 TB": both
    * tables are written `bucketBy(8, orderkey)` once, after which
    * every orderkey-equi-join reads co-located buckets and the join
    * plans with NO Exchange on either side (asserted in
    * `BucketedJoinSpec`; at 100 TB that exchange IS the job cost).
    * The query writes both bucketed tables, joins them, and audits
    * revenue per status; the oracle replays the plain join.
    */
  val q46_bucketed_join: Q = (s, dir) => {
    val db = "graft_bkt"
    val tmp = java.nio.file.Files.createTempDirectory("graft-bucketed")
      .toFile.getAbsolutePath
    s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    s.sql(s"DROP TABLE IF EXISTS $db.orders_b")
    s.sql(s"DROP TABLE IF EXISTS $db.lineitem_b")
    val orders = Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
    val li = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * 100).cast(LongType).as("cents"))
    orders.write.mode("overwrite").option("path", s"$tmp/orders_b")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(s"$db.orders_b")
    li.write.mode("overwrite").option("path", s"$tmp/lineitem_b")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(s"$db.lineitem_b")
    s.table(s"$db.orders_b")
      .join(s.table(s"$db.lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        sum(col("cents")).as("sum_cents"))
      .orderBy(col("o_orderstatus"))
  }

  val q46_sql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_lines,
      |  COUNT(DISTINCT o_orderkey) AS n_orders,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ───────────────────────────── s17: metadata-filtered ANN

  /** Filtered vector search — retrieval under a metadata predicate
    * (the "top-k among label-class documents" ask every RAG/curation
    * stack has). PRE-filter strategy: the predicate lands on the
    * corpus scan (parquet pushdown) BEFORE any scoring, so the scored
    * set — and with IVF, the index probe set — shrinks by the
    * selectivity; top-k ranks are then exact within the filtered set
    * (no post-filter recall loss, the failure mode of filtering
    * AFTER an approximate top-k).
    */
  val s17_filtered_ann: Q = (s, dir) => {
    import graft.operators.VectorSearch
    val e = Tables(s, dir, "embeddings")
    VectorSearch.bruteForceTopK(
        corpus = e.filter(col("label") % 2 === 0),
        queries = e.filter(col("vec_id") < 5),
        idCol = "vec_id", vecCol = "embedding", queryIdCol = "vec_id", k = 10)
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }

  val s17_sql: String =
    """SELECT query_id, rank, id FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS id,
      |         ROW_NUMBER() OVER (
      |           PARTITION BY q.vec_id
      |           ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                           CAST(c.embedding AS DOUBLE[])) DESC,
      |                    c.vec_id ASC) AS rank
      |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      |  WHERE q.vec_id < 5 AND c.label % 2 = 0) t
      |WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  // ───────────────────────────── v21: schema-on-read merge

  /** Schema drift on READ: two parquet batches with different schemas
    * (the second adds `o_orderpriority`) land in one directory; a
    * `mergeSchema` read reconciles them — old files surface NULL for
    * the new column, no rewrite of history (the only sane option at
    * 100 TB). The audit pins both the union schema and the NULL
    * backfill; the oracle replays the drift from the live table.
    */
  val v21_schema_merge: Q = (s, dir) => {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mergeschema")
      .toFile.getAbsolutePath + "/orders"
    val orders = Tables(s, dir, "orders")
      .withColumn("cents", round(col("o_totalprice") * 100).cast(LongType))
    orders.filter(col("o_orderdate") < "1996-01-01")
      .select(col("o_orderkey"), col("o_orderstatus"), col("cents"))
      .write.mode("overwrite").parquet(tmp)
    orders.filter(col("o_orderdate") >= "1996-01-01")
      .select(col("o_orderkey"), col("o_orderstatus"), col("cents"),
        col("o_orderpriority"))
      .write.mode("append").parquet(tmp)
    s.read.option("mergeSchema", "true").parquet(tmp)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        count(col("o_orderpriority")).as("n_with_priority"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        sum(col("cents")).as("sum_cents"))
      .orderBy(col("o_orderstatus"))
  }

  val v21_sql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  COUNT(CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      |        THEN o_orderpriority END) AS n_with_priority,
      |  COUNT(DISTINCT CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      |        THEN o_orderpriority END) AS n_priorities,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  val queries: Map[String, Q] = Map(
    "q45_grouping_sets" -> q45_grouping_sets,
    "q46_bucketed_join" -> q46_bucketed_join,
    "d44_mor_cdc" -> d44_mor_cdc,
    "v22_fileskip_lookup" -> v22_fileskip_lookup,
    "d45_incremental_distinct" -> d45_incremental_distinct,
    "q47_recursive_spine" -> q47_recursive_spine,
    "q48_not_in_nulls" -> q48_not_in_nulls,
    "s17_filtered_ann" -> s17_filtered_ann,
    "v21_schema_merge" -> v21_schema_merge,
    "d42_incremental_view" -> d42_incremental_view,
    "q44_lateral_topn" -> q44_lateral_topn,
    "d40_bloom_decontaminate" -> d40_bloom_decontaminate,
    "d41_global_index" -> d41_global_index,
    "q42_pivot" -> q42_pivot,
    "q43_ntile_bins" -> q43_ntile_bins,
    "t19_bm25_topk" -> t19_bm25_topk,
    "t23_bm25_index_serve" -> t23_bm25_index_serve,
    "t27_bm25_index_delete" -> t27_bm25_index_delete,
    "w30_streaming_postings" -> w30_streaming_postings,
    "w31_postings_autocompact" -> w31_postings_autocompact,
    "t28_phrase_search" -> t28_phrase_search,
    "t29_proximity_search" -> t29_proximity_search,
    "t32_bm25f_fields" -> t32_bm25f_fields,
    "t33_bm25f_index_serve" -> t33_bm25f_index_serve,
    "t34_collocations" -> t34_collocations,
    "t30_phrase_index_serve" -> t30_phrase_index_serve,
    "t31_proximity_index_serve" -> t31_proximity_index_serve,
    "w34_positional_maintenance" -> w34_positional_maintenance,
    "w32_unified_index_admission" -> w32_unified_index_admission,
    "w33_unified_forget" -> w33_unified_forget,
    "w35_unified_phrase" -> w35_unified_phrase,
    "w36_postings_defrag" -> w36_postings_defrag,
    "w37_unified_recrawl" -> w37_unified_recrawl,
    "w38_index_asof" -> w38_index_asof,
    "w41_tagged_retrieval_cut" -> w41_tagged_retrieval_cut,
    "v20_catalog_snapshot" -> v20_catalog_snapshot)

  val oracles: Map[String, String] = Map(
    "q45_grouping_sets" -> q45_sql,
    "q46_bucketed_join" -> q46_sql,
    "d44_mor_cdc" -> d44_sql,
    "v22_fileskip_lookup" -> v22_sql,
    "d45_incremental_distinct" -> d45_sql,
    "q47_recursive_spine" -> q47_sql,
    "q48_not_in_nulls" -> q48_sql,
    "s17_filtered_ann" -> s17_sql,
    "v21_schema_merge" -> v21_sql,
    "d42_incremental_view" -> d42_sql,
    "q44_lateral_topn" -> q44_sql,
    "d40_bloom_decontaminate" -> d40_sql,
    "d41_global_index" -> d41_sql,
    "q42_pivot" -> q42_sql,
    "q43_ntile_bins" -> q43_sql,
    "t19_bm25_topk" -> t19_sql,
    "t23_bm25_index_serve" -> t19_sql,
    "t27_bm25_index_delete" ->
      bm25OracleSql("(SELECT * FROM documents WHERE doc_id % 5 <> 0)"),
    // the stream's final surviving corpus: deletes out, recrawled
    // texts (two prepended query terms) in — index-serving under
    // maintenance must reproduce the scan-time ranking bit-identically
    "w30_streaming_postings" -> bm25OracleSql(
      """(SELECT doc_id,
        |        CASE WHEN doc_id % 10 = 3
        |             THEN 'vector stream ' || text ELSE text END AS text
        | FROM documents WHERE doc_id % 7 <> 0)""".stripMargin),
    // the stream's surviving corpus after both delete waves —
    // compaction must not change the served answer
    "w31_postings_autocompact" -> bm25OracleSql(
      "(SELECT doc_id, text FROM documents" +
        " WHERE doc_id % 3 <> 0 AND doc_id % 10 <> 7)"),
    "t28_phrase_search" -> t28_sql,
    "t29_proximity_search" -> t29_sql,
    "t32_bm25f_fields" -> t32_sql,
    // t32's weighted replay over the forget's survivors — the stored
    // positional member must reproduce scan-time BM25F bit-identically
    "t33_bm25f_index_serve" -> t33_sql,
    "t34_collocations" -> t34_sql,
    // index-serving is an execution strategy: t28's replay verbatim
    "t30_phrase_index_serve" -> t28_sql,
    // index-serving is an execution strategy: t29's replay verbatim
    "t31_proximity_index_serve" -> t29_sql,
    "w34_positional_maintenance" -> w34_sql,
    "w32_unified_index_admission" -> w32_sql,
    // the surviving corpus after both erasure waves — masking vs
    // folding is an execution event, the answer must not move
    "w33_unified_forget" -> bm25OracleSql(
      "(SELECT doc_id, text FROM documents" +
        " WHERE doc_id % 3 <> 1 AND doc_id % 10 <> 2)"),
    // t28's phrase replay over the forget's survivors — one doc in
    // five relations but not the sixth shifts a count and fails this
    "w35_unified_phrase" -> w35_sql,
    // defragmentation is an execution event: t19's replay verbatim —
    // a fold that loses or duplicates a posting row fails the hash
    "w36_postings_defrag" -> t19_sql,
    // the final LOGICAL corpus after the recrawl + forget waves:
    // revisions and kill floors are execution machinery — one stale
    // revision scoring (or a lost new one) shifts tf/df/dl and fails
    "w37_unified_recrawl" -> bm25OracleSql(
      """(SELECT doc_id,
        |        CASE WHEN doc_id % 10 = 4
        |             THEN 'merge window ' || text ELSE text END AS text
        | FROM documents WHERE doc_id % 7 <> 0)""".stripMargin),
    // the AS-OF serve predates every recrawl/forget: t19's replay over
    // the ORIGINAL corpus verbatim (declared sharing, t30-style — time
    // travel is an execution strategy; the in-query pins carry the
    // head-vs-snapshot divergence)
    "w38_index_asof" -> t19_sql,
    // the tagged cut's logical corpus: original text (the recrawl
    // postdates the tag), forgotten ids removed (the forget predates
    // it) — declared sharing of the one BM25 scoring body, w38-style;
    // the in-query pins carry the tag/vacuum/chain-retention teeth
    "w41_tagged_retrieval_cut" ->
      bm25OracleSql("(SELECT * FROM documents WHERE doc_id % 7 <> 0)"),
    "v20_catalog_snapshot" -> v20_sql)
}
