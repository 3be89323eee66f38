package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.{TextFunctions, WinnowedFingerprint}
import graft.operators.{ConnectedComponents, Decontaminate, IncrementalDedup, LanguageModel, Multimodal, PageRank, Sampling, TextDedup, VectorSearch}

/** The training-data-pipeline operator suite (dedup, similarity search,
  * text analysis, multimodal) as driver-checked queries.
  *
  * The documents/embeddings testdata has no organic duplicates, so dedup
  * queries run over a *planted* corpus: the original table unioned with
  * deterministic exact-dup copies (+1000000000 ids) and near-dup copies
  * (+2000000000 ids, slightly perturbed) — both expressible identically in
  * the DuckDB oracle.
  *
  * Determinism: no raw floating-point aggregate ever reaches a hashed
  * output — pair membership and ranks are decided far from numeric
  * boundaries, and doubles in outputs come from single-division or
  * identical-op-sequence arithmetic.
  */
object DataPipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  // ── shared planted corpora ──────────────────────────────────────────

  /** documents ∪ exact copies (ids %10=0 → +1000000000) ∪ near-dup copies
    * (ids %10=5 → +2000000000, first two chars replaced).
    */
  def dupDocCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    d.unionAll(
        d.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000000L).as("doc_id"), col("text")))
      .unionAll(
        d.filter(col("doc_id") % 10 === 5)
          .select((col("doc_id") + 2000000000L).as("doc_id"),
            concat(lit("zz"), expr("substring(text, 3)")).as("text")))
      // the documents parquet is a single small file → 1-3 input
      // partitions; spread the (expression-heavy) shingling across cores.
      // At real scale the input already has ≥ parallelism partitions and
      // callers skip this.
      .repartition(s.sparkContext.defaultParallelism)
  }

  val DupDocCorpusSql: String =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000000, text FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000000, 'zz' || substr(text, 3) FROM documents WHERE doc_id % 10 = 5
      |)""".stripMargin

  /** embeddings (as DOUBLE[]) ∪ exact copies (%10=5 → +2000000000) ∪ near-dup
    * copies (%10=0 → +1000000000, first component +0.5).
    */
  def dupVecCorpus(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast(DoubleType)).as("vec"))
    e.unionAll(
        e.filter(col("vec_id") % 10 === 5)
          .select((col("vec_id") + 2000000000L).as("vec_id"), col("vec")))
      .unionAll(
        e.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 1000000000L).as("vec_id"),
            concat(array(element_at(col("vec"), 1) + 0.5),
              slice(col("vec"), 2, 10000)).as("vec")))
  }

  val DupVecCorpusSql: String =
    """vecs AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 2000000000, CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id % 10 = 5
      |  UNION ALL
      |  SELECT vec_id + 1000000000,
      |         list_concat([CAST(embedding[1] AS DOUBLE) + 0.5], CAST(embedding[2:] AS DOUBLE[]))
      |  FROM embeddings WHERE vec_id % 10 = 0
      |)""".stripMargin

  /** Shingle definition shared by the Jaccard oracles (must mirror
    * TextFunctions.wordNgrams with n=3).
    */
  val ShinglesSql: String =
    """shingles AS (
      |  SELECT id, unnest(grams) AS shingle FROM (
      |    SELECT id,
      |           CASE WHEN len(toks) = 0 THEN []
      |                ELSE list_distinct(list_transform(range(0, GREATEST(len(toks) - 3, 0) + 1),
      |                  i -> array_to_string(toks[i + 1 : i + 3], ' '))) END AS grams
      |    FROM (SELECT doc_id AS id,
      |                 list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS toks
      |          FROM corpus) t
      |  ) g
      |)""".stripMargin

  /** CTE block ending in `pairs(id_a, id_b, jaccard)` — composed by the
    * pair queries (d02/d03) and the group-resolution query (d06).
    */
  val JaccardCtesSql: String =
    """sizes AS (SELECT id, COUNT(*) AS n_shingles FROM shingles GROUP BY id),
      |inter AS (
      |  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
      |  FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.id < b.id
      |  GROUP BY a.id, b.id
      |),
      |pairs AS (
      |  SELECT i.id_a, i.id_b,
      |         CAST(i.n_inter AS DOUBLE) / (sa.n_shingles + sb.n_shingles - i.n_inter) AS jaccard
      |  FROM inter i
      |  JOIN sizes sa ON sa.id = i.id_a
      |  JOIN sizes sb ON sb.id = i.id_b
      |)""".stripMargin

  val JaccardPairsSql: String =
    JaccardCtesSql +
      "\nSELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.8 ORDER BY id_a, id_b"

  // ── deduplication ───────────────────────────────────────────────────

  /** Exact dedup groups over the planted corpus: md5 content identity,
    * min-id survivor.
    */
  val d01_dedup_exact: Q = (s, dir) => {
    TextDedup.exactGroups(dupDocCorpus(s, dir), "doc_id", "text")
      .orderBy(col("survivor_id"))
  }

  val d01_sql: String =
    s"""WITH $DupDocCorpusSql
       |SELECT md5(text) AS content_hash, COUNT(*) AS group_size, MIN(doc_id) AS survivor_id
       |FROM corpus
       |GROUP BY md5(text)
       |ORDER BY survivor_id""".stripMargin

  /** Exact all-pairs 3-gram Jaccard ≥ 0.8 (inverted-index join). */
  val d02_ngram_jaccard: Q = (s, dir) => {
    TextDedup.ngramJaccardPairs(dupDocCorpus(s, dir), "doc_id", "text", n = 3, threshold = 0.8)
      .orderBy(col("id_a"), col("id_b"))
  }

  val d02_sql: String =
    s"""WITH $DupDocCorpusSql,
       |$ShinglesSql,
       |$JaccardPairsSql""".stripMargin

  /** Near-exact dedup on the canonical text form: lowercased,
    * punctuation-stripped, whitespace-collapsed. Planted variants
    * (every %10=3 doc re-added shouted: uppercased + noise punctuation)
    * collide ONLY after normalization — raw md5 (d01) keeps them apart.
    */
  val d17_normalized_dedup: Q = (s, dir) => {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val corpus = d.unionAll(
      d.filter(col("doc_id") % 10 === 3)
        .select((col("doc_id") + 300000L).as("doc_id"),
          concat(upper(col("text")), lit(" !!")).as("text")))
    TextDedup.normalizedGroups(corpus, "doc_id", "text")
      .orderBy(col("survivor_id"))
  }

  val d17_sql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 300000, upper(text) || ' !!' FROM documents WHERE doc_id % 10 = 3
      |)
      |SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 \t\n\x0B\f\r]', '', 'g'), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS content_hash,
      |       CAST(COUNT(*) AS BIGINT) AS group_size,
      |       CAST(MIN(doc_id) AS BIGINT) AS survivor_id
      |FROM corpus
      |GROUP BY 1
      |ORDER BY survivor_id""".stripMargin

  /** Link-graph authority scoring ([[graft.operators.PageRank]]):
    * 5 integer-exact PageRank iterations over the customer↔supplier
    * trade graph (an edge per trading pair, both directions — the
    * bipartite stand-in for a web link graph), top-20 authorities.
    * This is the curation signal web-corpus pipelines weight
    * documents by: a supplier trading with many well-connected
    * customers outranks one with the same degree of marginal ones —
    * degree alone cannot produce this ordering. The fixed-point
    * arithmetic (ppb ranks, every division integral) makes the k-th
    * iterate bit-identical across engines, so the oracle replays all
    * five rounds as unrolled CTEs and the hash pins every rank. Scale
    * shape: 2 shuffles per iteration (share join on src, contribution
    * aggregate on dst) over the edge relation — the canonical
    * distributed PageRank.
    */
  val d51_link_authority: Q = (s, dir) => {
    val o = Tables(s, dir, "orders")
      .filter(col("o_orderkey") % 20 === 0)
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val raw = o.join(l, col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
    val edges = raw.union(raw.select(col("dst").as("src"), col("src").as("dst")))
    PageRank.run(edges, iterations = 5)
      .select(col("node"), col("rank").as("rank_ppb"))
      .orderBy(col("rank_ppb").desc, col("node"))
      .limit(20)
  }

  val d51_sql: String = {
    def iter(k: Int): String =
      s"""r$k AS (
         |  SELECT n2.node,
         |         CAST(15000000000 // (100 * m.n) + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank
         |  FROM nodes n2 CROSS JOIN meta m
         |  LEFT JOIN (
         |    SELECT e.dst AS node, SUM(r.rank // d.deg) AS s
         |    FROM edges e JOIN r${k - 1} r ON r.node = e.src
         |    JOIN outdeg d ON d.src = e.src
         |    GROUP BY e.dst
         |  ) c ON c.node = n2.node
         |)""".stripMargin
    s"""WITH eraw AS (
       |  SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
       |         's' || CAST(l.l_suppkey AS VARCHAR) AS dst
       |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |  WHERE o.o_orderkey % 20 = 0
       |), edges AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM eraw UNION ALL SELECT dst AS src, src AS dst FROM eraw)
       |), nodes AS (
       |  SELECT DISTINCT src AS node FROM edges UNION SELECT DISTINCT dst FROM edges
       |), meta AS (SELECT COUNT(*) AS n FROM nodes),
       |outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
       |r0 AS (SELECT node, CAST(1000000000 // m.n AS BIGINT) AS rank
       |       FROM nodes CROSS JOIN meta m),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT node, rank AS rank_ppb FROM r5
       |ORDER BY rank_ppb DESC, node LIMIT 20""".stripMargin
  }

  /** Leakage-safe train/eval split ([[Sampling.leakageSafeSplit]]):
    * the split key is the NORMALIZED-CONTENT group, not the doc id,
    * so the planted shouted variants (d17's corpus — same text after
    * canonicalization, doc_id 300k apart) land in the same side as
    * their originals instead of leaking a train doc's near-copy into
    * eval. The gated output makes the safety property visible: the
    * `straddling_groups` row counts groups split across sides and
    * must be 0 (a doc-id-keyed split leaves it > 0 here by
    * construction — the variants' ids hash independently).
    */
  val d52_leakage_split: Q = (s, dir) => {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val corpus = d.unionAll(
      d.filter(col("doc_id") % 10 === 3)
        .select((col("doc_id") + 300000L).as("doc_id"),
          concat(upper(col("text")), lit(" !!")).as("text")))
    val split = Sampling.leakageSafeSplit(
      corpus.withColumn("grp", md5(TextDedup.normalizedText(col("text")))),
      col("grp"), trainPct = 90)
    val per = split.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("grp")).as("n_groups"))
    val straddle = split.groupBy(col("grp"))
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1)
      .agg(count(lit(1)).as("n_docs"))
      .select(lit("straddling_groups").as("split"), col("n_docs"),
        col("n_docs").as("n_groups"))
    per.unionByName(straddle).orderBy(col("split"))
  }

  val d52_sql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 300000, upper(text) || ' !!' FROM documents WHERE doc_id % 10 = 3
      |), g AS (
      |  SELECT doc_id,
      |         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 \t\n\x0B\f\r]', '', 'g'), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS grp
      |  FROM corpus
      |), sp AS (
      |  SELECT doc_id, grp,
      |         CASE WHEN CAST(('0x' || substr(md5(grp), 1, 15)) AS BIGINT) % 100 < 90
      |              THEN 'train' ELSE 'eval' END AS split
      |  FROM g
      |), per AS (
      |  SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |         CAST(COUNT(DISTINCT grp) AS BIGINT) AS n_groups
      |  FROM sp GROUP BY split
      |), straddle AS (
      |  SELECT 'straddling_groups' AS split,
      |         CAST(COUNT(*) AS BIGINT) AS n_docs,
      |         CAST(COUNT(*) AS BIGINT) AS n_groups
      |  FROM (SELECT grp FROM sp GROUP BY grp HAVING COUNT(DISTINCT split) > 1)
      |)
      |SELECT * FROM per UNION ALL SELECT * FROM straddle ORDER BY split""".stripMargin

  /** Asymmetric containment ≥ 0.9: documents whose 3-gram set is mostly
    * INSIDE another document's (quotes, boilerplate wrappers). Ordered
    * pairs — the planted near-dups produce both directions; truncations
    * only one. Containment is a single division of integer counts, so it
    * hash-compares across engines.
    */
  val d16_containment: Q = (s, dir) => {
    TextDedup.containmentPairs(dupDocCorpus(s, dir), "doc_id", "text",
        n = 3, threshold = 0.9)
      .orderBy(col("id_src"), col("id_dst"))
  }

  val d16_sql: String =
    s"""WITH $DupDocCorpusSql,
       |$ShinglesSql,
       |sizes AS (SELECT id, COUNT(*) AS n_shingles FROM shingles GROUP BY id),
       |inter AS (
       |  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
       |  FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.id < b.id
       |  GROUP BY a.id, b.id
       |),
       |directed AS (
       |  SELECT i.id_a AS id_src, i.id_b AS id_dst,
       |         CAST(i.n_inter AS DOUBLE) / sa.n_shingles AS containment
       |  FROM inter i JOIN sizes sa ON sa.id = i.id_a
       |  UNION ALL
       |  SELECT i.id_b, i.id_a,
       |         CAST(i.n_inter AS DOUBLE) / sb.n_shingles
       |  FROM inter i JOIN sizes sb ON sb.id = i.id_b
       |)
       |SELECT id_src, id_dst, containment FROM directed
       |WHERE containment >= 0.9
       |ORDER BY id_src, id_dst""".stripMargin

  /** Containment at scale: prefix-filtered candidates (rarest-shingle
    * pigeonhole, candidate join on the 8-byte shingle hash — see
    * [[TextDedup.containmentCandidates]]) with exact verification. The
    * prefix filter is lossless, so the oracle is d16's exact SQL — the
    * banded path must reproduce the exact operator's rows bit-for-bit.
    */
  val d19_containment_prefix: Q = (s, dir) => {
    TextDedup.containmentPairsPrefix(dupDocCorpus(s, dir), "doc_id", "text",
        n = 3, threshold = 0.9)
      .orderBy(col("id_src"), col("id_dst"))
  }

  val d19_sql: String = d16_sql

  /** MinHash+LSH near-dup (128 hashes, 32 bands) with exact verification —
    * must equal the exact operator at these margins, so it shares d02's
    * oracle.
    */
  val d03_minhash_lsh: Q = (s, dir) => {
    TextDedup.minhashLshPairs(dupDocCorpus(s, dir), "doc_id", "text",
        n = 3, numHashes = 128, bands = 32, threshold = 0.8)
      .orderBy(col("id_a"), col("id_b"))
  }

  val d03_sql: String = d02_sql

  /** SimHash near-dup pairs (hamming ≤ 3 on 60-bit md5-based signatures,
    * banded candidates + exact popcount). The hash is engine-portable, so
    * the oracle recomputes the identical signatures and pairs.
    */
  val d04_simhash: Q = (s, dir) => {
    TextDedup.simhashPairs(dupDocCorpus(s, dir), "doc_id", "text", maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  val d04_sql: String = {
    val bits = TextDedup.SimhashBits
    val bitSums = (0 until bits).map(i =>
      s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b_$i").mkString(",\n    ")
    val sigTerms = (0 until bits).map(i =>
      s"(CASE WHEN b_$i > 0 THEN CAST(1 AS BIGINT) << $i ELSE 0 END)").mkString(" + ")
    val chunkBits = bits / 4
    val mask = (1L << chunkBits) - 1
    s"""WITH $DupDocCorpusSql,
       |toks AS (
       |  SELECT id, unnest(list_distinct(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> ''))) AS tok
       |  FROM (SELECT doc_id AS id, text FROM corpus) t
       |),
       |h AS (
       |  SELECT id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM toks
       |),
       |bits AS (
       |  SELECT id,
       |    $bitSums
       |  FROM h GROUP BY id
       |),
       |sigs AS (SELECT id, $sigTerms AS sig FROM bits),
       |chunks AS (
       |  SELECT id, sig, c.chunk, (sig >> (c.chunk * $chunkBits)) & $mask AS ckey
       |  FROM sigs, (VALUES (0), (1), (2), (3)) c(chunk)
       |),
       |pairs AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |         CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
       |  FROM chunks a
       |  JOIN chunks b ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.id < b.id
       |)
       |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin
  }

  /** Plane count for the banded near-dup LSH (32 bands × 8 bits). */
  private val NearDupPlanes = 256
  private val NearDupBands = 32

  /** Embedding-cosine near-dup pairs over the planted vector corpus via
    * banded hyperplane LSH (256 data-derived planes, 32 bands of 8 bits)
    * with exact cosine verification.
    *
    * Oracle parity: the oracle is the EXACT all-pairs query — measured
    * on the planted corpora the banded candidates lose zero pairs at
    * every test scale, and the margin is sized so that holds at any sf:
    * the worst admissible pair sits at the cos = 0.90 threshold, where a
    * per-band match is p = (1 − θ/π)⁸ ≈ 0.29 and 32 bands miss with
    * (1−p)³² ≈ 1.7e-5 per pair (≈4e-3 with 16 bands — too close for an
    * untested sf with many planted pairs; see
    * [[VectorSearch.cosineNearDupPairs]]). Membership margins: planted
    * pair cosines measured 0.876–0.923 (those below 0.9 are excluded by
    * both engines), organic max ~0.60 at sf0.1 — and both engines fold
    * the same doubles in the same order, so the ≥ 0.9 test cannot flip
    * cross-engine.
    */
  val d05_embedding_neardup: Q = (s, dir) => {
    VectorSearch.cosineNearDupPairs(dupVecCorpus(s, dir), "vec_id", "vec",
        threshold = 0.9, planes = derivedPlanes(s, dir, NearDupPlanes), bands = NearDupBands)
      .select(col("id_a"), col("id_b"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val d05_sql: String =
    s"""WITH $DupVecCorpusSql
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
       |WHERE list_cosine_similarity(a.vec, b.vec) >= 0.9
       |ORDER BY id_a, id_b""".stripMargin

  /** Near-dup GROUP resolution: MinHash+LSH pairs (the scale path,
    * oracle-proven equal to exact Jaccard at these margins — d03) fed
    * through connected components, labeling every corpus doc with its
    * dup-group survivor (min id; itself when unique). This is the step
    * that actually drops duplicates: pairs alone cannot pick survivors
    * when duplicates chain (a~b, b~c, a≁c must collapse to one keeper).
    * The oracle replays the closure with a recursive CTE over the exact
    * pair graph.
    */
  val d06_dedup_groups: Q = (s, dir) => {
    val corpus = dupDocCorpus(s, dir)
    val pairs = TextDedup.minhashLshPairs(corpus, "doc_id", "text",
      n = 3, numHashes = 128, bands = 32, threshold = 0.8)
    ConnectedComponents.dedupGroups(corpus, pairs, "doc_id")
      .orderBy(col("doc_id"))
  }

  /** Dedup-group resolution with a QUALITY-AWARE representative —
    * curation keeps the best member of each near-dup group, not the
    * arbitrary lowest id (d06's survivor): rank members by text
    * length (the quality surrogate both engines compute identically)
    * with doc_id as the tie-break, so a planted exact-dup group keeps
    * its original and a perturbed group keeps its longest variant.
    * Same pair graph and components as d06; one extra per-component
    * rank window over group-cardinality rows.
    */
  val d47_group_representative: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val corpus = dupDocCorpus(s, dir)
    val pairs = TextDedup.minhashLshPairs(corpus, "doc_id", "text",
      n = 3, numHashes = 128, bands = 32, threshold = 0.8)
    val memb = ConnectedComponents.dedupGroups(corpus, pairs, "doc_id")
      .join(corpus.select(col("doc_id"), length(col("text")).as("__q")), "doc_id")
    val rep = memb.withColumn("__rn", row_number().over(
        Window.partitionBy(col("component"))
          .orderBy(col("__q").desc, col("doc_id"))))
      .filter(col("__rn") === 1)
      .select(col("component"), col("doc_id").as("rep_id"))
    memb.join(rep, "component")
      .select(col("doc_id"), col("component"), col("rep_id"),
        (col("doc_id") === col("rep_id")).as("is_rep"))
      .orderBy(col("doc_id"))
  }

  val d47_sql: String =
    s"""WITH RECURSIVE $DupDocCorpusSql,
       |$ShinglesSql,
       |$JaccardCtesSql,
       |edges AS (SELECT id_a AS a, id_b AS b FROM pairs WHERE jaccard >= 0.8),
       |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
       |reach(id, r) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM sym) t
       |  UNION
       |  SELECT s.a, r.r FROM sym s JOIN reach r ON r.id = s.b
       |),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
       |memb AS (
       |  SELECT c.doc_id, COALESCE(mp.component, c.doc_id) AS component,
       |         LENGTH(c.text) AS q
       |  FROM corpus c LEFT JOIN comp mp ON mp.id = c.doc_id
       |),
       |rep AS (
       |  SELECT component, doc_id AS rep_id FROM (
       |    SELECT component, doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY component
       |                         ORDER BY q DESC, doc_id) AS rn
       |    FROM memb) t
       |  WHERE rn = 1
       |)
       |SELECT m.doc_id, m.component, r.rep_id, m.doc_id = r.rep_id AS is_rep
       |FROM memb m JOIN rep r USING (component)
       |ORDER BY m.doc_id""".stripMargin

  val d06_sql: String =
    s"""WITH RECURSIVE $DupDocCorpusSql,
       |$ShinglesSql,
       |$JaccardCtesSql,
       |edges AS (SELECT id_a AS a, id_b AS b FROM pairs WHERE jaccard >= 0.8),
       |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
       |reach(id, r) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM sym) t
       |  UNION
       |  SELECT s.a, r.r FROM sym s JOIN reach r ON r.id = s.b
       |),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
       |SELECT c.doc_id,
       |       COALESCE(mp.component, c.doc_id) AS component,
       |       COALESCE(mp.component, c.doc_id) = c.doc_id AS is_survivor
       |FROM corpus c LEFT JOIN comp mp ON mp.id = c.doc_id
       |ORDER BY doc_id""".stripMargin

  /** Embedding dedup GROUP resolution — the vector analog of d06:
    * banded near-dup pairs (d05's scale path, oracle-proven lossless at
    * these margins) through connected components, labeling every vector
    * with its dup-group survivor. Every dedup modality ends in groups,
    * not just pairs — pairs can't pick survivors when duplicates chain.
    */
  val d11_embedding_groups: Q = (s, dir) => {
    val corpus = dupVecCorpus(s, dir)
    val pairs = VectorSearch.cosineNearDupPairs(corpus, "vec_id", "vec",
      threshold = 0.9, planes = derivedPlanes(s, dir, NearDupPlanes), bands = NearDupBands)
    ConnectedComponents.dedupGroups(corpus, pairs, "vec_id")
      .orderBy(col("vec_id"))
  }

  val d11_sql: String =
    s"""WITH RECURSIVE $DupVecCorpusSql,
       |vpairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
       |  WHERE list_cosine_similarity(a.vec, b.vec) >= 0.9
       |),
       |sym AS (SELECT id_a AS a, id_b AS b FROM vpairs
       |        UNION SELECT id_b, id_a FROM vpairs),
       |reach(id, r) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM sym) t
       |  UNION
       |  SELECT s.a, r.r FROM sym s JOIN reach r ON r.id = s.b
       |),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
       |SELECT v.vec_id,
       |       COALESCE(mp.component, v.vec_id) AS component,
       |       COALESCE(mp.component, v.vec_id) = v.vec_id AS is_survivor
       |FROM vecs v LEFT JOIN comp mp ON mp.id = v.vec_id
       |ORDER BY vec_id""".stripMargin

  // ── similarity search ───────────────────────────────────────────────

  /** Brute-force cosine top-10 for query vectors 0-4 over the corpus —
    * ranks only in the output (gaps between random-vector cosines dwarf
    * double-vs-float noise).
    */
  val s01_ann_topk: Q = (s, dir) => {
    val e = Tables(s, dir, "embeddings")
    VectorSearch.bruteForceTopK(
        corpus = e, queries = e.filter(col("vec_id") < 5),
        idCol = "vec_id", vecCol = "embedding", queryIdCol = "vec_id", k = 10)
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }

  val s01_sql: String =
    """SELECT query_id, rank, id FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS id,
      |         ROW_NUMBER() OVER (
      |           PARTITION BY q.vec_id
      |           ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                           CAST(c.embedding AS DOUBLE[])) DESC,
      |                    c.vec_id ASC) AS rank
      |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      |  WHERE q.vec_id < 5) t
      |WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** Number of hyperplanes for the LSH-bucketed ANN (data-derived planes:
    * the 8 highest-id embedding vectors).
    */
  private val LshPlanes = 8

  /** Data-derived hyperplanes: the `n` highest-id embedding vectors in
    * ascending id order. Deterministic, tiny (collect of n rows), and
    * replayable in SQL by any engine reading the same parquet.
    */
  def derivedPlanes(s: SparkSession, dir: String, n: Int): Seq[Seq[Double]] = {
    val e = Tables(s, dir, "embeddings")
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    e.filter(col("vec_id") > maxId - n)
      .orderBy(col("vec_id"))
      .select(transform(col("embedding"), _.cast(DoubleType)))
      .collect().toSeq
      .map(_.getSeq[Double](0).toSeq)
  }

  /** LSH-bucketed ANN: corpus bucketed by 8-bit hyperplane signature;
    * each query re-ranks only its bucket. Approximate by design — but
    * deterministically so, and the oracle computes the same approximation.
    */
  val s02_ann_lsh: Q = (s, dir) => {
    val e = Tables(s, dir, "embeddings")
    val planes = derivedPlanes(s, dir, LshPlanes)
    VectorSearch.lshTopK(
        corpus = e, queries = e.filter(col("vec_id") < 5),
        idCol = "vec_id", vecCol = "embedding", queryIdCol = "vec_id",
        planes = planes, k = 10)
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }

  val s02_sql: String =
    """WITH planes AS (
      |  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS plane_no,
      |         CAST(embedding AS DOUBLE[]) AS pvec
      |  FROM embeddings
      |  WHERE vec_id > (SELECT MAX(vec_id) FROM embeddings) - 8
      |),
      |sigs AS (
      |  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS vec,
      |         SUM(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]), p.pvec) > 0.0
      |                  THEN CAST(1 AS BIGINT) << p.plane_no ELSE 0 END) AS bucket
      |  FROM embeddings e CROSS JOIN planes p
      |  GROUP BY e.vec_id, e.embedding
      |)
      |SELECT query_id, rank, id FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS id,
      |         ROW_NUMBER() OVER (
      |           PARTITION BY q.vec_id
      |           ORDER BY list_cosine_similarity(q.vec, c.vec) DESC, c.vec_id ASC) AS rank
      |  FROM sigs q JOIN sigs c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
      |  WHERE q.vec_id < 5) t
      |WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** ANN quality measured IN the gate: per query, how many of the exact
    * top-10 (s01's ranking) the LSH-bucketed search (s02's ranking)
    * returns — recall@10 as integer counts, the acceptance metric every
    * ANN deployment needs before trading exactness for speed. Both
    * rankings tie-break identically (score DESC, id ASC) and their
    * memberships are oracle-proven (s01/s02), so the overlap count is
    * engine-portable. Queries whose LSH bucket is empty drop out on
    * both sides.
    */
  val s05_ann_recall: Q = (s, dir) => {
    val e = Tables(s, dir, "embeddings")
    val qs = e.filter(col("vec_id") < 5)
    val exact = VectorSearch.bruteForceTopK(
        corpus = e, queries = qs,
        idCol = "vec_id", vecCol = "embedding", queryIdCol = "vec_id", k = 10)
      .select(col("query_id").as("__eq"), col("id").as("__eid"))
    val approx = VectorSearch.lshTopK(
        corpus = e, queries = qs,
        idCol = "vec_id", vecCol = "embedding", queryIdCol = "vec_id",
        planes = derivedPlanes(s, dir, LshPlanes), k = 10)
      .select(col("query_id"), col("id"))
    // Single pass over each ranking: approx LEFT JOIN exact on
    // (query_id, id), then one aggregation — n_approx counts all approx
    // rows, n_hits counts the ones that matched an exact-top-10 row.
    // (query_id, id) is unique on the exact side so the left join cannot
    // fan out. The earlier two-reference shape re-executed the LSH
    // ranking once per consumer; this plan computes each ranking exactly
    // once, so the query costs ~1x its s01+s02 parts.
    approx.join(exact,
        col("query_id") === col("__eq") && col("id") === col("__eid"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_approx"), count(col("__eid")).as("n_hits"))
      .orderBy(col("query_id"))
  }

  val s05_sql: String =
    """WITH planes AS (
      |  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS plane_no,
      |         CAST(embedding AS DOUBLE[]) AS pvec
      |  FROM embeddings
      |  WHERE vec_id > (SELECT MAX(vec_id) FROM embeddings) - 8
      |),
      |sigs AS (
      |  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS vec,
      |         SUM(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]), p.pvec) > 0.0
      |                  THEN CAST(1 AS BIGINT) << p.plane_no ELSE 0 END) AS bucket
      |  FROM embeddings e CROSS JOIN planes p
      |  GROUP BY e.vec_id, e.embedding
      |),
      |ex AS (
      |  SELECT query_id, id FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS id,
      |           ROW_NUMBER() OVER (
      |             PARTITION BY q.vec_id
      |             ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                             CAST(c.embedding AS DOUBLE[])) DESC,
      |                      c.vec_id ASC) AS rank
      |    FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      |    WHERE q.vec_id < 5) t
      |  WHERE rank <= 10
      |),
      |ap AS (
      |  SELECT query_id, id FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS id,
      |           ROW_NUMBER() OVER (
      |             PARTITION BY q.vec_id
      |             ORDER BY list_cosine_similarity(q.vec, c.vec) DESC, c.vec_id ASC) AS rank
      |    FROM sigs q JOIN sigs c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
      |    WHERE q.vec_id < 5) t
      |  WHERE rank <= 10
      |),
      |apc AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_approx FROM ap GROUP BY query_id),
      |hits AS (
      |  SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
      |  FROM ex e JOIN ap a ON a.query_id = e.query_id AND a.id = e.id
      |  GROUP BY e.query_id
      |)
      |SELECT apc.query_id, apc.n_approx, COALESCE(hits.n_hits, 0) AS n_hits
      |FROM apc LEFT JOIN hits ON hits.query_id = apc.query_id
      |ORDER BY apc.query_id""".stripMargin

  /** Centroid count for the IVF query (data-derived like the LSH
    * planes: the 8 highest-id embedding vectors).
    */
  private val IvfCentroids = 8

  /** IVF-partitioned ANN: corpus assigned to its nearest centroid (one
    * scan, broadcast centroid table), queries probe their 2 nearest
    * cells, candidates re-rank exactly. Centroids are deterministic
    * data-derived vectors (the derivedPlanes recipe), so the oracle
    * replays the identical argmin assignment + probe + re-rank; rank
    * decisions sit far from FP boundaries (same argument as s01/s02).
    */
  val s03_ann_ivf: Q = (s, dir) => {
    val e = Tables(s, dir, "embeddings")
    VectorSearch.ivfTopK(
        corpus = e, queries = e.filter(col("vec_id") < 5),
        idCol = "vec_id", vecCol = "embedding", queryIdCol = "vec_id",
        centroids = derivedPlanes(s, dir, IvfCentroids), k = 10, nProbe = 2)
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Replay: same centroids (8 highest-id vectors, cell = row-number by
    * id), same squared-distance formula term order
    * (`v·v − 2·v·c + c·c`), argmin cell per vector, 2 nearest cells per
    * query, exact cosine re-rank within probed cells.
    */
  val s03_sql: String =
    """WITH cents AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c,
      |         CAST(embedding AS DOUBLE[]) AS cvec
      |  FROM embeddings
      |  WHERE vec_id > (SELECT MAX(vec_id) FROM embeddings) - 8
      |),
      |vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
      |dists AS (
      |  SELECT v.vec_id, v.vec, c.c,
      |         ROW_NUMBER() OVER (PARTITION BY v.vec_id
      |           ORDER BY list_inner_product(v.vec, v.vec)
      |                    - 2.0 * list_inner_product(v.vec, c.cvec)
      |                    + list_inner_product(c.cvec, c.cvec) ASC, c.c ASC) AS rn
      |  FROM vecs v CROSS JOIN cents c
      |),
      |assign AS (SELECT vec_id, vec, c FROM dists WHERE rn = 1),
      |probes AS (SELECT vec_id, vec, c FROM dists WHERE rn <= 2 AND vec_id < 5)
      |SELECT query_id, rank, id FROM (
      |  SELECT q.vec_id AS query_id, a.vec_id AS id,
      |         ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |           ORDER BY list_cosine_similarity(q.vec, a.vec) DESC, a.vec_id ASC) AS rank
      |  FROM probes q JOIN assign a ON q.c = a.c AND a.vec_id <> q.vec_id) t
      |WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** Int8-quantized top-10 (s01's memory-lean sibling): corpus-global
    * max-|component| scale, q = round(v/scale×127), ranking by the
    * exact INTEGER dot product (IntDot codegen kernel) — replayed
    * verbatim by the oracle, since integer scores cannot drift across
    * engines the way float scores can.
    */
  val s04_ann_quantized: Q = (s, dir) => {
    val e = Tables(s, dir, "embeddings")
    VectorSearch.quantizedTopK(
        corpus = e, queries = e.filter(col("vec_id") < 5),
        idCol = "vec_id", vecCol = "embedding", queryIdCol = "vec_id", k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  val s04_sql: String =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
      |sc AS (SELECT MAX(list_max(list_transform(vec, x -> ABS(x)))) AS scale FROM v),
      |q AS (
      |  SELECT v.vec_id,
      |         list_transform(v.vec, x -> CAST(ROUND(x / sc.scale * 127) AS INT)) AS qvec
      |  FROM v, sc
      |),
      |dots AS (
      |  SELECT qr.vec_id AS query_id, c.vec_id AS id,
      |         CAST(list_sum(list_transform(range(1, len(qr.qvec) + 1),
      |           i -> qr.qvec[i] * c.qvec[i])) AS BIGINT) AS qdot
      |  FROM q qr JOIN q c ON c.vec_id <> qr.vec_id
      |  WHERE qr.vec_id < 5
      |)
      |SELECT query_id, rank, id, qdot FROM (
      |  SELECT query_id, id, qdot,
      |         ROW_NUMBER() OVER (PARTITION BY query_id
      |           ORDER BY qdot DESC, id ASC) AS rank
      |  FROM dots) t
      |WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** Two-stage retrieval (s04's prefilter + s01's precision): int8 dot
    * keeps 40 candidates per query, exact double cosine re-ranks to
    * top-10. The production serving shape — full-precision math touches
    * 40 rows per query, not the corpus; corpus scanned once. Candidate
    * cut is integer-exact (engine-portable); the oracle replays both
    * stages.
    */
  val s10_ann_rerank: Q = (s, dir) => {
    val e = Tables(s, dir, "embeddings")
    VectorSearch.rerankTopK(
        corpus = e, queries = e.filter(col("vec_id") < 5),
        idCol = "vec_id", vecCol = "embedding", queryIdCol = "vec_id",
        k = 10, candidates = 40)
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }

  val s10_sql: String =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
      |sc AS (SELECT MAX(list_max(list_transform(vec, x -> ABS(x)))) AS scale FROM v),
      |q AS (
      |  SELECT v.vec_id, v.vec,
      |         list_transform(v.vec, x -> CAST(ROUND(x / sc.scale * 127) AS INT)) AS qvec
      |  FROM v, sc
      |),
      |dots AS (
      |  SELECT qr.vec_id AS query_id, c.vec_id AS id, qr.vec AS qv, c.vec AS cv,
      |         CAST(list_sum(list_transform(range(1, len(qr.qvec) + 1),
      |           i -> qr.qvec[i] * c.qvec[i])) AS BIGINT) AS qdot
      |  FROM q qr JOIN q c ON c.vec_id <> qr.vec_id
      |  WHERE qr.vec_id < 5
      |),
      |cand AS (
      |  SELECT query_id, id, qv, cv FROM (
      |    SELECT query_id, id, qv, cv,
      |           ROW_NUMBER() OVER (PARTITION BY query_id
      |             ORDER BY qdot DESC, id ASC) AS crank
      |    FROM dots) t
      |  WHERE crank <= 40
      |)
      |SELECT query_id, rank, id FROM (
      |  SELECT query_id, id,
      |         ROW_NUMBER() OVER (PARTITION BY query_id
      |           ORDER BY list_cosine_similarity(qv, cv) DESC, id ASC) AS rank
      |  FROM cand) t
      |WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** Diversified retrieval: [[VectorSearch.mmrTopK]] — 20 exact-cosine
    * candidates per query, MMR (λ=0.5) greedily re-picks 5 trading
    * relevance against redundancy with already-picked results. The
    * oracle replays the greedy loop as k−1 unrolled CTE steps
    * (generated — each picks the arg-max of `0.5·rel − 0.5·maxsim`
    * over the not-yet-picked candidates).
    */
  val s11_mmr_topk: Q = (s, dir) => {
    val e = Tables(s, dir, "embeddings")
    VectorSearch.mmrTopK(
        corpus = e, queries = e.filter(col("vec_id") < 3),
        idCol = "vec_id", vecCol = "embedding", queryIdCol = "vec_id",
        k = 5, candidates = 20, lambdaPct = 50)
      .orderBy(col("query_id"), col("rank"))
  }

  /** One unrolled greedy step of the MMR oracle: score remaining
    * candidates against the picked-so-far set, keep the arg-max.
    */
  private def mmrOracleStep(i: Int): String =
    s"""p$i AS (
       |  SELECT c.query_id, c.id, c.rel, c.cv,
       |         MAX(list_cosine_similarity(c.cv, s.cv)) AS red
       |  FROM cand c JOIN all${i - 1} s ON s.query_id = c.query_id
       |  WHERE NOT EXISTS (SELECT 1 FROM all${i - 1} x
       |                    WHERE x.query_id = c.query_id AND x.id = c.id)
       |  GROUP BY c.query_id, c.id, c.rel, c.cv
       |),
       |sel$i AS (
       |  SELECT query_id, $i AS rank, id, rel, cv FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY 0.5 * rel - 0.5 * red DESC, id) AS r
       |    FROM p$i) t
       |  WHERE r = 1
       |),
       |all$i AS (SELECT * FROM all${i - 1} UNION ALL SELECT * FROM sel$i)""".stripMargin

  val s11_sql: String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
       |cand AS (
       |  SELECT query_id, id, rel, cv FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS id,
       |           list_cosine_similarity(q.vec, c.vec) AS rel, c.vec AS cv,
       |           ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |             ORDER BY list_cosine_similarity(q.vec, c.vec) DESC, c.vec_id) AS crank
       |    FROM v q JOIN v c ON c.vec_id <> q.vec_id
       |    WHERE q.vec_id < 3) t
       |  WHERE crank <= 20
       |),
       |sel1 AS (
       |  SELECT query_id, 1 AS rank, id, rel, cv FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rel DESC, id) AS r
       |    FROM cand) t
       |  WHERE r = 1
       |),
       |all1 AS (SELECT * FROM sel1),
       |${(2 to 5).map(mmrOracleStep).mkString(",\n")}
       |SELECT query_id, rank, id FROM all5 ORDER BY query_id, rank""".stripMargin

  // ── text analysis ───────────────────────────────────────────────────

  /** Token/subword counts, punctuation, mean token length, stopword ratio,
    * quality score — the cheap corpus-cleaning statistics. Doubles in the
    * output come from identical op sequences; quality is floored to µunits.
    */
  val t01_text_stats: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    val text = col("text")
    d.select(
        col("doc_id"),
        length(text).as("n_chars"),
        TextFunctions.tokenCount(text).as("n_tokens"),
        size(TextFunctions.tokenSet(text)).as("n_distinct_tokens"),
        TextFunctions.subwordCount(text).as("n_subwords"),
        TextFunctions.punctCount(text).as("n_punct"),
        TextFunctions.meanTokenLength(text).as("mean_token_len"),
        floor(TextFunctions.qualityScore(text) * 1e6).cast(LongType).as("quality_micro"))
      .orderBy(col("doc_id"))
  }

  val t01_sql: String = {
    // toks / metrics / score fragments shared with the t09 oracle —
    // single SQL copy of the qualityScore formula (TextFunctions)
    s"""WITH t AS (
       |  SELECT doc_id, text, ${TextFunctions.ToksSql} AS toks
       |  FROM documents
       |),
       |m AS (
       |  SELECT doc_id, text, toks,
       |         CAST(len(toks) AS INT) AS n_tokens,
       |         CAST(len(list_distinct(toks)) AS INT) AS n_distinct_tokens,
       |         CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS INT) AS n_subwords,
       |         ${TextFunctions.QualityMetricsSql}
       |  FROM t
       |)
       |SELECT doc_id, n_chars, n_tokens, n_distinct_tokens, n_subwords, n_punct, mean_token_len,
       |       ${TextFunctions.QualityMicroSql} AS quality_micro
       |FROM m
       |ORDER BY doc_id""".stripMargin
  }

  /** Heuristic language-ID over marker-word profiles (argmax, ties →
    * alphabetically first, zero → "und"). Deterministic scoring — the
    * oracle recomputes the same profiles.
    */
  val t02_langid: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    d.select(
        col("doc_id"),
        TextFunctions.langId(col("text")).as("detected"),
        TextFunctions.langScore(col("text"), TextFunctions.LangProfiles.toMap.apply("en")).as("en_score"))
      .orderBy(col("doc_id"))
  }

  val t02_sql: String = {
    def prof(lang: String): String =
      TextFunctions.LangProfiles.toMap.apply(lang).map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id,
       |         list_distinct(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')) AS toks
       |  FROM documents
       |),
       |sc AS (
       |  SELECT doc_id,
       |         CAST(len(list_intersect(toks, ${prof("de")})) AS INT) AS s_de,
       |         CAST(len(list_intersect(toks, ${prof("en")})) AS INT) AS s_en,
       |         CAST(len(list_intersect(toks, ${prof("es")})) AS INT) AS s_es,
       |         CAST(len(list_intersect(toks, ${prof("fr")})) AS INT) AS s_fr
       |  FROM t
       |)
       |SELECT doc_id,
       |       CASE WHEN GREATEST(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
       |            WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
       |            WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
       |            WHEN s_es >= s_fr THEN 'es'
       |            ELSE 'fr' END AS detected,
       |       s_en AS en_score
       |FROM sc
       |ORDER BY doc_id""".stripMargin
  }

  /** Winnowed fingerprints via the custom Catalyst expression —
    * near-dup docs share fingerprint members. The k-gram hash is the
    * md5-60-bit construction (engine-portable, like SimHash's token
    * hash), so the oracle replays the ENTIRE algorithm — gram hashing,
    * window minima, distinct-sort — in SQL and the hash values
    * themselves sit under the gate.
    */
  val t03_fingerprint: Q = (s, dir) => {
    val fp = WinnowedFingerprint(col("text"), k = 8, w = 4)
    dupDocCorpus(s, dir)
      .select(col("doc_id"), fp.as("fp"))
      .select(col("doc_id"), size(col("fp")).as("n_fingerprints"),
        element_at(col("fp"), 1).as("min_fp"))
      .orderBy(col("doc_id"))
  }

  /** Full winnowing replay: k-gram md5-60 hashes per char position
    * (substr clamps the tail gram exactly like the kernel when
    * n ≤ k), then the min of each w-window of gram hashes, distinct +
    * sorted. `GREATEST(..., 0) + 2` reproduces the kernel's
    * `max(n - k + 1, 1)` gram count and `max(m - w + 1, 1)` window
    * count (range upper bounds are exclusive).
    */
  val t03_sql: String =
    s"""WITH $DupDocCorpusSql,
       |grams AS (
       |  SELECT doc_id,
       |    CASE WHEN length(text) = 0 THEN []
       |         ELSE list_transform(range(1, GREATEST(length(text) - 8, 0) + 2),
       |           i -> CAST(('0x' || substr(md5(substr(text, i, 8)), 1, 15)) AS BIGINT)) END AS hs
       |  FROM corpus
       |),
       |fps AS (
       |  SELECT doc_id,
       |    list_sort(list_distinct(list_transform(
       |      range(1, GREATEST(length(hs) - 4, 0) + 2),
       |      s -> list_min(list_slice(hs, s, s + 3))))) AS fp
       |  FROM grams
       |)
       |SELECT doc_id, CAST(length(fp) AS INT) AS n_fingerprints, fp[1] AS min_fp
       |FROM fps
       |ORDER BY doc_id""".stripMargin

  /** MOSS-style fingerprint near-dup pairs (char-level modality — the
    * 'zz'-prefixed planted near-dups share almost all fingerprints even
    * where word tokenization shifts). The oracle replays winnowing via
    * t03's CTE, then the same inverted-index count.
    */
  val d21_fingerprint_pairs: Q = (s, dir) => {
    TextDedup.fingerprintPairs(dupDocCorpus(s, dir), "doc_id", "text",
        k = 8, w = 4, minShared = 5)
      .orderBy(col("id_a"), col("id_b"))
  }

  val d21_sql: String =
    s"""WITH $DupDocCorpusSql,
       |grams AS (
       |  SELECT doc_id,
       |    CASE WHEN length(text) = 0 THEN []
       |         ELSE list_transform(range(1, GREATEST(length(text) - 8, 0) + 2),
       |           i -> CAST(('0x' || substr(md5(substr(text, i, 8)), 1, 15)) AS BIGINT)) END AS hs
       |  FROM corpus
       |),
       |fps AS (
       |  SELECT doc_id,
       |    list_sort(list_distinct(list_transform(
       |      range(1, GREATEST(length(hs) - 4, 0) + 2),
       |      s -> list_min(list_slice(hs, s, s + 3))))) AS fp
       |  FROM grams
       |),
       |fpx AS (SELECT doc_id, unnest(fp) AS fp FROM fps),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS shared_fps
       |  FROM fpx a JOIN fpx b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT id_a, id_b, shared_fps FROM pairs
       |WHERE shared_fps >= 5
       |ORDER BY id_a, id_b""".stripMargin

  /** d21 with MOSS boilerplate suppression (maxDf = 64): fingerprints
    * held by more than 64 documents are template noise, not copying
    * evidence, and their posting lists are what turns the inverted-
    * index self-join quadratic on replicated corpora (the sf1 growth
    * sweep measured one corpus-wide hot fingerprint driving d21's join
    * from seconds to minutes — df² on a key whose df scales with the
    * corpus). The cap bounds every key's candidate contribution at
    * maxDf², making the join Σ min(df, maxDf)² ≤ maxDf · total_fps —
    * linear in the corpus. The oracle replays the suppression exactly
    * (HAVING count(*) <= 64 on the fingerprint relation), so this is a
    * different DECLARED semantic, not an approximation gate.
    */
  val d56_fingerprint_capped: Q = (s, dir) => {
    TextDedup.fingerprintPairs(dupDocCorpus(s, dir), "doc_id", "text",
        k = 8, w = 4, minShared = 5, maxDf = 64)
      .orderBy(col("id_a"), col("id_b"))
  }

  val d56_sql: String =
    s"""WITH $DupDocCorpusSql,
       |grams AS (
       |  SELECT doc_id,
       |    CASE WHEN length(text) = 0 THEN []
       |         ELSE list_transform(range(1, GREATEST(length(text) - 8, 0) + 2),
       |           i -> CAST(('0x' || substr(md5(substr(text, i, 8)), 1, 15)) AS BIGINT)) END AS hs
       |  FROM corpus
       |),
       |fps AS (
       |  SELECT doc_id,
       |    list_sort(list_distinct(list_transform(
       |      range(1, GREATEST(length(hs) - 4, 0) + 2),
       |      s -> list_min(list_slice(hs, s, s + 3))))) AS fp
       |  FROM grams
       |),
       |fpx AS (SELECT doc_id, unnest(fp) AS fp FROM fps),
       |keep AS (SELECT fp FROM fpx GROUP BY fp HAVING COUNT(*) <= 64),
       |fpk AS (SELECT f.doc_id, f.fp FROM fpx f JOIN keep k USING (fp)),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS shared_fps
       |  FROM fpk a JOIN fpk b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT id_a, id_b, shared_fps FROM pairs
       |WHERE shared_fps >= 5
       |ORDER BY id_a, id_b""".stripMargin

  /** Directed fingerprint containment at scale: prefix-filtered
    * candidates (rarest ⌊(1−t)·n⌋+1 fingerprints by document frequency
    * — see [[TextDedup.fingerprintContainmentPrefix]]) with exact
    * |src∩dst|/|src| verification on candidates only. The prefix
    * filter is lossless, so the oracle replays the EXACT inverted-index
    * containment — the prefix path must reproduce it bit-for-bit.
    * (The absolute-count sibling d21 deliberately has no prefix query:
    * its pigeonhole prefix is the whole fingerprint set — the
    * fractional threshold is what makes the filter prune.)
    *
    * k = 16 (not d21's 8): measured on this corpus, 8-char windows over
    * the synthetic vocabulary yield only ~7k distinct fingerprint
    * values (median df 22, Σdf² = 275M at sf0.1) — chance sharing, not
    * content sharing, so EVERY doc pair becomes a candidate and no
    * filter can prune. At 16 chars fingerprints are doc-specific
    * (260k distinct, avg df 2.6, Σdf² = 5.9M) and candidates collapse
    * to true near-dups — gram width is the selectivity knob for
    * char-level dedup, exactly like shingle n for word-level.
    */
  val d23_fingerprint_prefix: Q = (s, dir) => {
    TextDedup.fingerprintContainmentPrefix(dupDocCorpus(s, dir), "doc_id", "text",
        k = 16, w = 4, threshold = 0.8)
      .orderBy(col("id_src"), col("id_dst"))
  }

  val d23_sql: String =
    s"""WITH $DupDocCorpusSql,
       |grams AS (
       |  SELECT doc_id,
       |    CASE WHEN length(text) = 0 THEN []
       |         ELSE list_transform(range(1, GREATEST(length(text) - 16, 0) + 2),
       |           i -> CAST(('0x' || substr(md5(substr(text, i, 16)), 1, 15)) AS BIGINT)) END AS hs
       |  FROM corpus
       |),
       |fps AS (
       |  SELECT doc_id,
       |    list_sort(list_distinct(list_transform(
       |      range(1, GREATEST(length(hs) - 4, 0) + 2),
       |      s -> list_min(list_slice(hs, s, s + 3))))) AS fp
       |  FROM grams
       |),
       |fpx AS (SELECT doc_id, unnest(fp) AS fp FROM fps),
       |sizes AS (SELECT doc_id, len(fp) AS n_fp FROM fps WHERE len(fp) > 0),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_inter
       |  FROM fpx a JOIN fpx b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |),
       |directed AS (
       |  SELECT i.id_a AS id_src, i.id_b AS id_dst,
       |         CAST(i.n_inter AS DOUBLE) / sa.n_fp AS containment
       |  FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
       |  UNION ALL
       |  SELECT i.id_b, i.id_a,
       |         CAST(i.n_inter AS DOUBLE) / sb.n_fp
       |  FROM inter i JOIN sizes sb ON sb.doc_id = i.id_b
       |)
       |SELECT id_src, id_dst, containment FROM directed
       |WHERE containment >= 0.8
       |ORDER BY id_src, id_dst""".stripMargin

  // ── corpus curation ─────────────────────────────────────────────────

  /** Benchmark decontamination: docs with `doc_id % 37 = 0` play the
    * eval suite; the pool is the planted corpus minus the eval docs
    * themselves. Planted copies of eval docs are the contamination the
    * report must find (8-word grams — chance collisions between
    * independent docs are ~(1/V)⁸, vanishing). Eval grams broadcast;
    * the corpus is never shuffled before the matched-rows-only agg.
    */
  val d07_decontaminate: Q = (s, dir) => {
    val evalSet = Tables(s, dir, "documents")
      .filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text"))
    val pool = dupDocCorpus(s, dir)
      .join(broadcast(evalSet.select(col("doc_id").as("__eid"))),
        col("doc_id") === col("__eid"), "left_anti")
    Decontaminate.report(pool, evalSet, "doc_id", "text", n = 8)
      .orderBy(col("doc_id"))
  }

  /** The eval-centric transpose of d07 ([[Decontaminate.evalOverlap]]):
    * per EVAL document, the fraction of its 8-grams found anywhere in
    * the training pool — the memorization-risk report. Planted copies
    * of eval docs give 100% overlap rows; organic eval docs sit near 0.
    * Same broadcast/scan shape as d07; zero-overlap eval docs survive
    * via the left join from the per-eval totals.
    */
  val d33_eval_overlap: Q = (s, dir) => {
    val evalSet = Tables(s, dir, "documents")
      .filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text"))
    val pool = dupDocCorpus(s, dir)
      .join(broadcast(evalSet.select(col("doc_id").as("__eid"))),
        col("doc_id") === col("__eid"), "left_anti")
    Decontaminate.evalOverlap(pool, evalSet, "doc_id", "text", n = 8)
      .orderBy(col("doc_id"))
  }

  /** 8-gram shingles with wordNgrams' short-doc convention, as a SQL
    * select body over (doc_id, text) relation `src`.
    */
  private def gramsSql(src: String, n: Int): String =
    s"""SELECT doc_id AS id, unnest(grams) AS shingle FROM (
       |    SELECT doc_id,
       |           CASE WHEN len(toks) = 0 THEN []
       |                ELSE list_distinct(list_transform(range(0, GREATEST(len(toks) - $n, 0) + 1),
       |                  i -> array_to_string(toks[i + 1 : i + $n], ' '))) END AS grams
       |    FROM (SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS toks
       |          FROM $src) t
       |  ) g""".stripMargin

  val d07_sql: String =
    s"""WITH $DupDocCorpusSql,
       |evaldocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 37 = 0),
       |pool AS (SELECT doc_id, text FROM corpus
       |         WHERE doc_id NOT IN (SELECT doc_id FROM evaldocs)),
       |pgrams AS (
       |  ${gramsSql("pool", 8)}
       |),
       |egrams AS (
       |  SELECT DISTINCT id AS eval_id, shingle FROM (${gramsSql("evaldocs", 8)}) e
       |)
       |SELECT p.id AS doc_id,
       |       COUNT(DISTINCT p.shingle) AS matched_grams,
       |       COUNT(DISTINCT e.eval_id) AS matched_eval_docs
       |FROM pgrams p JOIN egrams e ON p.shingle = e.shingle
       |GROUP BY p.id
       |ORDER BY doc_id""".stripMargin

  val d33_sql: String =
    s"""WITH $DupDocCorpusSql,
       |evaldocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 37 = 0),
       |pool AS (SELECT doc_id, text FROM corpus
       |         WHERE doc_id NOT IN (SELECT doc_id FROM evaldocs)),
       |egrams AS (
       |  SELECT DISTINCT id AS eval_id, shingle FROM (${gramsSql("evaldocs", 8)}) e
       |),
       |totals AS (
       |  SELECT eval_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM egrams GROUP BY eval_id
       |),
       |pgrams AS (
       |  ${gramsSql("pool", 8)}
       |),
       |hits AS (
       |  SELECT e.eval_id, CAST(COUNT(DISTINCT e.shingle) AS BIGINT) AS n_hit
       |  FROM pgrams p JOIN egrams e ON e.shingle = p.shingle
       |  GROUP BY e.eval_id
       |)
       |SELECT t.eval_id AS doc_id, t.n_grams,
       |       COALESCE(h.n_hit, 0) AS n_hit,
       |       100 * COALESCE(h.n_hit, 0) // t.n_grams AS overlap_pct
       |FROM totals t LEFT JOIN hits h ON h.eval_id = t.eval_id
       |ORDER BY doc_id""".stripMargin

  /** Incremental ingestion dedup: the planted copies arrive as a NEW
    * BATCH against the original documents as the already-ingested store
    * with a precomputed band index. Output: which incoming docs
    * duplicate something already in the corpus, with exact Jaccard.
    * The oracle replays the exact batch×store Jaccard join — LSH
    * banding at 128/32 loses < 5e-8 of pairs at j ≥ 0.8, the same
    * parity argument as d03.
    */
  val d09_incremental_dedup: Q = (s, dir) => {
    val store = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val batch = store.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
      .unionAll(store.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 2000000000L).as("doc_id"),
          concat(lit("zz"), expr("substring(text, 3)")).as("text")))
      .repartition(s.sparkContext.defaultParallelism)
    val storeIndex = IncrementalDedup.bandIndex(
      store.repartition(s.sparkContext.defaultParallelism), "doc_id", "text")
    IncrementalDedup.dedupAgainst(storeIndex, store, batch, "doc_id", "text")
      .orderBy(col("batch_id"), col("store_id"))
  }

  val d09_sql: String =
    s"""WITH batch AS (
       |  SELECT doc_id + 1000000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
       |  UNION ALL
       |  SELECT doc_id + 2000000000, 'zz' || substr(text, 3) FROM documents WHERE doc_id % 10 = 5
       |),
       |bsh AS (
       |  ${gramsSql("batch", 3)}
       |),
       |ssh AS (
       |  ${gramsSql("documents", 3)}
       |),
       |bsz AS (SELECT id, COUNT(*) AS n_b FROM bsh GROUP BY id),
       |ssz AS (SELECT id, COUNT(*) AS n_s FROM ssh GROUP BY id),
       |inter AS (
       |  SELECT b.id AS batch_id, s.id AS store_id, COUNT(*) AS n_inter
       |  FROM bsh b JOIN ssh s ON b.shingle = s.shingle
       |  GROUP BY b.id, s.id
       |)
       |SELECT i.batch_id, i.store_id,
       |       CAST(i.n_inter AS DOUBLE) / (bsz.n_b + ssz.n_s - i.n_inter) AS jaccard
       |FROM inter i
       |JOIN bsz ON bsz.id = i.batch_id
       |JOIN ssz ON ssz.id = i.store_id
       |WHERE CAST(i.n_inter AS DOUBLE) / (bsz.n_b + ssz.n_s - i.n_inter) >= 0.8
       |ORDER BY batch_id, store_id""".stripMargin

  /** The full curation pipeline as one run — what a training-data team
    * actually executes nightly: exact dedup → near-dup group
    * resolution (LSH + connected components) → benchmark
    * decontamination → repetition quality gate, each stage evaluated
    * on the previous stage's survivors. Output labels EVERY corpus doc
    * with the stage that dropped it ('kept' if none) — the auditable
    * artifact, not just the surviving subset. Eval docs are external
    * (excluded from the corpus), so planted copies of them reach the
    * decontamination stage alive and must be caught there.
    */
  val d10_curation_pipeline: Q = (s, dir) => {
    val evalSet = Tables(s, dir, "documents")
      .filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text"))
    val corpus = dupDocCorpus(s, dir)
      .join(broadcast(evalSet.select(col("doc_id").as("__eid"))),
        col("doc_id") === col("__eid"), "left_anti")
      .localCheckpoint() // read once: feeds s1 AND the final labeling join
    // cut the lineage after the md5-window shuffle — s1docs feeds four
    // subtrees (LSH, CC corpus, decontamination, quality gate) across
    // independent jobs, which would otherwise each re-run exact dedup
    val s1docs = TextDedup.exact(corpus, "doc_id", "text").localCheckpoint()
    val pairs = TextDedup.minhashLshPairs(s1docs, "doc_id", "text",
      n = 3, numHashes = 128, bands = 32, threshold = 0.8)
    val comps = ConnectedComponents.dedupGroups(s1docs, pairs, "doc_id")
    // AQE coalesces the tiny semi-join output to one partition; spread
    // it back out before the expression-heavy gram stages
    val s2docs = s1docs.join(
        comps.filter(col("is_survivor")).select("doc_id"), Seq("doc_id"), "left_semi")
      .repartition(s.sparkContext.defaultParallelism)
    // contam/lowq are tiny id lists each referenced twice (stage filter
    // + final labeling) with an expensive gram-join lineage — cut them
    val contam = Decontaminate.report(s2docs, evalSet, "doc_id", "text", n = 8)
      .select("doc_id").localCheckpoint()
    val s3docs = s2docs.join(broadcast(contam), Seq("doc_id"), "left_anti")
    val lowq = TextDedup.gramStats(s3docs, "doc_id", "text", n = 2)
      .filter(!((col("n_grams") - col("n_distinct_grams")) * 10 <= col("n_grams")))
      .select(col("id").as("doc_id"))
      .localCheckpoint()
    corpus.select(col("doc_id"))
      .join(s1docs.select(col("doc_id"), lit(true).as("__s1")), Seq("doc_id"), "left")
      .join(comps.select(col("doc_id"), col("is_survivor").as("__s2")), Seq("doc_id"), "left")
      .join(broadcast(contam.withColumn("__c", lit(true))), Seq("doc_id"), "left")
      .join(broadcast(lowq.withColumn("__lq", lit(true))), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__s1").isNull, "exact_dup")
          .when(!col("__s2"), "near_dup")
          .when(col("__c").isNotNull && col("__c"), "contaminated")
          .when(col("__lq").isNotNull && col("__lq"), "low_quality")
          .otherwise("kept").as("stage"))
      .orderBy(col("doc_id"))
  }

  val d10_sql: String =
    s"""WITH RECURSIVE $DupDocCorpusSql,
       |evaldocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 37 = 0),
       |pool0 AS (SELECT doc_id, text FROM corpus
       |          WHERE doc_id NOT IN (SELECT doc_id FROM evaldocs)),
       |s1surv AS (SELECT MIN(doc_id) AS doc_id FROM pool0 GROUP BY md5(text)),
       |s1docs AS (SELECT p.doc_id, p.text FROM pool0 p JOIN s1surv USING (doc_id)),
       |shingles AS (
       |  ${gramsSql("s1docs", 3)}
       |),
       |$JaccardCtesSql,
       |edges AS (SELECT id_a AS a, id_b AS b FROM pairs WHERE jaccard >= 0.8),
       |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
       |reach(id, r) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM sym) t
       |  UNION
       |  SELECT s.a, r.r FROM sym s JOIN reach r ON r.id = s.b
       |),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
       |s2docs AS (
       |  SELECT d.doc_id, d.text FROM s1docs d
       |  LEFT JOIN comp ON comp.id = d.doc_id
       |  WHERE COALESCE(comp.component, d.doc_id) = d.doc_id
       |),
       |pgrams AS (
       |  ${gramsSql("s2docs", 8)}
       |),
       |egrams AS (
       |  SELECT DISTINCT shingle FROM (${gramsSql("evaldocs", 8)}) e
       |),
       |contam AS (SELECT DISTINCT id AS doc_id FROM pgrams JOIN egrams USING (shingle)),
       |s3docs AS (SELECT doc_id, text FROM s2docs
       |           WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
       |rep AS (
       |  SELECT doc_id,
       |         CASE WHEN len(toks) = 0 THEN 0
       |              ELSE GREATEST(len(toks) - 2, 0) + 1 END AS n_2g,
       |         CASE WHEN len(toks) = 0 THEN 0
       |              ELSE len(list_distinct(list_transform(range(0, GREATEST(len(toks) - 2, 0) + 1),
       |                i -> array_to_string(toks[i + 1 : i + 2], ' ')))) END AS d_2g
       |  FROM (SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS toks
       |        FROM s3docs) t
       |),
       |lowq AS (SELECT doc_id FROM rep WHERE (n_2g - d_2g) * 10 > n_2g)
       |SELECT p.doc_id,
       |       CASE
       |         WHEN p.doc_id NOT IN (SELECT doc_id FROM s1surv) THEN 'exact_dup'
       |         WHEN p.doc_id NOT IN (SELECT doc_id FROM s2docs) THEN 'near_dup'
       |         WHEN p.doc_id IN (SELECT doc_id FROM contam) THEN 'contaminated'
       |         WHEN p.doc_id IN (SELECT doc_id FROM lowq) THEN 'low_quality'
       |         ELSE 'kept'
       |       END AS stage
       |FROM pool0 p
       |ORDER BY p.doc_id""".stripMargin

  /** Deterministic stratified sampling: even-numbered sources at 10%,
    * odd at 30%, membership a pure md5 function of doc_id — identical
    * row set on any engine, partitioning, or rerun. One narrow
    * codegen'd filter: the 100 TB path has no shuffle at all.
    */
  val d08_stratified_sample: Q = (s, dir) => {
    val rate = when(
      col("source").substr(lit(4), lit(8)).cast(IntegerType) % 2 === 0, 10)
      .otherwise(30)
    Sampling.stratifiedSample(Tables(s, dir, "documents"), "doc_id", rate)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  val d08_sql: String =
    """SELECT doc_id, source FROM documents
      |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100
      |      < CASE WHEN CAST(substr(source, 4, 8) AS INT) % 2 = 0 THEN 10 ELSE 30 END
      |ORDER BY doc_id""".stripMargin

  /** Gopher-style repetition gate: per-doc token/2-gram duplication
    * counts and a keep flag (≤10% duplicate 2-grams). The flag compares
    * integers — no FP boundary can flip it cross-engine.
    */
  val t04_repetition: Q = (s, dir) => {
    val text = col("text")
    val d = Tables(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
    val stats = TextDedup.gramStats(d, "doc_id", "text", n = 2)
      .withColumnRenamed("id", "doc_id")
    val n2 = coalesce(col("n_grams"), lit(0L))
    val d2 = coalesce(col("n_distinct_grams"), lit(0L))
    d.select(col("doc_id"),
        TextFunctions.tokenCount(text).as("n_tokens"),
        size(TextFunctions.tokenSet(text)).as("n_distinct_tokens"))
      .join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
        n2.cast(IntegerType).as("n_2grams"),
        d2.cast(IntegerType).as("n_distinct_2grams"),
        ((n2 - d2) * 10 <= n2).as("keep"))
      .orderBy(col("doc_id"))
  }

  val t04_sql: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS toks FROM documents
      |),
      |g AS (
      |  SELECT doc_id,
      |         CAST(len(toks) AS INT) AS n_tokens,
      |         CAST(len(list_distinct(toks)) AS INT) AS n_distinct_tokens,
      |         CAST(CASE WHEN len(toks) = 0 THEN 0
      |              ELSE GREATEST(len(toks) - 2, 0) + 1 END AS INT) AS n_2grams,
      |         CAST(CASE WHEN len(toks) = 0 THEN 0
      |              ELSE len(list_distinct(list_transform(range(0, GREATEST(len(toks) - 2, 0) + 1),
      |                i -> array_to_string(toks[i + 1 : i + 2], ' ')))) END AS INT) AS n_distinct_2grams
      |  FROM t
      |)
      |SELECT doc_id, n_tokens, n_distinct_tokens, n_2grams, n_distinct_2grams,
      |       (n_2grams - n_distinct_2grams) * 10 <= n_2grams AS keep
      |FROM g
      |ORDER BY doc_id""".stripMargin

  /** Per-(source, lang) corpus report: doc counts, char/token volume,
    * distinct contents — the nightly corpus-composition dashboard. One
    * map-side-combined aggregation; all-integer outputs.
    */
  val t06_corpus_report: Q = (s, dir) => {
    Tables(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("source"), col("lang"), col("n_chars"),
        TextFunctions.tokenCount(col("text")).as("__nt"),
        md5(col("text")).as("__h"))
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("__nt").cast(LongType)).as("total_tokens"),
        countDistinct(col("__h")).as("distinct_contents"))
      .orderBy(col("source"), col("lang"))
  }

  val t06_sql: String =
    """SELECT source, lang,
      |       COUNT(*) AS n_docs,
      |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |       CAST(SUM(len(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> ''))) AS BIGINT) AS total_tokens,
      |       COUNT(DISTINCT md5(text)) AS distinct_contents
      |FROM documents
      |GROUP BY source, lang
      |ORDER BY source, lang""".stripMargin

  /** Corpus-wide 2-gram frequency top-100 (heavy hitters): explode →
    * map-side-combined count → TakeOrderedAndProject. Total order
    * (count DESC, gram) makes the limit boundary deterministic.
    */
  val t05_gram_topk: Q = (s, dir) => {
    Tables(s, dir, "documents")
      // single small parquet → 1 input partition; spread the explode
      // (the expensive step) across cores. Real corpora arrive with
      // ≥ parallelism partitions and skip this.
      .repartition(s.sparkContext.defaultParallelism)
      .select(TextFunctions.tokens(col("text")).as("__toks"))
      .select(explode(TextFunctions.gramsOfTokens(col("__toks"), 2)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("occurrences"))
      .orderBy(col("occurrences").desc, col("gram"))
      .limit(100)
  }

  val t05_sql: String =
    """WITH t AS (
      |  SELECT list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS toks FROM documents
      |),
      |g AS (
      |  SELECT unnest(CASE WHEN len(toks) = 0 THEN []
      |           ELSE list_transform(range(0, GREATEST(len(toks) - 2, 0) + 1),
      |             i -> array_to_string(toks[i + 1 : i + 2], ' ')) END) AS gram
      |  FROM t
      |)
      |SELECT gram, COUNT(*) AS occurrences FROM g
      |GROUP BY gram
      |ORDER BY occurrences DESC, gram
      |LIMIT 100""".stripMargin

  // ── multimodal ──────────────────────────────────────────────────────

  /** Multimodal plumbing: text bytes wrapped as media payloads, features
    * extracted per-partition in batches through the typed Dataset path.
    * The decode step is a deterministic stub (no codecs in-container) with
    * arithmetic the oracle mirrors; checksum (not SQL-portable) is
    * excluded here and covered by unit tests.
    */
  val m01_multimodal_features: Q = (s, dir) => {
    val media = Multimodal.syntheticMedia(
      Tables(s, dir, "documents"), "doc_id", "text", "source")
    Multimodal.processBatches(media).toDF()
      .select(col("media_id"), col("kind"), col("byte_size"),
        col("width"), col("height"), col("channels"), col("duration_ms"))
      .orderBy(col("media_id"))
  }

  /** Video near-dup over the planted corpus as all-video payloads:
    * pairs agreeing on ≥ 4 same-position frame signatures (32-byte
    * stub "frames", ≤ 8 per video). Exact copies share every frame;
    * 'zz'-perturbed near copies share all but frame 0. The oracle
    * replays the identical byte windows over the text (ASCII ⇒ byte
    * and char windows coincide).
    */
  val m02_video_neardup: Q = (s, dir) => {
    import s.implicits._
    val media = dupDocCorpus(s, dir).select(
        col("doc_id").cast(LongType).as("media_id"),
        lit("video").as("kind"),
        encode(col("text"), "UTF-8").as("content"),
        lit("corpus").as("source"))
      .as[Multimodal.MediaRecord]
    Multimodal.videoNearDupPairs(media, stride = 32, maxFrames = 8, minShared = 4)
      .orderBy(col("id_a"), col("id_b"))
  }

  val m02_sql: String =
    s"""WITH $DupDocCorpusSql,
       |frames AS (
       |  SELECT doc_id, f.frame_no,
       |         md5(substr(text, f.frame_no * 32 + 1, 32)) AS sig
       |  FROM corpus, (SELECT unnest(range(0, 8)) AS frame_no) f
       |  WHERE f.frame_no * 32 < length(text)
       |),
       |nf AS (SELECT doc_id, COUNT(*) AS n FROM frames GROUP BY doc_id),
       |p AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_frames
       |  FROM frames a JOIN frames b
       |    ON a.frame_no = b.frame_no AND a.sig = b.sig AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id
       |)
       |SELECT p.id_a, p.id_b, p.shared_frames
       |FROM p
       |JOIN nf na ON na.doc_id = p.id_a
       |JOIN nf nb ON nb.doc_id = p.id_b
       |WHERE p.shared_frames >= LEAST(4, na.n, nb.n)
       |ORDER BY id_a, id_b""".stripMargin

  /** Image near-dup over the planted corpus as all-image payloads:
    * pairs within hamming 3 of their 60-bit perceptual hashes (16-byte
    * block features). Exact copies hash identically; 'zz'-perturbed
    * copies can flip only block 0's bit. The oracle replays the block
    * arithmetic over the text (ASCII ⇒ byte and char windows coincide)
    * and verifies with an all-pairs popcount — the Spark side must
    * produce identical pairs from banded chunk collisions only.
    */
  val m03_image_neardup: Q = (s, dir) => {
    import s.implicits._
    val media = dupDocCorpus(s, dir).select(
        col("doc_id").cast(LongType).as("media_id"),
        lit("image").as("kind"),
        encode(col("text"), "UTF-8").as("content"),
        lit("corpus").as("source"))
      .as[Multimodal.MediaRecord]
    Multimodal.imageNearDupPairs(media, blockBytes = 16, maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  val m03_sql: String =
    s"""WITH $DupDocCorpusSql,
       |blocks AS (
       |  SELECT doc_id, b.b AS block,
       |         CASE WHEN CAST(('0x' || substr(md5(substr(text, b.b * 16 + 1, 16)), 1, 1)) AS INT) >= 8
       |              THEN 1 ELSE 0 END AS bit
       |  FROM corpus, (SELECT unnest(range(0, 60)) AS b) b
       |  WHERE b.b * 16 < length(text)
       |),
       |hashes AS (
       |  SELECT doc_id,
       |         CAST(SUM(bit * (CAST(1 AS BIGINT) << block)) AS BIGINT) AS h
       |  FROM blocks GROUP BY doc_id
       |)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
       |FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.h, b.h)) <= 3
       |ORDER BY id_a, id_b""".stripMargin

  /** Audio near-dup over the planted corpus as all-audio payloads:
    * shift-invariant landmark alignment ([[Multimodal.audioNearDupPairs]])
    * — 32-byte stub fingerprint windows every 16 bytes (≤ 16 per clip),
    * pairs needing ≥ 4 signature matches at one consistent window
    * delta. Exact copies align at delta 0 on every window; the df ≤ 64
    * landmark cap (the silence-skew guard) is far above the planted
    * dup-group sizes, so it drops nothing here — the oracle replays the
    * cap anyway so the rule itself is gated. ASCII corpus ⇒ byte and
    * char windows coincide (the m02/m03 convention).
    */
  val m04_audio_neardup: Q = (s, dir) => {
    import s.implicits._
    val media = dupDocCorpus(s, dir).select(
        col("doc_id").cast(LongType).as("media_id"),
        lit("audio").as("kind"),
        encode(col("text"), "UTF-8").as("content"),
        lit("corpus").as("source"))
      .as[Multimodal.MediaRecord]
    Multimodal.audioNearDupPairs(media, windowBytes = 32, hop = 16,
        maxWins = 16, minAligned = 4, maxSigDf = 64)
      .orderBy(col("id_a"), col("id_b"))
  }

  val m04_sql: String =
    s"""WITH $DupDocCorpusSql,
       |wins AS (
       |  SELECT doc_id, w.w AS win_no,
       |         md5(substr(text, w.w * 16 + 1, 32)) AS sig
       |  FROM corpus, (SELECT unnest(range(0, 16)) AS w) w
       |  WHERE w.w * 16 < length(text)
       |),
       |dfreq AS (SELECT sig, COUNT(*) AS df FROM wins GROUP BY sig),
       |fw AS (
       |  SELECT w.doc_id, w.win_no, w.sig
       |  FROM wins w JOIN dfreq USING (sig) WHERE dfreq.df <= 64
       |),
       |nw AS (SELECT doc_id, COUNT(*) AS n FROM fw GROUP BY doc_id),
       |m AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |         a.win_no - b.win_no AS delta, COUNT(*) AS aligned
       |  FROM fw a JOIN fw b ON a.sig = b.sig AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3
       |),
       |best AS (
       |  SELECT id_a, id_b, delta, aligned,
       |         ROW_NUMBER() OVER (PARTITION BY id_a, id_b
       |                            ORDER BY aligned DESC, delta ASC) AS rn
       |  FROM m
       |)
       |SELECT b.id_a, b.id_b, CAST(b.delta AS INT) AS offset_delta,
       |       CAST(b.aligned AS BIGINT) AS aligned_matches
       |FROM best b
       |JOIN nw na ON na.doc_id = b.id_a
       |JOIN nw nb ON nb.doc_id = b.id_b
       |WHERE b.rn = 1 AND b.aligned >= LEAST(4, na.n, nb.n)
       |ORDER BY id_a, id_b""".stripMargin

  /** REAL media bytes end-to-end (r12 verdict item 3): every row's
    * payload is an actual 24-bit BMP — header, bottom-up padded rows,
    * BGR channels — built by [[Multimodal.encodeBmp]] from a
    * deterministic per-id pixel formula, then DECODED BACK by the real
    * [[Multimodal.BmpCodec]] through the same partition-batched
    * `processBatches` path m01 drives with the stub. The features are
    * decoded-pixel arithmetic: geometry from the parsed header,
    * byte_size pinning the padding math, and a position-weighted pixel
    * checksum that changes if the decoder misreads row order, padding,
    * or channel order. The oracle replays the pixel formula directly
    * in SQL — the Spark side must round-trip the formula through real
    * container bytes to match it.
    */
  val m05_bmp_decode: Q = (s, dir) => {
    val media = Multimodal.bmpMedia(
      Tables(s, dir, "documents").select(col("doc_id")), "doc_id")
    Multimodal.processBatches(media, codec = Multimodal.BmpCodec).toDF()
      .select(col("media_id"), col("width"), col("height"),
        col("byte_size"), col("checksum").as("pix_checksum"))
      .orderBy(col("media_id"))
  }

  val m05_sql: String =
    """WITH d AS (
      |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
      |),
      |px AS (
      |  SELECT d.doc_id, d.w, d.h, x.x, y.y,
      |         (7*d.doc_id + 3*x.x + 11*y.y) % 256 AS r,
      |         (13*d.doc_id + 5*x.x + 2*y.y) % 256 AS g,
      |         (3*d.doc_id + x.x + 17*y.y) % 256 AS b
      |  FROM d,
      |       (SELECT unnest(range(0, 8)) AS x) x,
      |       (SELECT unnest(range(0, 6)) AS y) y
      |  WHERE x.x < d.w AND y.y < d.h
      |)
      |SELECT doc_id AS media_id,
      |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |  CAST(54 + h * ((3*w + 3) // 4) * 4 AS BIGINT) AS byte_size,
      |  CAST(SUM((r + 2*g + 3*b) * (1 + x + y*w)) AS BIGINT) AS pix_checksum
      |FROM px
      |GROUP BY doc_id, w, h
      |ORDER BY media_id""".stripMargin

  /** The COMPRESSED image path end-to-end — m05's contract through a
    * container whose pixel bytes do not exist in the payload: every
    * record is an actual PNG (zlib-deflated, CRC-chunked,
    * filter-predicted scanlines), decoded by the real
    * [[Multimodal.decodePng]] — JDK-Inflater inflation with an exact
    * length contract, CRC verification on every chunk, and byte-exact
    * inversion of all five scanline filters, which CYCLE per row
    * across the corpus so each inversion is load-bearing (a reader
    * mis-inverting Paeth or Average fails the hash on most images). A
    * third of the corpus splits the zlib stream across three IDAT
    * chunks; another third carries an ancillary tEXt chunk before the
    * image data. Features are decoded-pixel arithmetic ONLY (the same
    * position-weighted checksum as m05 — byte_size is deliberately
    * absent: deflate output is container-internal, not oracle
    * surface); the oracle replays the pixel formula, so any misparse
    * anywhere in the CRC→inflate→unfilter chain breaks the hash.
    */
  val m15_png_decode: Q = (s, dir) => {
    val media = Multimodal.pngMedia(
      Tables(s, dir, "documents").select(col("doc_id")), "doc_id")
    Multimodal.processBatches(media, codec = Multimodal.PngCodec).toDF()
      .select(col("media_id"), col("width"), col("height"),
        col("checksum").as("pix_checksum"))
      .orderBy(col("media_id"))
  }

  val m15_sql: String =
    """WITH d AS (
      |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
      |),
      |px AS (
      |  SELECT d.doc_id, d.w, d.h, x.x, y.y,
      |         (7*d.doc_id + 3*x.x + 11*y.y) % 256 AS r,
      |         (13*d.doc_id + 5*x.x + 2*y.y) % 256 AS g,
      |         (3*d.doc_id + x.x + 17*y.y) % 256 AS b
      |  FROM d,
      |       (SELECT unnest(range(0, 8)) AS x) x,
      |       (SELECT unnest(range(0, 6)) AS y) y
      |  WHERE x.x < d.w AND y.y < d.h
      |)
      |SELECT doc_id AS media_id,
      |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |  CAST(SUM((r + 2*g + 3*b) * (1 + x + y*w)) AS BIGINT) AS pix_checksum
      |FROM px
      |GROUP BY doc_id, w, h
      |ORDER BY media_id""".stripMargin

  /** Mixed-encoding audio decode — the SECOND real audio encoding,
    * G.711 μ-law (the telephony codec), dispatched inside one RIFF
    * walk: half the corpus is 16-bit PCM (m06's formula), half is
    * 8-bit μ-law codes expanded through the exact ITU integer
    * arithmetic ([[Multimodal.mulawDecode]]: invert, split
    * sign/exponent/mantissa, `((mant·8+132) << exp) − 132`), and
    * [[Multimodal.decodeWavExpanded]] collects fmt fields and data
    * position BEFORE interpreting either — chunk order cannot break
    * the dispatch. The fmt tag is load-bearing corpus-wide (a reader
    * assuming PCM turns μ-law bytes into noise on half the rows), the
    * JUNK-chunk third keeps the walk honest, and odd μ-law sample
    * counts leave RIFF pad bytes in the container but not the size
    * field (byte_size pins that, too). Features are expanded-sample
    * arithmetic; the oracle replays BOTH formulas — the m06 PCM
    * stream and the full μ-law expansion in integer CASE math.
    */
  val m17_mulaw_decode: Q = (s, dir) => {
    import s.implicits._
    val ids = Tables(s, dir, "documents").select(col("doc_id"))
    val media = ids.repartition(s.sparkContext.defaultParallelism)
      .as[Long].map { id =>
        val n = (40 + id % 32).toInt
        val junk = id % 3 == 0
        if (id % 2 == 0) {
          val samples = Array.tabulate(n)(i =>
            (((31 * id + 7L * i * i) % 65536) - 32768).toShort)
          Multimodal.MediaRecord(id, "audio",
            Multimodal.encodeWav(8000, samples, junkChunk = junk), "wav-synth")
        } else {
          val codes = Array.tabulate(n)(i =>
            ((29 * id + 11 * i + (id * (i + 1)) % 223) % 256).toByte)
          Multimodal.MediaRecord(id, "audio",
            Multimodal.encodeWavMulaw(8000, codes, junkChunk = junk), "wav-synth")
        }
      }
    Multimodal.processBatches(media, codec = Multimodal.TelephonyCodec).toDF()
      .select(col("media_id"), col("duration_ms"), col("byte_size"),
        col("checksum").as("pcm_checksum"))
      .orderBy(col("media_id"))
  }

  val m17_sql: String =
    """WITH d AS (
      |  SELECT doc_id, 40 + doc_id % 32 AS n FROM documents
      |),
      |sm AS (
      |  SELECT d.doc_id, d.n, i.i,
      |    CASE WHEN d.doc_id % 2 = 0
      |      THEN ((31*d.doc_id + 7*i.i*i.i) % 65536) - 32768
      |      ELSE (CASE WHEN u.u >= 128 THEN -1 ELSE 1 END) *
      |           (((u.u % 16) * 8 + 132) * (1 << ((u.u // 16) % 8)) - 132)
      |    END AS s
      |  FROM d,
      |       (SELECT unnest(range(0, 72)) AS i) i,
      |       LATERAL (SELECT 255 - ((29*d.doc_id + 11*i.i
      |                  + (d.doc_id*(i.i+1)) % 223) % 256) AS u) u
      |  WHERE i.i < d.n
      |)
      |SELECT doc_id AS media_id,
      |  CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
      |  CAST(44 + CASE WHEN doc_id % 3 = 0 THEN 20 ELSE 0 END
      |       + CASE WHEN doc_id % 2 = 0 THEN 2*n ELSE n + (n % 2) END
      |       AS BIGINT) AS byte_size,
      |  CAST(SUM(s * (1 + i)) AS BIGINT) AS pcm_checksum
      |FROM sm
      |GROUP BY doc_id, n
      |ORDER BY media_id""".stripMargin

  /** CROSS-CONTAINER content dedup — the crawl problem no single
    * codec sees: the same image fetched twice, once as BMP and once
    * as PNG, is byte-DISJOINT at the container level (one stores
    * bottom-up padded BGR verbatim, the other deflates filtered
    * top-down scanlines), so container-byte hashing can never pair
    * them. Identity lives only in DECODED pixels: each half of the
    * corpus decodes through its own real codec
    * ([[Multimodal.decodeBmp]] / [[Multimodal.decodePng]]) into the
    * shared [[Multimodal.imageContentKeys]] route — two independent
    * position-weighted integer sums — and re-encodes pair on
    * (geometry, c1, c2) in ONE equi-join, no pair scan. Planted: even
    * doc ids re-encode the SAME md5-scrambled seedPixel image as PNG
    * (+1e9); odd ids draw an unrelated seed. The PNG half keeps every
    * compression trap live (cycling filters, ⅓ multi-IDAT, ⅓ tEXt).
    * The oracle replays both sums from the pixel formula for both
    * halves — a misdecode on EITHER side breaks the join.
    */
  val m16_crosscontainer_dedup: Q = (s, dir) => {
    import s.implicits._
    val ids = Tables(s, dir, "documents").select(col("doc_id"))
    val bmpPlan = ids.select(col("doc_id").as("media_id"),
      col("doc_id").as("raw"))
    // unrelated seeds come from the NEGATIVE raw space: doc ids are
    // nonnegative at every SF but NOT dense (sf1 shards them across a
    // 90M range), so any positive offset eventually lands on a real
    // id — measured: doc_id + 1e7 re-rendered shard-1's images for
    // 22.5k of sf1's odd docs and manufactured exactly that many
    // cross pairs
    val pngPlan = ids.select((col("doc_id") + 1000000000L).as("media_id"),
      when(col("doc_id") % 2 === 0, col("doc_id"))
        .otherwise(-col("doc_id") - 1L).as("raw"))
    val bmps = bmpPlan.repartition(s.sparkContext.defaultParallelism)
      .as[(Long, Long)].map { case (mid, raw) =>
        val seed = Multimodal.scrambleSeed(raw)
        val w = (4 + seed % 5).toInt
        val h = (3 + seed % 4).toInt
        Multimodal.MediaRecord(mid, "image",
          Multimodal.encodeBmp(w, h, Multimodal.seedPixel(seed)), "bmp-synth")
      }
    val pngs = pngPlan.repartition(s.sparkContext.defaultParallelism)
      .as[(Long, Long)].map { case (mid, raw) =>
        val seed = Multimodal.scrambleSeed(raw)
        val w = (4 + seed % 5).toInt
        val h = (3 + seed % 4).toInt
        Multimodal.MediaRecord(mid, "image",
          Multimodal.encodePng(w, h, Multimodal.seedPixel(seed),
            filterForRow = y => ((seed + y) % 5).toInt,
            idatSplit = if (mid % 3 == 1) 3 else 1,
            textChunk = if (mid % 3 == 2) Some("graft-fixture") else None),
          "png-synth")
      }
    val kb = Multimodal.imageContentKeys(bmps, Multimodal.decodeBmp)
    val kp = Multimodal.imageContentKeys(pngs, Multimodal.decodePng)
    kb.select(col("media_id").as("id_a"), col("width"), col("height"),
        col("c1"), col("c2"))
      .join(kp.select(col("media_id").as("id_b"), col("width"), col("height"),
        col("c1"), col("c2")), Seq("width", "height", "c1", "c2"))
      .select(col("id_a"), col("id_b"), col("width"), col("height"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val m16_sql: String =
    """WITH im AS (
      |  SELECT media_id,
      |         CAST(('0x' || substr(md5(CAST(raw AS VARCHAR)), 1, 8)) AS BIGINT) AS seed
      |  FROM (
      |    SELECT doc_id AS media_id, doc_id AS raw FROM documents
      |    UNION ALL
      |    SELECT doc_id + 1000000000,
      |           CASE WHEN doc_id % 2 = 0 THEN doc_id ELSE -doc_id - 1 END
      |    FROM documents
      |  ) r
      |),
      |g AS (
      |  SELECT media_id, seed, 4 + seed % 5 AS w, 3 + seed % 4 AS h FROM im
      |),
      |px AS (
      |  SELECT g.media_id, g.w, g.h, x.x, y.y,
      |    (7*g.seed + 3*x.x + 11*y.y + (g.seed * (x.x + 40*y.y + 1)) % 251) % 256 AS r,
      |    (13*g.seed + 5*x.x + 2*y.y + (g.seed * (x.x + 40*y.y + 2)) % 241) % 256 AS gg,
      |    (3*g.seed + x.x + 17*y.y + (g.seed * (x.x + 40*y.y + 3)) % 239) % 256 AS b
      |  FROM g,
      |       (SELECT unnest(range(0, 8)) AS x) x,
      |       (SELECT unnest(range(0, 6)) AS y) y
      |  WHERE x.x < g.w AND y.y < g.h
      |),
      |keys AS (
      |  SELECT media_id, w, h,
      |         CAST(SUM((r + 2*gg + 3*b) * (1 + x + y*w)) AS BIGINT) AS c1,
      |         CAST(SUM((3*r + 2*gg + b) * (1 + y + x*h)) AS BIGINT) AS c2
      |  FROM px GROUP BY media_id, w, h
      |)
      |SELECT a.media_id AS id_a, b.media_id AS id_b,
      |       CAST(a.w AS INT) AS width, CAST(a.h AS INT) AS height
      |FROM keys a JOIN keys b
      |  ON a.w = b.w AND a.h = b.h AND a.c1 = b.c1 AND a.c2 = b.c2
      |  AND a.media_id < 1000000000 AND b.media_id >= 1000000000
      |ORDER BY id_a, id_b""".stripMargin

  /** REAL audio bytes end-to-end — m05's contract for the second
    * modality: every payload is an actual RIFF/WAVE container (16-bit
    * mono PCM), a third of them carrying a JUNK chunk between `fmt `
    * and `data`, so [[Multimodal.decodeWav]]'s chunk walk is load-
    * bearing (a reader that hardcodes samples-at-44 fails the hash on
    * exactly those rows). Features are decoded-sample arithmetic:
    * duration from the parsed rate, byte_size pinning the container
    * layout, and a position-weighted PCM checksum. Oracle replays the
    * sample formula directly in SQL.
    */
  val m06_wav_decode: Q = (s, dir) => {
    val media = Multimodal.wavMedia(
      Tables(s, dir, "documents").select(col("doc_id")), "doc_id")
    Multimodal.processBatches(media, codec = Multimodal.WavCodec).toDF()
      .select(col("media_id"), col("channels"), col("duration_ms"),
        col("byte_size"), col("checksum").as("pcm_checksum"))
      .orderBy(col("media_id"))
  }

  val m06_sql: String =
    """WITH d AS (
      |  SELECT doc_id, 40 + doc_id % 32 AS n FROM documents
      |),
      |sm AS (
      |  SELECT d.doc_id, d.n, i.i,
      |         ((31*d.doc_id + 7*i.i*i.i) % 65536) - 32768 AS s
      |  FROM d, (SELECT unnest(range(0, 72)) AS i) i
      |  WHERE i.i < d.n
      |)
      |SELECT doc_id AS media_id,
      |  CAST(1 AS INT) AS channels,
      |  CAST((n * 1000) // 8000 AS BIGINT) AS duration_ms,
      |  CAST(44 + CASE WHEN doc_id % 3 = 0 THEN 20 ELSE 0 END + 2*n AS BIGINT) AS byte_size,
      |  CAST(SUM(s * (1 + i)) AS BIGINT) AS pcm_checksum
      |FROM sm
      |GROUP BY doc_id, n
      |ORDER BY media_id""".stripMargin

  /** Perceptual near-dup over REAL image bytes — m03's banded-hamming
    * pipeline with every stub replaced: the corpus is actual 24-bit
    * BMPs (8×40 — exactly 60 full 16-byte pixel blocks, so every hash
    * bit is live and the 4×15-bit banding keys stay selective), the
    * block bits come from [[Multimodal.BmpCodec.blockBit]] — the
    * declarative header parse + codegen'd ByteSum over real BGR
    * samples — and the planted structure is CODEC-level: exact copies
    * share the pixel seed, near copies perturb ONE pixel (≤1 block
    * flips, the image analogue of m03's 'zz' text edit). The oracle
    * rebuilds each hash from the pixel formula + the BMP byte layout
    * (bottom-up rows, BGR order) and verifies with an all-pairs
    * popcount — the Spark side must reproduce it from banded chunk
    * collisions over real container bytes only.
    */
  val m07_bmp_neardup: Q = (s, dir) => {
    import s.implicits._
    val ids = Tables(s, dir, "documents").select(col("doc_id"))
    val plan = ids.select(col("doc_id").as("media_id"),
        col("doc_id").as("seed"), lit(0).as("p"))
      .unionAll(ids.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000000L).as("media_id"),
          col("doc_id").as("seed"), lit(0).as("p")))
      .unionAll(ids.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 2000000000L).as("media_id"),
          col("doc_id").as("seed"), lit(1).as("p")))
      .repartition(s.sparkContext.defaultParallelism)
    // the seed×position CROSS terms (mod distinct primes) matter: a
    // formula linear in the seed is 256-periodic mod 256, so seeds 256
    // apart would render IDENTICAL images — at sf1 that manufactured
    // ~8M chance hamming-0 pairs (measured before the fix) and turned
    // the oracle's all-pairs verify quadratic-output. With the cross
    // term, distinct seeds render unrelated pixels: binomial hamming
    // ≈ 30, chance pairs ≈ 0 — the output is the planted structure.
    val media = plan.as[(Long, Long, Int)].map { case (mid, seed, p) =>
      Multimodal.MediaRecord(mid, "image", Multimodal.encodeBmp(8, 40,
        (x, y) =>
          if (p == 1 && x == 0 && y == 0) (255, 255, 255)
          else Multimodal.seedPixel(seed)(x, y)), "bmp-synth")
    }
    Multimodal.imageNearDupPairs(media, blockBytes = 16, maxHamming = 3,
        codec = Multimodal.BmpCodec)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** The hash replay maps each pixel-area byte k back through the BMP
    * layout: file row k//24 (bottom-up ⇒ display y = 39 − k//24),
    * x = (k%24)//3, channel k%3 in BGR order — then the pixel formula,
    * 16-byte block sums against the mid-gray threshold, and m03's
    * all-pairs popcount.
    */
  val m07_sql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id, doc_id AS seed, 0 AS p FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000000, doc_id, 0 FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000000, doc_id, 1 FROM documents WHERE doc_id % 10 = 5
      |),
      |px AS (
      |  SELECT m.media_id, k.k // 16 AS block,
      |    CASE
      |      WHEN m.p = 1 AND (39 - k.k // 24) = 0 AND ((k.k % 24) // 3) = 0 THEN 255
      |      ELSE CASE k.k % 3
      |        WHEN 0 THEN (3*m.seed + ((k.k % 24) // 3) + 17*(39 - k.k // 24)
      |                     + (m.seed * (((k.k % 24) // 3) + 40*(39 - k.k // 24) + 3)) % 239) % 256
      |        WHEN 1 THEN (13*m.seed + 5*((k.k % 24) // 3) + 2*(39 - k.k // 24)
      |                     + (m.seed * (((k.k % 24) // 3) + 40*(39 - k.k // 24) + 2)) % 241) % 256
      |        ELSE (7*m.seed + 3*((k.k % 24) // 3) + 11*(39 - k.k // 24)
      |              + (m.seed * (((k.k % 24) // 3) + 40*(39 - k.k // 24) + 1)) % 251) % 256
      |      END
      |    END AS v
      |  FROM m, (SELECT unnest(range(0, 960)) AS k) k
      |),
      |bits AS (
      |  SELECT media_id, block,
      |         CASE WHEN SUM(v) >= 2048 THEN 1 ELSE 0 END AS bit
      |  FROM px GROUP BY media_id, block
      |),
      |hashes AS (
      |  SELECT media_id,
      |         CAST(SUM(bit * (CAST(1 AS BIGINT) << block)) AS BIGINT) AS h
      |  FROM bits GROUP BY media_id
      |)
      |SELECT a.media_id AS id_a, b.media_id AS id_b,
      |       CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
      |FROM hashes a JOIN hashes b ON a.media_id < b.media_id
      |WHERE bit_count(xor(a.h, b.h)) <= 3
      |ORDER BY id_a, id_b""".stripMargin

  /** Shift-invariant audio near-dup over REAL DECODED PCM — the
    * alignment semantics m04's text-byte stub could never exercise:
    * the planted copies here are SAMPLE-SHIFTED (16 junk samples
    * prepended to the base clip — an intro/ad cut into a stream), so
    * the delta-consistent landmark join must find them at offset
    * delta −1, not 0. Every payload is an actual RIFF/WAVE container;
    * fingerprints come from [[Multimodal.pcmWindowSigs]] (decoded
    * 32-sample windows every 16, position-weighted integer sums —
    * exact, unlike container-byte md5s the oracle could not rebuild)
    * and pair through the SAME [[Multimodal.landmarkAlignPairs]] join
    * m04 uses. Oracle replays the junk+base sample stream, the df
    * cap, and the alignment argmax from the formulas alone.
    */
  val m08_wav_neardup: Q = (s, dir) => {
    import s.implicits._
    val ids = Tables(s, dir, "documents").select(col("doc_id"))
    val plan = ids.select(col("doc_id").as("media_id"),
        col("doc_id").as("seed"), lit(0).as("shift"))
      .unionAll(ids.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000000L).as("media_id"),
          col("doc_id").as("seed"), lit(0).as("shift")))
      .unionAll(ids.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 2000000000L).as("media_id"),
          col("doc_id").as("seed"), lit(16).as("shift")))
      .repartition(s.sparkContext.defaultParallelism)
    val media = plan.as[(Long, Long, Int)].map { case (mid, seed, shift) =>
      val n = (96 + seed % 32).toInt
      val junk = Array.tabulate(shift)(t =>
        (((1000 + 13 * seed + 5L * t) % 65536) - 32768).toShort)
      val base = Array.tabulate(n)(i =>
        (((31 * seed + 7L * i * i) % 65536) - 32768).toShort)
      Multimodal.MediaRecord(mid, "audio",
        Multimodal.encodeWav(8000, junk ++ base), "wav-synth")
    }
    Multimodal.landmarkAlignPairs(
        Multimodal.pcmWindowSigs(media, windowSamples = 32, hop = 16),
        minAligned = 4, maxSigDf = 64)
      .orderBy(col("id_a"), col("id_b"))
  }

  val m08_sql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id, doc_id AS seed, 0 AS shift,
      |         96 + doc_id % 32 AS n
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000000, doc_id, 0, 96 + doc_id % 32
      |  FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000000, doc_id, 16, 96 + doc_id % 32
      |  FROM documents WHERE doc_id % 10 = 5
      |),
      |sigs AS (
      |  SELECT media_id, w.w AS win_no,
      |    CAST(SUM((CASE WHEN (w.w*16 + i.i) < m.shift
      |      THEN ((1000 + 13*m.seed + 5*(w.w*16 + i.i)) % 65536) - 32768
      |      ELSE ((31*m.seed + 7*(w.w*16 + i.i - m.shift)*(w.w*16 + i.i - m.shift)) % 65536) - 32768
      |      END) * (1 + i.i)) AS BIGINT) AS sig
      |  FROM m,
      |       (SELECT unnest(range(0, 9)) AS w) w,
      |       (SELECT unnest(range(0, 32)) AS i) i
      |  WHERE w.w*16 + 32 <= m.shift + m.n
      |  GROUP BY media_id, w.w
      |),
      |dfreq AS (SELECT sig, COUNT(*) AS df FROM sigs GROUP BY sig),
      |fw AS (SELECT s.media_id, s.win_no, s.sig
      |       FROM sigs s JOIN dfreq USING (sig) WHERE dfreq.df <= 64),
      |nw AS (SELECT media_id, COUNT(*) AS n FROM fw GROUP BY media_id),
      |mm AS (
      |  SELECT a.media_id AS id_a, b.media_id AS id_b,
      |         a.win_no - b.win_no AS delta, COUNT(*) AS aligned
      |  FROM fw a JOIN fw b ON a.sig = b.sig AND a.media_id < b.media_id
      |  GROUP BY 1, 2, 3
      |),
      |best AS (
      |  SELECT id_a, id_b, delta, aligned,
      |         ROW_NUMBER() OVER (PARTITION BY id_a, id_b
      |                            ORDER BY aligned DESC, delta ASC) AS rn
      |  FROM mm
      |)
      |SELECT b.id_a, b.id_b, CAST(b.delta AS INT) AS offset_delta,
      |       CAST(b.aligned AS BIGINT) AS aligned_matches
      |FROM best b
      |JOIN nw na ON na.media_id = b.id_a
      |JOIN nw nb ON nb.media_id = b.id_b
      |WHERE b.rn = 1 AND b.aligned >= LEAST(4, na.n, nb.n)
      |ORDER BY id_a, id_b""".stripMargin

  /** REAL video bytes end-to-end — the THIRD modality's m05/m06
    * contract, closing the last stubbed decode (r13 verdict item 4):
    * every payload is an actual yuv4mpeg2 stream built by
    * [[Multimodal.encodeY4m]] and decoded back by the real
    * [[Multimodal.Y4mCodec]] header walk, with the format's legal
    * variability planted a third of the corpus each so the parse is
    * load-bearing: mixed frame RATES (duration_ms derives from the F
    * header), a C444 class whose frame boundaries double (a reader
    * hardcoding 4:2:0 subsampling misreads every frame after the
    * first), reordered header parameters, and FRAME marker lines
    * carrying parameters (a fixed-stride reader lands mid-plane).
    * Features are decoded-luma arithmetic: byte_size pins the exact
    * container layout (headers, markers, chroma-plane sizes) and the
    * checksum is the frame-and-position-weighted luma sum. The oracle
    * replays the pixel formula and the per-class layout constants
    * directly in SQL.
    */
  val m09_y4m_decode: Q = (s, dir) => {
    val media = Multimodal.y4mMedia(
      Tables(s, dir, "documents").select(col("doc_id")), "doc_id")
    Multimodal.processBatches(media, codec = Multimodal.Y4mCodec).toDF()
      .select(col("media_id"), col("width"), col("height"),
        col("duration_ms"), col("byte_size"),
        col("checksum").as("y_checksum"))
      .orderBy(col("media_id"))
  }

  /** Byte-size constants per class (verified against the encoder):
    * canonical header 39 B, C-first C444 header 35 B, X-param header
    * 46 B; frames 6 B marker + 72 B planes (4:2:0) or 150 B total
    * (C444), +3 B for each odd frame's marker parameter in class 2.
    */
  val m09_sql: String =
    """WITH d AS (
      |  SELECT doc_id, 2 + doc_id % 4 AS n, doc_id % 3 AS c FROM documents
      |),
      |px AS (
      |  SELECT d.doc_id, d.n, d.c, f.f, x.x, y.y,
      |         (17*d.doc_id + 5*f.f + 3*x.x + 7*y.y) % 256 AS yv
      |  FROM d,
      |       (SELECT unnest(range(0, 5)) AS f) f,
      |       (SELECT unnest(range(0, 8)) AS x) x,
      |       (SELECT unnest(range(0, 6)) AS y) y
      |  WHERE f.f < d.n
      |)
      |SELECT doc_id AS media_id,
      |  CAST(8 AS INT) AS width, CAST(6 AS INT) AS height,
      |  CAST(CASE c WHEN 0 THEN 40*n WHEN 1 THEN 100*n
      |       ELSE (n*1000) // 30 END AS BIGINT) AS duration_ms,
      |  CAST(CASE c WHEN 0 THEN 39 + 78*n WHEN 1 THEN 35 + 150*n
      |       ELSE 46 + 78*n + 3*(n // 2) END AS BIGINT) AS byte_size,
      |  CAST(SUM(yv * (1 + x + 8*y + 48*f)) AS BIGINT) AS y_checksum
      |FROM px
      |GROUP BY doc_id, n, c
      |ORDER BY media_id""".stripMargin

  /** Video near-dup over REAL DECODED FRAMES — m02's same-position
    * frame-signature join with the stub replaced end-to-end: the
    * corpus is actual yuv4mpeg2 streams (6 frames of 8×6), per-frame
    * signatures are position-weighted luma sums over DECODED Y planes
    * ([[Multimodal.y4mFrameSigs]] — exact integers the oracle replays
    * from the pixel formula, where m02's md5-of-container-bytes could
    * not be rebuilt), and the pairing rides the SAME
    * [[Multimodal.samePositionPairs]] join m02 uses. Planted structure
    * is codec-level, like m07: exact copies share the pixel seed, near
    * copies perturb ONE pixel of ONE frame (5 of 6 frames still
    * match). The luma formula carries a seed×position cross term mod a
    * prime — m07's measured lesson: without it the formula is
    * 256-periodic in the seed and seeds 256 apart render identical
    * frames, manufacturing chance pairs at scale.
    */
  val m10_y4m_neardup: Q = (s, dir) => {
    import s.implicits._
    val ids = Tables(s, dir, "documents").select(col("doc_id"))
    val plan = ids.select(col("doc_id").as("media_id"),
        col("doc_id").as("seed"), lit(0).as("p"))
      .unionAll(ids.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000000L).as("media_id"),
          col("doc_id").as("seed"), lit(0).as("p")))
      .unionAll(ids.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 2000000000L).as("media_id"),
          col("doc_id").as("seed"), lit(1).as("p")))
      .repartition(s.sparkContext.defaultParallelism)
    val media = plan.as[(Long, Long, Int)].map { case (mid, seed, p) =>
      Multimodal.MediaRecord(mid, "video", Multimodal.encodeY4m(8, 6, 25, 1, 6,
        luma = (f, x, y) =>
          if (p == 1 && f == 2 && x == 0 && y == 0) 255
          else ((17 * seed + 5 * f + 3 * x + 7 * y +
            (seed * (x + 8 * y + 48 * f + 1)) % 211) % 256).toInt), "y4m-synth")
    }
    Multimodal.samePositionPairs(Multimodal.y4mFrameSigs(media), minShared = 4)
      .orderBy(col("id_a"), col("id_b"))
  }

  val m10_sql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id, doc_id AS seed, 0 AS p FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000000, doc_id, 0 FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000000, doc_id, 1 FROM documents WHERE doc_id % 10 = 5
      |),
      |sigs AS (
      |  SELECT m.media_id, f.f,
      |    SUM(CASE WHEN m.p = 1 AND f.f = 2 AND x.x = 0 AND y.y = 0 THEN 255
      |         ELSE (17*m.seed + 5*f.f + 3*x.x + 7*y.y
      |               + (m.seed * (x.x + 8*y.y + 48*f.f + 1)) % 211) % 256
      |         END * (1 + x.x + 8*y.y)) AS sig
      |  FROM m,
      |       (SELECT unnest(range(0, 6)) AS f) f,
      |       (SELECT unnest(range(0, 8)) AS x) x,
      |       (SELECT unnest(range(0, 6)) AS y) y
      |  GROUP BY m.media_id, f.f
      |)
      |SELECT a.media_id AS id_a, b.media_id AS id_b,
      |       CAST(COUNT(*) AS BIGINT) AS shared_frames
      |FROM sigs a JOIN sigs b
      |  ON a.f = b.f AND a.sig = b.sig AND a.media_id < b.media_id
      |GROUP BY 1, 2
      |HAVING COUNT(*) >= 4
      |ORDER BY id_a, id_b""".stripMargin

  /** Temporally-ALIGNED video near-dup over REAL DECODED FRAMES — the
    * m08 alignment semantic for the THIRD modality, closing the
    * asymmetry where audio had shift-invariant matching and video
    * only m10's same-position join. Real re-encodes are TRIMMED (an
    * intro cut, a cold open dropped), so the planted copies here are
    * FRAME-SHIFTED: the +1e9 copy's frame f is the base's frame f+2
    * (two frames trimmed off the head, 6 of the base's 8 frames
    * kept) — same-position agreement is ZERO by construction, and
    * only the delta-consistent landmark join
    * ([[Multimodal.landmarkAlignPairs]], the SAME implementation
    * m04/m08 ride) finds the pair, at offset_delta +2. The +2e9
    * copies are shifted by ONE frame and perturb one pixel of one
    * frame (5 of 6 frames still align at delta +1 — trim plus damage,
    * the m10 near-copy lesson carried to alignment). Frame signatures
    * are [[Multimodal.y4mFrameSigs]] over decoded Y planes — content-
    * only (position-weighted WITHIN the frame, not by frame index),
    * which is precisely the shift-COMPATIBILITY the delta join needs.
    * The luma formula is m10's with THREE prime cross terms instead
    * of one, under md5-scrambled seeds — both measured load-bearing
    * against manufactured chance pairs (see the fixture comment: the
    * delta≠0 channel and the mod-54016 birthday space are two
    * DIFFERENT collision mechanisms, each found by counting pairs).
    */
  val m14_y4m_align: Q = (s, dir) => {
    import s.implicits._
    val ids = Tables(s, dir, "documents").select(col("doc_id"))
    val plan = ids.select(col("doc_id").as("media_id"),
        col("doc_id").as("seed"), lit(0).as("off"), lit(8).as("n"), lit(0).as("p"))
      .unionAll(ids.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000000L).as("media_id"),
          col("doc_id").as("seed"), lit(2).as("off"), lit(6).as("n"), lit(0).as("p")))
      .unionAll(ids.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 2000000000L).as("media_id"),
          col("doc_id").as("seed"), lit(1).as("off"), lit(6).as("n"), lit(1).as("p")))
      .repartition(s.sparkContext.defaultParallelism)
    // Seeds md5-scrambled (the d59/m07 lesson) AND the luma formula
    // widened to THREE prime cross terms — both measured load-bearing:
    // raw seeds collide through the delta≠0 channel this query opens
    // (85 chance pairs per 500 docs — arithmetically related seeds
    // align at nonzero offsets), and m10's single-prime formula
    // depends on the seed only mod 256·211 = 54016, a space small
    // enough that SCRAMBLED 32-bit seeds birthday-collide in it
    // (measured: 3 identical-clip pairs at 500 docs, ~quadratic at
    // sf1). Three distinct primes (the BMP formula's design) put the
    // effective seed space at ~3·10^12: the pair set is the planted
    // structure at every SF.
    val media = plan.as[(Long, Long, Int, Int, Int)].map {
      case (mid, raw, off, n, p) =>
        val seed = Multimodal.scrambleSeed(raw)
        Multimodal.MediaRecord(mid, "video", Multimodal.encodeY4m(8, 6, 25, 1, n,
          luma = (f, x, y) => {
            val g = f + off
            if (p == 1 && f == 3 && x == 0 && y == 0) 255
            else ((17 * seed + 5 * g + 3 * x + 7 * y +
              (seed * (x + 8 * y + 48 * g + 1)) % 211 +
              (seed * (x + 8 * y + 48 * g + 2)) % 241 +
              (seed * (x + 8 * y + 48 * g + 3)) % 239) % 256).toInt
          }),
          "y4m-synth")
    }
    Multimodal.landmarkAlignPairs(
        Multimodal.y4mFrameSigs(media)
          .select(col("media_id"), col("frame_no").as("win_no"),
            col("frame_sig").as("sig")),
        minAligned = 4, maxSigDf = 64)
      .orderBy(col("id_a"), col("id_b"))
  }

  val m14_sql: String =
    """WITH m0 AS (
      |  SELECT doc_id AS media_id, doc_id AS raw, 0 AS off, 8 AS n, 0 AS p
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000000, doc_id, 2, 6, 0
      |  FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000000, doc_id, 1, 6, 1
      |  FROM documents WHERE doc_id % 10 = 5
      |),
      |m AS (
      |  SELECT media_id,
      |         CAST(('0x' || substr(md5(CAST(raw AS VARCHAR)), 1, 8)) AS BIGINT) AS seed,
      |         off, n, p
      |  FROM m0
      |),
      |sigs AS (
      |  SELECT m.media_id, f.f AS win_no,
      |    CAST(SUM(CASE WHEN m.p = 1 AND f.f = 3 AND x.x = 0 AND y.y = 0 THEN 255
      |         ELSE (17*m.seed + 5*(f.f + m.off) + 3*x.x + 7*y.y
      |               + (m.seed * (x.x + 8*y.y + 48*(f.f + m.off) + 1)) % 211
      |               + (m.seed * (x.x + 8*y.y + 48*(f.f + m.off) + 2)) % 241
      |               + (m.seed * (x.x + 8*y.y + 48*(f.f + m.off) + 3)) % 239) % 256
      |         END * (1 + x.x + 8*y.y)) AS BIGINT) AS sig
      |  FROM m,
      |       (SELECT unnest(range(0, 8)) AS f) f,
      |       (SELECT unnest(range(0, 8)) AS x) x,
      |       (SELECT unnest(range(0, 6)) AS y) y
      |  WHERE f.f < m.n
      |  GROUP BY m.media_id, f.f
      |),
      |dfreq AS (SELECT sig, COUNT(*) AS df FROM sigs GROUP BY sig),
      |fw AS (SELECT s.media_id, s.win_no, s.sig
      |       FROM sigs s JOIN dfreq USING (sig) WHERE dfreq.df <= 64),
      |nw AS (SELECT media_id, COUNT(*) AS n FROM fw GROUP BY media_id),
      |mm AS (
      |  SELECT a.media_id AS id_a, b.media_id AS id_b,
      |         a.win_no - b.win_no AS delta, COUNT(*) AS aligned
      |  FROM fw a JOIN fw b ON a.sig = b.sig AND a.media_id < b.media_id
      |  GROUP BY 1, 2, 3
      |),
      |best AS (
      |  SELECT id_a, id_b, delta, aligned,
      |         ROW_NUMBER() OVER (PARTITION BY id_a, id_b
      |                            ORDER BY aligned DESC, delta ASC) AS rn
      |  FROM mm
      |)
      |SELECT b.id_a, b.id_b, CAST(b.delta AS INT) AS offset_delta,
      |       CAST(b.aligned AS BIGINT) AS aligned_matches
      |FROM best b
      |JOIN nw na ON na.media_id = b.id_a
      |JOIN nw nb ON nb.media_id = b.id_b
      |WHERE b.rn = 1 AND b.aligned >= LEAST(4, na.n, nb.n)
      |ORDER BY id_a, id_b""".stripMargin

  /** CROSS-MODAL dup groups — the dedup decision no single modality
    * can make: a RE-RENDERED page keeps its text but gets a brand-new
    * image (text-only match), a RE-OCR'd scan keeps its image but
    * garbles the text to noise (image-only match). Each planted copy
    * here is catchable by EXACTLY one modality — +1e9 copies share
    * text with an unrelated image, +2e9 copies share the image under
    * md5-scrambled text — so neither d03's LSH pairs nor m07's
    * perceptual pairs alone resolve the groups; the union of both
    * edge sets through connected components does (base, re-render,
    * re-scan → ONE component via the base). Text pairs come from the
    * full MinHash+LSH path, image pairs from real BMP bytes through
    * the declarative perceptual hash; the oracle replays both pair
    * semantics and the min-label fixpoint in one WITH RECURSIVE.
    */
  val d59_crossmodal_groups: Q = (s, dir) => {
    import s.implicits._
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val textCorpus = d
      .unionAll(d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000000L).as("doc_id"), col("text")))
      .unionAll(d.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 2000000000L).as("doc_id"),
          md5(col("text")).as("text")))
      .repartition(s.sparkContext.defaultParallelism)
    val textPairs = TextDedup.minhashLshPairs(textCorpus, "doc_id", "text",
      n = 3, numHashes = 128, bands = 32, threshold = 0.8)
    // image seeds: the re-render (+1e9) draws an UNRELATED image from
    // the NEGATIVE raw space — doc ids are nonnegative but NOT dense
    // (sf1 shards them across a 90M range), so a positive offset
    // eventually lands on a real id and silently reuses that doc's
    // image (the m16 measurement: +1e7 hit shard-1 ids for 22.5k sf1
    // docs); the re-scan (+2e9) reuses the base image exactly
    val plan = d.select(col("doc_id").as("media_id"), col("doc_id").as("seed"))
      .unionAll(d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000000L).as("media_id"),
          (-col("doc_id") - 1L).as("seed")))
      .unionAll(d.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 2000000000L).as("media_id"),
          col("doc_id").as("seed")))
      .repartition(s.sparkContext.defaultParallelism)
    // seeds are md5-SCRAMBLED before rendering: seedPixel's modular
    // arithmetic makes nearby raw seeds hamming-adjacent, and under a
    // GRAPH operator that turns the corpus into one giant chain whose
    // diameter defeats the CC fixpoint (measured at sf1); scrambled
    // seeds render unrelated images, so the edge set is the planted
    // structure
    val media = plan.as[(Long, Long)].map { case (mid, raw) =>
      Multimodal.MediaRecord(mid, "image", Multimodal.encodeBmp(8, 40,
        Multimodal.seedPixel(Multimodal.scrambleSeed(raw))), "bmp-synth")
    }
    val imgPairs = Multimodal.imageNearDupPairs(media, blockBytes = 16,
      maxHamming = 3, codec = Multimodal.BmpCodec)
    val edges = textPairs.select(col("id_a"), col("id_b"))
      .unionAll(imgPairs.select(col("id_a"), col("id_b")))
    ConnectedComponents.dedupGroups(textCorpus.select(col("doc_id")),
        edges, "doc_id")
      .orderBy(col("doc_id"))
  }

  val d59_sql: String =
    s"""WITH RECURSIVE corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000000, text FROM documents WHERE doc_id % 10 = 0
       |  UNION ALL
       |  SELECT doc_id + 2000000000, md5(text) FROM documents WHERE doc_id % 10 = 5
       |),
       |$ShinglesSql,
       |$JaccardCtesSql,
       |im AS (
       |  SELECT media_id, CAST(('0x' || substr(md5(CAST(raw AS VARCHAR)), 1, 8)) AS BIGINT) AS seed
       |  FROM (
       |    SELECT doc_id AS media_id, doc_id AS raw FROM documents
       |    UNION ALL
       |    SELECT doc_id + 1000000000, -doc_id - 1 FROM documents WHERE doc_id % 10 = 0
       |    UNION ALL
       |    SELECT doc_id + 2000000000, doc_id FROM documents WHERE doc_id % 10 = 5
       |  ) r
       |),
       |ipx AS (
       |  SELECT im.media_id, k.k // 16 AS block,
       |    CASE k.k % 3
       |      WHEN 0 THEN (3*im.seed + ((k.k % 24) // 3) + 17*(39 - k.k // 24)
       |                   + (im.seed * (((k.k % 24) // 3) + 40*(39 - k.k // 24) + 3)) % 239) % 256
       |      WHEN 1 THEN (13*im.seed + 5*((k.k % 24) // 3) + 2*(39 - k.k // 24)
       |                   + (im.seed * (((k.k % 24) // 3) + 40*(39 - k.k // 24) + 2)) % 241) % 256
       |      ELSE (7*im.seed + 3*((k.k % 24) // 3) + 11*(39 - k.k // 24)
       |            + (im.seed * (((k.k % 24) // 3) + 40*(39 - k.k // 24) + 1)) % 251) % 256
       |    END AS v
       |  FROM im, (SELECT unnest(range(0, 960)) AS k) k
       |),
       |ibits AS (
       |  SELECT media_id, block,
       |         CASE WHEN SUM(v) >= 2048 THEN 1 ELSE 0 END AS bit
       |  FROM ipx GROUP BY media_id, block
       |),
       |ihash AS (
       |  SELECT media_id,
       |         CAST(SUM(bit * (CAST(1 AS BIGINT) << block)) AS BIGINT) AS h
       |  FROM ibits GROUP BY media_id
       |),
       |ipairs AS (
       |  SELECT a.media_id AS id_a, b.media_id AS id_b
       |  FROM ihash a JOIN ihash b ON a.media_id < b.media_id
       |  WHERE bit_count(xor(a.h, b.h)) <= 3
       |),
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM pairs WHERE jaccard >= 0.8
       |  UNION
       |  SELECT id_a, id_b FROM ipairs
       |),
       |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
       |reach(id, r) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM sym) t
       |  UNION
       |  SELECT s.a, r.r FROM sym s JOIN reach r ON r.id = s.b
       |),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
       |SELECT c.doc_id,
       |       COALESCE(mp.component, c.doc_id) AS component,
       |       COALESCE(mp.component, c.doc_id) = c.doc_id AS is_survivor
       |FROM corpus c LEFT JOIN comp mp ON mp.id = c.doc_id
       |ORDER BY doc_id""".stripMargin

  val m01_sql: String =
    """SELECT doc_id AS media_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  octet_length(encode(text)) AS byte_size,
      |  CASE doc_id % 3
      |    WHEN 1 THEN 0
      |    ELSE CAST(64 + octet_length(encode(text)) % 577 AS INT) END AS width,
      |  CASE doc_id % 3
      |    WHEN 1 THEN 0
      |    ELSE CAST(64 + octet_length(encode(text)) % 419 AS INT) END AS height,
      |  CASE doc_id % 3 WHEN 1 THEN 2 ELSE 3 END AS channels,
      |  CASE doc_id % 3
      |    WHEN 0 THEN 0
      |    WHEN 1 THEN octet_length(encode(text)) * 8
      |    ELSE octet_length(encode(text)) * 40 END AS duration_ms
      |FROM documents
      |ORDER BY media_id""".stripMargin

  // ── m11: real image resize (decode → box filter → re-encode) ────────

  /** The RESIZE stage of a multimodal pipeline over real bytes: every
    * m05 BMP is decoded, 2×2 box-filtered (integer floor average per
    * channel) and re-encoded, then the RESIZED container goes back
    * through the full real-decode path — so the gate pins the whole
    * decode → resample → encode → decode round trip. The m05 corpus's
    * varying geometry makes the resize arithmetic load-bearing:
    * odd widths/heights crop (bottom display row = FIRST file row, so
    * file-order resizers crop wrong), widths 5/6/7 give padded input
    * rows a raw-stride resampler misreads, and the asymmetric checksum
    * weights catch any BGR/RGB confusion in the re-encode. Oracle
    * replays the box-filter over the m05 pixel formula in SQL.
    */
  val m11_bmp_resize: Q = (s, dir) => {
    val media = Multimodal.bmpMedia(
      Tables(s, dir, "documents").select(col("doc_id")), "doc_id")
    val resized = Multimodal.resizeImages(media, factor = 2)
    Multimodal.processBatches(resized, codec = Multimodal.BmpCodec).toDF()
      .select(col("media_id"), col("width"), col("height"),
        col("byte_size"), col("checksum").as("pix_checksum"))
      .orderBy(col("media_id"))
  }

  val m11_sql: String =
    """WITH d AS (
      |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
      |),
      |o AS (SELECT doc_id, w, h, w // 2 AS ow, h // 2 AS oh FROM d),
      |px AS (
      |  SELECT o.doc_id, o.ow, o.oh, x.x, y.y,
      |    SUM((7*o.doc_id + 3*(2*x.x + t.dx) + 11*(2*y.y + t.dy)) % 256) // 4 AS r,
      |    SUM((13*o.doc_id + 5*(2*x.x + t.dx) + 2*(2*y.y + t.dy)) % 256) // 4 AS g,
      |    SUM((3*o.doc_id + (2*x.x + t.dx) + 17*(2*y.y + t.dy)) % 256) // 4 AS b
      |  FROM o,
      |       (SELECT unnest(range(0, 4)) AS x) x,
      |       (SELECT unnest(range(0, 3)) AS y) y,
      |       (SELECT dx.dx, dy.dy
      |        FROM (SELECT unnest(range(0, 2)) AS dx) dx,
      |             (SELECT unnest(range(0, 2)) AS dy) dy) t
      |  WHERE x.x < o.ow AND y.y < o.oh
      |  GROUP BY o.doc_id, o.ow, o.oh, x.x, y.y
      |)
      |SELECT doc_id AS media_id,
      |  CAST(ow AS INT) AS width, CAST(oh AS INT) AS height,
      |  CAST(54 + oh * ((3*ow + 3) // 4) * 4 AS BIGINT) AS byte_size,
      |  CAST(SUM((r + 2*g + 3*b) * (1 + x + y*ow)) AS BIGINT) AS pix_checksum
      |FROM px
      |GROUP BY doc_id, ow, oh
      |ORDER BY media_id""".stripMargin

  // ── m12: frame-sampling at a target rate over real Y4M streams ──────

  /** Temporal downsample of the m09 mixed-rate video corpus to a fixed
    * 15 fps: the sampled frame index is floor arithmetic over the
    * PARSED F header (25 fps class keeps frames 0,1,3,…; the 30 fps
    * class every second frame; the 10 fps class emits frames TWICE —
    * upsampling repeats the nearest-earlier frame, so the gate pins
    * exact row cardinality against rate-ignoring or frame-deduping
    * implementations). Each sample carries its source timestamp and
    * the decoded-plane luma signature; the oracle replays index
    * selection, timestamps and signatures from the pixel formula.
    */
  val m12_frame_sample: Q = (s, dir) => {
    val media = Multimodal.y4mMedia(
      Tables(s, dir, "documents").select(col("doc_id")), "doc_id")
    Multimodal.sampleFramesAtRate(media, targetFps = 15)
      .orderBy(col("media_id"), col("sample_no"))
  }

  val m12_sql: String =
    """WITH d AS (
      |  SELECT doc_id, 2 + doc_id % 4 AS n,
      |         CASE doc_id % 3 WHEN 0 THEN 25 WHEN 1 THEN 10 ELSE 30 END AS num
      |  FROM documents
      |),
      |s AS (
      |  SELECT doc_id, n, num, k.k AS sample_no, (k.k * num) // 15 AS f
      |  FROM d, (SELECT unnest(range(0, 16)) AS k) k
      |  WHERE (k.k * num) // 15 < n
      |)
      |SELECT doc_id AS media_id,
      |  CAST(sample_no AS INT) AS sample_no,
      |  CAST(f AS INT) AS frame_no,
      |  CAST(f * 1000 // num AS BIGINT) AS frame_ts_ms,
      |  CAST((SELECT SUM(((17*s.doc_id + 5*s.f + 3*x.x + 7*y.y) % 256) * (1 + x.x + 8*y.y))
      |        FROM (SELECT unnest(range(0, 8)) AS x) x,
      |             (SELECT unnest(range(0, 6)) AS y) y) AS BIGINT) AS frame_sig
      |FROM s
      |ORDER BY media_id, sample_no""".stripMargin

  // ── m13: audio decimation (decode → box average → re-encode) ────────

  /** The audio counterpart of m11/m12 — temporal downsample of the m06
    * WAV corpus by 4 (8000 → 2000 Hz): every container (a third
    * carrying JUNK chunks, so the chunk walk feeds the resampler) is
    * decoded, each 4-sample run box-averaged with truncating integer
    * division, and re-encoded; the DECIMATED container then runs the
    * full real-decode path, so duration pins the new rate header,
    * byte_size the rebuilt layout, and the position-weighted checksum
    * the exact resample arithmetic (negative PCM sums make the
    * toward-zero division semantics load-bearing). Oracle replays the
    * sample formula through the 4-tap average in SQL.
    */
  val m13_audio_decimate: Q = (s, dir) => {
    val media = Multimodal.wavMedia(
      Tables(s, dir, "documents").select(col("doc_id")), "doc_id")
    val dec = Multimodal.decimateAudio(media, factor = 4)
    Multimodal.processBatches(dec, codec = Multimodal.WavCodec).toDF()
      .select(col("media_id"), col("duration_ms"),
        col("byte_size"), col("checksum").as("pcm_checksum"))
      .orderBy(col("media_id"))
  }

  val m13_sql: String =
    """WITH d AS (
      |  SELECT doc_id, (40 + doc_id % 32) // 4 AS m FROM documents
      |),
      |dec AS (
      |  SELECT d.doc_id, i.i,
      |    SUM((31*d.doc_id + 7*(4*i.i + j.j)*(4*i.i + j.j)) % 65536 - 32768) // 4 AS v
      |  FROM d,
      |       (SELECT unnest(range(0, 18)) AS i) i,
      |       (SELECT unnest(range(0, 4)) AS j) j
      |  WHERE i.i < d.m
      |  GROUP BY d.doc_id, i.i
      |)
      |SELECT dec.doc_id AS media_id,
      |  CAST(d.m * 1000 // 2000 AS BIGINT) AS duration_ms,
      |  CAST(44 + 2 * d.m AS BIGINT) AS byte_size,
      |  CAST(SUM(dec.v * (1 + dec.i)) AS BIGINT) AS pcm_checksum
      |FROM dec JOIN d USING (doc_id)
      |GROUP BY dec.doc_id, d.m
      |ORDER BY media_id""".stripMargin

  // ── t35: bigram-LM quality scoring (CCNet-shaped perplexity filter) ──

  /** Train a stupid-backoff bigram LM on the trusted slice
    * (doc_id % 5 = 0 — in production, the curated reference corpus)
    * and score EVERY document by integer-exact mean token
    * milli-likelihood (see [[graft.operators.LanguageModel]] for the
    * surrogate contract). One training scan (single bigram aggregate,
    * everything else model-sized), one scoring scan (broadcast model
    * joins, per-doc aggregate partials map-side) — the 100 TB quality
    * gate at two corpus passes total.
    */
  val t35_lm_quality: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
    val lm = LanguageModel.train(
      docs.filter(col("doc_id") % 5 === 0), "doc_id", "text")
    LanguageModel.score(docs, lm, "doc_id", "text").orderBy(col("doc_id"))
  }

  val t35_sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, ${TextFunctions.ToksSql} AS toks FROM documents
       |),
       |bg AS (
       |  SELECT doc_id,
       |         CASE WHEN p.pos = 1 THEN '<S>' ELSE toks[p.pos - 1] END AS w1,
       |         toks[p.pos] AS w2
       |  FROM t CROSS JOIN LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS pos) p
       |),
       |bi AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
       |       FROM bg WHERE doc_id % 5 = 0 GROUP BY 1, 2),
       |ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bi GROUP BY 1),
       |uni AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2 FROM bi GROUP BY 1),
       |tot AS (SELECT CAST(SUM(c12) AS BIGINT) AS n_train FROM bi),
       |sc AS (
       |  SELECT bg.doc_id,
       |    CASE WHEN bi.c12 IS NOT NULL THEN (1000 * bi.c12) // ctx.c1
       |         WHEN uni.c2 IS NOT NULL THEN (400 * uni.c2) // tot.n_train
       |         ELSE 0 END AS milli,
       |    CASE WHEN bi.c12 IS NULL AND uni.c2 IS NULL THEN 1 ELSE 0 END AS oov
       |  FROM bg
       |  LEFT JOIN bi USING (w1, w2)
       |  LEFT JOIN ctx USING (w1)
       |  LEFT JOIN uni USING (w2)
       |  CROSS JOIN tot
       |),
       |agg AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |         CAST(SUM(oov) AS BIGINT) AS n_oov,
       |         CAST(SUM(milli) AS BIGINT) AS sum_milli
       |  FROM sc GROUP BY 1
       |)
       |SELECT d.doc_id,
       |       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       |       CAST(COALESCE(a.n_oov, 0) AS BIGINT) AS n_oov,
       |       CAST(COALESCE(a.sum_milli, 0) AS BIGINT) AS sum_milli,
       |       CAST(CASE WHEN a.n_tokens > 0 THEN a.sum_milli // a.n_tokens
       |            ELSE 0 END AS BIGINT) AS avg_milli
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ── t36: per-language LM quality (one model per language) ───────────

  /** The CCNet refinement of t35: ONE bigram model per language,
    * trained in the same single corpus pass (group-keyed aggregates),
    * each document scored against ITS OWN language's model — a fluent
    * Spanish document no longer scores as noise against an
    * English-dominated mixture. All model joins carry the language in
    * their key, so the plan is t35's (broadcast model, map-side doc
    * partials) with wider join keys, not per-language jobs.
    */
  val t36_lm_per_lang: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
    val lm = LanguageModel.train(
      docs.filter(col("doc_id") % 5 === 0), "doc_id", "text",
      groupCols = Seq("lang"))
    LanguageModel.score(docs, lm, "doc_id", "text", groupCols = Seq("lang"))
      .orderBy(col("doc_id"))
  }

  val t36_sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, ${TextFunctions.ToksSql} AS toks FROM documents
       |),
       |bg AS (
       |  SELECT doc_id, lang,
       |         CASE WHEN p.pos = 1 THEN '<S>' ELSE toks[p.pos - 1] END AS w1,
       |         toks[p.pos] AS w2
       |  FROM t CROSS JOIN LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS pos) p
       |),
       |bi AS (SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
       |       FROM bg WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3),
       |ctx AS (SELECT lang, w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bi GROUP BY 1, 2),
       |uni AS (SELECT lang, w2, CAST(SUM(c12) AS BIGINT) AS c2 FROM bi GROUP BY 1, 2),
       |tot AS (SELECT lang, CAST(SUM(c12) AS BIGINT) AS n_train FROM bi GROUP BY 1),
       |sc AS (
       |  SELECT bg.doc_id,
       |    CASE WHEN bi.c12 IS NOT NULL THEN (1000 * bi.c12) // ctx.c1
       |         WHEN uni.c2 IS NOT NULL THEN (400 * uni.c2) // tot.n_train
       |         ELSE 0 END AS milli,
       |    CASE WHEN bi.c12 IS NULL AND uni.c2 IS NULL THEN 1 ELSE 0 END AS oov
       |  FROM bg
       |  LEFT JOIN bi USING (lang, w1, w2)
       |  LEFT JOIN ctx USING (lang, w1)
       |  LEFT JOIN uni USING (lang, w2)
       |  LEFT JOIN tot USING (lang)
       |),
       |agg AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |         CAST(SUM(oov) AS BIGINT) AS n_oov,
       |         CAST(SUM(milli) AS BIGINT) AS sum_milli
       |  FROM sc GROUP BY 1
       |)
       |SELECT d.doc_id, d.lang,
       |       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       |       CAST(COALESCE(a.n_oov, 0) AS BIGINT) AS n_oov,
       |       CAST(COALESCE(a.sum_milli, 0) AS BIGINT) AS sum_milli,
       |       CAST(CASE WHEN a.n_tokens > 0 THEN a.sum_milli // a.n_tokens
       |            ELSE 0 END AS BIGINT) AS avg_milli
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ── t37: trigram LM quality (one tier deeper, one aggregate still) ──

  /** t35 one backoff tier deeper — the trigram stupid-backoff scorer
    * (CCNet trains 5-grams; the tier STRUCTURE is what this pins):
    * (1000·c₁₂₃)÷c₁₂ | (400·c₂₃)÷c₂ | (160·c₃)÷N | OOV. Training is
    * still ONE corpus aggregate: the (w2,w3) projection of the trigram
    * stream IS the bigram stream, so every backoff relation derives
    * from the trigram counts model-sized (`LanguageModel.trainTrigram`).
    */
  val t37_lm_trigram: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
    val lm = LanguageModel.trainTrigram(
      docs.filter(col("doc_id") % 5 === 0), "doc_id", "text")
    LanguageModel.scoreTrigram(docs, lm, "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  val t37_sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, ${TextFunctions.ToksSql} AS toks FROM documents
       |),
       |tg AS (
       |  SELECT doc_id,
       |         CASE WHEN p.pos <= 2 THEN '<S>' ELSE toks[p.pos - 2] END AS w1,
       |         CASE WHEN p.pos <= 1 THEN '<S>' ELSE toks[p.pos - 1] END AS w2,
       |         toks[p.pos] AS w3
       |  FROM t CROSS JOIN LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS pos) p
       |),
       |tri AS (SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c123
       |        FROM tg WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3),
       |cx AS (SELECT w1, w2, CAST(SUM(c123) AS BIGINT) AS c12 FROM tri GROUP BY 1, 2),
       |b23 AS (SELECT w2, w3, CAST(SUM(c123) AS BIGINT) AS c23 FROM tri GROUP BY 1, 2),
       |c2 AS (SELECT w2, CAST(SUM(c23) AS BIGINT) AS c2 FROM b23 GROUP BY 1),
       |uni AS (SELECT w3, CAST(SUM(c23) AS BIGINT) AS c3 FROM b23 GROUP BY 1),
       |tot AS (SELECT CAST(SUM(c123) AS BIGINT) AS n_train FROM tri),
       |sc AS (
       |  SELECT tg.doc_id,
       |    CASE WHEN tri.c123 IS NOT NULL THEN (1000 * tri.c123) // cx.c12
       |         WHEN b23.c23 IS NOT NULL THEN (400 * b23.c23) // c2.c2
       |         WHEN uni.c3 IS NOT NULL THEN (160 * uni.c3) // tot.n_train
       |         ELSE 0 END AS milli,
       |    CASE WHEN tri.c123 IS NULL AND b23.c23 IS NULL AND uni.c3 IS NULL
       |         THEN 1 ELSE 0 END AS oov
       |  FROM tg
       |  LEFT JOIN tri USING (w1, w2, w3)
       |  LEFT JOIN cx USING (w1, w2)
       |  LEFT JOIN b23 USING (w2, w3)
       |  LEFT JOIN c2 USING (w2)
       |  LEFT JOIN uni USING (w3)
       |  CROSS JOIN tot
       |),
       |agg AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |         CAST(SUM(oov) AS BIGINT) AS n_oov,
       |         CAST(SUM(milli) AS BIGINT) AS sum_milli
       |  FROM sc GROUP BY 1
       |)
       |SELECT d.doc_id,
       |       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       |       CAST(COALESCE(a.n_oov, 0) AS BIGINT) AS n_oov,
       |       CAST(COALESCE(a.sum_milli, 0) AS BIGINT) AS sum_milli,
       |       CAST(CASE WHEN a.n_tokens > 0 THEN a.sum_milli // a.n_tokens
       |            ELSE 0 END AS BIGINT) AS avg_milli
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ── registry ────────────────────────────────────────────────────────

  val queries: Map[String, Q] = Map(
    "d01_dedup_exact" -> d01_dedup_exact,
    "d02_ngram_jaccard" -> d02_ngram_jaccard,
    "d16_containment" -> d16_containment,
    "d17_normalized_dedup" -> d17_normalized_dedup,
    "d52_leakage_split" -> d52_leakage_split,
    "d51_link_authority" -> d51_link_authority,
    "d19_containment_prefix" -> d19_containment_prefix,
    "d21_fingerprint_pairs" -> d21_fingerprint_pairs,
    "d56_fingerprint_capped" -> d56_fingerprint_capped,
    "d23_fingerprint_prefix" -> d23_fingerprint_prefix,
    "d03_minhash_lsh" -> d03_minhash_lsh,
    "d04_simhash" -> d04_simhash,
    "d05_embedding_neardup" -> d05_embedding_neardup,
    "d06_dedup_groups" -> d06_dedup_groups,
    "d47_group_representative" -> d47_group_representative,
    "d07_decontaminate" -> d07_decontaminate,
    "d33_eval_overlap" -> d33_eval_overlap,
    "d08_stratified_sample" -> d08_stratified_sample,
    "d09_incremental_dedup" -> d09_incremental_dedup,
    "d10_curation_pipeline" -> d10_curation_pipeline,
    "d11_embedding_groups" -> d11_embedding_groups,
    "s01_ann_topk" -> s01_ann_topk,
    "s02_ann_lsh" -> s02_ann_lsh,
    "s03_ann_ivf" -> s03_ann_ivf,
    "s04_ann_quantized" -> s04_ann_quantized,
    "s10_ann_rerank" -> s10_ann_rerank,
    "s11_mmr_topk" -> s11_mmr_topk,
    "s05_ann_recall" -> s05_ann_recall,
    "t01_text_stats" -> t01_text_stats,
    "t02_langid" -> t02_langid,
    "t03_fingerprint" -> t03_fingerprint,
    "t04_repetition" -> t04_repetition,
    "t05_gram_topk" -> t05_gram_topk,
    "t06_corpus_report" -> t06_corpus_report,
    "m01_multimodal_features" -> m01_multimodal_features,
    "m02_video_neardup" -> m02_video_neardup,
    "m03_image_neardup" -> m03_image_neardup,
    "m04_audio_neardup" -> m04_audio_neardup,
    "m05_bmp_decode" -> m05_bmp_decode,
    "m15_png_decode" -> m15_png_decode,
    "m16_crosscontainer_dedup" -> m16_crosscontainer_dedup,
    "m17_mulaw_decode" -> m17_mulaw_decode,
    "m06_wav_decode" -> m06_wav_decode,
    "m07_bmp_neardup" -> m07_bmp_neardup,
    "m08_wav_neardup" -> m08_wav_neardup,
    "m09_y4m_decode" -> m09_y4m_decode,
    "m10_y4m_neardup" -> m10_y4m_neardup,
    "m14_y4m_align" -> m14_y4m_align,
    "d59_crossmodal_groups" -> d59_crossmodal_groups,
    "m11_bmp_resize" -> m11_bmp_resize,
    "m12_frame_sample" -> m12_frame_sample,
    "t35_lm_quality" -> t35_lm_quality,
    "t36_lm_per_lang" -> t36_lm_per_lang,
    "t37_lm_trigram" -> t37_lm_trigram,
    "m13_audio_decimate" -> m13_audio_decimate)

  val oracles: Map[String, String] = Map(
    "d01_dedup_exact" -> d01_sql,
    "d02_ngram_jaccard" -> d02_sql,
    "d16_containment" -> d16_sql,
    "d17_normalized_dedup" -> d17_sql,
    "d52_leakage_split" -> d52_sql,
    "d51_link_authority" -> d51_sql,
    "d19_containment_prefix" -> d19_sql,
    "d21_fingerprint_pairs" -> d21_sql,
    "d56_fingerprint_capped" -> d56_sql,
    "d23_fingerprint_prefix" -> d23_sql,
    "d03_minhash_lsh" -> d03_sql,
    "d04_simhash" -> d04_sql,
    "d05_embedding_neardup" -> d05_sql,
    "d06_dedup_groups" -> d06_sql,
    "d47_group_representative" -> d47_sql,
    "d07_decontaminate" -> d07_sql,
    "d33_eval_overlap" -> d33_sql,
    "d08_stratified_sample" -> d08_sql,
    "d09_incremental_dedup" -> d09_sql,
    "d10_curation_pipeline" -> d10_sql,
    "d11_embedding_groups" -> d11_sql,
    "s01_ann_topk" -> s01_sql,
    "s02_ann_lsh" -> s02_sql,
    "s03_ann_ivf" -> s03_sql,
    "s04_ann_quantized" -> s04_sql,
    "s10_ann_rerank" -> s10_sql,
    "s11_mmr_topk" -> s11_sql,
    "s05_ann_recall" -> s05_sql,
    "t01_text_stats" -> t01_sql,
    "t02_langid" -> t02_sql,
    "t03_fingerprint" -> t03_sql,
    "t04_repetition" -> t04_sql,
    "t05_gram_topk" -> t05_sql,
    "t06_corpus_report" -> t06_sql,
    "m01_multimodal_features" -> m01_sql,
    "m02_video_neardup" -> m02_sql,
    "m03_image_neardup" -> m03_sql,
    "m04_audio_neardup" -> m04_sql,
    "m05_bmp_decode" -> m05_sql,
    "m15_png_decode" -> m15_sql,
    "m16_crosscontainer_dedup" -> m16_sql,
    "m17_mulaw_decode" -> m17_sql,
    "m06_wav_decode" -> m06_sql,
    "m07_bmp_neardup" -> m07_sql,
    "m08_wav_neardup" -> m08_sql,
    "m09_y4m_decode" -> m09_sql,
    "m10_y4m_neardup" -> m10_sql,
    "m14_y4m_align" -> m14_sql,
    "d59_crossmodal_groups" -> d59_sql,
    "m11_bmp_resize" -> m11_sql,
    "m12_frame_sample" -> m12_sql,
    "t35_lm_quality" -> t35_sql,
    "t36_lm_per_lang" -> t36_sql,
    "t37_lm_trigram" -> t37_sql,
    "m13_audio_decimate" -> m13_sql)
}
