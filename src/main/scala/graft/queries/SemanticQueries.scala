package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.VectorSearch
import graft.queries.DataPipelineQueries.{DupVecCorpusSql, derivedPlanes, dupVecCorpus}

/** Embedding-space curation operators, driver-checked: SemDeDup-style
  * semantic dedup (cluster-scoped near-dup) and embedding-space eval
  * decontamination. Same determinism rules as [[DataPipelineQueries]]:
  * cosine/distance doubles are computed with the same fold order on
  * both engines and every hashed output column is integer or boolean.
  * Threshold margins: s09's 0.85 sits below the entire planted band
  * (≥ ~0.876) and far above organic cosines (≤ ~0.6). d27's 0.9 deliberately
  * sits INSIDE the planted band — it separates exact copies (1.0,
  * dropped) from perturbed near-copies (~0.876, kept) with a ~0.024
  * margin; that margin is safe because both engines compute the
  * identical fold-order dot product on the identical doubles (planted
  * perturbations are fixed integers /1000, nowhere near 0.9), not
  * because the threshold clears the whole score range.
  */
object SemanticQueries {

  type Q = (SparkSession, String) => DataFrame

  // ── d27: SemDeDup-style semantic dedup ──────────────────────────────

  /** Cluster-then-dedup (the SemDeDup shape): every vector of the
    * planted corpus is assigned to its nearest coarse centroid (the 8
    * highest-id embeddings — the s03 IVF recipe), then dropped iff a
    * lower-id SAME-CELL neighbor has cosine ≥ 0.9. Output is one row
    * per vector: (vec_id, cell, is_kept).
    *
    * vs d05/d11 (banded-LSH near-dup): candidates here come from a
    * CLUSTERING, not signature agreement — cost is Σ cell², cross-cell
    * duplicates are missed by design, and the cell label itself is a
    * useful curation artifact (domain-ish grouping for mixing /
    * diversity sampling). The oracle replays the identical argmin
    * assignment (same `v·v − 2·v·c + c·c` term order) and drop rule.
    */
  val d27_semantic_dedup: Q = (s, dir) => {
    VectorSearch.semanticDedup(dupVecCorpus(s, dir), "vec_id", "vec",
        centroids = derivedPlanes(s, dir, 8), threshold = 0.9)
      .select(col("id").as("vec_id"), col("cell"), col("is_kept"))
      .orderBy(col("vec_id"))
  }

  val d27_sql: String =
    s"""WITH $DupVecCorpusSql,
       |cents AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c,
       |         CAST(embedding AS DOUBLE[]) AS cvec
       |  FROM embeddings
       |  WHERE vec_id > (SELECT MAX(vec_id) FROM embeddings) - 8
       |),
       |assign AS (
       |  SELECT vec_id, vec, c FROM (
       |    SELECT v.vec_id, v.vec, c.c,
       |           ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |             ORDER BY list_inner_product(v.vec, v.vec)
       |                      - 2.0 * list_inner_product(v.vec, c.cvec)
       |                      + list_inner_product(c.cvec, c.cvec) ASC, c.c ASC) AS rn
       |    FROM vecs v CROSS JOIN cents c) t
       |  WHERE rn = 1
       |),
       |dropped AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM assign a JOIN assign b ON a.c = b.c AND a.vec_id < b.vec_id
       |  WHERE list_cosine_similarity(a.vec, b.vec) >= 0.9
       |)
       |SELECT a.vec_id, CAST(a.c AS BIGINT) AS cell, d.vec_id IS NULL AS is_kept
       |FROM assign a LEFT JOIN dropped d ON d.vec_id = a.vec_id
       |ORDER BY a.vec_id""".stripMargin

  // ── s09: embedding-space decontamination ────────────────────────────

  /** Embedding-space eval decontamination: corpus vectors whose cosine
    * to ANY eval vector reaches 0.85 — the semantic sibling of the
    * n-gram decontamination (d07), catching paraphrased leakage exact
    * grams miss. Eval set = base embeddings with vec_id % 100 < 10 (a
    * deterministic sample that scales with the corpus); corpus = the
    * planted dup corpus minus those base rows, so the planted copies of
    * eval members are the guaranteed leaks. Output: one row per
    * contaminated vector with its hit count and argmax-cosine eval id.
    */
  val s09_embedding_decontam: Q = (s, dir) => {
    val e = Tables(s, dir, "embeddings")
    val evals = e.filter(col("vec_id") % 100 < 10)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("vec"))
    val corpus = dupVecCorpus(s, dir)
      .filter(col("vec_id") >= 1000000000L || col("vec_id") % 100 >= 10)
    VectorSearch.decontamFlags(corpus, evals, "vec_id", "vec", "vec_id",
        threshold = 0.85)
      .select(col("id").as("vec_id"), col("n_eval_hits"), col("best_eval_id"))
      .orderBy(col("vec_id"))
  }

  val s09_sql: String =
    s"""WITH $DupVecCorpusSql,
       |evals AS (
       |  SELECT vec_id AS eval_id, CAST(embedding AS DOUBLE[]) AS evec
       |  FROM embeddings WHERE vec_id % 100 < 10
       |),
       |hits AS (
       |  SELECT c.vec_id, e.eval_id,
       |         list_cosine_similarity(c.vec, e.evec) AS cos
       |  FROM vecs c CROSS JOIN evals e
       |  WHERE (c.vec_id >= 1000000000 OR c.vec_id % 100 >= 10)
       |    AND list_cosine_similarity(c.vec, e.evec) >= 0.85
       |),
       |ranked AS (
       |  SELECT vec_id, eval_id,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id
       |                            ORDER BY cos DESC, eval_id ASC) AS rn
       |  FROM hits
       |)
       |SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_eval_hits,
       |       MIN(CASE WHEN rn = 1 THEN eval_id END) AS best_eval_id
       |FROM ranked GROUP BY vec_id
       |ORDER BY vec_id""".stripMargin

  // ── s12: quantized k-means clustering ───────────────────────────────

  /** Fixed-iteration Lloyd k-means over the int8-quantized embedding
    * corpus ([[graft.operators.VectorSearch.quantizedKMeans]]): k=8,
    * three assignment passes, seeds = the 8 lowest vec_ids. The cluster
    * label is the curation primitive behind cluster-balanced mixing,
    * SemDeDup cells (d27 uses fixed centroids; this LEARNS them) and
    * IVF coarse quantizers (s03). Integer quantization is what makes a
    * LEARNED clustering engine-replayable at all: distances are exact
    * integers, centroid updates are floor(sum/count) with one IEEE
    * double division, argmin ties break to the lower cluster index —
    * the oracle replays all three passes as unrolled CTEs and
    * hash-matches (vec_id, cluster, sq_dist) row for row.
    */
  val s12_kmeans: Q = (s, dir) => {
    VectorSearch.quantizedKMeans(Tables(s, dir, "embeddings"),
        "vec_id", "embedding", k = 8, iters = 3)
      .select(col("id").as("vec_id"), col("cluster"), col("sq_dist"))
      .orderBy(col("vec_id"))
  }

  /** One Lloyd assignment pass: exact integer distances to every
    * centroid of `prevC`, argmin with ties to the lower cluster index.
    */
  private def kmAssign(i: Int, prevC: String): String =
    s"""d$i AS (
       |  SELECT e.vec_id, c.c,
       |         CAST(SUM(CAST(e.val - c.val AS BIGINT) * (e.val - c.val)) AS BIGINT) AS dist
       |  FROM e JOIN $prevC c ON c.pos = e.pos GROUP BY e.vec_id, c.c
       |),
       |a$i AS (
       |  SELECT vec_id, c, dist FROM (
       |    SELECT vec_id, c, dist,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn
       |    FROM d$i) t
       |  WHERE rn = 1
       |)""".stripMargin

  /** One centroid update: floor(sum/count) per component; clusters
    * that lost every member keep their previous centroid (COALESCE).
    */
  private def kmUpdate(i: Int, prevC: String): String =
    s"""s$i AS (
       |  SELECT a.c, e.pos, CAST(SUM(e.val) AS BIGINT) AS sv,
       |         CAST(COUNT(*) AS BIGINT) AS n
       |  FROM a$i a JOIN e ON e.vec_id = a.vec_id GROUP BY a.c, e.pos
       |),
       |c$i AS (
       |  SELECT p.c, p.pos,
       |         COALESCE(CAST(FLOOR(CAST(s.sv AS DOUBLE) / s.n) AS INT), p.val) AS val
       |  FROM $prevC p LEFT JOIN s$i s ON s.c = p.c AND s.pos = p.pos
       |)""".stripMargin

  val s12_sql: String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
       |sc AS (SELECT MAX(list_max(list_transform(vec, x -> ABS(x)))) AS scale FROM v),
       |q AS (
       |  SELECT vec_id,
       |         list_transform(vec, x -> CAST(ROUND(x / sc.scale * 127) AS INT)) AS qvec
       |  FROM v, sc
       |),
       |u AS (SELECT vec_id, qvec, unnest(range(1, len(qvec) + 1)) AS i FROM q),
       |e AS (SELECT vec_id, CAST(i - 1 AS INT) AS pos, qvec[i] AS val FROM u),
       |seeds AS (
       |  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c
       |  FROM (SELECT vec_id FROM q ORDER BY vec_id LIMIT 8) t
       |),
       |c0 AS (SELECT s.c, e.pos, e.val FROM seeds s JOIN e ON e.vec_id = s.vec_id),
       |${kmAssign(1, "c0")},
       |${kmUpdate(1, "c0")},
       |${kmAssign(2, "c1")},
       |${kmUpdate(2, "c1")},
       |${kmAssign(3, "c2")}
       |SELECT vec_id, CAST(c AS INT) AS cluster, dist AS sq_dist
       |FROM a3 ORDER BY vec_id""".stripMargin

  // ── s13: product-quantization ANN (asymmetric distance) ────────────

  /** PQ/ADC top-10 ([[VectorSearch.pqTopK]]): 4 subspaces × 16 dims,
    * 8 codes per subspace — codebook s is the s-th slice of the 8
    * highest-id embedding vectors (the derivedPlanes recipe, so the
    * oracle rebuilds the codebooks from the parquet alone). Corpus rows
    * compress to 4×3 bits; queries score candidates by summed
    * distance-table lookups, never a per-pair dot product.
    *
    * Determinism: codes are integer argmins (d ASC, code ASC), and both
    * engines fold the 4 subspace distances in the same order
    * (((d0+d1)+d2)+d3) over identical doubles, so the rank window sees
    * identical keys; the oracle ranks dist ASC where Spark ranks
    * −dist DESC — an exact negation, not a float transform.
    */
  val s13_pq_ann: Q = (s, dir) => {
    val planes = derivedPlanes(s, dir, 8)
    val codebooks = (0 until 4).map(sub =>
      planes.map(_.slice(sub * 16, sub * 16 + 16)))
    val e = Tables(s, dir, "embeddings")
    VectorSearch.pqTopK(
        corpus = e, queries = e.filter(col("vec_id") < 5),
        idCol = "vec_id", vecCol = "embedding", queryIdCol = "vec_id",
        codebooks = codebooks, k = 10)
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }

  val s13_sql: String =
    """WITH cents AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS j,
      |         CAST(embedding AS DOUBLE[]) AS cvec
      |  FROM embeddings
      |  WHERE vec_id > (SELECT MAX(vec_id) FROM embeddings) - 8
      |),
      |vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
      |ss AS (SELECT unnest(range(4)) AS s),
      |subs AS (
      |  SELECT v.vec_id, ss.s, list_slice(v.vec, ss.s*16 + 1, ss.s*16 + 16) AS sub
      |  FROM vecs v CROSS JOIN ss
      |),
      |csubs AS (
      |  SELECT c.j, ss.s, list_slice(c.cvec, ss.s*16 + 1, ss.s*16 + 16) AS csub
      |  FROM cents c CROSS JOIN ss
      |),
      |dists AS (
      |  SELECT sb.vec_id, sb.s, cs.j,
      |         list_inner_product(sb.sub, sb.sub)
      |           - 2.0 * list_inner_product(sb.sub, cs.csub)
      |           + list_inner_product(cs.csub, cs.csub) AS d
      |  FROM subs sb JOIN csubs cs ON cs.s = sb.s
      |),
      |codes AS (
      |  SELECT vec_id, s, j AS code FROM (
      |    SELECT vec_id, s, j,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d ASC, j ASC) AS rn
      |    FROM dists) t
      |  WHERE rn = 1
      |),
      |qd AS (SELECT vec_id AS query_id, s, j, d FROM dists WHERE vec_id < 5),
      |parts AS (
      |  SELECT q.query_id, co.vec_id AS id, co.s, q.d
      |  FROM codes co JOIN qd q ON q.s = co.s AND q.j = co.code
      |  WHERE co.vec_id <> q.query_id
      |),
      |scores AS (
      |  SELECT query_id, id,
      |         ((MAX(CASE WHEN s = 0 THEN d END)
      |           + MAX(CASE WHEN s = 1 THEN d END))
      |           + MAX(CASE WHEN s = 2 THEN d END))
      |           + MAX(CASE WHEN s = 3 THEN d END) AS dist
      |  FROM parts GROUP BY query_id, id
      |)
      |SELECT query_id, rank, id FROM (
      |  SELECT query_id, id,
      |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist ASC, id ASC) AS rank
      |  FROM scores) t
      |WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  // ── s14: IVF-PQ composite ANN ──────────────────────────────────────

  /** The billion-scale index shape ([[VectorSearch.ivfPqTopK]]): s03's
    * coarse partition-and-probe fused with s13's PQ/ADC scoring — the
    * corpus is stored as (cell, 4×3-bit codes), queries probe 2 cells
    * and score by distance-table lookups. Coarse centroids AND
    * codebooks both come from the derivedPlanes recipe (the 8
    * highest-id vectors; codebook s = their s-th 16-dim slice), so the
    * oracle rebuilds the full index from the parquet alone and replays
    * the identical argmins, fixed-order ADC fold, and (dist ASC,
    * id ASC) ranking.
    */
  val s14_ivf_pq: Q = (s, dir) => {
    val planes = derivedPlanes(s, dir, 8)
    val codebooks = (0 until 4).map(sub =>
      planes.map(_.slice(sub * 16, sub * 16 + 16)))
    val e = Tables(s, dir, "embeddings")
    VectorSearch.ivfPqTopK(
        corpus = e, queries = e.filter(col("vec_id") < 5),
        idCol = "vec_id", vecCol = "embedding", queryIdCol = "vec_id",
        centroids = planes, codebooks = codebooks, k = 10, nProbe = 2)
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Replay = s03's coarse CTEs (assign/probes) ∘ s13's PQ CTEs
    * (codes/qd), candidates restricted to probed cells before the ADC
    * sum and rank.
    */
  val s14_sql: String =
    """WITH cents AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS j,
      |         CAST(embedding AS DOUBLE[]) AS cvec
      |  FROM embeddings
      |  WHERE vec_id > (SELECT MAX(vec_id) FROM embeddings) - 8
      |),
      |vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
      |cdists AS (
      |  SELECT v.vec_id, c.j,
      |         ROW_NUMBER() OVER (PARTITION BY v.vec_id
      |           ORDER BY list_inner_product(v.vec, v.vec)
      |                    - 2.0 * list_inner_product(v.vec, c.cvec)
      |                    + list_inner_product(c.cvec, c.cvec) ASC, c.j ASC) AS rn
      |  FROM vecs v CROSS JOIN cents c
      |),
      |assign AS (SELECT vec_id, j AS cell FROM cdists WHERE rn = 1),
      |probes AS (SELECT vec_id, j AS cell FROM cdists WHERE rn <= 2 AND vec_id < 5),
      |cand AS (
      |  SELECT p.vec_id AS query_id, a.vec_id AS id
      |  FROM probes p JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.vec_id
      |),
      |ss AS (SELECT unnest(range(4)) AS s),
      |subs AS (
      |  SELECT v.vec_id, ss.s, list_slice(v.vec, ss.s*16 + 1, ss.s*16 + 16) AS sub
      |  FROM vecs v CROSS JOIN ss
      |),
      |csubs AS (
      |  SELECT c.j, ss.s, list_slice(c.cvec, ss.s*16 + 1, ss.s*16 + 16) AS csub
      |  FROM cents c CROSS JOIN ss
      |),
      |sdists AS (
      |  SELECT sb.vec_id, sb.s, cs.j,
      |         list_inner_product(sb.sub, sb.sub)
      |           - 2.0 * list_inner_product(sb.sub, cs.csub)
      |           + list_inner_product(cs.csub, cs.csub) AS d
      |  FROM subs sb JOIN csubs cs ON cs.s = sb.s
      |),
      |codes AS (
      |  SELECT vec_id, s, j AS code FROM (
      |    SELECT vec_id, s, j,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d ASC, j ASC) AS rn
      |    FROM sdists) t
      |  WHERE rn = 1
      |),
      |qd AS (SELECT vec_id AS query_id, s, j, d FROM sdists WHERE vec_id < 5),
      |parts AS (
      |  SELECT cd.query_id, cd.id, co.s, q.d
      |  FROM cand cd
      |  JOIN codes co ON co.vec_id = cd.id
      |  JOIN qd q ON q.query_id = cd.query_id AND q.s = co.s AND q.j = co.code
      |),
      |scores AS (
      |  SELECT query_id, id,
      |         ((MAX(CASE WHEN s = 0 THEN d END)
      |           + MAX(CASE WHEN s = 1 THEN d END))
      |           + MAX(CASE WHEN s = 2 THEN d END))
      |           + MAX(CASE WHEN s = 3 THEN d END) AS dist
      |  FROM parts GROUP BY query_id, id
      |)
      |SELECT query_id, rank, id FROM (
      |  SELECT query_id, id,
      |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist ASC, id ASC) AS rank
      |  FROM scores) t
      |WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  // ── s15: persisted ANN index (index once, query many) ──────────────

  /** The index-persistence split every ANN deployment runs:
    * [[VectorSearch.encodeIvfPq]] builds the compressed inverted file
    * (cell + 4 codes per row), a [[graft.sources.SnapshotStore]]
    * generation persists it, and [[VectorSearch.searchIvfPq]] serves
    * the query from the STORED codes — raw vectors are never read at
    * query time. Results are identical to s14's fused run (the stored
    * codes are the same integers), so the oracle is s14's replay
    * verbatim; what this query pins is that persistence round-trips
    * the index losslessly.
    */
  val s15_ann_index_store: Q = (s, dir) => {
    val planes = derivedPlanes(s, dir, 8)
    val codebooks = (0 until 4).map(sub =>
      planes.map(_.slice(sub * 16, sub * 16 + 16)))
    val e = Tables(s, dir, "embeddings")
    val root = java.nio.file.Files.createTempDirectory("graft-annidx")
      .toFile.getAbsolutePath + "/t"
    val st = new graft.sources.SnapshotStore(s, root)
    st.commit(VectorSearch.encodeIvfPq(e, "vec_id", "embedding", planes, codebooks),
      commitTsMillis = 1000L)
    VectorSearch.searchIvfPq(st.readLatest(), e.filter(col("vec_id") < 5),
        "vec_id", "embedding", planes, codebooks, k = 10, nProbe = 2)
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ── w23: streaming ANN index maintenance ───────────────────────────

  /** CONTINUOUS INGESTION into the persisted ANN index — the
    * operational gap between s15 (index once, query many) and a live
    * corpus: new vectors must become searchable without rebuilding
    * the inverted file. Because [[VectorSearch.encodeIvfPq]] is
    * row-local (each row's cell + codes depend only on that row and
    * the FROZEN centroids/codebooks), a micro-batch encodes
    * independently and APPENDS to the index store
    * ([[graft.streaming.SnapshotSink.appendBatch]] — exactly-once on
    * redelivery, snapshot isolation for concurrent readers, and
    * O(batch) work per commit: raw vectors are encoded once and
    * never touched again). Three vector batches arrive (vec_id mod
    * 3); batch 1 is replayed and must no-op (require-guarded, with
    * the version count pinned at 3); the final search over the
    * ACCUMULATED index must equal s14/s15's batch-built result
    * verbatim — the oracle is s14's full replay, so a lost, doubled,
    * or re-encoded batch shifts the ranking and fails the hash.
    */
  val w23_stream_ann_index: Q = (s, dir) => {
    val planes = derivedPlanes(s, dir, 8)
    val codebooks = (0 until 4).map(sub =>
      planes.map(_.slice(sub * 16, sub * 16 + 16)))
    val e = Tables(s, dir, "embeddings")
    val root = java.nio.file.Files.createTempDirectory("graft-annstream")
      .toFile.getAbsolutePath + "/t"
    val st = new graft.sources.SnapshotStore(s, root)
    (0 until 3).foreach { i =>
      val batch = e.filter(col("vec_id") % 3 === i)
      graft.streaming.SnapshotSink.appendBatch(st,
        VectorSearch.encodeIvfPq(batch, "vec_id", "embedding", planes, codebooks),
        batchId = i.toLong)
    }
    // crash replay: batch 1 redelivered — must no-op, not re-append
    require(graft.streaming.SnapshotSink.appendBatch(st,
      VectorSearch.encodeIvfPq(e.filter(col("vec_id") % 3 === 1),
        "vec_id", "embedding", planes, codebooks), batchId = 1L) == -1L,
      "redelivered batch was re-applied")
    require(st.loggedVersions().size == 3,
      s"expected 3 index generations, got ${st.loggedVersions().size}")
    VectorSearch.searchIvfPq(st.readLatest(), e.filter(col("vec_id") < 5),
        "vec_id", "embedding", planes, codebooks, k = 10, nProbe = 2)
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ── s22: ANN index deletions (tombstone + compact) ─────────────────

  /** DELETIONS in the live ANN index — the operational gap w23's
    * append-only ingestion leaves open (right-to-be-forgotten, stale
    * document eviction): the encoded index lives in a
    * [[graft.sources.MorStore]] keyed by vector id, so deletes are
    * O(batch) TOMBSTONE deltas (the Lucene/Milvus mark-then-compact
    * shape) applied by the store's resolve at serve time, and a
    * compaction folds them away physically. Batches: base third,
    * upsert third, then a mixed delta (final third + D tombstones for
    * ids ≡ 4 mod 9, all previously ingested); a replayed mixed batch
    * must no-op. The serve after compaction must equal the batch
    * search over the surviving corpus — the oracle is s14's replay
    * with the deletion predicate on the candidate side, so a vector
    * that outlives its tombstone (or a tombstone that kills a
    * neighbor) shifts the ranking and fails the hash.
    */
  val s22_ann_deletions: Q = (s, dir) => {
    val planes = derivedPlanes(s, dir, 8)
    val codebooks = (0 until 4).map(sub =>
      planes.map(_.slice(sub * 16, sub * 16 + 16)))
    val e = Tables(s, dir, "embeddings")
    def enc(df: org.apache.spark.sql.DataFrame) =
      VectorSearch.encodeIvfPq(df, "vec_id", "embedding", planes, codebooks)
    val root = java.nio.file.Files.createTempDirectory("graft-anndel")
      .toFile.getAbsolutePath + "/t"
    val st = new graft.sources.MorStore(s, root, Seq("id")) // encode renames the key
    st.commitBase(enc(e.filter(col("vec_id") % 3 === 0)), -1L)
    graft.streaming.MorSink.appendBatch(st,
      enc(e.filter(col("vec_id") % 3 === 1)).withColumn(st.OpCol, lit("U")), 0L)
    val mixed = enc(e.filter(col("vec_id") % 3 === 2))
      .withColumn(st.OpCol, lit("U"))
      .unionByName(enc(e.filter(col("vec_id") % 9 === 4))
        .withColumn(st.OpCol, lit("D")))
    graft.streaming.MorSink.appendBatch(st, mixed, 1L)
    require(graft.streaming.MorSink.appendBatch(st, mixed, 1L) == -1L,
      "redelivered tombstone batch re-applied")
    require(st.read().filter(col("id") % 9 === 4).isEmpty,
      "tombstoned vectors still served")
    st.compact(-2L)
    require(st.read().filter(col("id") % 9 === 4).isEmpty,
      "compaction resurrected tombstoned vectors")
    VectorSearch.searchIvfPq(st.read(), e.filter(col("vec_id") < 5),
        "vec_id", "embedding", planes, codebooks, k = 10, nProbe = 2)
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** s14's replay with the deletion predicate on the candidate side —
    * string surgery keeps the two replays in lockstep by
    * construction.
    */
  def s22_sql: String = s14_sql.replace(
    "a.vec_id <> p.vec_id",
    "a.vec_id <> p.vec_id AND a.vec_id % 9 <> 4")

  // ── s16: IVF-PQ with residual encoding (IVFADC proper) ─────────────

  /** s14's index with the residual mechanism (Jégou et al. §IV —
    * IVFADC proper): PQ codes quantize `v − centroid(cell)` and the
    * query builds its ADC table from ITS residual w.r.t. each probed
    * cell. Same plan shape as s14 (one encode scan, one broadcast,
    * one rank-window shuffle); the oracle replay adds one
    * centroid-subtraction join per side.
    *
    * Measured caveat (COVERAGE round-8): with the data-derived
    * codebooks this suite uses (raw corpus-vector slices — the
    * deterministic recipe the oracle can rebuild from parquet alone),
    * residual encoding REDUCES overlap with the exact ranking
    * (0.08 vs 0.24 raw-PQ at sf0.001): residuals concentrate near the
    * origin while the codewords stay raw-vector-sized, so the
    * quantizer maps everything to far-away entries. The gain Jégou
    * reports requires codebooks TRAINED on residuals (a k-means pass
    * over residual subvectors — operationally [[VectorSearch
    * .quantizedKMeans]], but its oracle replay composed into this one
    * is out of scope). What this query pins is the residual
    * MACHINERY, bit-exact across engines.
    */
  val s16_ivf_pq_residual: Q = (s, dir) => {
    val planes = derivedPlanes(s, dir, 8)
    val codebooks = (0 until 4).map(sub =>
      planes.map(_.slice(sub * 16, sub * 16 + 16)))
    val e = Tables(s, dir, "embeddings")
    val enc = VectorSearch.encodeIvfPq(e, "vec_id", "embedding",
      planes, codebooks, residual = true)
    VectorSearch.searchIvfPq(enc, e.filter(col("vec_id") < 5),
        "vec_id", "embedding", planes, codebooks, k = 10, nProbe = 2,
        residual = true)
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }

  val s16_sql: String =
    """WITH cents AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS j,
      |         CAST(embedding AS DOUBLE[]) AS cvec
      |  FROM embeddings
      |  WHERE vec_id > (SELECT MAX(vec_id) FROM embeddings) - 8
      |),
      |vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
      |cdists AS (
      |  SELECT v.vec_id, c.j,
      |         ROW_NUMBER() OVER (PARTITION BY v.vec_id
      |           ORDER BY list_inner_product(v.vec, v.vec)
      |                    - 2.0 * list_inner_product(v.vec, c.cvec)
      |                    + list_inner_product(c.cvec, c.cvec) ASC, c.j ASC) AS rn
      |  FROM vecs v CROSS JOIN cents c
      |),
      |assign AS (SELECT vec_id, j AS cell FROM cdists WHERE rn = 1),
      |probes AS (SELECT vec_id, j AS cell FROM cdists WHERE rn <= 2 AND vec_id < 5),
      |cand AS (
      |  SELECT p.vec_id AS query_id, a.vec_id AS id, a.cell
      |  FROM probes p JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.vec_id
      |),
      |ss AS (SELECT unnest(range(4)) AS s),
      |csubs AS (
      |  SELECT c.j, ss.s, list_slice(c.cvec, ss.s*16 + 1, ss.s*16 + 16) AS csub
      |  FROM cents c CROSS JOIN ss
      |),
      |rsubs AS (
      |  SELECT v.vec_id, ss.s,
      |    list_transform(range(1, 17), i ->
      |      v.vec[CAST(ss.s*16 + i AS INT)] - c.cvec[CAST(ss.s*16 + i AS INT)]) AS sub
      |  FROM vecs v
      |  JOIN assign a ON a.vec_id = v.vec_id
      |  JOIN cents c ON c.j = a.cell
      |  CROSS JOIN ss
      |),
      |sdists AS (
      |  SELECT sb.vec_id, sb.s, cs.j,
      |         list_inner_product(sb.sub, sb.sub)
      |           - 2.0 * list_inner_product(sb.sub, cs.csub)
      |           + list_inner_product(cs.csub, cs.csub) AS d
      |  FROM rsubs sb JOIN csubs cs ON cs.s = sb.s
      |),
      |codes AS (
      |  SELECT vec_id, s, j AS code FROM (
      |    SELECT vec_id, s, j,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d ASC, j ASC) AS rn
      |    FROM sdists) t
      |  WHERE rn = 1
      |),
      |qrsubs AS (
      |  SELECT p.vec_id AS query_id, p.cell, ss.s,
      |    list_transform(range(1, 17), i ->
      |      v.vec[CAST(ss.s*16 + i AS INT)] - c.cvec[CAST(ss.s*16 + i AS INT)]) AS sub
      |  FROM probes p
      |  JOIN vecs v ON v.vec_id = p.vec_id
      |  JOIN cents c ON c.j = p.cell
      |  CROSS JOIN ss
      |),
      |qd AS (
      |  SELECT q.query_id, q.cell, q.s, cs.j,
      |         list_inner_product(q.sub, q.sub)
      |           - 2.0 * list_inner_product(q.sub, cs.csub)
      |           + list_inner_product(cs.csub, cs.csub) AS d
      |  FROM qrsubs q JOIN csubs cs ON cs.s = q.s
      |),
      |parts AS (
      |  SELECT cd.query_id, cd.id, co.s, q.d
      |  FROM cand cd
      |  JOIN codes co ON co.vec_id = cd.id
      |  JOIN qd q ON q.query_id = cd.query_id AND q.cell = cd.cell
      |            AND q.s = co.s AND q.j = co.code
      |),
      |scores AS (
      |  SELECT query_id, id,
      |         ((MAX(CASE WHEN s = 0 THEN d END)
      |           + MAX(CASE WHEN s = 1 THEN d END))
      |           + MAX(CASE WHEN s = 2 THEN d END))
      |           + MAX(CASE WHEN s = 3 THEN d END) AS dist
      |  FROM parts GROUP BY query_id, id
      |)
      |SELECT query_id, rank, id FROM (
      |  SELECT query_id, id,
      |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist ASC, id ASC) AS rank
      |  FROM scores) t
      |WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  // ── s20: PQ with TRAINED sub-codebooks ─────────────────────────────

  /** s14's IVF-PQ with codebooks TRAINED per subspace — the round-8
    * next-steps item that makes quantization error a function of the
    * DATA rather than of arbitrary slice choices: each of the 4
    * subspaces runs the s12 integer-exact Lloyd loop (k=8, 3 passes)
    * over its 16-dim slice corpus, the learned integer centroids map
    * back to doubles (`ci × scale ÷ 127`), and the index/search path
    * is byte-identical to s14 with those codebooks. The oracle
    * composes the s12 k-means replay (per subspace — quantization,
    * seeding, two update rounds) INTO the s14 ADC replay, so the
    * training dynamics and the search are pinned end-to-end in one
    * hash.
    */
  val s20_trained_pq: Q = (s, dir) => {
    val e = Tables(s, dir, "embeddings")
    val planes = derivedPlanes(s, dir, 8)
    val codebooks = (0 until 4).map { sub =>
      VectorSearch.quantizedKMeansModel(
        e.select(col("vec_id"),
          slice(col("embedding"), sub * 16 + 1, 16).as("embedding")),
        "vec_id", "embedding", k = 8, iters = 3)
    }
    VectorSearch.ivfPqTopK(
        corpus = e, queries = e.filter(col("vec_id") < 5),
        idCol = "vec_id", vecCol = "embedding", queryIdCol = "vec_id",
        centroids = planes, codebooks = codebooks, k = 10, nProbe = 2)
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }

  val s20_sql: String =
    s"""WITH cents AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS j,
       |         CAST(embedding AS DOUBLE[]) AS cvec
       |  FROM embeddings
       |  WHERE vec_id > (SELECT MAX(vec_id) FROM embeddings) - 8
       |),
       |vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
       |ss AS (SELECT unnest(range(4)) AS s),
       |subs AS (
       |  SELECT v.vec_id, ss.s, list_slice(v.vec, ss.s*16 + 1, ss.s*16 + 16) AS sub
       |  FROM vecs v CROSS JOIN ss
       |),
       |scl AS (
       |  SELECT s, MAX(list_max(list_transform(sub, x -> ABS(x)))) AS scale
       |  FROM subs GROUP BY s
       |),
       |qs AS (
       |  SELECT sb.vec_id, sb.s,
       |         list_transform(sb.sub, x -> CAST(ROUND(x / sc.scale * 127) AS INT)) AS qvec
       |  FROM subs sb JOIN scl sc ON sc.s = sb.s
       |),
       |uu AS (SELECT vec_id, s, qvec, unnest(range(1, len(qvec) + 1)) AS i FROM qs),
       |el AS (SELECT vec_id, s, CAST(i - 1 AS INT) AS pos, qvec[i] AS val FROM uu),
       |seeds AS (
       |  SELECT s, vec_id, rn - 1 AS c FROM (
       |    SELECT s, vec_id,
       |           ROW_NUMBER() OVER (PARTITION BY s ORDER BY vec_id) AS rn
       |    FROM qs) t
       |  WHERE rn <= 8
       |),
       |c0 AS (
       |  SELECT sd.s, sd.c, el.pos, el.val FROM seeds sd
       |  JOIN el ON el.vec_id = sd.vec_id AND el.s = sd.s
       |),
       |d1 AS (
       |  SELECT e.vec_id, e.s, c.c,
       |         CAST(SUM(CAST(e.val - c.val AS BIGINT) * (e.val - c.val)) AS BIGINT) AS dist
       |  FROM el e JOIN c0 c ON c.s = e.s AND c.pos = e.pos
       |  GROUP BY e.vec_id, e.s, c.c
       |),
       |a1 AS (
       |  SELECT vec_id, s, c FROM (
       |    SELECT vec_id, s, c,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, c) AS rn
       |    FROM d1) t
       |  WHERE rn = 1
       |),
       |s1 AS (
       |  SELECT a.c, e.s, e.pos, CAST(SUM(e.val) AS BIGINT) AS sv,
       |         CAST(COUNT(*) AS BIGINT) AS n
       |  FROM a1 a JOIN el e ON e.vec_id = a.vec_id AND e.s = a.s
       |  GROUP BY a.c, e.s, e.pos
       |),
       |c1 AS (
       |  SELECT p.s, p.c, p.pos,
       |         COALESCE(CAST(FLOOR(CAST(x.sv AS DOUBLE) / x.n) AS INT), p.val) AS val
       |  FROM c0 p LEFT JOIN s1 x ON x.c = p.c AND x.s = p.s AND x.pos = p.pos
       |),
       |d2 AS (
       |  SELECT e.vec_id, e.s, c.c,
       |         CAST(SUM(CAST(e.val - c.val AS BIGINT) * (e.val - c.val)) AS BIGINT) AS dist
       |  FROM el e JOIN c1 c ON c.s = e.s AND c.pos = e.pos
       |  GROUP BY e.vec_id, e.s, c.c
       |),
       |a2 AS (
       |  SELECT vec_id, s, c FROM (
       |    SELECT vec_id, s, c,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, c) AS rn
       |    FROM d2) t
       |  WHERE rn = 1
       |),
       |s2 AS (
       |  SELECT a.c, e.s, e.pos, CAST(SUM(e.val) AS BIGINT) AS sv,
       |         CAST(COUNT(*) AS BIGINT) AS n
       |  FROM a2 a JOIN el e ON e.vec_id = a.vec_id AND e.s = a.s
       |  GROUP BY a.c, e.s, e.pos
       |),
       |c2 AS (
       |  SELECT p.s, p.c, p.pos,
       |         COALESCE(CAST(FLOOR(CAST(x.sv AS DOUBLE) / x.n) AS INT), p.val) AS val
       |  FROM c1 p LEFT JOIN s2 x ON x.c = p.c AND x.s = p.s AND x.pos = p.pos
       |),
       |cbl AS (
       |  SELECT cc.s, cc.c,
       |         list((CAST(cc.val AS DOUBLE) * sc.scale) / 127.0 ORDER BY cc.pos) AS cvec
       |  FROM c2 cc JOIN scl sc ON sc.s = cc.s
       |  GROUP BY cc.s, cc.c
       |),
       |sdists AS (
       |  SELECT sb.vec_id, sb.s, cb.c AS j,
       |         list_inner_product(sb.sub, sb.sub)
       |           - 2.0 * list_inner_product(sb.sub, cb.cvec)
       |           + list_inner_product(cb.cvec, cb.cvec) AS d
       |  FROM subs sb JOIN cbl cb ON cb.s = sb.s
       |),
       |codes AS (
       |  SELECT vec_id, s, j AS code FROM (
       |    SELECT vec_id, s, j,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d ASC, j ASC) AS rn
       |    FROM sdists) t
       |  WHERE rn = 1
       |),
       |cdists AS (
       |  SELECT v.vec_id, c.j,
       |         ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |           ORDER BY list_inner_product(v.vec, v.vec)
       |                    - 2.0 * list_inner_product(v.vec, c.cvec)
       |                    + list_inner_product(c.cvec, c.cvec) ASC, c.j ASC) AS rn
       |  FROM vecs v CROSS JOIN cents c
       |),
       |assign AS (SELECT vec_id, j AS cell FROM cdists WHERE rn = 1),
       |probes AS (SELECT vec_id, j AS cell FROM cdists WHERE rn <= 2 AND vec_id < 5),
       |cand AS (
       |  SELECT p.vec_id AS query_id, a.vec_id AS id
       |  FROM probes p JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.vec_id
       |),
       |qd AS (SELECT vec_id AS query_id, s, j, d FROM sdists WHERE vec_id < 5),
       |parts AS (
       |  SELECT cd.query_id, cd.id, co.s, q.d
       |  FROM cand cd
       |  JOIN codes co ON co.vec_id = cd.id
       |  JOIN qd q ON q.query_id = cd.query_id AND q.s = co.s AND q.j = co.code
       |),
       |scores AS (
       |  SELECT query_id, id,
       |         ((MAX(CASE WHEN s = 0 THEN d END)
       |           + MAX(CASE WHEN s = 1 THEN d END))
       |           + MAX(CASE WHEN s = 2 THEN d END))
       |           + MAX(CASE WHEN s = 3 THEN d END) AS dist
       |  FROM parts GROUP BY query_id, id
       |)
       |SELECT query_id, rank, id FROM (
       |  SELECT query_id, id,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist ASC, id ASC) AS rank
       |  FROM scores) t
       |WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  // ── s24: IVF-PQ + exact refine (the recall lever that works here) ──

  /** s20's trained IVF-PQ with the FAISS refine stage
    * ([[graft.operators.VectorSearch.searchIvfPqRefined]]): ADC
    * shortlists 50 candidates from 4 probed cells, exact cosine
    * re-ranks only those. WHY this is the quality item's answer
    * (r12 verdict 4, measured in PqRecallProbe → COVERAGE): the
    * synthetic embeddings are isotropic unit vectors whose top-10
    * cosine gaps (0.002-0.03) sit far below 40-bit quantization
    * noise, so codebook levers stall — k=32, 8 subspaces, more Lloyd
    * passes, farthest-point seeding all measured ≤ 0.36 overlap@10,
    * and pure farthest seeding REGRESSED to 0.08 (outlier-chasing;
    * kept as a documented negative result). Refine instead converges
    * to the IVF routing ceiling (0.44/0.72/1.00 at nProbe 2/4/8):
    * measured 0.58 here vs 0.26 for s20 — past the ≥ 0.5 bar with
    * the exact scoring confined to |queries|×50 rows. The oracle IS
    * s20's full training+ADC replay, shortlist widened to 50 and
    * probe depth to 4, plus the cosine re-rank tail — one hash pins
    * training, routing, shortlist, and refine together.
    */
  val s24_ivfpq_refined: Q = (s, dir) => {
    val e = Tables(s, dir, "embeddings")
    val planes = derivedPlanes(s, dir, 8)
    val codebooks = (0 until 4).map { sub =>
      VectorSearch.quantizedKMeansModel(
        e.select(col("vec_id"),
          slice(col("embedding"), sub * 16 + 1, 16).as("embedding")),
        "vec_id", "embedding", k = 8, iters = 3)
    }
    val enc = VectorSearch.encodeIvfPq(e, "vec_id", "embedding",
      planes, codebooks)
    VectorSearch.searchIvfPqRefined(enc, e, e.filter(col("vec_id") < 5),
        "vec_id", "vec_id", "embedding", planes, codebooks,
        k = 10, candidates = 50, nProbe = 4)
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** s20's replay with probe depth 4, the shortlist kept at 50, and
    * an exact-cosine re-rank tail (s01's `list_cosine_similarity`
    * convention) — string surgery on the shared text, s22-style, so
    * the training/ADC replay can never drift from s20's.
    */
  val s24_sql: String = validatedS24Sql

  /** Build + VALIDATE the surgery: `String.replace` silently no-ops on
    * a pattern mismatch, so an edit to s20's shared text would
    * otherwise leave s24's oracle quietly replaying the wrong probe
    * depth/shortlist until the hash gate failed with a confusing diff.
    * The requires turn that into an immediate, named failure.
    */
  private def validatedS24Sql: String = {
    val r = s20_sql
      .replace("WHERE rn <= 2 AND vec_id < 5", "WHERE rn <= 4 AND vec_id < 5")
      .replace(
      """SELECT query_id, rank, id FROM (
        |  SELECT query_id, id,
        |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist ASC, id ASC) AS rank
        |  FROM scores) t
        |WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
      """, short AS (
        |  SELECT query_id, id FROM (
        |    SELECT query_id, id,
        |           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist ASC, id ASC) AS rank
        |    FROM scores) t
        |  WHERE rank <= 50
        |),
        |rer AS (
        |  SELECT sh.query_id, sh.id,
        |         list_cosine_similarity(cv.vec, qv.vec) AS cosine
        |  FROM short sh
        |  JOIN vecs cv ON cv.vec_id = sh.id
        |  JOIN vecs qv ON qv.vec_id = sh.query_id
        |)
        |SELECT query_id, rank, id FROM (
        |  SELECT query_id, id,
        |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, id ASC) AS rank
        |  FROM rer) t
        |WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin)
    require(r.contains("WHERE rn <= 4 AND vec_id < 5"),
      "s24 oracle surgery: the probe-depth pattern no longer matches s20's text")
    require(r.contains("WHERE rank <= 50") && r.contains("list_cosine_similarity"),
      "s24 oracle surgery: the shortlist/re-rank tail pattern no longer matches s20's text")
    r
  }

  /** The ONE trained-index configuration s25/s26/s27 share — coarse
    * cells (full-dim Lloyd) plus the four sub-codebooks, all k=8
    * iters=3 first-seeded (the depth the s20 oracle replay pins). A
    * single definition: the three queries must train the SAME index or
    * s26/s27 would persist and forget a different one than s25's
    * oracle replays.
    */
  private def trainedIndexModel(e: DataFrame)(
      implicit cs: graft.operators.CacheScope): (Seq[Seq[Double]], Seq[Seq[Seq[Double]]]) = {
    val coarse = VectorSearch.quantizedKMeansModel(
      e, "vec_id", "embedding", k = 8, iters = 3)
    val codebooks = (0 until 4).map { sub =>
      VectorSearch.quantizedKMeansModel(
        e.select(col("vec_id"),
          slice(col("embedding"), sub * 16 + 1, 16).as("embedding")),
        "vec_id", "embedding", k = 8, iters = 3)
    }
    (coarse, codebooks)
  }

  // ── s25: refined IVF-PQ through TRAINED coarse cells ────────────────

  /** s24 with the COARSE quantizer trained too — the round-14 probe
    * finding that moves the binding constraint itself: the 8 derived
    * planes route np4 at a 0.72 ceiling (0.56 at sf0.1), while
    * k-means cells (full-64-dim s12 Lloyd, k=8, iters=3, first
    * seeding — exactly the replay depth the s20 oracle already pins)
    * measure **np2=0.88 / np4=0.94** at sf0.01 (`PqRecallProbe`
    * ivf-ceiling-trained rows). Everything downstream is s24
    * unchanged: trained sub-codebooks, ADC shortlist of 50, exact
    * cosine re-rank. The oracle trains the coarse quantizer as a
    * FIFTH subspace (s=4, the full 64-dim slice) inside s20's
    * existing per-subspace Lloyd replay, so one chain pins all five
    * trainings plus the search.
    */
  val s25_trained_cells: Q = (s, dir) => {
    val e = Tables(s, dir, "embeddings")
    val (coarse, codebooks) = trainedIndexModel(e)
    val enc = VectorSearch.encodeIvfPq(e, "vec_id", "embedding",
      coarse, codebooks)
    VectorSearch.searchIvfPqRefined(enc, e, e.filter(col("vec_id") < 5),
        "vec_id", "vec_id", "embedding", coarse, codebooks,
        k = 10, candidates = 50, nProbe = 2)
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** s24's replay with the coarse quantizer trained in-chain: the
    * `subs` relation gains an s=4 branch carrying the FULL vector
    * (so the shared Lloyd CTEs train it like any other subspace) and
    * the cell-assignment join reads the s=4 trained centroids from
    * `cbl` instead of the derived-planes `cents` CTE (left in place,
    * unused — CTEs may dangle). Same validated-surgery discipline as
    * s24: a silent replace no-op must fail loudly here, not at the
    * hash gate.
    */
  val s25_sql: String = {
    val subsOld =
      """subs AS (
        |  SELECT v.vec_id, ss.s, list_slice(v.vec, ss.s*16 + 1, ss.s*16 + 16) AS sub
        |  FROM vecs v CROSS JOIN ss
        |),""".stripMargin
    val subsNew =
      """subs AS (
        |  SELECT v.vec_id, ss.s, list_slice(v.vec, ss.s*16 + 1, ss.s*16 + 16) AS sub
        |  FROM vecs v CROSS JOIN ss
        |  UNION ALL
        |  SELECT v.vec_id, 4 AS s, v.vec AS sub FROM vecs v
        |),""".stripMargin
    val centsJoinOld = "FROM vecs v CROSS JOIN cents c"
    val centsJoinNew =
      "FROM vecs v CROSS JOIN (SELECT c AS j, cvec FROM cbl WHERE s = 4) c"
    val r = s24_sql.replace(subsOld, subsNew)
      .replace(centsJoinOld, centsJoinNew)
      // balanced trained cells capture the neighborhood at depth 2;
      // deeper probes only dilute the fixed shortlist with ADC noise
      // (measured: np2 R50 = 0.76 vs np4 R50 = 0.64 at sf0.01)
      .replace("WHERE rn <= 4 AND vec_id < 5", "WHERE rn <= 2 AND vec_id < 5")
    require(r.contains("WHERE rn <= 2 AND vec_id < 5"),
      "s25 oracle surgery: the probe-depth pattern no longer matches s24's text")
    require(r.contains("UNION ALL") && r.contains("4 AS s"),
      "s25 oracle surgery: the subs pattern no longer matches s20's text")
    require(r.contains("FROM cbl WHERE s = 4"),
      "s25 oracle surgery: the cell-assignment pattern no longer matches s20's text")
    r
  }

  // ── s26: the trained index PERSISTED — model + codes + flat store ──

  /** s25's trained-cells index as a SERVING artifact — the FAISS
    * IndexRefineFlat architecture made durable: ONE atomic catalog
    * commit carries the quantization MODEL (coarse centroids + the
    * four sub-codebooks, tiny relations), the PQ `codes`, and the raw
    * vectors as the refine `flat` store. Serving reads ONLY stored
    * relations — the model is reconstructed from its relations
    * (require-pinned EXACTLY equal to the trained one: doubles
    * round-trip parquet bit-exact), the ADC scan runs over the stored
    * codes, the refine join over the stored flat member; the
    * embeddings table is touched only for the bounded query-vector
    * fetch (s23's convention). WHY the model must ride the commit: a
    * code store without its codebooks is unreadable, and a crash
    * between "codes written" and "model written" would strand exactly
    * that — the multi-table generation makes the tear impossible.
    * Oracle: s25's replay verbatim (declared sharing — the output
    * contract is identical; what this query adds is the storage
    * round trip, pinned by the same hash).
    */
  val s26_trained_index_serve: Q = (s, dir) => {
    import graft.streaming.CatalogSink
    val e = Tables(s, dir, "embeddings")
    val (coarse, codebooks) = trainedIndexModel(e)
    val spark = s
    import spark.implicits._
    val cat = new graft.sources.TableCatalog(s,
      java.nio.file.Files.createTempDirectory("graft-trainedidx")
        .toFile.getAbsolutePath + "/cat")
    def modelRelations: Map[String, (Option[org.apache.spark.sql.DataFrame], org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame] = Map(
      "codes" -> ((_, b) => VectorSearch.encodeIvfPq(b, "vec_id", "embedding",
        coarse, codebooks)),
      "flat" -> ((_, b) => b.select(col("vec_id"), col("embedding"))),
      "coarse" -> ((_, _) => coarse.zipWithIndex
        .map { case (c, j) => (j, c) }.toDF("j", "cvec")),
      "books" -> ((_, _) => codebooks.zipWithIndex.flatMap { case (cb, sub) =>
        cb.zipWithIndex.map { case (c, j) => (sub, j, c) }
      }.toDF("s", "j", "cvec")))
    CatalogSink.commitBatch(cat, e, 0L, modelRelations)
    require(CatalogSink.commitBatch(cat, e, 0L, modelRelations) == -1L,
      "redelivered index-build batch was re-applied")
    // reconstruct the model FROM THE STORE; it must be the trained one
    val storedCoarse = cat.read("coarse").orderBy(col("j")).collect()
      .map(_.getSeq[Double](1).toSeq).toSeq
    require(storedCoarse == coarse,
      "coarse centroids did not round-trip the catalog bit-exact")
    val storedBooks = (0 until 4).map { sub =>
      cat.read("books").filter(col("s") === sub).orderBy(col("j"))
        .collect().map(_.getSeq[Double](2).toSeq).toSeq
    }
    require(storedBooks == codebooks,
      "codebooks did not round-trip the catalog bit-exact")
    VectorSearch.searchIvfPqRefined(cat.read("codes"), cat.read("flat"),
        e.filter(col("vec_id") < 5),
        "vec_id", "vec_id", "embedding", storedCoarse, storedBooks,
        k = 10, candidates = 50, nProbe = 2)
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ── s27: forget on the persisted trained index (flat store too) ────

  /** The deletion lifecycle s22 pins for CODES, extended to the piece
    * a refine-stage index uniquely adds: the raw-vector FLAT store. A
    * code-only forget leaves the refine join able to RESURRECT a
    * deleted vector with its exact cosine — the quiet GDPR failure a
    * two-stage index invites, because stage-1 masking makes stage 2
    * look correct in every test that doesn't probe it. Here the forget
    * is one catalog generation rewriting codes AND flat together (a
    * reader can never see one masked and the other not), redelivery
    * no-ops, and the require-pins check BOTH relations plus the served
    * output. Oracle: s25's replay with the deletion predicate on the
    * candidate side (s22's surgery discipline).
    */
  val s27_trained_index_forget: Q = (s, dir) => {
    import graft.streaming.CatalogSink
    val e = Tables(s, dir, "embeddings")
    val (coarse, codebooks) = trainedIndexModel(e)
    val cat = new graft.sources.TableCatalog(s,
      java.nio.file.Files.createTempDirectory("graft-trainedfgt")
        .toFile.getAbsolutePath + "/cat")
    CatalogSink.commitBatch(cat, e, 0L, Map(
      "codes" -> ((_, b: org.apache.spark.sql.DataFrame) =>
        VectorSearch.encodeIvfPq(b, "vec_id", "embedding", coarse, codebooks)),
      "flat" -> ((_, b: org.apache.spark.sql.DataFrame) =>
        b.select(col("vec_id"), col("embedding")))))
    // the forget wave: ONE generation rewrites both relations
    val forget = Map(
      "codes" -> ((p: Option[org.apache.spark.sql.DataFrame],
          _: org.apache.spark.sql.DataFrame) =>
        p.get.filter(col("id") % 9 =!= 4)), // encode renames the key
      "flat" -> ((p: Option[org.apache.spark.sql.DataFrame],
          _: org.apache.spark.sql.DataFrame) =>
        p.get.filter(col("vec_id") % 9 =!= 4)))
    CatalogSink.commitBatch(cat, e.limit(0), 1L, forget)
    require(CatalogSink.commitBatch(cat, e.limit(0), 1L, forget) == -1L,
      "redelivered forget wave was re-applied")
    require(cat.read("codes").filter(col("id") % 9 === 4).isEmpty,
      "a forgotten vector still has codes")
    require(cat.read("flat").filter(col("vec_id") % 9 === 4).isEmpty,
      "a forgotten vector survives in the refine flat store")
    val out = VectorSearch.searchIvfPqRefined(cat.read("codes"),
        cat.read("flat"), e.filter(col("vec_id") < 5),
        "vec_id", "vec_id", "embedding", coarse, codebooks,
        k = 10, candidates = 50, nProbe = 2)
      .select(col("query_id"), col("rank"), col("id"))
    require(out.filter(col("id") % 9 === 4).isEmpty,
      "the refine stage resurrected a forgotten vector")
    out.orderBy(col("query_id"), col("rank"))
  }

  /** s25's replay minus the forgotten vectors on the candidate side
    * (the s22 surgery discipline, validated). */
  val s27_sql: String = {
    val r = s25_sql.replace(
      "a.vec_id <> p.vec_id",
      "a.vec_id <> p.vec_id AND a.vec_id % 9 <> 4")
    require(r.contains("a.vec_id % 9 <> 4"),
      "s27 oracle surgery: the candidate pattern no longer matches s20's text")
    r
  }

  // ── s21: residual encoding with residual-TRAINED codebooks ─────────

  /** The full IVFADC arc, closed: s16 proved residual MACHINERY but
    * measured a recall REGRESSION with slice-derived codebooks (raw-
    * vector-sized codewords cannot quantize near-origin residuals —
    * COVERAGE round-8 caveat); here the codebooks are TRAINED ON THE
    * RESIDUALS themselves (per-subspace s12 Lloyd loops over
    * `v − centroid(cell)` slices), which is what Jégou's IVFADC
    * actually prescribes. The oracle composes three proven replays —
    * coarse assignment + residual construction (s16), per-subspace
    * integer-exact k-means (s20), residual ADC scoring (s16) — into
    * one hash. Measured verdict (`PqRecallProbe`, recorded in
    * COVERAGE): residual TRAINING repairs part of s16's regression
    * (overlap@10 0.04 → 0.12 at sf0.001) but plain trained
    * codebooks still win on THIS corpus (0.26 at sf0.01) — the
    * synthetic embeddings are unclustered, so residuals carry no
    * structure to exploit; IVFADC's gain presupposes data where the
    * coarse quantizer explains real variance. The operator exists
    * and is pinned for the corpora where it does.
    */
  val s21_residual_trained: Q = (s, dir) => {
    val e = Tables(s, dir, "embeddings")
    val planes = derivedPlanes(s, dir, 8)
    val centsLit = typedLit(planes.map(_.toArray).toArray)
    val resid = VectorSearch.assignCells(e, "vec_id", "embedding", planes)
      .select(col("id").as("vec_id"),
        zip_with(col("__vec").cast("array<double>"),
          element_at(centsLit, col("cell") + 1), (a, b) => a - b).as("embedding"))
    val codebooks = (0 until 4).map { sub =>
      VectorSearch.quantizedKMeansModel(
        resid.select(col("vec_id"),
          slice(col("embedding"), sub * 16 + 1, 16).as("embedding")),
        "vec_id", "embedding", k = 8, iters = 3)
    }
    val enc = VectorSearch.encodeIvfPq(e, "vec_id", "embedding",
      planes, codebooks, residual = true)
    VectorSearch.searchIvfPq(enc, e.filter(col("vec_id") < 5),
        "vec_id", "embedding", planes, codebooks, k = 10, nProbe = 2,
        residual = true)
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }

  val s21_sql: String =
    s"""WITH cents AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS j,
       |         CAST(embedding AS DOUBLE[]) AS cvec
       |  FROM embeddings
       |  WHERE vec_id > (SELECT MAX(vec_id) FROM embeddings) - 8
       |),
       |vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
       |cdists AS (
       |  SELECT v.vec_id, c.j,
       |         ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |           ORDER BY list_inner_product(v.vec, v.vec)
       |                    - 2.0 * list_inner_product(v.vec, c.cvec)
       |                    + list_inner_product(c.cvec, c.cvec) ASC, c.j ASC) AS rn
       |  FROM vecs v CROSS JOIN cents c
       |),
       |assign AS (SELECT vec_id, j AS cell FROM cdists WHERE rn = 1),
       |probes AS (SELECT vec_id, j AS cell FROM cdists WHERE rn <= 2 AND vec_id < 5),
       |cand AS (
       |  SELECT p.vec_id AS query_id, a.vec_id AS id, a.cell
       |  FROM probes p JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.vec_id
       |),
       |ss AS (SELECT unnest(range(4)) AS s),
       |rsubs AS (
       |  SELECT v.vec_id, ss.s,
       |    list_transform(range(1, 17), i ->
       |      v.vec[CAST(ss.s*16 + i AS INT)] - c.cvec[CAST(ss.s*16 + i AS INT)]) AS sub
       |  FROM vecs v
       |  JOIN assign a ON a.vec_id = v.vec_id
       |  JOIN cents c ON c.j = a.cell
       |  CROSS JOIN ss
       |),
       |scl AS (
       |  SELECT s, MAX(list_max(list_transform(sub, x -> ABS(x)))) AS scale
       |  FROM rsubs GROUP BY s
       |),
       |qs AS (
       |  SELECT r.vec_id, r.s,
       |         list_transform(r.sub, x -> CAST(ROUND(x / sc.scale * 127) AS INT)) AS qvec
       |  FROM rsubs r JOIN scl sc ON sc.s = r.s
       |),
       |uu AS (SELECT vec_id, s, qvec, unnest(range(1, len(qvec) + 1)) AS i FROM qs),
       |el AS (SELECT vec_id, s, CAST(i - 1 AS INT) AS pos, qvec[i] AS val FROM uu),
       |seeds AS (
       |  SELECT s, vec_id, rn - 1 AS c FROM (
       |    SELECT s, vec_id,
       |           ROW_NUMBER() OVER (PARTITION BY s ORDER BY vec_id) AS rn
       |    FROM qs) t
       |  WHERE rn <= 8
       |),
       |c0t AS (
       |  SELECT sd.s, sd.c, el.pos, el.val FROM seeds sd
       |  JOIN el ON el.vec_id = sd.vec_id AND el.s = sd.s
       |),
       |d1t AS (
       |  SELECT e.vec_id, e.s, c.c,
       |         CAST(SUM(CAST(e.val - c.val AS BIGINT) * (e.val - c.val)) AS BIGINT) AS dist
       |  FROM el e JOIN c0t c ON c.s = e.s AND c.pos = e.pos
       |  GROUP BY e.vec_id, e.s, c.c
       |),
       |a1t AS (
       |  SELECT vec_id, s, c FROM (
       |    SELECT vec_id, s, c,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, c) AS rn
       |    FROM d1t) t
       |  WHERE rn = 1
       |),
       |s1t AS (
       |  SELECT a.c, e.s, e.pos, CAST(SUM(e.val) AS BIGINT) AS sv,
       |         CAST(COUNT(*) AS BIGINT) AS n
       |  FROM a1t a JOIN el e ON e.vec_id = a.vec_id AND e.s = a.s
       |  GROUP BY a.c, e.s, e.pos
       |),
       |c1t AS (
       |  SELECT p.s, p.c, p.pos,
       |         COALESCE(CAST(FLOOR(CAST(x.sv AS DOUBLE) / x.n) AS INT), p.val) AS val
       |  FROM c0t p LEFT JOIN s1t x ON x.c = p.c AND x.s = p.s AND x.pos = p.pos
       |),
       |d2t AS (
       |  SELECT e.vec_id, e.s, c.c,
       |         CAST(SUM(CAST(e.val - c.val AS BIGINT) * (e.val - c.val)) AS BIGINT) AS dist
       |  FROM el e JOIN c1t c ON c.s = e.s AND c.pos = e.pos
       |  GROUP BY e.vec_id, e.s, c.c
       |),
       |a2t AS (
       |  SELECT vec_id, s, c FROM (
       |    SELECT vec_id, s, c,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, c) AS rn
       |    FROM d2t) t
       |  WHERE rn = 1
       |),
       |s2t AS (
       |  SELECT a.c, e.s, e.pos, CAST(SUM(e.val) AS BIGINT) AS sv,
       |         CAST(COUNT(*) AS BIGINT) AS n
       |  FROM a2t a JOIN el e ON e.vec_id = a.vec_id AND e.s = a.s
       |  GROUP BY a.c, e.s, e.pos
       |),
       |c2t AS (
       |  SELECT p.s, p.c, p.pos,
       |         COALESCE(CAST(FLOOR(CAST(x.sv AS DOUBLE) / x.n) AS INT), p.val) AS val
       |  FROM c1t p LEFT JOIN s2t x ON x.c = p.c AND x.s = p.s AND x.pos = p.pos
       |),
       |cbl AS (
       |  SELECT cc.s, cc.c,
       |         list((CAST(cc.val AS DOUBLE) * sc.scale) / 127.0 ORDER BY cc.pos) AS cvec
       |  FROM c2t cc JOIN scl sc ON sc.s = cc.s
       |  GROUP BY cc.s, cc.c
       |),
       |sdists AS (
       |  SELECT sb.vec_id, sb.s, cb.c AS j,
       |         list_inner_product(sb.sub, sb.sub)
       |           - 2.0 * list_inner_product(sb.sub, cb.cvec)
       |           + list_inner_product(cb.cvec, cb.cvec) AS d
       |  FROM rsubs sb JOIN cbl cb ON cb.s = sb.s
       |),
       |codes AS (
       |  SELECT vec_id, s, j AS code FROM (
       |    SELECT vec_id, s, j,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d ASC, j ASC) AS rn
       |    FROM sdists) t
       |  WHERE rn = 1
       |),
       |qrsubs AS (
       |  SELECT p.vec_id AS query_id, p.cell, ss.s,
       |    list_transform(range(1, 17), i ->
       |      v.vec[CAST(ss.s*16 + i AS INT)] - c.cvec[CAST(ss.s*16 + i AS INT)]) AS sub
       |  FROM probes p
       |  JOIN vecs v ON v.vec_id = p.vec_id
       |  JOIN cents c ON c.j = p.cell
       |  CROSS JOIN ss
       |),
       |qd AS (
       |  SELECT q.query_id, q.cell, q.s, cb.c AS j,
       |         list_inner_product(q.sub, q.sub)
       |           - 2.0 * list_inner_product(q.sub, cb.cvec)
       |           + list_inner_product(cb.cvec, cb.cvec) AS d
       |  FROM qrsubs q JOIN cbl cb ON cb.s = q.s
       |),
       |parts AS (
       |  SELECT cd.query_id, cd.id, co.s, q.d
       |  FROM cand cd
       |  JOIN codes co ON co.vec_id = cd.id
       |  JOIN qd q ON q.query_id = cd.query_id AND q.cell = cd.cell
       |            AND q.s = co.s AND q.j = co.code
       |),
       |scores AS (
       |  SELECT query_id, id,
       |         ((MAX(CASE WHEN s = 0 THEN d END)
       |           + MAX(CASE WHEN s = 1 THEN d END))
       |           + MAX(CASE WHEN s = 2 THEN d END))
       |           + MAX(CASE WHEN s = 3 THEN d END) AS dist
       |  FROM parts GROUP BY query_id, id
       |)
       |SELECT query_id, rank, id FROM (
       |  SELECT query_id, id,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist ASC, id ASC) AS rank
       |  FROM scores) t
       |WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  // ── s23: hybrid retrieval served from BOTH persisted indexes ──────

  /** s19's hybrid RRF with NOTHING scanned at query time — the lexical
    * list serves from a persisted postings index (the t23 split) and
    * the semantic list from a persisted IVF-PQ code store (the s15
    * split): corpus text and corpus vectors are each read exactly once,
    * at INDEX BUILD, and the fused query touches only stored relations
    * (plus the raw query vector — the query side is inherently raw).
    * This is the serving economics at 100 TB: per-query cost is
    * posting-lists + probed-cells, not two corpus scans. The semantic
    * ranking is the INDEX's (IVF-PQ/ADC — s14's semantics, top-50),
    * not brute cosine: approximation is the index's documented
    * contract, so the oracle replays the same coarse argmins and ADC
    * folds rather than pretending the index is exact. Lexical ranking
    * is t19/t23's integer BM25 (index-serving is bit-identical to
    * scan-time — t23's proven contract), top-50. Fusion is s19's
    * integer RRF verbatim: Σ 1000000 div (60 + rank), nulls score 0.
    */
  val s23_hybrid_index_serve: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import graft.streaming.CatalogSink
    // build: postings index (one atomic generation; t23's layout)
    val docs = Tables(s, dir, "documents")
    val cat = new graft.sources.TableCatalog(s,
      java.nio.file.Files.createTempDirectory("graft-hybidx")
        .toFile.getAbsolutePath + "/cat")
    val toks = docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    CatalogSink.commitBatch(cat, docs, 0L, Map(
      "postings" -> ((_, _) => toks.groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))),
      "doclen" -> ((_, _) => toks.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("dl")))))
    // build: IVF-PQ code store (s15's layout)
    val planes = derivedPlanes(s, dir, 8)
    val codebooks = (0 until 4).map(sub =>
      planes.map(_.slice(sub * 16, sub * 16 + 16)))
    val e = Tables(s, dir, "embeddings")
    val st = new graft.sources.SnapshotStore(s,
      java.nio.file.Files.createTempDirectory("graft-hybann")
        .toFile.getAbsolutePath + "/t")
    st.commit(VectorSearch.encodeIvfPq(e, "vec_id", "embedding",
      planes, codebooks), commitTsMillis = 1000L)
    // serve: lexical top-50 from the stored postings (s19's lex shape,
    // tf/dl sourced from the index relations instead of a corpus scan)
    val terms = Seq("vector", "stream", "merge", "window", "filter", "scan")
    val tf = cat.read("postings").filter(col("tok").isin(terms: _*))
    val dl = cat.read("doclen")
    val totals = dl.agg(sum(col("dl")).as("sumdl"), count(lit(1)).as("n_docs"))
    val dft = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val lexTop = tf.join(broadcast(dft), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(totals))
      .withColumn("rarity", expr("(1000 * (n_docs - df)) div n_docs"))
      .withColumn("contrib", expr(
        "(rarity * 22 * tf * sumdl) div (10 * sumdl * tf + 3 * sumdl + 9 * dl * n_docs)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("score_num"))
      .orderBy(col("score_num").desc, col("doc_id"))
      .limit(50)
    val lex = lexTop.withColumn("rank_lex", row_number().over(
      Window.orderBy(col("score_num").desc, col("doc_id")))) // 50-row frame
      .select(col("doc_id"), col("rank_lex"))
    // serve: semantic top-50 from the stored codes (s14's ranking)
    val sem = VectorSearch.searchIvfPq(st.readLatest(),
        e.filter(col("vec_id") === 0),
        "vec_id", "embedding", planes, codebooks, k = 50, nProbe = 2)
      .select(col("id").as("doc_id"), col("rank").cast("int").as("rank_sem"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf", coalesce(expr("1000000 div (60 + rank_lex)"), lit(0L))
        + coalesce(expr("1000000 div (60 + rank_sem)"), lit(0L)))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), col("rrf"), col("rank_lex"), col("rank_sem"))
  }

  // ── w39: cross-MODAL atomic admission (text + vector, one commit) ──

  /** ONE GENERATION, EVERY MODALITY — the w32/w35 unified transaction
    * extended across the text/vector boundary: the admitted batch's
    * IVF-PQ code relation ([[VectorSearch.encodeIvfPq]] — row-local,
    * so an O(batch) append like the six text relations) rides the
    * SAME atomic commit via
    * [[graft.streaming.UnifiedIndex.commitBatch]]'s `extraMembers`,
    * so a document becomes dedup-gated, BM25-ranked,
    * phrase-searchable AND ANN-searchable in one generation — a crash
    * cannot strand a doc lexically-findable but semantically
    * invisible (the tear a hybrid-retrieval serving stack can least
    * afford, because RRF silently degrades instead of failing).
    * Require-pinned: redelivery no-ops across all SEVEN relations in
    * one batch-id check; cross-modal membership — every text-indexed
    * (id, rev) has its code row in the same generation (exceptAll,
    * exact); ONE forget masks the vector serve too
    * ([[graft.streaming.UnifiedIndex.memberLive]] under the shared
    * kill floors). Serve = hybrid RRF fused from BOTH live members of
    * the one catalog (s23's fusion, re-rooted on the unified family):
    * lexical top-50 from postingsLive, semantic top-50 from
    * searchIvfPq over the live codes. Oracle composes s19/s23's lex
    * CTEs and s14's IVF-PQ replay over the SURVIVING doc∩embedding
    * corpus — one leaked forgotten doc, torn modality, or stale
    * revision shifts a rank list and fails the fused hash.
    */
  val w39_multimodal_admission: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import graft.streaming.UnifiedIndex
    val planes = derivedPlanes(s, dir, 8)
    val codebooks = (0 until 4).map(sub =>
      planes.map(_.slice(sub * 16, sub * 16 + 16)))
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val e = Tables(s, dir, "embeddings")
    // the multimodal corpus: docs WITH embeddings (the admission join
    // is the upstream contract that makes cross-modal membership exact)
    val adm = docs.join(e, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding")).persist()
    val cat = new graft.sources.TableCatalog(s,
      java.nio.file.Files.createTempDirectory("graft-mmidx")
        .toFile.getAbsolutePath + "/cat")
    def commit() = UnifiedIndex.commitBatch(cat, adm, 0L, extraMembers =
      Map("codes" -> VectorSearch.encodeIvfPq(adm, "doc_id", "embedding",
        planes, codebooks)))
    commit()
    require(commit() == -1L, "redelivered seven-relation batch was re-applied")
    // cross-modal membership: text-indexed ⊆ vector-indexed, same rev
    // (codes may hold MORE ids — an empty-text doc still embeds)
    require(cat.read("sizes").select(col("id"), col("rev"))
      .exceptAll(cat.read("codes").select(col("id"), col("rev"))).isEmpty,
      "a text-indexed doc is not ANN-searchable in its own generation")
    // ONE forget masks all four serve paths (query vec 0 never hit)
    UnifiedIndex.delete(cat, adm.filter(col("doc_id") % 7 === 3)
      .select(col("doc_id")), 1L)
    val codesLive = UnifiedIndex.memberLive(cat, "codes", "id")
    require(codesLive.filter(col("id") % 7 === 3).isEmpty,
      "a forgotten doc is still ANN-searchable")
    // lexical top-50 from the live postings (s23's lex shape)
    val terms = Seq("vector", "stream", "merge", "window", "filter", "scan")
    val (tfAll, dl) = UnifiedIndex.postingsLive(cat)
    val tf = tfAll.filter(col("tok").isin(terms: _*))
    val totals = dl.agg(sum(col("dl")).as("sumdl"), count(lit(1)).as("n_docs"))
    val dft = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val lexTop = tf.join(broadcast(dft), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(totals))
      .withColumn("rarity", expr("(1000 * (n_docs - df)) div n_docs"))
      .withColumn("contrib", expr(
        "(rarity * 22 * tf * sumdl) div (10 * sumdl * tf + 3 * sumdl + 9 * dl * n_docs)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("score_num"))
      .orderBy(col("score_num").desc, col("doc_id"))
      .limit(50)
    val lex = lexTop.withColumn("rank_lex", row_number().over(
      Window.orderBy(col("score_num").desc, col("doc_id")))) // 50-row frame
      .select(col("doc_id"), col("rank_lex"))
    // semantic top-50 from the LIVE stored codes of the SAME catalog
    val sem = VectorSearch.searchIvfPq(codesLive,
        e.filter(col("vec_id") === 0),
        "vec_id", "embedding", planes, codebooks, k = 50, nProbe = 2)
      .select(col("id").as("doc_id"), col("rank").cast("int").as("rank_sem"))
    val out = lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf", coalesce(expr("1000000 div (60 + rank_lex)"), lit(0L))
        + coalesce(expr("1000000 div (60 + rank_sem)"), lit(0L)))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), col("rrf"), col("rank_lex"), col("rank_sem"))
    adm.unpersist()
    out
  }

  // ── w40: the cross-modal index under streaming maintenance ────────

  /** w39's SEVEN-RELATION FAMILY UNDER CONTINUOUS MAINTENANCE — the
    * w30/w31 streaming story lifted across the modality boundary:
    * micro-batches ingest the multimodal corpus in halves, a RECRAWL
    * wave replaces documents' text (two prepended query terms move
    * the lexical ranking by construction; the embedding re-encodes at
    * the new revision), a forget wave erases a third of the corpus,
    * and [[graft.streaming.IndexMaintenance.compactUnifiedIfNeeded]]
    * runs IN THE LOOP with the code relation named as a rider — the
    * trigger pattern is require-pinned (fires exactly once, after the
    * forget wave pushes the dead fraction past the default 0.3;
    * never on the ingest halves or the 10% recrawl). Redelivery of
    * the recrawl batch no-ops across all seven relations + the floor
    * in one batch-id check. The serve after the fold is w39's hybrid
    * RRF from the live members — identical masked or folded, which
    * is what the oracle checks: the s19/s23 lex CTEs over the
    * recrawled surviving corpus fused with s14's IVF-PQ replay over
    * the surviving vectors.
    */
  // ── w42: cross-modal admission from REAL container bytes ───────────

  /** w39's atomic cross-modal admission with the vector modality
    * derived from REAL image bytes: every doc renders to an actual
    * 24-bit BMP (m07's fixed 8×40 geometry and seed-decorrelated pixel
    * formula), [[graft.operators.Multimodal.decodeBmp]] parses the
    * container back, and the rider the unified commit carries is the
    * INTEGER pixel-block-sum vector
    * ([[graft.operators.Multimodal.bmpBlockSums]]) — exact integers,
    * so the image-similarity serve is [[graft.functions.IntDot]]
    * scoring the oracle replays bit-identically (a float embedding
    * could not). One generation makes a doc BM25-rankable AND
    * image-searchable; one forget masks both; the fold auto-discovers
    * the rider (ADVICE r12's rider-aware machinery under real bytes).
    * Output: top-20 live docs by exact integer dot to the lowest live
    * doc's image vector. Oracle replays pixel formula → display-order
    * RGB block sums → forget-surviving corpus → dot ranking.
    */
  val w42_realmodal_admission: Q = (s, dir) => {
    import s.implicits._
    import graft.operators.Multimodal
    import graft.streaming.{IndexMaintenance, UnifiedIndex}
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val media = docs.select(col("doc_id")).as[Long].map { seed =>
      Multimodal.MediaRecord(seed, "image",
        Multimodal.encodeBmp(8, 40, Multimodal.seedPixel(seed)), "bmp-synth")
    }
    val cat = new graft.sources.TableCatalog(s,
      java.nio.file.Files.createTempDirectory("graft-realmodal")
        .toFile.getAbsolutePath + "/cat")
    // ONE atomic generation: six text relations + the real-pixel rider
    val sums = Multimodal.bmpBlockSums(media)
    UnifiedIndex.commitBatch(cat, docs, 0L,
      extraMembers = Map("pixsums" -> sums))
    require(UnifiedIndex.commitBatch(cat, docs, 0L,
      extraMembers = Map("pixsums" -> sums)) == -1L,
      "redelivered real-codec batch was re-applied")
    // cross-modal membership: every text-indexed doc is image-indexed
    // in the same generation (the rider may hold MORE — 0-token docs)
    require(cat.read("sizes").select(col("id"), col("rev"))
      .exceptAll(cat.read("pixsums").select(col("id"), col("rev"))).isEmpty,
      "a text-indexed doc is not image-searchable in its own generation")
    // one forget masks text AND image serving
    UnifiedIndex.delete(cat, docs.filter(col("doc_id") % 9 === 2)
      .select(col("doc_id")), 1L)
    val live = UnifiedIndex.memberLive(cat, "pixsums", "id")
    require(live.filter(col("id") % 9 === 2).isEmpty,
      "a forgotten doc is still image-searchable")
    require(UnifiedIndex.postingsLive(cat)._2
      .filter(col("doc_id") % 9 === 2).isEmpty,
      "a forgotten doc still ranks lexically")
    // the fold auto-discovers the real-pixel rider and destroys its
    // dead rows in the same transact (≥ 1/9 dead fires the 1e-9 bar)
    require(IndexMaintenance.compactUnifiedIfNeeded(cat, 2L,
      threshold = 1e-9).nonEmpty, "the forget wave must trigger the fold")
    require(cat.read("pixsums").filter(col("id") % 9 === 2).isEmpty,
      "the fold stranded dead rider rows")
    val folded = UnifiedIndex.memberLive(cat, "pixsums", "id")
    // image-similarity serve from the folded store: exact integer dot
    // to the lowest live doc's vector (TakeOrderedAndProject top-20)
    val qvec = folded.orderBy(col("id")).limit(1)
      .select(col("pixsums")).head().getSeq[Int](0).toArray
    folded.select(col("id"),
        graft.functions.IntDot(col("pixsums"), lit(qvec)).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(20)
  }

  /** Pixel formula → display-order RGB block sums → forget survivors →
    * integer dot ranking (query = lowest surviving doc), all exact.
    */
  val w42_sql: String =
    """WITH live AS (
      |  SELECT doc_id FROM documents WHERE doc_id % 9 <> 2
      |),
      |px AS (
      |  SELECT l.doc_id, j.j // 16 AS block,
      |    CASE j.j % 3
      |      WHEN 0 THEN (7*l.doc_id + 3*((j.j % 24) // 3) + 11*(j.j // 24)
      |                   + (l.doc_id * (((j.j % 24) // 3) + 40*(j.j // 24) + 1)) % 251) % 256
      |      WHEN 1 THEN (13*l.doc_id + 5*((j.j % 24) // 3) + 2*(j.j // 24)
      |                   + (l.doc_id * (((j.j % 24) // 3) + 40*(j.j // 24) + 2)) % 241) % 256
      |      ELSE (3*l.doc_id + ((j.j % 24) // 3) + 17*(j.j // 24)
      |            + (l.doc_id * (((j.j % 24) // 3) + 40*(j.j // 24) + 3)) % 239) % 256
      |    END AS v
      |  FROM live l, (SELECT unnest(range(0, 960)) AS j) j
      |),
      |sums AS (
      |  SELECT doc_id, block, CAST(SUM(v) AS BIGINT) AS bs
      |  FROM px GROUP BY doc_id, block
      |),
      |q AS (
      |  SELECT block, bs AS qb FROM sums
      |  WHERE doc_id = (SELECT MIN(doc_id) FROM live)
      |),
      |dots AS (
      |  SELECT s.doc_id AS id, CAST(SUM(s.bs * q.qb) AS BIGINT) AS score
      |  FROM sums s JOIN q USING (block)
      |  GROUP BY s.doc_id
      |)
      |SELECT id, score FROM dots
      |ORDER BY score DESC, id
      |LIMIT 20""".stripMargin

  // ── w43: LM-quality-gated admission into the unified index ──────────

  /** The quality gate AT the ingestion boundary — t35's bigram-LM
    * scoring deciding what enters the index at all, with the scores
    * riding the SAME atomic generation as the six text relations (so
    * "why was this admitted" is answerable from the index forever):
    * train on the trusted slice, score the incoming batch, commit ONLY
    * documents at or above the integer gate (avg_milli ≥ 34 — mid-
    * distribution, exact integer comparison), the per-doc scores as a
    * rider member. Require-pinned: redelivery is a no-op, no rejected
    * document is lexically servable, every admitted document is
    * searchable in its own generation, and the rider holds exactly the
    * admitted set. Output: the per-language admission report FROM THE
    * INDEX RIDER (not the transient scoring frame), the oracle
    * replaying score → gate → report in SQL.
    */
  val w43_lm_gated_admission: Q = (s, dir) => {
    import graft.operators.LanguageModel
    import graft.streaming.UnifiedIndex
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    val lm = LanguageModel.train(
      docs.filter(col("doc_id") % 5 === 0), "doc_id", "text")(
      graft.operators.CacheScope.processOwned)
    // skinny (id, scores) frame feeds the gate, three require-pins and
    // the rider — persist so the corpus is scored once (t09 contract:
    // Verify/Bench clear the cache between runs)
    val scored = LanguageModel.score(docs, lm, "doc_id", "text").persist()
    val admittedIds = scored.filter(col("avg_milli") >= 34)
    val adm = docs.join(admittedIds.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val cat = new graft.sources.TableCatalog(s,
      java.nio.file.Files.createTempDirectory("graft-lmgate")
        .toFile.getAbsolutePath + "/cat")
    val rider = admittedIds.select(col("doc_id").as("id"),
      col("avg_milli"), col("n_oov"))
    UnifiedIndex.commitBatch(cat, adm, 0L,
      extraMembers = Map("lmq" -> rider))
    require(UnifiedIndex.commitBatch(cat, adm, 0L,
      extraMembers = Map("lmq" -> rider)) == -1L,
      "redelivered gated batch was re-applied")
    // no rejected document serves lexically
    require(UnifiedIndex.postingsLive(cat)._2.select(col("doc_id")).distinct()
      .join(scored.filter(col("avg_milli") < 34), Seq("doc_id"), "left_semi")
      .isEmpty, "a rejected document is lexically searchable")
    // every admitted document is searchable in its own generation
    require(admittedIds.select(col("doc_id").as("id"))
      .exceptAll(cat.read("sizes").select(col("id"))).isEmpty,
      "an admitted document is not searchable")
    // the rider IS the admitted set
    val live = UnifiedIndex.memberLive(cat, "lmq", "id")
    require(graft.operators.Constraints.sameMultiset(
      live.select(col("id")), admittedIds.select(col("doc_id").as("id"))),
      "rider and admitted set diverge")
    live.join(docs.select(col("doc_id").as("id"), col("lang")), Seq("id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_admitted"),
        sum(col("avg_milli")).as("sum_avg_milli"),
        sum(col("n_oov")).as("n_oov_total"),
        min(col("avg_milli")).as("min_avg_milli"))
      .orderBy(col("lang"))
  }

  /** t35's score replay → integer gate → per-language report: string
    * surgery on [[DataPipelineQueries.t35_sql]] (the validated-replace
    * discipline of s24/s25/s27) — the scoring CTEs are shared TEXT, so
    * a fix to t35's tokenization, backoff constants or OOV rule
    * propagates here by construction instead of drifting.
    */
  val w43_sql: String = {
    val t35Tail =
      """SELECT d.doc_id,
        |       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
        |       CAST(COALESCE(a.n_oov, 0) AS BIGINT) AS n_oov,
        |       CAST(COALESCE(a.sum_milli, 0) AS BIGINT) AS sum_milli,
        |       CAST(CASE WHEN a.n_tokens > 0 THEN a.sum_milli // a.n_tokens
        |            ELSE 0 END AS BIGINT) AS avg_milli
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin
    val gateTail =
      """, q AS (
        |  SELECT doc_id, n_tokens, n_oov,
        |         CAST(sum_milli // n_tokens AS BIGINT) AS avg_milli
        |  FROM agg WHERE n_tokens > 0
        |)
        |SELECT d.lang,
        |       CAST(COUNT(*) AS BIGINT) AS n_admitted,
        |       CAST(SUM(q.avg_milli) AS BIGINT) AS sum_avg_milli,
        |       CAST(SUM(q.n_oov) AS BIGINT) AS n_oov_total,
        |       CAST(MIN(q.avg_milli) AS BIGINT) AS min_avg_milli
        |FROM q JOIN documents d USING (doc_id)
        |WHERE q.avg_milli >= 34
        |GROUP BY d.lang
        |ORDER BY d.lang""".stripMargin
    val r = DataPipelineQueries.t35_sql.replace(t35Tail, gateTail)
    require(r.contains("q.avg_milli >= 34") && !r.contains("ORDER BY doc_id"),
      "w43 oracle surgery: the per-doc tail pattern no longer matches t35's text")
    r
  }

  val w40_multimodal_stream: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import graft.streaming.{IndexMaintenance, UnifiedIndex}
    val planes = derivedPlanes(s, dir, 8)
    val codebooks = (0 until 4).map(sub =>
      planes.map(_.slice(sub * 16, sub * 16 + 16)))
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val e = Tables(s, dir, "embeddings")
    val adm = docs.join(e, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding")).persist()
    val cat = new graft.sources.TableCatalog(s,
      java.nio.file.Files.createTempDirectory("graft-mmstream")
        .toFile.getAbsolutePath + "/cat")
    def codesOf(b: org.apache.spark.sql.DataFrame) =
      VectorSearch.encodeIvfPq(b, "doc_id", "embedding", planes, codebooks)
    val recrawl = adm.filter(col("doc_id") % 10 === 6)
      .withColumn("text", concat(lit("vector stream "), col("text")))
    val batches: Seq[(org.apache.spark.sql.DataFrame, Boolean)] = Seq(
      adm.filter(col("doc_id") % 2 === 0) -> false,
      adm.filter(col("doc_id") % 2 === 1) -> false,
      recrawl -> true)
    val fired = (batches.zipWithIndex.map { case ((b, rep), i) =>
      UnifiedIndex.commitBatch(cat, b, i.toLong, replace = rep,
        extraMembers = Map("codes" -> codesOf(b)))
      IndexMaintenance.compactUnifiedIfNeeded(cat, 100L + i,
        extraMembers = Map("codes" -> "id")).nonEmpty
    }) :+ {
      UnifiedIndex.delete(cat, adm.filter(col("doc_id") % 3 === 2)
        .select(col("doc_id")), 3L)
      IndexMaintenance.compactUnifiedIfNeeded(cat, 103L,
        extraMembers = Map("codes" -> "id")).nonEmpty
    }
    require(fired == Seq(false, false, false, true),
      s"compaction trigger pattern diverged: $fired")
    require(UnifiedIndex.commitBatch(cat, recrawl, 2L, replace = true,
      extraMembers = Map("codes" -> codesOf(recrawl))) == -1L,
      "redelivered recrawl batch was re-applied")
    // post-fold: no dead revision anywhere, one revision serves per doc
    val (tfAll, dl) = UnifiedIndex.postingsLive(cat)
    require(dl.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).isEmpty, "a stale revision is still serving")
    val codesLive = UnifiedIndex.memberLive(cat, "codes", "id")
    require(codesLive.filter(col("id") % 3 === 2).isEmpty,
      "a forgotten doc is still ANN-searchable after the fold")
    // w39's fused serve from the folded members
    val terms = Seq("vector", "stream", "merge", "window", "filter", "scan")
    val tf = tfAll.filter(col("tok").isin(terms: _*))
    val totals = dl.agg(sum(col("dl")).as("sumdl"), count(lit(1)).as("n_docs"))
    val dft = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val lexTop = tf.join(broadcast(dft), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(totals))
      .withColumn("rarity", expr("(1000 * (n_docs - df)) div n_docs"))
      .withColumn("contrib", expr(
        "(rarity * 22 * tf * sumdl) div (10 * sumdl * tf + 3 * sumdl + 9 * dl * n_docs)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("score_num"))
      .orderBy(col("score_num").desc, col("doc_id"))
      .limit(50)
    val lex = lexTop.withColumn("rank_lex", row_number().over(
      Window.orderBy(col("score_num").desc, col("doc_id"))))
      .select(col("doc_id"), col("rank_lex"))
    val sem = VectorSearch.searchIvfPq(codesLive,
        e.filter(col("vec_id") === 0),
        "vec_id", "embedding", planes, codebooks, k = 50, nProbe = 2)
      .select(col("id").as("doc_id"), col("rank").cast("int").as("rank_sem"))
    val out = lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf", coalesce(expr("1000000 div (60 + rank_lex)"), lit(0L))
        + coalesce(expr("1000000 div (60 + rank_sem)"), lit(0L)))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), col("rrf"), col("rank_lex"), col("rank_sem"))
    adm.unpersist()
    out
  }

  /** w39's fused oracle with the stream's lifecycle folded in: the
    * lex corpus carries the recrawled texts and drops the forgotten
    * third; the sem replay's corpus drops them too (embeddings are
    * revision-invariant, so the recrawl moves only the lexical list).
    */
  // lazy: composed from w39_sql/w39SemReplay which are declared below
  lazy val w40_sql: String = {
    val semReplay = s14_sql
      .replace("rn <= 2 AND vec_id < 5", "rn <= 2 AND vec_id = 0")
      .replace("WHERE vec_id < 5", "WHERE vec_id = 0")
      .replace("WHERE rank <= 10", "WHERE rank <= 50")
      .replace(
        "vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)",
        "vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec" +
          " FROM embeddings JOIN documents ON doc_id = vec_id" +
          " WHERE vec_id % 3 <> 2)")
    w39_sql
      .replace(
        """WITH corpus AS (
          |  SELECT d.doc_id, d.text
          |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
          |  WHERE d.doc_id % 7 <> 3
          |)""".stripMargin,
        """WITH corpus AS (
          |  SELECT d.doc_id,
          |         CASE WHEN d.doc_id % 10 = 6
          |              THEN 'vector stream ' || d.text ELSE d.text END AS text
          |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
          |  WHERE d.doc_id % 3 <> 2
          |)""".stripMargin)
      .replace(w39SemReplay, semReplay)
  }

  /** s23's fused oracle re-rooted on the surviving doc∩embedding
    * corpus: lex CTEs read the join, the sem replay's `vecs` corpus
    * takes the same join + survivor filter (encode is row-local, so
    * filtering assignments ≡ filtering inputs), centroids stay
    * derived from the RAW embeddings table exactly like the Spark
    * side's derivedPlanes.
    */
  /** s14's IVF-PQ replay narrowed to query 0 / top-50 over the
    * surviving doc∩embedding vectors — shared with w40, whose
    * lifecycle uses a different forget predicate.
    */
  private val w39SemReplay: String = s14_sql
    .replace("rn <= 2 AND vec_id < 5", "rn <= 2 AND vec_id = 0")
    .replace("WHERE vec_id < 5", "WHERE vec_id = 0")
    .replace("WHERE rank <= 10", "WHERE rank <= 50")
    .replace(
      "vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)",
      "vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec" +
        " FROM embeddings JOIN documents ON doc_id = vec_id" +
        " WHERE vec_id % 7 <> 3)")

  val w39_sql: String = {
    val semReplay = w39SemReplay
    s"""WITH corpus AS (
       |  SELECT d.doc_id, d.text
       |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
       |  WHERE d.doc_id % 7 <> 3
       |), toks AS (
       |  SELECT doc_id,
       |         unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |                x -> x <> '')) AS tok
       |  FROM corpus
       |), dl AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
       |), totals AS (
       |  SELECT CAST(SUM(dl) AS BIGINT) AS sumdl, CAST(COUNT(*) AS BIGINT) AS n_docs FROM dl
       |), tf AS (
       |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
       |  WHERE tok IN ('vector', 'stream', 'merge', 'window', 'filter', 'scan')
       |  GROUP BY doc_id, tok
       |), dft AS (
       |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
       |), scored AS (
       |  SELECT tf.doc_id,
       |    ((1000 * (n_docs - df)) // n_docs) * 22 * tf * sumdl
       |      // (10 * sumdl * tf + 3 * sumdl + 9 * dl * n_docs) AS contrib
       |  FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id), totals
       |), lex AS (
       |  SELECT doc_id,
       |         CAST(ROW_NUMBER() OVER (ORDER BY score_num DESC, doc_id) AS INT) AS rank_lex
       |  FROM (SELECT doc_id, CAST(SUM(contrib) AS BIGINT) AS score_num
       |        FROM scored GROUP BY doc_id)
       |  QUALIFY rank_lex <= 50
       |), sem AS (
       |  SELECT id AS doc_id, CAST(rank AS INT) AS rank_sem
       |  FROM ($semReplay) ivfpq
       |)
       |SELECT doc_id,
       |  COALESCE(1000000 // (60 + rank_lex), 0)
       |    + COALESCE(1000000 // (60 + rank_sem), 0) AS rrf,
       |  rank_lex, rank_sem
       |FROM lex FULL JOIN sem USING (doc_id)
       |ORDER BY rrf DESC, doc_id
       |LIMIT 20""".stripMargin
  }

  /** Lex CTEs are s19's verbatim (t23's contract: index-serving ≡
    * scan-time BM25); the sem list is s14's IVF-PQ replay narrowed to
    * query 0 / top-50 by targeted replaces (the s22 string-surgery
    * discipline — the two replays move in lockstep by construction);
    * fusion tail is s19's.
    */
  val s23_sql: String = {
    val semReplay = s14_sql
      .replace("rn <= 2 AND vec_id < 5", "rn <= 2 AND vec_id = 0")
      .replace("WHERE vec_id < 5", "WHERE vec_id = 0")
      .replace("WHERE rank <= 10", "WHERE rank <= 50")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |                x -> x <> '')) AS tok
       |  FROM documents
       |), dl AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
       |), totals AS (
       |  SELECT CAST(SUM(dl) AS BIGINT) AS sumdl, CAST(COUNT(*) AS BIGINT) AS n_docs FROM dl
       |), tf AS (
       |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
       |  WHERE tok IN ('vector', 'stream', 'merge', 'window', 'filter', 'scan')
       |  GROUP BY doc_id, tok
       |), dft AS (
       |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
       |), scored AS (
       |  SELECT tf.doc_id,
       |    ((1000 * (n_docs - df)) // n_docs) * 22 * tf * sumdl
       |      // (10 * sumdl * tf + 3 * sumdl + 9 * dl * n_docs) AS contrib
       |  FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id), totals
       |), lex AS (
       |  SELECT doc_id,
       |         CAST(ROW_NUMBER() OVER (ORDER BY score_num DESC, doc_id) AS INT) AS rank_lex
       |  FROM (SELECT doc_id, CAST(SUM(contrib) AS BIGINT) AS score_num
       |        FROM scored GROUP BY doc_id)
       |  QUALIFY rank_lex <= 50
       |), sem AS (
       |  SELECT id AS doc_id, CAST(rank AS INT) AS rank_sem
       |  FROM ($semReplay) ivfpq
       |)
       |SELECT doc_id,
       |  COALESCE(1000000 // (60 + rank_lex), 0)
       |    + COALESCE(1000000 // (60 + rank_sem), 0) AS rrf,
       |  rank_lex, rank_sem
       |FROM lex FULL JOIN sem USING (doc_id)
       |ORDER BY rrf DESC, doc_id
       |LIMIT 20""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "s23_hybrid_index_serve" -> s23_hybrid_index_serve,
    "w39_multimodal_admission" -> w39_multimodal_admission,
    "w40_multimodal_stream" -> w40_multimodal_stream,
    "d27_semantic_dedup" -> d27_semantic_dedup,
    "s09_embedding_decontam" -> s09_embedding_decontam,
    "s12_kmeans" -> s12_kmeans,
    "s13_pq_ann" -> s13_pq_ann,
    "s14_ivf_pq" -> s14_ivf_pq,
    "s15_ann_index_store" -> s15_ann_index_store,
    "w23_stream_ann_index" -> w23_stream_ann_index,
    "s16_ivf_pq_residual" -> s16_ivf_pq_residual,
    "s20_trained_pq" -> s20_trained_pq,
    "s21_residual_trained" -> s21_residual_trained,
    "s22_ann_deletions" -> s22_ann_deletions,
    "s24_ivfpq_refined" -> s24_ivfpq_refined,
    "w42_realmodal_admission" -> w42_realmodal_admission,
    "w43_lm_gated_admission" -> w43_lm_gated_admission,
    "s25_trained_cells" -> s25_trained_cells,
    "s26_trained_index_serve" -> s26_trained_index_serve,
    "s27_trained_index_forget" -> s27_trained_index_forget)

  val oracles: Map[String, String] = Map(
    "s23_hybrid_index_serve" -> s23_sql,
    "w39_multimodal_admission" -> w39_sql,
    "w40_multimodal_stream" -> w40_sql,
    "d27_semantic_dedup" -> d27_sql,
    "s09_embedding_decontam" -> s09_sql,
    "s12_kmeans" -> s12_sql,
    "s13_pq_ann" -> s13_sql,
    "s14_ivf_pq" -> s14_sql,
    "s15_ann_index_store" -> s14_sql,
    "w23_stream_ann_index" -> s14_sql,
    "s16_ivf_pq_residual" -> s16_sql,
    "s20_trained_pq" -> s20_sql,
    "s21_residual_trained" -> s21_sql,
    "s22_ann_deletions" -> s22_sql,
    "s24_ivfpq_refined" -> s24_sql,
    "w42_realmodal_admission" -> w42_sql,
    "w43_lm_gated_admission" -> w43_sql,
    "s25_trained_cells" -> s25_sql,
    "s26_trained_index_serve" -> s25_sql,
    "s27_trained_index_forget" -> s27_sql)
}
