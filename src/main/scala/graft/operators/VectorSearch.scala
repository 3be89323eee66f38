package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths:
  * - brute-force cosine top-k — the exact baseline; one broadcast of the
  *   query set against a full scan (no shuffle of the corpus), then a
  *   per-query top-k window;
  * - hyperplane-LSH bucketing — the scale path: each vector maps to a
  *   `numPlanes`-bit signature (sign of dot with each hyperplane);
  *   search probes only its bucket. Sub-linear candidate sets at the cost
  *   of recall; candidates are re-ranked exactly.
  *
  * All dot products run through `zip_with` + `aggregate` in double
  * precision — built-in higher-order functions, codegen-friendly, no UDF.
  */
object VectorSearch {

  /** Sequential-fold dot product in double precision — a native codegen
    * expression (see [[graft.functions.DoubleDot]]); bit-identical to the
    * `aggregate(zip_with(...))` composition it replaces, ~60× faster on
    * all-pairs joins.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DoubleDot(
      a.cast(ArrayType(DoubleType)), b.cast(ArrayType(DoubleType)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (0 for zero vectors, avoiding NaN). */
  def cosine(a: Column, b: Column): Column =
    cosineFromParts(dot(a, b), norm(a), norm(b))

  /** Cosine from a precomputed dot and per-side norms — lets pair joins
    * compute each row's norm once instead of once per pair.
    */
  private def cosineFromParts(d: Column, na: Column, nb: Column): Column = {
    val denom = na * nb
    when(denom === 0.0, lit(0.0)).otherwise(d / denom)
  }

  /** Shared ranking tail for every top-k variant: per-query rank by
    * (score DESC, id ASC), keep k — one definition so tie-breaking and
    * the output contract cannot diverge across ANN paths.
    */
  private def rankTopK(scored: DataFrame, scoreCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col(scoreCol).desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col(scoreCol))
  }

  /** Exact top-k neighbors for each query vector.
    * @param corpus  (idCol, vecCol) table — the big side, never shuffled;
    *                the query set is broadcast into a single BHJ cross join
    * @param queries (queryIdCol, vecCol) — small
    * @return (query_id, rank, id, cosine) with rank 1..k, ties broken by id
    */
  /** Hard-negative mining for contrastive training: per query, the k
    * nearest corpus vectors with a DIFFERENT label — the most
    * confusable wrong answers, the negatives that carry gradient.
    * Same scan shape as [[bruteForceTopK]]: queries broadcast, corpus
    * scanned once (the label predicate rides the broadcast join, so a
    * label-partitioned corpus prunes at the scan); per-query top-k via
    * the rank window over the scored result.
    */
  def hardNegatives(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String, queryIdCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"), col(vecCol).as("__qvec"),
      norm(col(vecCol)).as("__qnorm"), col(labelCol).as("__qlabel")))
    val scored = corpus.select(col(idCol).as("id"), col(labelCol).as("neg_label"),
        col(vecCol).as("__cvec"), norm(col(vecCol)).as("__cnorm"))
      .join(q, col("neg_label") =!= col("__qlabel"))
      .withColumn("cosine", cosineFromParts(
        dot(col("__cvec"), col("__qvec")), col("__cnorm"), col("__qnorm")))
    rankTopK(scored, "cosine", k)
  }

  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"), col(vecCol).as("__qvec"),
      norm(col(vecCol)).as("__qnorm")))
    val scored = corpus.select(col(idCol).as("id"), col(vecCol).as("__cvec"),
        norm(col(vecCol)).as("__cnorm"))
      .join(q, if (excludeSelf) col("id") =!= col("query_id") else lit(true))
      .withColumn("cosine", cosineFromParts(
        dot(col("__cvec"), col("__qvec")), col("__cnorm"), col("__qnorm")))
    rankTopK(scored, "cosine", k)
  }

  /** Symmetric int8 quantization: q_i = round(v_i / scale × 127) with a
    * corpus-global scale = max |component|. 4× less memory/bandwidth
    * than float32 at 100 TB, and — unlike float scores — quantized dot
    * products are exact integers, so rankings replay bit-identically on
    * any engine. Returns (id, qvec array<int>); `scale` is computed by
    * [[quantScale]] (one max-aggregate over the corpus).
    */
  def quantScale(df: DataFrame, vecCol: String): Double = {
    val row = df.agg(max(array_max(transform(col(vecCol),
      v => abs(v.cast(DoubleType)))))).head()
    require(!row.isNullAt(0), "quantScale: empty corpus")
    val scale = row.getDouble(0)
    require(scale > 0.0, "quantScale: all-zero corpus (scale would be 0)")
    scale
  }

  /** The quantization expression itself — shared by [[quantize]] and
    * [[rerankTopK]] so the int8 mapping cannot drift between the
    * standalone path and the two-stage prefilter.
    */
  private def quantExpr(vec: Column, scale: Double): Column =
    transform(vec, v => round(v.cast(DoubleType) / scale * 127).cast(IntegerType))

  def quantize(df: DataFrame, idCol: String, vecCol: String, scale: Double): DataFrame =
    df.select(col(idCol).as("id"), quantExpr(col(vecCol), scale).as("qvec"))

  /** Top-k by quantized integer dot product (IntDot codegen kernel),
    * ties broken by id — the memory-lean ANN path; corpus never
    * shuffled, queries broadcast, scores exact integers. The metric is
    * DOT, so it matches cosine ranking only for (near-)unit-norm
    * embeddings — normalize first if cosine order is intended.
    */
  def quantizedTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    val scale = quantScale(corpus, vecCol)
    val qc = quantize(corpus, idCol, vecCol, scale)
    val qq = broadcast(quantize(queries, queryIdCol, vecCol, scale)
      .select(col("id").as("query_id"), col("qvec").as("__qvec")))
    val scored = qc.join(qq,
        if (excludeSelf) col("id") =!= col("query_id") else lit(true))
      .withColumn("qdot", graft.functions.IntDot(col("qvec"), col("__qvec")))
    rankTopK(scored, "qdot", k)
  }

  /** Two-stage retrieval — the production ANN serving shape: a cheap
    * int8 dot-product prefilter keeps the top `candidates` per query,
    * and ONLY those candidates re-rank by exact double cosine. At 100 TB
    * the full-precision scoring (the expensive part: double loads,
    * divisions, sqrt) runs on |queries|×candidates rows instead of
    * |queries|×|corpus|; the corpus is scanned ONCE — the int8 signature
    * and the float vector ride the same row, so stage 2 is a filter on
    * stage 1's output, never a join back to the corpus.
    *
    * Determinism: the candidate set is decided by the exact INTEGER
    * dot with id tie-break (engine-portable, s04's argument), and the
    * final rank by double cosine whose gaps dwarf float noise (s01's
    * argument). Over-fetching (`candidates` ≥ k, typically 3-5×) heals
    * quantization rank inversions near the cut: an exact top-k member
    * is missed only if quantization demotes it below `candidates`-th.
    *
    * The stage-1 window sees the same |queries|×|corpus| relation as
    * [[quantizedTopK]] (integer kernel, WindowGroupLimit pushes the
    * per-query limit into the sort); the stage-2 window is negligible.
    */
  def rerankTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String,
      k: Int, candidates: Int, excludeSelf: Boolean = true): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    val scale = quantScale(corpus, vecCol)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("__cvec"),
      norm(col(vecCol)).as("__cnorm"),
      quantExpr(col(vecCol), scale).as("__cq"))
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"), col(vecCol).as("__qvec"),
      norm(col(vecCol)).as("__qnorm"),
      quantExpr(col(vecCol), scale).as("__qq")))
    val stage1 = c.join(q,
        if (excludeSelf) col("id") =!= col("query_id") else lit(true))
      .withColumn("qdot", graft.functions.IntDot(col("__cq"), col("__qq")))
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("qdot").desc, col("id").asc)
    val cand = stage1.withColumn("__crank", row_number().over(cw))
      .filter(col("__crank") <= candidates)
    val reranked = cand.withColumn("cosine", cosineFromParts(
      dot(col("__cvec"), col("__qvec")), col("__cnorm"), col("__qnorm")))
    rankTopK(reranked, "cosine", k)
  }

  /** Product-quantization ANN (Jégou et al. 2011 shape): the vector
    * splits into `codebooks.size` contiguous subvectors; each subspace
    * has its own small centroid codebook, and a corpus vector is stored
    * as one small code per subspace (its nearest centroid in that
    * subspace — 3 bits/code at 8 centroids, a 64× compression of a
    * 64-dim float vector). Queries score by ASYMMETRIC distance (ADC):
    * the query precomputes its squared distance to every centroid of
    * every subspace (an m×|codebook| table, tiny), and a corpus row's
    * distance is the fold of its codes' table entries — table lookups
    * and adds, no per-pair float dot products.
    *
    * Scale shape: the corpus is encoded in ONE scan (codes ride the
    * row; at 100 TB the encoded corpus is what you'd persist), the
    * query table broadcasts, and scoring is a codegen projection inside
    * the broadcast join stage — no shuffle before the per-query top-k
    * window. Approximate by design — but deterministically so: codes
    * are integer argmins (distance ASC, code ASC — engine-portable),
    * and the ADC sum folds subspaces in fixed order s=0..m−1 so the
    * oracle replays the identical doubles.
    *
    * @param codebooks per-subspace centroid lists: codebooks(s)(j) is
    *                  centroid j of subspace s; all subvectors must
    *                  share one length, and m·subDim must equal the
    *                  embedding dimension — enforced at RUNTIME per row
    *                  (`raise_error` on mismatch), because a slice past
    *                  the array end would otherwise silently encode
    *                  short subvectors and degrade recall with no signal
    */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String,
      codebooks: Seq[Seq[Seq[Double]]], k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty))
    val subDim = codebooks.head.head.size
    require(codebooks.forall(_.forall(_.size == subDim)),
      "pqTopK: ragged codebook subvectors")
    val m = codebooks.size
    val dim = m * subDim
    // loud dimension gate: a mismatched codebook fails the job, never
    // silently truncates the encoding
    def checked(vec: Column): Column = {
      val v = vec.cast(ArrayType(DoubleType))
      when(size(v) === dim, v).otherwise(raise_error(format_string(
        s"pqTopK: embedding dimension %d != m*subDim = $dim", size(v))))
    }
    def sub(vec: Column, s: Int): Column =
      slice(vec, s * subDim + 1, subDim)
    // same term order as cellDist2 (v·v − 2·v·c + c·c) so the oracle's
    // list_inner_product replay is bit-identical
    def dist2(sv: Column, svv: Column, c: Seq[Double]): Column =
      svv - lit(2.0) * dot(sv, lit(c.toArray)) + lit(c.map(x => x * x).sum)
    // corpus: per-subspace nearest code — array_min over (d, code)
    // structs (argmin, ties to the lower code; see nearestCell's note on
    // why NOT a when/otherwise fold)
    val encoded = corpus
      .select(col(idCol).as("id"), checked(col(vecCol)).as("__v"))
      .select(
        col("id") +:
          codebooks.zipWithIndex.map { case (cb, s) =>
            val sv = sub(col("__v"), s)
            val svv = dot(sv, sv)
            array_min(array(cb.zipWithIndex.map { case (c, j) =>
              struct(dist2(sv, svv, c).as("d"), lit(j).as("c"))
            }: _*)).getField("c").as(s"__code$s")
          }: _*)
    // queries: the ADC table — one distance array per subspace
    val qtab = broadcast(queries
      .select(col(queryIdCol).as("query_id"), checked(col(vecCol)).as("__v"))
      .select(
        col("query_id") +:
          codebooks.zipWithIndex.map { case (cb, s) =>
            val sv = sub(col("__v"), s)
            val svv = dot(sv, sv)
            array(cb.map(c => dist2(sv, svv, c)): _*).as(s"__dtab$s")
          }: _*))
    // score = −ADC distance (rankTopK ranks DESC; negation is FP-exact),
    // folded in fixed subspace order
    val adc = (0 until m).map(s =>
        element_at(col(s"__dtab$s"), col(s"__code$s") + 1))
      .reduceLeft(_ + _)
    val scored = encoded.join(qtab,
        if (excludeSelf) col("id") =!= col("query_id") else lit(true))
      .withColumn("score", -adc)
    rankTopK(scored, "score", k)
  }

  /** Diversified top-k via Maximal Marginal Relevance (Carbonell &
    * Goldstein 1998): greedily pick the candidate maximizing
    * `λ·rel(q,d) − (1−λ)·max_{s∈picked} sim(d,s)` — relevance traded
    * against redundancy with what's already picked, the standard
    * de-duplicating retrieval tail (RAG context assembly, eval-set
    * diversification).
    *
    * Shape: stage 1 is [[bruteForceTopK]]'s scan (queries broadcast,
    * corpus scanned once) cut to `candidates` per query and persisted
    * under the [[CacheScope]] — the greedy loop references it k times.
    * The loop itself is k−1 driver-built PLAN steps (not actions):
    * each joins the remaining candidates to the picked set on
    * query_id (both ≤ candidates rows per query), takes max pairwise
    * similarity, and keeps the arg-max row per query via a rank
    * window. Each pick is persisted: step i's plan would otherwise
    * inline step i−1 twice (anti-join + redundancy join) and the tree
    * would double per step. Cost at 100 TB: one corpus scan + k
    * joins over |queries|×candidates rows — the corpus never
    * re-enters after stage 1.
    *
    * Determinism: every comparison is on doubles both engines compute
    * with the same expression shape over the same parquet (s01's
    * argument — organic cosine gaps dwarf float noise), ties broken
    * by id; the hashed output is (query_id, rank, id) — integers.
    */
  def mmrTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String,
      k: Int, candidates: Int, lambdaPct: Int = 50,
      excludeSelf: Boolean = true)(implicit cs: CacheScope): DataFrame = {
    require(k >= 1 && candidates >= k, s"need candidates ($candidates) >= k ($k) >= 1")
    require(lambdaPct >= 0 && lambdaPct <= 100, "lambdaPct must be 0..100")
    val lam = lambdaPct / 100.0
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"), col(vecCol).as("__qvec"),
      norm(col(vecCol)).as("__qnorm")))
    val scored = corpus.select(col(idCol).as("id"), col(vecCol).as("__cvec"),
        norm(col(vecCol)).as("__cnorm"))
      .join(q, if (excludeSelf) col("id") =!= col("query_id") else lit(true))
      .withColumn("rel", cosineFromParts(
        dot(col("__cvec"), col("__qvec")), col("__cnorm"), col("__qnorm")))
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("id").asc)
    // __red carries the RUNNING redundancy max_{s∈picked} sim(d,s),
    // seeded at −1.0 (the cosine floor, so the first greatest()
    // returns the true sim bit-exactly). Folding the max one pick at
    // a time is bit-identical to re-aggregating the whole picked set
    // (double max is exactly associative), which is what the r14
    // optimization replaced: the picked-set re-join + groupBy carried
    // the candidate VECTORS through first() buffers, forcing a
    // SortMergeJoin + SortAggregate pair per greedy step — 38 sort
    // aggregates of plan for k=5, ~1.5 s of operator overhead on 60
    // candidate rows.
    val cand = cs.persist(scored
      .withColumn("__crank", row_number().over(cw))
      .filter(col("__crank") <= candidates)
      .select(col("query_id"), col("id"), col("rel"),
        col("__cvec"), col("__cnorm"))
      .withColumn("__red", lit(-1.0)))
    val pickCols = Seq(col("query_id"), col("rank"), col("id"), col("rel"),
      col("__cvec"), col("__cnorm"))
    // Each greedy step is ONE rank window over the (persisted,
    // query_id-partitioned) shrinking pool: the step's arg-max row is
    // every row's `first(...)` over the score-ordered window, so the
    // pick is the `id === __sid` row and the survivors update their
    // running __red against the pick's vector — no join, no broadcast
    // barrier, no aggregation anywhere in the loop. Step 1 orders by
    // plain relevance (empty picked set ⇒ no penalty — and score would
    // be constant at λ=0); later steps by the MMR score. Per-step
    // PICKS are persisted individually (k tiny frames — one row per
    // query each) and unioned once at the end.
    var picks = Vector.empty[DataFrame]
    var pool = cand
    for (step <- 1 to k) {
      val sw =
        if (step == 1) cw
        else Window.partitionBy(col("query_id"))
          .orderBy((lit(lam) * col("rel") - lit(1.0 - lam) * col("__red")).desc,
            col("id").asc)
      val staged = pool
        .withColumn("__sid", first(col("id")).over(sw))
        .withColumn("__svec", first(col("__cvec")).over(sw))
        .withColumn("__snorm", first(col("__cnorm")).over(sw))
      picks :+= cs.persist(staged
        .filter(col("id") === col("__sid"))
        .withColumn("rank", lit(step)).select(pickCols: _*))
      if (step < k) pool = cs.persist(staged
        .filter(col("id") =!= col("__sid"))
        .withColumn("__red", greatest(col("__red"), cosineFromParts(
          dot(col("__cvec"), col("__svec")), col("__cnorm"), col("__snorm"))))
        .select(col("query_id"), col("id"), col("rel"),
          col("__cvec"), col("__cnorm"), col("__red")))
    }
    picks.reduce(_ unionByName _).select(col("query_id"), col("rank"), col("id"))
  }

  /** Hyperplane-LSH signature: bit i = (dot(v, plane_i) > 0). */
  def lshSignature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      // constant array literal, NOT array(lit...): CreateArray of
      // literals is rebuilt per row in codegen, a per-row allocation ×
      // |planes|; a Literal array is one shared ArrayData reference
      val planeCol = lit(p.toArray)
      when(dot(vec, planeCol) > 0.0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))

  /** Bucketed ANN: corpus bucketed by LSH signature; each query probes
    * only its own bucket, then candidates re-rank exactly. The bucket join
    * broadcasts the (small) query side, so the corpus is scanned once with
    * no shuffle.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String,
      planes: Seq[Seq[Double]], k: Int, excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("__cvec"),
      norm(col(vecCol)).as("__cnorm"),
      lshSignature(col(vecCol), planes).as("__bucket"))
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"), col(vecCol).as("__qvec"),
      norm(col(vecCol)).as("__qnorm"),
      lshSignature(col(vecCol), planes).as("__bucket")))
    val joined = c.join(q, "__bucket")
      .filter(if (excludeSelf) col("id") =!= col("query_id") else lit(true))
      .withColumn("cosine", cosineFromParts(
        dot(col("__cvec"), col("__qvec")), col("__cnorm"), col("__qnorm")))
    rankTopK(joined, "cosine", k)
  }

  /** IVF (inverted-file) ANN: the corpus is assigned to its nearest
    * centroid; each query probes only the `nProbe` centroids nearest to
    * it, then re-ranks candidates exactly. Centroids are caller-provided
    * (e.g. sampled vectors refined offline) — the operator is the
    * partition-and-probe plan, which is where the scale structure lives:
    * assignment is one scan with a broadcast centroid table, the probe
    * join shuffles only by centroid id.
    */
  /** Squared distance to one centroid: `v·v − 2·v·c + c·c`. The v·v
    * term is hoisted to a column (it cannot affect an argmin over
    * centroids but stays in the formula so FP results — and the oracle
    * replay — are bit-identical), and centroids are constant array
    * literals, not per-row CreateArray.
    */
  private def cellDist2(vec: Column, vv: Column, p: Seq[Double]): Column =
    vv - lit(2.0) * dot(vec, lit(p.toArray)) + lit(p.map(x => x * x).sum)

  /** Nearest-centroid cell id: argmin over squared distance —
    * array_min over (d, c) structs, NOT a reduce of when/otherwise:
    * that fold references its accumulator twice per step, so the
    * expression tree doubles per centroid (2^|centroids| nodes) and
    * driver-side analysis dwarfs the actual job time. Struct ordering
    * breaks distance ties toward the smaller cell id, matching the
    * fold's keep-earlier semantics and the oracle's ORDER BY d, c.
    */
  private def nearestCell(vec: Column, vv: Column, centroids: Seq[Seq[Double]]): Column =
    array_min(array(centroids.zipWithIndex.map { case (p, i) =>
      struct(cellDist2(vec, vv, p).as("d"), lit(i).as("c"))
    }: _*)).getField("c")

  /** The `nProbe` nearest centroid ids, nearest first. */
  private def probeCells(
      vec: Column, vv: Column, centroids: Seq[Seq[Double]], nProbe: Int): Column = {
    val ranked = array(centroids.zipWithIndex.map { case (p, i) =>
      struct(cellDist2(vec, vv, p).as("d"), lit(i).as("c"))
    }: _*)
    slice(transform(array_sort(ranked), s => s.getField("c")), 1, nProbe)
  }

  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String,
      centroids: Seq[Seq[Double]], k: Int, nProbe: Int = 2,
      excludeSelf: Boolean = true): DataFrame = {
    require(centroids.nonEmpty && nProbe >= 1)
    def nearest(vec: Column, vv: Column): Column = nearestCell(vec, vv, centroids)
    def probes(vec: Column, vv: Column): Column = probeCells(vec, vv, centroids, nProbe)

    val c = corpus
      .select(col(idCol).as("id"), col(vecCol).as("__cvec"),
        norm(col(vecCol)).as("__cnorm"),
        dot(col(vecCol), col(vecCol)).as("__vv"))
      .select(col("id"), col("__cvec"), col("__cnorm"),
        nearest(col("__cvec"), col("__vv")).as("__cell"))
    val q = broadcast(queries
      .select(col(queryIdCol).as("query_id"), col(vecCol).as("__qvec"),
        norm(col(vecCol)).as("__qnorm"),
        dot(col(vecCol), col(vecCol)).as("__vv"))
      .select(col("query_id"), col("__qvec"), col("__qnorm"),
        explode(probes(col("__qvec"), col("__vv"))).as("__cell")))
    val joined = c.join(q, "__cell")
      .filter(if (excludeSelf) col("id") =!= col("query_id") else lit(true))
      .withColumn("cosine", cosineFromParts(
        dot(col("__cvec"), col("__qvec")), col("__cnorm"), col("__qnorm")))
    rankTopK(joined, "cosine", k)
  }

  /** IVF-PQ composite ANN — the standard billion-scale index shape
    * (Jégou et al. 2011; FAISS IVFPQ): [[ivfTopK]]'s coarse
    * partition-and-probe routing fused with [[pqTopK]]'s
    * product-quantized asymmetric scoring. The corpus is encoded in ONE
    * scan (coarse cell id + m small PQ codes per row — the compressed
    * inverted file a real deployment persists); queries broadcast their
    * probed cell ids and ADC distance tables; candidates are only the
    * rows in probed cells, scored by table lookups, never a per-pair
    * float dot product.
    *
    * Scale shape at 100 TB: the encoded corpus is ~2 orders of
    * magnitude smaller than the raw vectors, the probe join prunes to
    * nProbe/|centroids| of it per query, the query side rides one
    * broadcast, and the only shuffle is the per-query rank window.
    * Determinism: both argmins (coarse cell, PQ code) are (d ASC,
    * id ASC) over identical doubles, and the ADC fold is fixed-order —
    * the oracle replays the exact ranking.
    */
  private def pqChecked(vec: Column, dim: Int, op: String): Column = {
    val v = vec.cast(ArrayType(DoubleType))
    when(size(v) === dim, v).otherwise(raise_error(format_string(
      s"$op: embedding dimension %d != m*subDim = $dim", size(v))))
  }

  private def pqDist2(sv: Column, svv: Column, c: Seq[Double]): Column =
    svv - lit(2.0) * dot(sv, lit(c.toArray)) + lit(c.map(x => x * x).sum)

  /** The IVF-PQ index-build pass: one corpus scan computing each row's
    * coarse cell and m PQ codes — the compressed inverted file.
    * Columns: (id, __cell, __code0..__code{m−1}); persist THIS (e.g.
    * into a [[graft.sources.SnapshotStore]] generation) and serve
    * queries from the stored codes without touching raw vectors again
    * — the index-once / query-many split every real ANN deployment
    * runs (s15 exercises it end-to-end).
    */
  /** With `residual = true` the PQ codes encode `v − centroid(cell)`
    * instead of the raw vector — the IVFADC upgrade (Jégou et al.
    * §IV): residuals concentrate near the origin, so the same tiny
    * codebook quantizes them with far less error than raw vectors.
    * [[searchIvfPq]] must be called with the same flag (the query
    * builds its distance tables against the PROBED cell's residual).
    */
  def encodeIvfPq(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
      residual: Boolean = false): DataFrame = {
    require(centroids.nonEmpty)
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty))
    val subDim = codebooks.head.head.size
    require(codebooks.forall(_.forall(_.size == subDim)),
      "encodeIvfPq: ragged codebook subvectors")
    val dim = codebooks.size * subDim
    require(centroids.forall(_.size == dim), "encodeIvfPq: centroid dim mismatch")
    def sub(vec: Column, s: Int): Column = slice(vec, s * subDim + 1, subDim)
    val cents = typedLit(centroids.map(_.toArray).toArray)
    val assigned = corpus
      .select(col(idCol).as("id"), pqChecked(col(vecCol), dim, "encodeIvfPq").as("__v"))
      .withColumn("__cell",
        nearestCell(col("__v"), dot(col("__v"), col("__v")), centroids))
    val enc = if (residual)
      assigned.withColumn("__e",
        zip_with(col("__v"), element_at(cents, col("__cell") + 1), _ - _))
    else assigned.withColumn("__e", col("__v"))
    enc.select(
      Seq(col("id"), col("__cell")) ++
        codebooks.zipWithIndex.map { case (cb, s) =>
          val sv = sub(col("__e"), s)
          val svv = dot(sv, sv)
          array_min(array(cb.zipWithIndex.map { case (c, j) =>
            struct(pqDist2(sv, svv, c).as("d"), lit(j).as("c"))
          }: _*)).getField("c").as(s"__code$s")
        }: _*)
  }

  /** Query an [[encodeIvfPq]]-encoded corpus: probed cell ids + ADC
    * distance tables ride one broadcast; scoring is table lookups
    * inside the broadcast join; the only shuffle is the rank window.
    */
  def searchIvfPq(
      encoded: DataFrame, queries: DataFrame,
      queryIdCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
      k: Int, nProbe: Int = 2, excludeSelf: Boolean = true,
      residual: Boolean = false): DataFrame = {
    require(centroids.nonEmpty && nProbe >= 1)
    val subDim = codebooks.head.head.size
    val m = codebooks.size
    val dim = m * subDim
    def sub(vec: Column, s: Int): Column = slice(vec, s * subDim + 1, subDim)
    val cents = typedLit(centroids.map(_.toArray).toArray)
    // residual mode: the ADC table is per (query, probed cell) — the
    // query's residual w.r.t. THAT cell's centroid, matching the
    // corpus rows it joins (they share the cell)
    val probed = queries
      .select(col(queryIdCol).as("query_id"),
        pqChecked(col(vecCol), dim, "searchIvfPq").as("__v"))
      .withColumn("__cell",
        explode(probeCells(col("__v"), dot(col("__v"), col("__v")),
          centroids, nProbe)))
      .withColumn("__e",
        if (residual) zip_with(col("__v"), element_at(cents, col("__cell") + 1), _ - _)
        else col("__v"))
    adcTopK(encoded, probed, codebooks, k, excludeSelf)
  }

  /** Shared ADC scoring tail: distance tables from each probed
    * (query, cell, residual-or-raw `__e`) row ride ONE broadcast;
    * scoring is table lookups inside the broadcast join; the only
    * shuffle is the rank window.
    */
  private def adcTopK(encoded: DataFrame, probed: DataFrame,
      codebooks: Seq[Seq[Seq[Double]]], k: Int,
      excludeSelf: Boolean): DataFrame = {
    val subDim = codebooks.head.head.size
    val m = codebooks.size
    def sub(vec: Column, s: Int): Column = slice(vec, s * subDim + 1, subDim)
    val qtab = broadcast(probed.select(
      Seq(col("query_id"), col("__cell")) ++
        codebooks.zipWithIndex.map { case (cb, s) =>
          val sv = sub(col("__e"), s)
          val svv = dot(sv, sv)
          array(cb.map(c => pqDist2(sv, svv, c)): _*).as(s"__dtab$s")
        }: _*))
    val adc = (0 until m).map(s =>
        element_at(col(s"__dtab$s"), col(s"__code$s") + 1))
      .reduceLeft(_ + _)
    val scored = encoded.join(qtab, Seq("__cell"))
      .filter(if (excludeSelf) col("id") =!= col("query_id") else lit(true))
      .withColumn("score", -adc)
    rankTopK(scored, "score", k)
  }

  /** IVF-PQ with an exact REFINE stage — FAISS's IndexRefineFlat shape
    * and the standard answer to corpora where quantized distance gaps
    * are thinner than quantization noise (this repo's synthetic
    * embeddings are isotropic unit vectors — the measured worst case:
    * top-10 cosine gaps of 0.002-0.03 against 40-bit codes, see
    * PqRecallProbe / COVERAGE.md). Stage 1 is [[searchIvfPq]] fetching
    * `candidates` ≫ k by ADC (cells pruned, codes only); stage 2
    * re-scores ONLY the shortlist against the raw vectors by exact
    * cosine. Scale shape: the shortlist (|queries|·candidates rows) is
    * broadcast against the corpus — the raw vectors are scanned once
    * and never shuffled, and the expensive double scoring runs on the
    * shortlist, not the corpus. An exact top-k member is missed only
    * if ADC demotes it below `candidates`-th within the probed cells —
    * recall converges to the IVF routing ceiling as `candidates`
    * grows, at linear shortlist cost.
    */
  def searchIvfPqRefined(
      encoded: DataFrame, corpus: DataFrame, queries: DataFrame,
      idCol: String, queryIdCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
      k: Int, candidates: Int, nProbe: Int = 2,
      excludeSelf: Boolean = true, residual: Boolean = false): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    val shortlist = searchIvfPq(encoded, queries, queryIdCol, vecCol,
        centroids, codebooks, candidates, nProbe, excludeSelf, residual)
      .select(col("query_id"), col("id"))
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("__cvec"),
      norm(col(vecCol)).as("__cnorm"))
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).as("__qvec"), norm(col(vecCol)).as("__qnorm"))
    val rescored = broadcast(shortlist)
      .join(c, "id")
      .join(broadcast(q), "query_id")
      .withColumn("cosine", cosineFromParts(
        dot(col("__cvec"), col("__qvec")), col("__cnorm"), col("__qnorm")))
    rankTopK(rescored, "cosine", k)
  }

  /** Filter-aware IVF-PQ search — retrieval under a selective
    * metadata predicate over an indexed corpus, where a FIXED nProbe
    * fails both ways: probing few cells can leave under k predicate
    * survivors (missing results the corpus holds), probing all cells
    * wastes the index. Here the probe depth ADAPTS per query: cells
    * are ranked by centroid distance as usual, the per-cell SURVIVOR
    * counts (one aggregate over the prefiltered encoded relation —
    * index-sized, not corpus-sized) cumulate along each query's probe
    * order, and each query probes exactly as deep as needed for ≥ k
    * survivors (all cells when the corpus itself holds fewer). The
    * whole decision is relational — survivors aggregate → cum-sum
    * window over (queries × cells) → depth join — no driver loop, so
    * it holds at any query count.
    *
    * @param encodedFiltered [[encodeIvfPq]] output RESTRICTED to the
    *   predicate's rows (join ids or filter a metadata column carried
    *   through encode) — the on-disk index itself stays unfiltered
    * @param excludeSelf default false: under a predicate the query
    *   point is a legitimate corpus member iff it passes the filter
    * @param residual MUST match the `residual` flag `encodedFiltered`
    *   was encoded with (same contract as [[searchIvfPq]]): against a
    *   residual-encoded index a raw-vector ADC table measures distances
    *   in the wrong frame and silently mis-ranks — when set, `__e` is
    *   the query's residual w.r.t. each probed cell's centroid
    */
  def searchIvfPqFiltered(
      encodedFiltered: DataFrame, queries: DataFrame,
      queryIdCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
      k: Int, excludeSelf: Boolean = false,
      residual: Boolean = false): DataFrame = {
    require(centroids.nonEmpty)
    val subDim = codebooks.head.head.size
    val dim = codebooks.size * subDim
    val nCells = centroids.size
    val cents = typedLit(centroids.map(_.toArray).toArray)
    val surv = encodedFiltered.groupBy(col("__cell"))
      .agg(count(lit(1)).as("__n"))
    val qcells = queries
      .select(col(queryIdCol).as("query_id"),
        pqChecked(col(vecCol), dim, "searchIvfPqFiltered").as("__v"))
      .select(col("query_id"), col("__v"),
        posexplode(probeCells(col("__v"), dot(col("__v"), col("__v")),
          centroids, nCells)).as(Seq("__rn", "__cell")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("__rn"))
    val withCum = qcells.join(surv, Seq("__cell"), "left")
      .withColumn("__cum", sum(coalesce(col("__n"), lit(0L))).over(w))
    val depth = withCum.groupBy(col("query_id"))
      .agg(coalesce(min(when(col("__cum") >= k, col("__rn"))),
        lit(nCells - 1)).as("__depth"))
    val probed = withCum.join(depth, "query_id")
      .filter(col("__rn") <= col("__depth"))
      .select(col("query_id"), col("__cell"),
        (if (residual)
          zip_with(col("__v"), element_at(cents, col("__cell") + 1), _ - _)
        else col("__v")).as("__e"))
    adcTopK(encodedFiltered, probed, codebooks, k, excludeSelf)
  }

  def ivfPqTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String,
      centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
      k: Int, nProbe: Int = 2, excludeSelf: Boolean = true): DataFrame =
    searchIvfPq(encodeIvfPq(corpus, idCol, vecCol, centroids, codebooks),
      queries, queryIdCol, vecCol, centroids, codebooks, k, nProbe, excludeSelf)

  /** Embedding near-duplicate pairs: cosine ≥ `threshold`, id_a < id_b.
    *
    * With `planes` given, candidates come from banded hyperplane LSH
    * (the minhash-banding idea applied to sign signatures): the planes
    * split into `bands` bands of `planes.size / bands` bits; two vectors
    * are candidates iff they agree on EVERY bit of SOME band. Candidates
    * are then verified with the exact cosine. OR-ing bands is essential —
    * a single conjunctive signature at cos ≥ 0.9 (angle up to ~26°)
    * splits a true pair on some plane with high probability, while
    * per-band misses decay geometrically with the band count: at
    * θ/π = 0.144 (cos = 0.90) an 8-bit band matches with p = 0.857⁸ ≈
    * 0.29, so 32 bands miss with (1−p)³² ≈ 1.7e-5 per worst-case pair
    * (16 bands: ≈ 4e-3) — and measured misses on the planted corpora
    * are zero at every test scale. Work distributes across bands ×
    * 2^bits join keys (no single-reducer quadratic); candidate volume
    * measured ≈ 7% of all-pairs on the test corpora.
    *
    * With `planes = Nil` this is the exact all-pairs baseline — a
    * deliberate O(n²) single-key self-join for small corpora only.
    *
    * Shape note (measured, round 4): verification runs IN-PLACE — each
    * band collision computes its cosine inside the join stage and dies
    * on the ≥ threshold filter without ever crossing a shuffle. The
    * alternative (ids-only band join → distinct candidates → re-fetch
    * vectors, the text-LSH shape) was tried and is ~2× slower here:
    * collision volume (~7% of all-pairs) far exceeds corpus × bands
    * rows, so materializing candidates costs more than carrying the
    * vector payload through the band shuffle. Revisit only for
    * high-dimensional embeddings (≥ ~768 dims), where payload × bands
    * dominates and the refetch shape wins.
    */
  def cosineNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Seq[Seq[Double]] = Nil,
      bands: Int = 1)(implicit cs: CacheScope): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("__vec"),
      norm(col(vecCol)).as("__norm"))
    if (planes.isEmpty) {
      base.as("a").join(base.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          cosineFromParts(dot(col("a.__vec"), col("b.__vec")),
            col("a.__norm"), col("b.__norm")).as("cosine"))
        .filter(col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    } else {
      require(bands >= 1 && planes.size % bands == 0,
        s"planes (${planes.size}) must split evenly into $bands bands")
      val bits = planes.size / bands
      // all band keys in one compiled loop (PlaneBandKeys), not a
      // |planes|-node expression tree; posexplode yields (band, key)
      // persisted before the self-join: each side computes independently
      // (no exchange/stage reuse — measured, CcPlanCheck), so an
      // uncached plan would run PlaneBandKeys (planes x dims flops per
      // vector) and the scan twice. Payload rides in the cache because
      // in-place verification needs it (see shape note above); if the
      // corpus outgrows storage memory, Spark evicts and recomputes —
      // graceful degradation back to the uncached cost, never failure.
      val banded = cs.persist(base
        .select(col("id"), col("__vec"), col("__norm"),
          posexplode(graft.functions.PlaneBandKeys(
            col("__vec").cast(ArrayType(DoubleType)), planes, bits))
            .as(Seq("__band", "__bkey"))))
      val verified = banded.as("a").join(banded.as("b"),
          col("a.__band") === col("b.__band") &&
          col("a.__bkey") === col("b.__bkey") &&
          col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          cosineFromParts(dot(col("a.__vec"), col("b.__vec")),
            col("a.__norm"), col("b.__norm")).as("cosine"))
        .filter(col("cosine") >= threshold)
      // filter before distinct: only surviving pairs (tiny) pay the
      // dedup shuffle; cosine is deterministic per pair so the triple
      // is distinct-safe
      if (bands == 1) verified.select("id_a", "id_b", "cosine")
      else verified.distinct().select("id_a", "id_b", "cosine")
    }
  }

  /** Nearest-centroid cell assignment for every vector: one corpus scan
    * with the centroid table as constant literals (no shuffle, no join).
    * Returns (id, __vec, __norm, cell) — the internal columns ride along
    * so callers ([[semanticDedup]]) can verify candidates without
    * re-fetching vectors.
    */
  def assignCells(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]]): DataFrame = {
    require(centroids.nonEmpty)
    df.select(col(idCol).as("id"), col(vecCol).as("__vec"),
        norm(col(vecCol)).as("__norm"),
        dot(col(vecCol), col(vecCol)).as("__vv"))
      .select(col("id"), col("__vec"), col("__norm"),
        nearestCell(col("__vec"), col("__vv"), centroids).as("cell"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023 shape): assign
    * every vector to its nearest coarse centroid, then drop any vector
    * that has a LOWER-id neighbor with cosine ≥ `threshold` in the SAME
    * cell. Returns one row per input vector: (id, cell, is_kept).
    *
    * The cell scoping is the point, and the documented approximation:
    * near-dup comparison is confined to each cluster, so cost is
    * Σ per-cell size² instead of corpus² — with k centroids scaled so
    * cells stay bounded (SemDeDup uses k ∝ corpus size), the within-cell
    * pair join after ONE shuffle by cell is the whole plan. A cross-cell
    * duplicate pair is missed by design (both engines, identically);
    * that trade is what distinguishes this operator from the banded-LSH
    * near-dup ([[cosineNearDupPairs]]), which buckets by signature
    * agreement rather than by a clustering.
    *
    * Survivor rule: keep the minimum id of each within-cell duplicate
    * neighborhood (a vector is dropped iff ANY lower-id same-cell
    * neighbor passes the threshold — no transitive closure; chains
    * resolve per-edge, deterministically, and the oracle replays the
    * same rule).
    *
    * Cost note: the cell-assignment subplan is referenced three times
    * (both self-join sides plus the final keep/drop join), and
    * self-join sides compute independently (no exchange/stage reuse —
    * measured, CcPlanCheck), so the assignment persists under the
    * [[CacheScope]]: one scan + one assignment pass total. Eviction
    * under memory pressure degrades to recompute, never failure.
    */
  def semanticDedup(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], threshold: Double)(
      implicit cs: CacheScope): DataFrame = {
    val a = cs.persist(assignCells(df, idCol, vecCol, centroids))
    // filter-before-distinct like cosineNearDupPairs: only ids that
    // actually lose (tiny) pay the dedup shuffle
    val dropped = a.as("a").join(a.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .filter(cosineFromParts(dot(col("a.__vec"), col("b.__vec")),
        col("a.__norm"), col("b.__norm")) >= threshold)
      .select(col("b.id").as("id")).distinct()
      .withColumn("__dropped", lit(true))
    a.join(dropped, Seq("id"), "left")
      .select(col("id"), col("cell").cast(LongType).as("cell"),
        (!coalesce(col("__dropped"), lit(false))).as("is_kept"))
  }

  /** Embedding-space decontamination: flag every corpus vector whose
    * cosine to ANY eval-set vector reaches `threshold` — the semantic
    * sibling of n-gram decontamination ([[Decontaminate]]), catching
    * paraphrased eval leakage that exact n-grams miss. Returns one row
    * per CONTAMINATED corpus vector: (id, n_eval_hits, best_eval_id)
    * where best_eval_id is the argmax-cosine eval vector (ties to the
    * lower eval id).
    *
    * Scale shape: the eval set is small by nature (benchmarks), so it
    * broadcasts; the corpus is scanned ONCE with no shuffle — the
    * threshold filter kills non-hits inside the broadcast join stage,
    * and only flagged rows (tiny) reach the per-id aggregation.
    */
  def decontamFlags(
      corpus: DataFrame, evals: DataFrame,
      idCol: String, vecCol: String, evalIdCol: String,
      threshold: Double): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("__vec"),
      norm(col(vecCol)).as("__norm"))
    val e = broadcast(evals.select(col(evalIdCol).as("eval_id"),
      col(vecCol).as("__evec"), norm(col(vecCol)).as("__enorm")))
    val hits = c.join(e, cosineFromParts(dot(col("__vec"), col("__evec")),
        col("__norm"), col("__enorm")) >= threshold)
      .select(col("id"), col("eval_id"),
        cosineFromParts(dot(col("__vec"), col("__evec")),
          col("__norm"), col("__enorm")).as("__cos"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("__cos").desc, col("eval_id").asc)
    hits.withColumn("__rn", row_number().over(w))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_eval_hits"),
        min(when(col("__rn") === 1, col("eval_id"))).as("best_eval_id"))
  }

  /** Per-group centroid statistics over int8-quantized vectors: one row
    * per group with the element-wise component sums (`dim_sums`,
    * `array<long>`) and the group size — callers divide for the mean or
    * feed the sums straight into an IVF coarse quantizer. The sums are
    * exact integers, so the result is engine-replayable, unlike a float
    * mean whose accumulation order would differ.
    *
    * Scale shape: ONE custom typed aggregate
    * ([[graft.functions.VectorSumAgg]]) with map-side partials — the
    * shuffle carries |groups| × dims longs regardless of corpus size.
    * The posexplode/groupBy(pos) alternative would shuffle corpus × dims
    * rows; `collect_list` would pull whole groups onto one executor.
    */
  def quantizedCentroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val scale = quantScale(df, vecCol)
    df.select(col(groupCol),
        transform(col(vecCol),
          v => round(v.cast(DoubleType) / scale * 127).cast(IntegerType)).as("__qvec"))
      .groupBy(col(groupCol))
      .agg(graft.functions.VectorSumAgg(col("__qvec")).as("dim_sums"),
        count(lit(1)).as("n_vecs"))
  }

  /** Squared L2 distance to an integer centroid literal via the dot
    * identity `v·v − 2·v·c + c·c`: `vv` is the row's precomputed self
    * dot, `v·c` one [[graft.functions.IntDot]] codegen kernel per
    * centroid, `c·c` a driver-side constant. Exact integer arithmetic.
    */
  private def qCentDist2(vv: Column, vec: Column, cent: Seq[Int]): Column = {
    val cc = cent.iterator.map(x => x.toLong * x).sum
    vv - lit(2L) * graft.functions.IntDot(vec, lit(cent.toArray)) + lit(cc)
  }

  /** argmin-distance centroid index, ties to the LOWER index (struct
    * ordering compares distance first, then index).
    */
  private def nearestQCentroid(vv: Column, vec: Column,
      cents: Seq[Seq[Int]]): Column =
    array_min(array(cents.zipWithIndex.map { case (p, i) =>
      struct(qCentDist2(vv, vec, p).as("d"), lit(i).as("c"))
    }: _*)).getField("c")

  /** Fixed-iteration Lloyd k-means over int8-quantized vectors — the
    * cluster labeler feeding cluster-balanced sampling, SemDeDup cell
    * choice, and IVF coarse quantizers. Returns one row per input
    * vector: (id, cluster, sq_dist) under the final centroids.
    *
    * Determinism (the reason for the integer space): float k-means is
    * not engine-replayable (accumulation order changes the means), so
    * vectors are int8-quantized first ([[quantize]]), distances are
    * exact integers, seeds are the `k` LOWEST-id vectors, argmin ties
    * break to the lower cluster index, and each new centroid component
    * is `floor(sum/count)` computed with one IEEE double division —
    * identical on every engine. An empty cluster keeps its previous
    * centroid. `iters` = number of assignment passes; centroids are
    * updated between passes (iters−1 updates), never after the last.
    *
    * Scale shape (the MLlib pattern): per iteration ONE corpus scan
    * where assignment is a pure projection against k CONSTANT centroid
    * literals (no join, no shuffle), then ONE map-side-combined
    * aggregate whose shuffle carries k×dims longs regardless of corpus
    * size ([[graft.functions.VectorSumAgg]]), then an O(k×dims) driver
    * collect — the only driver-side data in the loop. The quantized
    * corpus persists under the [[CacheScope]], so the input is scanned
    * and quantized once across all passes; the RETURNED frame is a
    * zero-shuffle projection over that cached relation.
    */
  def quantizedKMeans(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, seeding: String = "first")(
      implicit cs: CacheScope): DataFrame = {
    val (q, cents, _) = lloydTrain(df, idCol, vecCol, k, iters, seeding)
    val best = array_min(array(cents.zipWithIndex.map { case (p, i) =>
      struct(qCentDist2(col("__vv"), col("qvec"), p).as("d"), lit(i).as("c"))
    }: _*))
    q.select(col("id"), best.getField("c").as("cluster"),
      best.getField("d").as("sq_dist"))
  }

  /** The MODEL half of [[quantizedKMeans]]: the learned centroids
    * mapped back to the input's double space
    * (`centroid_int × scale ÷ 127`, one multiply + one divide — IEEE-
    * exact cross-engine) — for callers that need the codebook rather
    * than the assignment, e.g. TRAINED PQ sub-codebooks (s20).
    */
  def quantizedKMeansModel(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, seeding: String = "first")(
      implicit cs: CacheScope): Seq[Seq[Double]] = {
    val (_, cents, scale) = lloydTrain(df, idCol, vecCol, k, iters, seeding)
    cents.map(_.map(ci => ci.toDouble * scale / 127.0))
  }

  /** Shared Lloyd loop: returns the persisted quantized corpus, the
    * final INT centroids, and the quantization scale.
    *
    * Seeding (all three deterministic and engine-replayable):
    *  - "first": the `k` lowest-id vectors — one scan, the original
    *    contract the s12/s20 oracles replay. Risk: consecutive ids can
    *    be CORRELATED vectors, starting the codebook in one region.
    *  - "stride": the k evenly-strided vectors of the id order (ranks
    *    ⌊1 + i·(n−1)/(k−1)⌋) — the deterministic analogue of random
    *    seeding, sampling the data distribution instead of its id
    *    prefix. Measured the best recall of the three on trained PQ
    *    (PqRecallProbe / COVERAGE.md); one extra count + one window
    *    pass at build time.
    *  - "farthest": greedy farthest-point (seed 0 = lowest id, each
    *    next seed maximizes distance to the nearest chosen, ties to
    *    lower id) — the k-means++ SHAPE, but without D² sampling it
    *    chases outliers: measured WORSE than "first" on this corpus
    *    (0.08 vs 0.26 overlap@10) — kept as the documented negative
    *    result and for corpora whose hull is the structure.
    *  - "kmpp": k-means|| (Bahmani et al. 2012, "Scalable k-means++")
    *    made deterministic — candidate centers D²-proportionally
    *    sampled with the repo's md5-threshold trick (2 rounds, ~2k
    *    expected picks each, one corpus pass per round), weighted by
    *    the corpus mass each attracts (one assignment pass), final k
    *    picked driver-side by weight·D² greedy maximization over the
    *    ≤ O(k) candidates. D² sampling keeps candidates
    *    mass-proportional (what "farthest" lacks), and the weight term
    *    suppresses the outliers that survive sampling. Cost: ~3 extra
    *    corpus passes at build time, zero at search.
    */
  private def lloydTrain(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, seeding: String = "first")(
      implicit cs: CacheScope): (DataFrame, Seq[Seq[Int]], Double) = {
    require(k > 0 && iters > 0, "k and iters must be positive")
    val scale = quantScale(df, vecCol)
    val q = cs.persist(quantize(df, idCol, vecCol, scale)
      .withColumn("__vv", graft.functions.IntDot(col("qvec"), col("qvec"))))
    def strideSeeds(): Seq[Seq[Int]] = {
      val n = q.count()
      require(n >= k, s"k=$k exceeds corpus size $n")
      // 0-based strided positions in the id order (distinct while
      // n ≥ k: the step (n−1)/(k−1) is ≥ 1)
      val ranks: Set[Long] =
        if (k == 1) Set(0L)
        else (0 until k).map(i => i.toLong * (n - 1) / (k - 1)).toSet
      // global rank via sorted-RDD zipWithIndex: range-partitioned
      // sort + per-partition counting — never the single-task global
      // window a partitionBy-less row_number serializes the whole
      // quantized corpus through (ADVICE r13)
      val picked = q.select(col("id"), col("qvec")).orderBy(col("id"))
        .rdd.zipWithIndex()
        .filter { case (_, idx) => ranks(idx) }
        .map { case (r, idx) => (idx, r.getSeq[Int](1).toSeq) }
        .collect()
      require(picked.length == k, s"stride seeding picked ${picked.length} of $k")
      picked.sortBy(_._1).map(_._2).toSeq
    }
    def seedRows(): Seq[Seq[Int]] = seeding match {
      case "first" =>
        val s = q.orderBy(col("id")).limit(k).collect()
        require(s.length == k, s"k=$k exceeds corpus size ${s.length}")
        s.map(_.getSeq[Int](1)).toSeq
      case "stride" => strideSeeds()
      case "kmpp" =>
        // D²-proportional candidate sampling, deterministic: the
        // md5-uniform u(id, round) ∈ [0, M) accepts a point when
        // u/M < 2k·d²/Σd² (the k-means|| overselection probability);
        // doubles only decide SAMPLING (row-local, deterministic on
        // the same data) — distances and the final selection stay
        // integer-exact
        val M = 1000000000L
        var cand = Seq(q.orderBy(col("id")).limit(1).collect()(0)
          .getSeq[Int](1).toSeq)
        for (r <- 1 to 2) {
          val dmin = array_min(array(cand.map(c =>
            qCentDist2(col("__vv"), col("qvec"), c)): _*)).cast(LongType)
          // persisted: the D² column feeds TWO actions (the Σd²
          // aggregate and the sampled collect) — without the persist
          // each round scans the corpus twice computing |cand|
          // quantized distances per row
          val withD = q.select(col("id"), col("qvec"), dmin.as("__d")).persist()
          val sumd = withD.agg(sum(col("__d"))).head().getLong(0)
          if (sumd > 0) {
            val u = conv(substring(md5(concat(col("id").cast(StringType),
              lit(s"_kmpp$r"))), 1, 15), 16, 10).cast(LongType) % M
            val picked = withD.filter(col("__d") > 0)
              .filter(u.cast(DoubleType) / M.toDouble <
                lit(2.0 * k) * col("__d").cast(DoubleType) / sumd.toDouble)
              .orderBy(col("id")).limit(8 * k).collect()
            cand = (cand ++ picked.map(_.getSeq[Int](1).toSeq)).distinct
          }
          withD.unpersist()
        }
        if (cand.size < k) cand = (cand ++ strideSeeds()).distinct
        require(cand.size >= k,
          s"kmpp found ${cand.size} distinct candidates for k=$k")
        // mass each candidate attracts (one assignment pass)
        val weight = q
          .select(nearestQCentroid(col("__vv"), col("qvec"), cand).as("__c"))
          .groupBy(col("__c")).agg(count(lit(1)).as("__n"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        def d2(a: Seq[Int], b: Seq[Int]): Long = {
          var s = 0L; var i = 0
          while (i < a.length) { val d = a(i).toLong - b(i); s += d * d; i += 1 }
          s
        }
        // greedy weighted D²: heaviest candidate first, then argmax of
        // mass × distance²-to-nearest-chosen (integer, ties to lower
        // candidate index). weight ≤ |corpus|, d² ≤ dims·(2·127)² —
        // the product stays far under Long overflow below ~10¹² rows.
        var chosen = List(cand.indices.maxBy(i => (weight.getOrElse(i, 0L), -i)))
        while (chosen.size < k) {
          val next = cand.indices.filterNot(chosen.contains)
            .maxBy { i =>
              val dm = chosen.iterator.map(j => d2(cand(i), cand(j))).min
              (weight.getOrElse(i, 0L) * dm, -i.toLong)
            }
          chosen = next :: chosen
        }
        chosen.reverse.map(cand(_))
      case "farthest" =>
        require(q.count() >= k, s"k=$k exceeds corpus size")
        var chosen = Seq(q.orderBy(col("id")).limit(1).collect()(0)
          .getSeq[Int](1).toSeq)
        while (chosen.size < k) {
          val dmin = array_min(array(chosen.map(c =>
            qCentDist2(col("__vv"), col("qvec"), c)): _*))
          val next = q.select(col("id"), col("qvec"), dmin.as("__d"))
            .orderBy(col("__d").desc, col("id")).limit(1).collect()(0)
          chosen = chosen :+ next.getSeq[Int](1).toSeq
        }
        chosen
      case other => throw new IllegalArgumentException(
        s"unknown seeding '$other' (first | stride | farthest | kmpp)")
    }
    var cents: Seq[Seq[Int]] = seedRows()
    for (_ <- 1 until iters) {
      val stats = q
        .select(nearestQCentroid(col("__vv"), col("qvec"), cents).as("__c"),
          col("qvec"))
        .groupBy(col("__c"))
        .agg(graft.functions.VectorSumAgg(col("qvec")).as("__sums"),
          count(lit(1)).as("__n"))
        .collect()
      val updated = stats.map { r =>
        val n = r.getLong(2)
        // one IEEE double division + floor — exact cross-engine for
        // |sum| far below 2^53 (int8 components cap it at 127·|corpus|)
        r.getInt(0) -> r.getSeq[Long](1)
          .map(s => math.floor(s.toDouble / n).toInt)
      }.toMap
      cents = cents.indices.map(c => updated.getOrElse(c, cents(c)))
    }
    (q, cents, scale)
  }
}
