package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

/** Document deduplication for training-data pipelines: exact,
  * n-gram-Jaccard, MinHash+LSH, and SimHash near-dup.
  *
  * Scale design notes (100 TB corpus):
  * - exact dedup: one shuffle on a 128-bit content hash — the canonical
  *   map-side-combined groupBy;
  * - MinHash+LSH: signatures are a single explode + groupBy(doc) with
  *   map-side partial min; candidate generation shuffles by (band,
  *   band-hash) — never all-pairs; verification touches only candidates;
  * - the *exact* all-pairs Jaccard join (inverted index on shingles) is
  *   provided for verification/small corpora; its cost is quadratic in
  *   per-shingle document frequency, which is why the LSH path is the
  *   default at scale;
  * - SimHash: 64-bit signature via per-bit weighted sums in one
  *   aggregation; near-dup = banded hamming join (4×16-bit chunks),
  *   again no all-pairs.
  */
object TextDedup {

  // ───────────────────────────────────────────── exact

  /** Exact dedup: one survivor (min `idCol`) per identical `textCol`.
    * Content identity = md5 (portable to the oracle; at scale swap for
    * xxhash128/sha-256 at no structural change).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact-dup groups: content hash → group size + surviving id. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("group_size"), min(col(idCol)).as("survivor_id"))

  /** C4-style cross-document line dedup: split on newlines, drop every
    * line occurring in ≥ `minDocs` DISTINCT documents (boilerplate:
    * banners, footers, cookie notices), reassemble survivors in
    * original order. Returns (idCol, n_lines, n_kept, clean_text).
    *
    * Scale shape: one map-side-combined shuffle to count distinct docs
    * per line, one join back keyed on the line (both sides corpus-sized
    * → sort-merge, never broadcast), and a per-doc reassembly that
    * sorts only within the document's own (pos, line) structs — no
    * global order anywhere. A line repeated WITHIN one document is not
    * boilerplate (distinct-doc count stays 1) and survives.
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 2): DataFrame = {
    val lines = df.select(col(idCol).as("__id"),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val counts = lines.groupBy(col("__line"))
      .agg(countDistinct(col("__id")).as("__ndocs"))
    lines.join(counts, Seq("__line"))
      .groupBy(col("__id").as(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(col("__ndocs") < minDocs, 1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(
            when(col("__ndocs") < minDocs, struct(col("__pos"), col("__line"))))),
          x => x.getField("__line")), "\n").as("clean_text"))
  }

  /** Intra-document de-repetition: collapse runs of CONSECUTIVE
    * identical lines within each document to a single occurrence
    * (generation loops, scraped pagination artifacts, stuttered
    * boilerplate). Non-consecutive repeats survive — [A, A, B, A]
    * keeps [A, B, A] — and cross-document frequency is irrelevant
    * (that's [[lineDedup]]'s job). Returns (idCol, n_lines, n_kept,
    * clean_text).
    *
    * Scale shape: ZERO shuffles — pure per-row array expressions
    * (split → indexed filter against the bound lines column → join),
    * embarrassingly parallel at any corpus size. The lambda reads the
    * previous element via element_at on the BOUND array column (O(1)
    * per element), never re-evaluating the split per element — the
    * HOF outer-ref quadratic pitfall.
    */
  def dropRepeatedLines(df: DataFrame, idCol: String, textCol: String): DataFrame =
    dropRepeatedUnits(df, idCol, textCol, "\n", "n_lines")

  /** Token-stutter removal: collapse runs of consecutive identical
    * space-separated tokens ("the the the cat" → "the cat") — OCR/ASR
    * stutter and decode-loop artifacts. Same zero-shuffle indexed-filter
    * machinery as [[dropRepeatedLines]], case-preserving (stutter is
    * exact repetition; near-repetition is t04's gate). Returns
    * (idCol, n_tokens, n_kept, clean_text).
    */
  def dropRepeatedTokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    dropRepeatedUnits(df, idCol, textCol, " ", "n_tokens")

  private def dropRepeatedUnits(df: DataFrame, idCol: String, textCol: String,
      sep: String, countCol: String): DataFrame =
    df.select(col(idCol), split(col(textCol), sep).as("__units"))
      .select(col(idCol), col("__units"),
        // keep unit i (0-based) iff first or different from unit i−1
        // (element_at is 1-based, so element_at(__units, i) IS i−1)
        filter(col("__units"),
          (x, i) => i === 0 || x =!= element_at(col("__units"), i)).as("__kept"))
      .select(col(idCol),
        size(col("__units")).as(countCol),
        size(col("__kept")).as("n_kept"),
        array_join(col("__kept"), sep).as("clean_text"))

  /** Canonical text form for near-exact dedup: lowercase, punctuation
    * stripped, whitespace collapsed. The regexes stay inside the
    * Java∩RE2 subset (cf. [[graft.functions.Redaction]]) so the oracle
    * replays them verbatim (DuckDB needs the 'g' flag for replace-all —
    * Spark's regexp_replace is global by default). The whitespace class
    * is spelled out rather than `\s` because the shorthand itself
    * diverges between the engines: Java's includes \x0B (vertical tab),
    * RE2's does not — a \x0B would collapse to a space on one engine
    * and be stripped as punctuation on the other.
    */
  val WhitespaceClass = " \\t\\n\\x0B\\f\\r"

  def normalizedText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), s"[^a-z0-9$WhitespaceClass]", ""),
      s"[$WhitespaceClass]+", " "))

  /** Near-exact dup groups on the canonical form — catches the
    * case/punctuation/whitespace variants a raw content hash misses
    * (the standard first pass before n-gram near-dup). Same single
    * map-side-combined shuffle as [[exactGroups]].
    */
  def normalizedGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(normalizedText(col(textCol))).as("content_hash"))
      .agg(count(lit(1)).as("group_size"), min(col(idCol)).as("survivor_id"))

  // ───────────────────────────────────────────── edit distance

  /** Near-dup pairs by edit distance ≤ `maxDist`, lossless length-band
    * blocking instead of all-pairs: two strings within distance k differ
    * in length by ≤ k, so with band = len div bandWidth (bandWidth > k)
    * a qualifying pair's bands differ by at most 1. The probe side keeps
    * its home band, the build side fans out to {b−1, b, b+1}; the join
    * on the band key plus an id order makes each pair appear exactly
    * once, and a |Δlen| ≤ k filter runs before the distance call. The
    * verify step uses Spark's threshold levenshtein — banded
    * O((2k+1)·n) with early exit, not the O(n²) full matrix — so the
    * cost is (candidates within a 3-band window) × k·len, never
    * corpus². At 100 TB the band key shuffles both sides; no band is
    * larger than the corpus slice sharing a length range, and skew is
    * bounded by `maxLen`.
    */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int, maxLen: Int, bandWidth: Int = 16): DataFrame = {
    require(maxDist < bandWidth, "bandWidth must exceed maxDist for lossless banding")
    val short = df
      .select(col(idCol).as("id"), col(textCol).as("__t"),
        length(col(textCol)).as("__len"))
      .filter(col("__len") <= maxLen)
    val probe = short.withColumn("__band", expr(s"__len div $bandWidth").cast(LongType))
    val build = probe
      .withColumn("__band", explode(array(col("__band") - 1, col("__band"), col("__band") + 1)))
    probe.as("a").join(build.as("b"),
        col("a.__band") === col("b.__band") && col("a.id") < col("b.id") &&
        abs(col("a.__len") - col("b.__len")) <= maxDist)
      .withColumn("dist", levenshtein(col("a.__t"), col("b.__t"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("dist"))
  }

  // ───────────────────────────────────────────── n-gram Jaccard (exact)

  /** Row bound for broadcasting pair-expanded shingle relations (~50 B/row
    * ⇒ a couple hundred MB worst case, far under broadcast limits).
    */
  private[operators] val PairShingleBroadcastRows = 4000000L

  /** Per-doc n-gram repetition stats: (id, n_grams, n_distinct_grams),
    * docs with zero grams omitted. Explode + aggregate rather than
    * array-expression arithmetic: higher-order functions run
    * interpreted and re-evaluate outer refs per element (~50 ms/doc),
    * while the Generate + hash-agg path is codegen'd end to end.
    */
  def gramStats(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("id"),
        explode(TextFunctions.gramsOfTokens(col("__toks"), n)).as("__g"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"), countDistinct(col("__g")).as("n_distinct_grams"))

  /** Distinct word-`n`-gram shingles per document: (id, shingle).
    * Tokenizes in its own projection so the gram lambda slices a bound
    * array (see [[TextFunctions.gramsOfTokens]] — inline tokenization
    * under a HOF is O(tokens²) per doc).
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("id"),
        explode(array_distinct(TextFunctions.gramsOfTokens(col("__toks"), n))).as("shingle"))

  /** Exact all-pairs n-gram Jaccard ≥ `threshold` via the inverted-index
    * join: pairs sharing ≥1 shingle, |A∩B| counted, |A∪B| = |A|+|B|−|A∩B|.
    * Output: (id_a, id_b, jaccard) with id_a < id_b.
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8)(implicit cs: CacheScope): DataFrame = {
    // the shingle relation feeds both join sides and the size aggregate —
    // materialize it once (shingling re-tokenizes every document)
    val sh = cs.persist(shingles(df, idCol, textCol, n))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_shingles"))

    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))

    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_shingles", "size_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_shingles", "size_b"), "id_b")
      .withColumn("jaccard",
        col("n_inter").cast(DoubleType) / (col("size_a") + col("size_b") - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Asymmetric n-gram containment: ordered pairs (id_src, id_dst,
    * containment) with |src ∩ dst| / |src| ≥ `threshold` — detects a
    * document CONTAINED in another (quoted passages, boilerplate
    * wrappers, expanded revisions), which symmetric Jaccard misses when
    * the container is much longer (|A∩B|/|A∪B| shrinks with |B|).
    * Same inverted-index shape as [[ngramJaccardPairs]] and the same
    * scale label: exact verification baseline — the scale path is
    * [[containmentPairsPrefix]]. The [[CacheScope]] owns the cache
    * lifetime of the shingle relation this persists (cf.
    * [[minhashLshPairs]]).
    */
  def containmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.9)(implicit cs: CacheScope): DataFrame = {
    val sh = cs.persist(shingles(df, idCol, textCol, n))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_shingles"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    val sized = inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_shingles", "size_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_shingles", "size_b"), "id_b")
    bothDirections(sized, threshold)
  }

  /** Each unordered sized-intersection row (id_a, id_b, n_inter,
    * size_a, size_b) yields both directed containments — via ONE
    * explode, never a dirA/dirB self-union: a union references the
    * sized relation twice, and since its upstream (the whole
    * inverted-index or verification pipeline) is lazy, the union
    * EXECUTES it twice. Measured on the d23 500k growth tier: the
    * union form ran 104 s (a stage probe put ~30 s in one verification
    * pass alone), the explode form 26 s — and the growth curve
    * straightened from ~14x per 10x docs to ~3.5x.
    */
  private def bothDirections(sized: DataFrame, threshold: Double): DataFrame =
    sized.select(explode(array(
        struct(col("id_a").as("id_src"), col("id_b").as("id_dst"),
          (col("n_inter").cast(DoubleType) / col("size_a")).as("containment")),
        struct(col("id_b").as("id_src"), col("id_a").as("id_dst"),
          (col("n_inter").cast(DoubleType) / col("size_b")).as("containment"))))
        .as("__dir"))
      .select(col("__dir.id_src").as("id_src"), col("__dir.id_dst").as("id_dst"),
        col("__dir.containment").as("containment"))
      .filter(col("containment") >= threshold)

  /** Directed candidate pairs for [[containmentPairsPrefix]] — split out
    * so the plan contract (candidate join keyed on the 8-byte shingle
    * hash, never the raw shingle string) is assertable in isolation.
    *
    * Prefix filtering (the AllPairs/PPJoin family): containment ≥ t
    * means at most ⌊(1−t)·|src|⌋ of src's shingles miss dst, so src's
    * k = ⌊(1−t)·|src|⌋+1 RAREST shingles (by document frequency) must
    * include at least one shingle present in dst — pigeonhole, lossless.
    * Candidates therefore come only from low-df shingles; the high-df
    * boilerplate tail — the Σ df² blowup that makes the exact
    * inverted-index join quadratic on exactly the corpora containment
    * detection is for — never generates a candidate. This beats banding
    * min-hash signatures for the asymmetric case: a short doc quoted
    * inside a much longer one has low Jaccard, so symmetric-signature
    * bands lose precisely the pairs containment exists to find, while
    * the prefix filter is exact at any length ratio.
    *
    * Scale shape: df counts are one map-side-combined shuffle; the
    * per-doc rarest-k selection is one corpus-linear window (shuffle by
    * doc id, sort within doc); the candidate join is prefix (≈(1−t) of
    * the shingle volume) against the full index on `xxhash64(shingle)`
    * — an 8-byte key, with fan-out bounded by the LOW df of prefix
    * shingles. Hash collisions only ever ADD candidates (verification
    * is exact), so the output is identical to [[containmentPairs]].
    */
  /** Single-long rarity sort key for the rarest-k prefix windows:
    * df (capped at 2²¹−1 — beyond that "common is common", rarity
    * distinctions carry no fan-out information) in the top 21 bits,
    * the hash key's top 42 bits as tie-break; always non-negative, so
    * signed long ordering == the intended (df ASC, key ASC) order.
    * ONE primitive sort key instead of two halves the window sort's
    * comparator work (constant-factor: the window stays corpus-linear).
    * Ties beyond the packed bits leave the k-th pick run-dependent —
    * harmless: the pigeonhole prefix is lossless for ANY k+1-subset of
    * a doc's shingles (|src∖dst| ≤ (1−t)·n regardless of which subset
    * is chosen), and exact verification makes the operator's OUTPUT
    * identical for every candidate superset.
    */
  private def rarityKey(dfCol: Column, keyCol: Column): Column =
    shiftleft(least(dfCol, lit((1L << 21) - 1)), 42)
      .bitwiseOR(shiftrightunsigned(keyCol, 22))

  private[graft] def containmentCandidates(
      sh: DataFrame, threshold: Double): DataFrame = {
    val keyed = sh.select(col("id"), xxhash64(col("shingle")).as("skey"))
    val dfs = keyed.groupBy("skey").agg(count(lit(1)).as("__df"))
    val sizes = keyed.groupBy("id").agg(count(lit(1)).as("n_shingles"))
    // +1e-6 guards the FP product's round-down at integer boundaries
    // ((1−0.9)·20 = 1.9999999999999996): k may only ever over-approximate
    val w = Window.partitionBy(col("id"))
      .orderBy(rarityKey(col("__df"), col("skey")))
    val prefix = keyed.join(dfs, "skey")
      .withColumn("__rk", row_number().over(w))
      .join(sizes, "id")
      .filter(col("__rk") <=
        floor((lit(1.0) - threshold) * col("n_shingles") + 1e-6) + 1)
      .select(col("id").as("id_src"), col("skey"))
    prefix.join(keyed.select(col("id").as("id_dst"), col("skey")), "skey")
      .filter(col("id_src") =!= col("id_dst"))
      .select("id_src", "id_dst")
      .distinct()
  }

  /** Asymmetric containment at scale: prefix-filtered candidates (see
    * [[containmentCandidates]]) verified with the exact |src∩dst|/|src|
    * on candidates only — same output as [[containmentPairs]], never
    * all-pairs on shared shingles. Verification compares raw shingle
    * strings (string-exact parity with the oracle) and is size-gated
    * exactly like [[minhashLshPairs]]: small candidate sets broadcast,
    * large ones fall back to shuffle joins. The [[CacheScope]] owns
    * the cache lifetime of the persisted shingle and candidate
    * relations.
    *
    * `hashedVerification` (exactness policy, default OFF — the same
    * flag and trade as [[minhashLshPairs]]): the verification joins
    * compare xxhash64(shingle) instead of the raw string. The
    * pair-shingles relation is the operator's dominant shuffle
    * (candidates × shingles-per-doc rows — ~99M rows at the 500k
    * growth tier), and the flag fixes each row's key at 8 bytes.
    * Measured at that tier: ~neutral on the short-shingle growth
    * corpus (33.4 s hashed vs 36.9 s string, same JVM position —
    * word 3-shingles there are only ~20 bytes); the byte win is for
    * LONG shingles/grams, where minhashLshPairs measured ~3×. A
    * 64-bit collision between DISTINCT shingles of a candidate pair
    * would inflate n_inter by one; expected errors are zero below
    * ~10¹³ candidates. Default stays string-exact so the oracle gate
    * is bit-identical by construction.
    */
  def containmentPairsPrefix(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.9,
      broadcastCandidateLimit: Long = 100000L,
      hashedVerification: Boolean = false)(implicit cs: CacheScope): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    val sh = cs.persist(shingles(df, idCol, textCol, n))
    val candidates = cs.persist(containmentCandidates(sh, threshold))
    val candCount = candidates.count()
    val shStats = sh.agg(countDistinct(col("id")), count(lit(1))).head()
    val avgShingles =
      if (shStats.getLong(0) == 0L) 1L
      else math.max(1L, shStats.getLong(1) / shStats.getLong(0))
    val small = candCount <= broadcastCandidateLimit &&
      candCount * avgShingles <= PairShingleBroadcastRows
    val gate: DataFrame => DataFrame = if (small) broadcast else identity

    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_shingles"))
    // sizes always come from the string relation; only the match key of
    // the verification joins switches under the policy flag
    val verif =
      if (hashedVerification) sh.select(col("id"), xxhash64(col("shingle")).as("shingle"))
      else sh
    val pairShingles = verif.join(gate(candidates), col("id") === col("id_src"))
      .select(col("id_src"), col("id_dst").as("__cand_b"), col("shingle").as("__cand_sh"))
    val inter = verif.join(gate(pairShingles),
        col("id") === col("__cand_b") && col("shingle") === col("__cand_sh"))
      .select(col("id_src"), col("__cand_b").as("id_dst"))
      .groupBy("id_src", "id_dst").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_src").withColumnRenamed("n_shingles", "size_src"), "id_src")
      .withColumn("containment", col("n_inter").cast(DoubleType) / col("size_src"))
      .filter(col("containment") >= threshold)
      .select("id_src", "id_dst", "containment")
  }

  // ───────────────────────────────────────────── winnowed fingerprints

  /** MOSS-style near-dup pairs via winnowed fingerprints: pairs sharing
    * ≥ `minShared` fingerprint values (character-level k-grams — catches
    * reformatted/retokenized near-dups that word-shingle Jaccard misses,
    * e.g. whitespace-mangled copies). Fingerprints are the winnowed ~1/w
    * subset of k-gram hashes ([[graft.functions.WinnowedFingerprint]]),
    * so the inverted index is w× smaller than the shingle index and
    * keyed on an 8-byte LONG. Like [[ngramJaccardPairs]] this is the
    * exact baseline: common 8-char grams ("ing the ") recur across
    * unrelated documents, so per-fingerprint df is corpus-scale and
    * the join is Σ df². The ABSOLUTE `minShared` threshold admits no
    * sublinear exact path (its pigeonhole prefix is `n − minShared + 1`
    * ≈ the whole fingerprint set when minShared ≪ n — measured: a
    * prefix variant of this operator was SLOWER than the join it
    * replaced) — at scale use the fractional
    * [[fingerprintContainmentPrefix]] instead, or bound the hot keys
    * with `maxDf`.
    *
    * `maxDf` is MOSS's boilerplate suppression (Schleimer et al. run
    * it as standard practice: fingerprints appearing in very many
    * documents are template/boilerplate, not copying evidence): a
    * fingerprint whose document frequency exceeds `maxDf` is dropped
    * from the inverted index BEFORE the self-join, bounding that key's
    * candidate contribution at maxDf² and the whole join at
    * Σ min(df, maxDf)². This is a semantic choice, not an
    * approximation of the uncapped answer — `shared_fps` counts only
    * non-ubiquitous fingerprints, so a pair held together solely by
    * corpus-wide grams (measured: one 10×-replicated hot token turned
    * the sf1 join quadratic) no longer qualifies. The hot set is tiny
    * (≤ total_fps / maxDf ids), so the suppression is a broadcast
    * anti-join, never a shuffle.
    */
  def fingerprintPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4, minShared: Int = 5,
      maxDf: Int = Int.MaxValue)(implicit cs: CacheScope): DataFrame = {
    // persist before the self-join: Spark computes each side of a
    // self-join independently (no exchange/stage reuse — measured,
    // see CcPlanCheck), so an uncached fps would re-fingerprint the
    // corpus twice
    val raw = df.select(col(idCol).as("id"),
      explode(graft.functions.WinnowedFingerprint(col(textCol), k, w)).as("fp"))
    val fps = cs.persist(
      if (maxDf == Int.MaxValue) raw
      else {
        // raw feeds BOTH the df aggregate and the anti-join probe, so
        // persist it too — otherwise the corpus is fingerprinted twice
        // before fps ever caches (the exact double-scan the self-join
        // persist below exists to avoid)
        val rawC = cs.persist(raw)
        // fingerprints are distinct per document, so count(1) per fp
        // IS the document frequency
        val hot = rawC.groupBy("fp").agg(count(lit(1)).as("__df"))
          .filter(col("__df") > maxDf).select("fp")
        rawC.join(broadcast(hot), Seq("fp"), "left_anti")
      })
    fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /** Directed fingerprint containment, exact: ordered pairs (id_src,
    * id_dst, containment) with |fp(src) ∩ fp(dst)| / |fp(src)| ≥
    * `threshold` — the char-level analog of [[containmentPairs]]
    * (quoted passages and wrapped copies survive retokenization that
    * word-shingle containment misses). Inverted index on the
    * fingerprint LONG; documents with empty fingerprint sets emit
    * nothing (containment is undefined over an empty source).
    *
    * Like [[containmentPairs]] this is the exact verification baseline
    * — cost is Σ per-fingerprint df², and common English 8-char grams
    * recur across unrelated documents, so df is NOT bounded by real
    * content sharing the way [[fingerprintPairs]]' absolute-count
    * OUTPUT is. The scale path is [[fingerprintContainmentPrefix]].
    * The [[CacheScope]] owns the cache lifetime of the fingerprint
    * relation this persists (cf. [[minhashLshPairs]]).
    */
  def fingerprintContainment(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, w: Int = 4, threshold: Double = 0.8)(implicit cs: CacheScope): DataFrame = {
    val fps = cs.persist(df.select(col(idCol).as("id"),
      explode(graft.functions.WinnowedFingerprint(col(textCol), k, w)).as("fp")))
    val sizes = fps.groupBy("id").agg(count(lit(1)).as("n_fp"))
    val inter = fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    val sized = inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_fp", "size_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_fp", "size_b"), "id_b")
    bothDirections(sized, threshold)
  }

  /** Fingerprint containment at scale: same output as
    * [[fingerprintContainment]], candidates from a prefix filter.
    *
    * The FRACTIONAL threshold is what makes prefix filtering effective
    * here: containment ≥ t means at most ⌊(1−t)·n⌋ of the source's `n`
    * fingerprints miss the destination, so its ⌊(1−t)·n⌋+1 RAREST
    * fingerprints (by document frequency) must include one present in
    * the destination — pigeonhole, lossless, and the prefix is a
    * (1−t) sliver of the fingerprint volume. Candidates therefore come
    * only from low-df fingerprints; ubiquitous English 8-grams (df ≈
    * corpus size — the Σ df² blowup of the exact join) never generate
    * a candidate. Contrast [[fingerprintPairs]]' ABSOLUTE `minShared`:
    * its pigeonhole prefix is `n − minShared + 1` ≈ the whole set when
    * minShared ≪ n, which prunes nothing — an absolute-overlap
    * predicate has no sublinear exact path, which is why the scale
    * form of char-level dedup is this fractional operator.
    *
    * One-sided and direction-complete: a qualifying (src → dst) pair
    * collides on src's prefix, and candidates are verified as
    * unordered pairs then re-directed, so both directions of the
    * output are covered. Verification counts intersections on
    * candidates only, with the same size-gated broadcast/shuffle
    * strategy as [[minhashLshPairs]] — and the join keys are 8-byte
    * LONGs, so unlike the shingle paths no re-keying hash is needed.
    * The [[CacheScope]] owns the cache lifetime of the fingerprint
    * and candidate relations this persists (cf. [[minhashLshPairs]]).
    */
  def fingerprintContainmentPrefix(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, w: Int = 4, threshold: Double = 0.8,
      broadcastCandidateLimit: Long = 100000L)(implicit cs: CacheScope): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    val fps = cs.persist(df.select(col(idCol).as("id"),
      explode(graft.functions.WinnowedFingerprint(col(textCol), k, w)).as("fp")))

    val dfs = fps.groupBy("fp").agg(count(lit(1)).as("__df"))
    val sizes = fps.groupBy("id").agg(count(lit(1)).as("n_fp"))
    val win = Window.partitionBy(col("id"))
      .orderBy(rarityKey(col("__df"), col("fp")))
    // +1e-6 guards the FP product's round-down at integer boundaries
    // (cf. containmentCandidates): k may only ever over-approximate
    val prefix = fps.join(dfs, "fp")
      .withColumn("__rk", row_number().over(win))
      .join(sizes, "id")
      .filter(col("__rk") <=
        floor((lit(1.0) - threshold) * col("n_fp") + 1e-6) + 1)
      .select(col("id").as("id_p"), col("fp"))
    val candidates = cs.persist(prefix
      .join(fps.select(col("id").as("id_oth"), col("fp")), "fp")
      .filter(col("id_p") =!= col("id_oth"))
      .select(least(col("id_p"), col("id_oth")).as("id_a"),
        greatest(col("id_p"), col("id_oth")).as("id_b"))
      .distinct())

    val candCount = candidates.count()
    val gate: DataFrame => DataFrame =
      if (candCount <= broadcastCandidateLimit) broadcast else identity

    val pairFps = fps.join(gate(candidates), col("id") === col("id_a"))
      .select(col("id_a"), col("id_b").as("__cand_b"), col("fp").as("__cand_fp"))
    val inter = fps.join(gate(pairFps),
        col("id") === col("__cand_b") && col("fp") === col("__cand_fp"))
      .select(col("id_a"), col("__cand_b").as("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    val sized = inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_fp", "size_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_fp", "size_b"), "id_b")
    bothDirections(sized, threshold)
  }

  // ───────────────────────────────────────────── MinHash + LSH

  // (signatures are computed by the MinHashAgg typed imperative
  // aggregate — one primitive buffer per doc instead of numHashes
  // separate min(...) aggregates; see graft.functions.MinHashAgg)

  /** (id, band, band_key) — LSH bucket keys: signature split into `bands`
    * bands of `numHashes/bands` rows, each band hashed to one key.
    */
  def lshBands(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int): DataFrame =
    lshBandsFromShingles(shingles(df, idCol, textCol, n), numHashes, bands)

  private[graft] def lshBandsFromShingles(
      sh: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val sigs = sh.groupBy("id")
      .agg(graft.functions.MinHashAgg(col("shingle"), numHashes).as("sig"))
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rows).map(r => element_at(col("sig"), b * rows + r + 1))
      struct(lit(b).as("band"), xxhash64(parts: _*).as("band_key"))
    }
    sigs.select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }

  /** MinHash+LSH near-dup: candidates = pairs colliding in ≥1 band;
    * verified with exact Jaccard ≥ `threshold` over their shingle sets.
    * With rows-per-band=4, bands=32 the miss probability at j≥0.8 is
    * ~5e-8 — the verified output matches the exact operator.
    *
    * Verification join strategy is size-gated: a normal corpus yields a
    * candidate set tiny relative to the corpus, so both verification
    * joins broadcast it and the shingle relation is scanned, never
    * shuffled. But `pairShingles` grows ∝ candidates × shingles/doc — a
    * k-member duplicate cluster alone contributes k(k−1)/2 candidates —
    * so past `broadcastCandidateLimit` pairs the same plan runs as
    * shuffle joins (keys: id, then (id, shingle)); correctness is
    * identical, only the exchange strategy changes. The gating count is
    * one cheap job over the already-persisted band keys.
    *
    * `hashedVerification` (exactness policy, default OFF): verification
    * joins compare xxhash64(shingle) instead of the raw string —
    * shuffle rows shrink to a fixed 8 bytes per shingle (measured ~3×
    * on long-shingle corpora). The trade: two DISTINCT shingles across
    * a candidate pair colliding at 64 bits would inflate that pair's
    * intersection count by one — ~10⁶ shingle pairs per candidate ×
    * 2⁻⁶⁴ ≈ 5e-14 per pair, zero expected errors below ~10¹³
    * candidates. Default stays string-exact so the driver gate remains
    * bit-identical to the oracle by construction, not by probability.
    */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8, broadcastCandidateLimit: Long = 100000L,
      hashedVerification: Boolean = false)(implicit cs: CacheScope): DataFrame = {
    // one shingle pass feeds signatures, sizes and verification joins
    val sh = cs.persist(shingles(df, idCol, textCol, n))
    // bk is operator-owned (unpersisted below once candidates
    // materialize), so it bypasses the scope
    val bk = lshBandsFromShingles(sh, numHashes, bands).persist()
    val candidates = cs.persist(bk.as("a").join(bk.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct())
    // the relation actually broadcast is pairShingles ≈ candidates ×
    // shingles/doc, so the gate must bound ROWS, not just pair count —
    // long documents make each candidate hundreds of rows wide
    val candCount = candidates.count()
    bk.unpersist() // dead once candidates materialized
    val shStats = sh.agg(countDistinct(col("id")), count(lit(1))).head()
    val avgShingles =
      if (shStats.getLong(0) == 0L) 1L
      else math.max(1L, shStats.getLong(1) / shStats.getLong(0))
    val small = candCount <= broadcastCandidateLimit &&
      candCount * avgShingles <= PairShingleBroadcastRows
    val gate: DataFrame => DataFrame = if (small) broadcast else identity

    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_shingles"))
    // sizes always come from the string relation; only the match key of
    // the verification joins switches under the policy flag
    val verif =
      if (hashedVerification) sh.select(col("id"), xxhash64(col("shingle")).as("shingle"))
      else sh
    val pairShingles = verif.join(gate(candidates), col("id") === col("id_a"))
      .select(col("id_a"), col("id_b").as("__cand_b"), col("shingle").as("__cand_sh"))
    val inter = verif.join(gate(pairShingles),
        col("id") === col("__cand_b") && col("shingle") === col("__cand_sh"))
      .select(col("id_a"), col("__cand_b").as("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_shingles", "size_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_shingles", "size_b"), "id_b")
      .withColumn("jaccard",
        col("n_inter").cast(DoubleType) / (col("size_a") + col("size_b") - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ──────────────────────────────── persisted LSH dedup index (serve)

  /** Index relations for a persisted MinHash-LSH dedup index from ONE
    * document batch — the index-served counterpart of
    * [[minhashLshPairs]], completing the same split the BM25 postings
    * index makes for retrieval: build once, maintained by appends (and
    * MoR tombstones at the catalog layer), queried per incoming batch
    * without ever re-shingling the corpus.
    *
    *  - `bands` (id, band, band_key): the LSH candidate router.
    *  - `shingles` (id, shingle): the exact-verification relation. Raw
    *    strings — the string-exact default policy of
    *    [[minhashLshPairs]] (exact by construction, not probability);
    *    a deployment trading that for fixed 8-byte keys stores
    *    `xxhash64(shingle)` instead (the documented
    *    `hashedVerification` trade).
    *  - `sizes` (id, n_shingles): |shingle set| for the jaccard
    *    denominator, so lookups never re-aggregate the index.
    *
    * Each document must land in exactly one batch: maintenance is then
    * a pure append of the batch's three relations (no per-key merge),
    * committed atomically as one catalog generation by the caller.
    *
    * The shingle relation is persisted through the [[CacheScope]]: the
    * three relations are written by SEPARATE jobs (one per catalog
    * member), and an unpersisted `sh` would re-shingle the batch for
    * each — measured ~2 s per commit on the 5k-doc corpus.
    */
  def lshIndexRelations(batch: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32)(
      implicit cs: CacheScope): Map[String, DataFrame] = {
    val sh = cs.persist(shingles(batch, idCol, textCol, n))
    Map(
      "bands" -> lshBandsFromShingles(sh, numHashes, bands),
      "shingles" -> sh,
      "sizes" -> sh.groupBy("id").agg(count(lit(1)).as("n_shingles")))
  }

  /** Near-dup lookup of a QUERY batch against a persisted LSH index:
    * (id_q, id_c, jaccard) for every query doc within exact Jaccard ≥
    * `threshold` of an indexed doc (same n/numHashes/bands as the
    * build — band keys must be computed identically or candidates are
    * garbage). The exactness argument is [[minhashLshPairs]]'s: band
    * collisions route candidates, the shingle join verifies exactly,
    * and at 128/32 the miss probability above threshold 0.8 is ~5e-8 —
    * so the output equals the exact query-vs-corpus jaccard operator.
    *
    * Scale shape: the query BATCH is the bounded side — its band keys
    * broadcast into the index band scan, so the corpus-sized index is
    * scanned once and never shuffled. Verification prunes the shingle
    * index to candidate ids (broadcast semi-join) before the
    * intersection join, so corpus shingles of non-candidates are never
    * shuffled either; like [[minhashLshPairs]] the candidate-side
    * broadcast degrades to shuffle joins past `broadcastCandidateLimit`
    * (a query doc colliding with a giant duplicate cluster), correctness
    * unchanged. Callers apply tombstone anti-joins to the index
    * relations BEFORE passing them (the t27 pattern), which keeps the
    * jaccard denominators right for free — sizes ride beside shingles.
    */
  def lshIndexLookup(queries: DataFrame, idCol: String, textCol: String,
      idxBands: DataFrame, idxShingles: DataFrame, idxSizes: DataFrame,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8,
      broadcastCandidateLimit: Long = 100000L)(implicit cs: CacheScope): DataFrame = {
    val qsh = cs.persist(shingles(queries, idCol, textCol, n)
      .withColumnRenamed("id", "__qid").withColumnRenamed("shingle", "__qsh"))
    val qb = lshBandsFromShingles(
      qsh.select(col("__qid").as("id"), col("__qsh").as("shingle")),
      numHashes, bands)
    val cands = cs.persist(idxBands
      .join(broadcast(qb.withColumnRenamed("id", "__qid")), Seq("band", "band_key"))
      .select(col("__qid"), col("id").as("__cid")).distinct())
    val gate: DataFrame => DataFrame =
      if (cands.count() <= broadcastCandidateLimit) broadcast else identity
    val qsizes = qsh.groupBy("__qid").agg(count(lit(1)).as("__nq"))
    val qPairSh = qsh.join(gate(cands), "__qid")
      .select(col("__qid"), col("__cid"), col("__qsh"))
    val inter = idxShingles
      .join(gate(cands).select(col("__cid")).distinct(),
        col("id") === col("__cid"), "left_semi")
      .join(gate(qPairSh),
        col("id") === col("__cid") && col("shingle") === col("__qsh"))
      .groupBy(col("__qid"), col("__cid")).agg(count(lit(1)).as("__ninter"))
    // stat joins keep the corpus-sized sizes relation on the probe
    // side: qsizes is batch-bounded (unconditional broadcast), the
    // intersection counts are candidate-bounded (gated), so the index
    // is only ever scanned here, same as the shingle join above
    val withQ = inter.join(broadcast(qsizes), "__qid")
    idxSizes.select(col("id").as("__cid"), col("n_shingles").as("__nc"))
      .join(gate(withQ), "__cid")
      .withColumn("jaccard", col("__ninter").cast(DoubleType) /
        (col("__nq") + col("__nc") - col("__ninter")))
      .filter(col("jaccard") >= threshold)
      .select(col("__qid").as("id_q"), col("__cid").as("id_c"), col("jaccard"))
  }

  // ───────────────────────────────────────────── SimHash

  /** SimHash bit width: 60 bits, from the leading 15 hex chars of the
    * token's md5 — an engine-portable hash (both Spark and the DuckDB
    * oracle compute the identical value), unlike xxhash64.
    */
  val SimhashBits = 60

  /** SimHash of the distinct-token set: bit i of the signature is set iff
    * Σ over tokens of (token-hash bit i ? +1 : −1) > 0.
    * One explode + one groupBy folding the per-bit counts in a single
    * `SimHashAgg` buffer (map-side combined, no all-pairs anywhere); the
    * token hash stays the engine-portable md5 value so the oracle can
    * replay the identical signature.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(TextFunctions.tokenSet(col(textCol))).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
    toks.groupBy("id")
      .agg(graft.functions.SimHashAgg(col("h"), SimhashBits).as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ `maxHamming`,
    * candidates via 4×15-bit chunk equality (any pair within hamming ≤ 3
    * must agree on ≥1 chunk — pigeonhole), verified with exact popcount.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3)(implicit cs: CacheScope): DataFrame = {
    // persist the (tiny: id + one long) signature relation before the
    // banded self-join — each side would otherwise re-run the whole
    // tokenize + SimHashAgg pipeline (measured 2x, CcPlanCheck)
    val sigs = cs.persist(simhash(df, idCol, textCol))
    val chunkBits = SimhashBits / 4
    val mask = (1L << chunkBits) - 1
    val chunks = sigs.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * chunkBits).bitwiseAND(mask).as("ckey"))): _*)).as("ck"))
      .select(col("id"), col("simhash"), col("ck.chunk").as("chunk"), col("ck.ckey").as("ckey"))
    val popcount: Column => Column = c => bit_count(c)
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") &&
        col("a.ckey") === col("b.ckey") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        popcount(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
