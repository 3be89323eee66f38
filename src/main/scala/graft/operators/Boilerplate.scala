package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.{TextFunctions, WordGrams}

/** Corpus-level boilerplate mining: find word n-grams that recur across
  * many documents (site templates, license headers, navigation chrome)
  * and locate/merge the passages they cover inside each document — the
  * span-level counterpart to [[TextDedup.lineDedup]]'s line-level C4
  * filter. Training-data pipelines run this before near-dup detection:
  * boilerplate inflates shingle document frequency, which is exactly
  * the regime that quadratic-pair detectors degrade on.
  *
  * Scale design (100 TB corpus):
  * - [[frequentNgrams]] is ONE map-side-combined aggregation over the
  *   gram stream (Spark plans the distinct-doc count as a two-phase
  *   partial-distinct on (gram, doc) — no all-pairs, no window);
  * - the frequent-gram relation is small BY CONSTRUCTION (grams above a
  *   document-frequency floor are the Zipf head), so the occurrence
  *   join in [[passageSpans]] broadcasts under AQE at any corpus size;
  * - interval merging is a per-document running-max window — shuffle by
  *   doc id only, never corpus-global sort.
  */
object Boilerplate {

  /** Word n-grams appearing in at least `minDf` distinct documents,
    * with total occurrence counts (intra-document repeats included).
    * Tokenization is [[TextFunctions.tokens]] (lowercased,
    * whitespace-split) and gram construction is the compiled
    * [[WordGrams]] kernel — one gram per token position, the final
    * gram clamped for documents shorter than `n` tokens.
    */
  def frequentNgrams(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, minDf: Long): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
        explode(WordGrams(TextFunctions.tokens(col(textCol)), n)).as("gram"))
    grams.groupBy("gram")
      .agg(countDistinct(col("id")).as("doc_freq"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("doc_freq") >= minDf)
  }

  /** Boilerplate passages per document: token-position intervals
    * covered by any frequent n-gram (document frequency ≥ `minDf`),
    * with overlapping and adjacent intervals merged. Output columns:
    * (id, span_start, span_end, n_tokens) — token positions are
    * 0-based, `span_end` exclusive, `n_tokens = span_end − span_start`.
    *
    * Shape: gram occurrences with positions (one posexplode), semi-ish
    * join against the mined frequent grams (small — Zipf head — so AQE
    * broadcasts it), then the classic interval-merge window per doc:
    * an interval starts a new span iff its start exceeds the running
    * max end of all earlier intervals; span id = running count of
    * span starts; group by (doc, span id).
    */
  def passageSpans(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, minDf: Long)(implicit cs: CacheScope): DataFrame = {
    // ONE tokenize+gram pass feeds both the df mining and the occurrence
    // join (the positioned stream subsumes [[frequentNgrams]]' input).
    // The CacheScope owns the cache lifetime of this persisted gram
    // relation (cf. TextDedup.minhashLshPairs — process-owned by
    // default; CacheScope.scoped releases it after materialization)
    val toks = df.select(col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val grams = cs.persist(toks.select(col("id"), size(col("toks")).as("n_toks"),
      posexplode(WordGrams(col("toks"), n)).as(Seq("pos", "gram"))))
    val frequent = grams.groupBy("gram")
      .agg(countDistinct(col("id")).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("gram"))
    val occ = grams
      .join(frequent, "gram")
      // the tail gram of a short doc covers only to the end of the doc
      .select(col("id"), col("pos").as("s"),
        least(col("pos") + n, col("n_toks")).as("e"))
    mergeIntervals(occ)
  }

  /** Classic per-doc interval merge over (id, s, e): an interval
    * starts a new span iff its start exceeds the running max end of
    * all earlier intervals; span id = running count of span starts.
    * Shuffled by doc id only (partitioned windows).
    */
  private def mergeIntervals(occ: DataFrame): DataFrame = {
    val wPrev = Window.partitionBy(col("id")).orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("id")).orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    occ
      .withColumn("__new_span",
        when(col("s") > coalesce(max(col("e")).over(wPrev), lit(-1L)), 1L)
          .otherwise(0L))
      .withColumn("__span", sum(col("__new_span")).over(wRun))
      .groupBy(col("id"), col("__span"))
      .agg(min(col("s")).as("span_start"), max(col("e")).as("span_end"))
      .select(col("id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("n_tokens"))
  }

  /** TARGETED spans: token intervals covered by any n-gram present in
    * `patterns` (one `gram` column — e.g. an eval set's shingles),
    * merged per doc. [[passageSpans]] is the df-mined special case;
    * this is the surgical one — decontamination by EXCISION, where
    * dropping whole documents for one leaked paragraph would waste
    * the rest. The pattern relation joins on the gram key (Catalyst
    * broadcasts it when small; at 100 TB the join stays gram-keyed
    * and shuffles pattern-matched occurrences only).
    */
  def matchSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int, patterns: DataFrame): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val grams = toks.select(col("id"), size(col("toks")).as("n_toks"),
      posexplode(WordGrams(col("toks"), n)).as(Seq("pos", "gram")))
    val occ = grams
      .join(patterns.select(col("gram")).distinct(), "gram")
      .select(col("id"), col("pos").as("s"),
        least(col("pos") + n, col("n_toks")).as("e"))
    mergeIntervals(occ)
  }

  /** GLOBAL exact-substring dedup spans with a CANONICAL SURVIVOR —
    * the keep-one-copy semantic of suffix-style training-data
    * deduplication (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better": exact duplicated substrings are
    * removed so each survives once in the corpus). Every n-gram
    * shared by ≥ 2 distinct documents elects the minimal carrier doc
    * id as its owner; token intervals covered by such a gram are
    * to-excise coverage in every document EXCEPT the gram's owner.
    * Returned spans (per-doc merged, same columns as
    * [[passageSpans]]) mark coverage in doc d sourced ONLY from
    * duplicated grams owned by docs ≠ d — a gram is never the REASON
    * its own owner loses tokens, so each duplicated region keeps its
    * canonical copy (the exact guarantee: an owner's occurrence is
    * excised only where OVERLAPPED by foreign duplicated coverage,
    * the same boundary behavior suffix-cluster dedup has at region
    * overlaps). Two deliberate edges: within-doc repeats INSIDE the
    * owner are kept (intra-doc de-repetition is a different operator
    * — cf. `TextDedup`'s de-repetition family), and adjacent
    * intervals sourced from grams with DIFFERENT owners still merge
    * into one span (the merge is coverage-level, like [[matchSpans]]).
    *
    * Contrast within this module: [[passageSpans]] mines FREQUENT
    * grams (df ≥ minDf boilerplate, all occurrences marked);
    * [[matchSpans]] marks occurrences of an EXTERNAL pattern set;
    * this one runs the corpus against itself and spares one carrier.
    *
    * Scale shape: the owner election is ONE gram-keyed aggregation
    * (min + partial-distinct count, map-side combined); the
    * occurrence join shuffles gram-keyed rows and keeps only
    * duplicated, non-owner occurrences; the merge windows are
    * doc-partitioned. No pair join anywhere — a gram seen in k docs
    * costs k rows, never k², so stop-gram skew cannot explode it.
    */
  def canonicalDupSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int)(implicit cs: CacheScope): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val grams = cs.persist(toks.select(col("id"), size(col("toks")).as("n_toks"),
      posexplode(WordGrams(col("toks"), n)).as(Seq("pos", "gram"))))
    val owners = grams.groupBy(col("gram"))
      .agg(min(col("id")).as("__owner"), countDistinct(col("id")).as("__df"))
      .filter(col("__df") >= 2)
      .select(col("gram"), col("__owner"))
    val occ = grams
      .join(owners, "gram")
      .filter(col("id") =!= col("__owner"))
      .select(col("id"), col("pos").as("s"),
        least(col("pos") + n, col("n_toks")).as("e"))
    mergeIntervals(occ)
  }

  /** Documents with [[matchSpans]] intervals excised (tokens inside
    * any span dropped, remainder re-joined with single spaces) —
    * normalizing by construction, like [[stripPassages]].
    */
  def exciseSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int, patterns: DataFrame): DataFrame =
    dropSpanTokens(df, idCol, textCol,
      matchSpans(df, idCol, textCol, n, patterns))

  /** Canonical-survivor dedup under FORGET — what happens to the
    * [[canonicalDupSpans]] decision when documents are deleted:
    * ownership is a MIN aggregate over a gram's carriers, so
    * forgetting the owner forces a RE-ELECTION (next-lowest live
    * carrier), and a duplicated gram whose distinct-carrier count
    * drops below 2 stops being duplicated at all — its coverage
    * RESURFACES everywhere. Returns, per live doc with any
    * before-forget coverage, the excised token counts before and
    * after the forget; restoration is monotone by construction
    * (owner1 = min over a SUBSET of carriers, so a doc that owned a
    * gram before still owns it after — per-gram after-excision
    * implies before-excision, proven in the spec's model test).
    *
    * Scale shape: ONE fused gram aggregate elects BOTH owners
    * (min + conditional min, distinct + conditional distinct — one
    * shuffle, not an election per epoch); both span merges read the
    * same persisted gram relation. The d46 lesson applied to dedup:
    * MIN is not algebraically retractable, but here the before/after
    * pair is computable in one pass because liveness is a column
    * predicate, not an ordering of deltas.
    */
  def canonicalReelection(df: DataFrame, idCol: String, textCol: String,
      n: Int, liveId: Column => Column)(implicit cs: CacheScope): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val grams = cs.persist(toks.select(col("id"), size(col("toks")).as("n_toks"),
      posexplode(WordGrams(col("toks"), n)).as(Seq("pos", "gram"))))
    val own = grams.groupBy(col("gram")).agg(
      min(col("id")).as("__o0"),
      countDistinct(col("id")).as("__d0"),
      min(when(liveId(col("id")), col("id"))).as("__o1"),
      countDistinct(when(liveId(col("id")), col("id"))).as("__d1"))
    val occ = grams.filter(liveId(col("id"))).join(own, "gram")
    def spansOf(dup: Column, owner: Column) = mergeIntervals(
      occ.filter(dup >= 2 && col("id") =!= owner)
        .select(col("id"), col("pos").as("s"),
          least(col("pos") + n, col("n_toks")).as("e")))
    val before = spansOf(col("__d0"), col("__o0"))
      .groupBy(col("id"))
      .agg(sum(col("n_tokens")).cast(LongType).as("excised_before"))
    val after = spansOf(col("__d1"), col("__o1"))
      .groupBy(col("id"))
      .agg(sum(col("n_tokens")).cast(LongType).as("excised_after"))
    before.join(after, Seq("id"), "left")
      .select(col("id"), col("excised_before"),
        coalesce(col("excised_after"), lit(0L)).as("excised_after"))
  }

  /** The corpus after canonical-survivor dedup: documents with
    * [[canonicalDupSpans]] intervals excised — each duplicated region
    * now lives in its owner only, everything else re-joined with
    * single spaces (normalizing by construction, like
    * [[stripPassages]]).
    */
  def canonicalExcise(df: DataFrame, idCol: String, textCol: String,
      n: Int)(implicit cs: CacheScope): DataFrame =
    dropSpanTokens(df, idCol, textCol,
      canonicalDupSpans(df, idCol, textCol, n))

  /** Documents with boilerplate passages stripped: tokens inside any
    * [[passageSpans]] interval are dropped and the remainder re-joined
    * with single spaces. Documents with no frequent-gram coverage pass
    * through with their normalized (lowercased, whitespace-collapsed)
    * token stream intact — this operator normalizes by construction,
    * like [[TextDedup.normalizedGroups]].
    */
  def stripPassages(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, minDf: Long)(implicit cs: CacheScope): DataFrame =
    dropSpanTokens(df, idCol, textCol,
      passageSpans(df, idCol, textCol, n, minDf))

  /** Shared reassembly: drop tokens inside any span, re-join the rest. */
  private def dropSpanTokens(df: DataFrame, idCol: String, textCol: String,
      spansDf: DataFrame): DataFrame = {
    val spans = spansDf
      .groupBy(col("id"))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    df.select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .join(spans, Seq("id"), "left")
      .select(col("id"),
        concat_ws(" ",
          filter(col("__toks"), (t, i) =>
            col("__spans").isNull ||
              !exists(col("__spans"),
                sp => i >= sp("span_start") && i < sp("span_end"))))
          .as("clean_text"))
  }
}
