package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Deterministic corpus sampling — the reproducible alternative to
  * `df.sample()` for training-data curation: membership is a pure
  * function of the row's id, so reruns, different partitionings, and
  * different engines (the DuckDB oracle replays it) select the exact
  * same rows. Stratification is any rate expression over the row
  * (per-source, per-language, per-quality-band …), so one narrow
  * filter — no shuffle, full codegen — downsamples every stratum at
  * its own rate in a single pass over 100 TB.
  */
object Sampling {

  /** Uniform hash bucket 0-99 from an md5-derived 60-bit integer of the
    * id — engine-portable (md5 of the decimal string), unlike
    * `hash()`/`xxhash64` whose seeds differ across engines.
    */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast(StringType)), 1, 15), 16, 10)
      .cast(LongType) % 100

  /** Keep each row iff its hash bucket falls under `ratePct` (0-100),
    * evaluated per row — pass a CASE over the stratum column for
    * stratified rates.
    */
  def stratifiedSample(df: DataFrame, idCol: String, ratePct: Column): DataFrame =
    df.filter(hashBucket(col(idCol)) < ratePct)

  /** Group-consistent train/eval split — the LEAKAGE-SAFE version of
    * the naive per-row split: membership is a pure function of the
    * row's GROUP key (content hash, dup-group representative, source
    * domain …), so every member of a duplicate group lands in the
    * same side and the eval set can never contain a near-copy of a
    * training document. A per-doc-id hash split fails exactly this
    * way — planted variants of a train doc leak into eval and inflate
    * every benchmark downstream. Pure narrow projection: no shuffle,
    * no state, deterministic across engines and reruns (the group-key
    * hash is the same md5-bucket identity as [[hashBucket]]).
    */
  def leakageSafeSplit(df: DataFrame, groupKey: Column, trainPct: Int): DataFrame = {
    require(trainPct > 0 && trainPct < 100, s"trainPct $trainPct not in (0,100)")
    df.withColumn("split",
      when(hashBucket(groupKey) < trainPct, "train").otherwise("eval"))
  }

  /** Fine-grained bucket (parts-per-million) for mixture targets where
    * the 0-99 bucket is too coarse.
    */
  def ppmBucket(id: Column): Column =
    conv(substring(md5(id.cast(StringType)), 1, 15), 16, 10)
      .cast(LongType) % 1000000L

  /** Resample a corpus toward a target group mixture — the "domain
    * weighting" step of a training-data pipeline: given integer percent
    * weights per group (language, source domain, quality band) and a
    * token/doc budget of `budgetNum/budgetDen` of the corpus, keep each
    * group at acceptance rate min(1, weight·budget / groupShare).
    *
    * All arithmetic is 64-bit integer (rates live in a 10⁶ bucket
    * space), so membership is a pure function of the row id that the
    * DuckDB oracle replays exactly — no float rate ever decides a row.
    * The data path is shuffle-free: one tiny per-group count aggregate
    * is broadcast back onto the corpus and the keep rule is a single
    * codegen'd filter, which is the only shape that works when the
    * corpus side is 100 TB (at that scale the counts come from table
    * metadata or a sketch instead; the filter is unchanged). Groups
    * absent from `weightsPct` are dropped. The w·budget·10⁶ product is
    * computed in decimal(38,0) (the oracle mirrors with HUGEINT), so the
    * only Long-bounded value is the per-group threshold itself —
    * safe while w·(total·num/den)·10⁶/(100·n) < 2⁶³, i.e. corpora to
    * ~10¹³ rows even in the worst single-row-group stratum.
    */
  def domainMix(df: DataFrame, idCol: String, groupCol: String,
      weightsPct: Map[String, Long],
      budgetNum: Long, budgetDen: Long): DataFrame = {
    require(weightsPct.values.forall(w => w > 0 && w <= 100))
    require(budgetNum > 0 && budgetDen >= budgetNum)
    val wcol = weightsPct.foldLeft(lit(null).cast(LongType)) {
      case (acc, (k, w)) => when(col(groupCol) === k, lit(w)).otherwise(acc)
    }
    // cut the lineage: `counts` feeds both the per-group thresholds and
    // the total — uncut, each consumer re-runs the corpus-wide count
    // scan (two full passes at 100 TB); checkpointed it is |groups| rows
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .localCheckpoint()
    val thresholds = counts
      .crossJoin(broadcast(counts.agg(sum(col("__n")).as("__total"))))
      .withColumn("__w", wcol)
      .filter(col("__w").isNotNull)
      .withColumn("__thr", least(lit(1000000L),
        expr(s"cast(__w as decimal(38,0)) * ((cast(__total as decimal(38,0)) * $budgetNum) div $budgetDen) * 1000000 div (100 * __n)")))
      .select(col(groupCol), col("__thr"))
    df.join(broadcast(thresholds), groupCol)
      .filter(ppmBucket(col(idCol)) < col("__thr"))
      .drop("__thr")
  }

  /** Per-domain token-budget admission (the d26 operator) via a quality
    * HISTOGRAM prefilter — exact, not approximate. Documents are
    * admitted per domain in (quality DESC, id ASC) order while the
    * running token total stays ≤ `budget`.
    *
    * The naive form is one window per domain: a 100 TB corpus with few
    * domains serializes each domain through a single task. This form
    * never sorts a whole domain:
    *
    *  1. bucket quality into ⌊q/bucketWidth⌋ coarse bands and build a
    *     per-(domain, bucket) token histogram — ONE map-side-combined
    *     aggregate, |domains|×|buckets| rows;
    *  2. prefix-sum the tiny histogram per domain (descending bucket)
    *     to get each bucket's `prev_cum` = tokens in strictly-better
    *     buckets;
    *  3. broadcast it back and DROP every doc whose bucket already
    *     exhausted the budget (`prev_cum > budget`) — a pure codegen
    *     filter that rejects the overwhelming majority of the corpus
    *     with no sort;
    *  4. window only the survivors (≈ admitted set + the one boundary
    *     bucket per domain), partitioned by (domain, bucket) — never a
    *     whole domain — offset each in-bucket running sum by prev_cum.
    *
    * Exactness: bucket order refines quality order (every doc in a
    * higher bucket outranks every doc in a lower one; quality ties
    * share a bucket), so in-bucket rank + prev_cum ≡ the full-sort
    * running sum, row for row — the d26 oracle replays the full sort
    * and hash-matches. Zero-token docs after the overflow point are
    * excluded by both forms (the running sum is monotone, and the
    * overflowing doc's tokens are already inside it).
    *
    * Preconditions (on the DATA, not checkable in the driver-side
    * require): `tokensCol` values must be ≥ 0 — the bucket-drop
    * prefilter assumes the running token total is monotone, so a
    * negative count would silently admit the wrong rows vs the naive
    * running-sum form. NULL domains/qualities are handled identically
    * to the naive window form (each NULL domain is its own partition;
    * NULL quality sorts last like the window's default null ordering):
    * the histogram join is NULL-SAFE (`<=>`), so the histogram path
    * cannot silently drop rows the window path would admit.
    */
  def tokenBudgetAdmit(
      docs: DataFrame, domainCol: String, idCol: String,
      qualityCol: String, tokensCol: String,
      budget: Long, bucketWidth: Long): DataFrame = {
    require(budget >= 0 && bucketWidth > 0)
    val W = org.apache.spark.sql.expressions.Window
    val base = docs.select(col(domainCol), col(idCol), col(qualityCol), col(tokensCol))
      .withColumn("__qbucket", floor(col(qualityCol) / bucketWidth).cast(LongType))
    val bw = W.partitionBy(col(domainCol)).orderBy(col("__qbucket").desc)
      .rowsBetween(W.unboundedPreceding, -1)
    val hist = base.groupBy(col(domainCol), col("__qbucket"))
      .agg(sum(col(tokensCol)).as("__btokens"))
      .withColumn("__prev_cum", coalesce(sum(col("__btokens")).over(bw), lit(0L)))
      .select(col(domainCol).as("__hd"), col("__qbucket").as("__hb"),
        col("__prev_cum"))
    val dw = W.partitionBy(col(domainCol), col("__qbucket"))
      .orderBy(col(qualityCol).desc, col(idCol))
      .rowsBetween(W.unboundedPreceding, 0)
    base.join(broadcast(hist),
        col(domainCol) <=> col("__hd") && col("__qbucket") <=> col("__hb"))
      .drop("__hd", "__hb")
      .filter(col("__prev_cum") <= budget)
      .withColumn("cum_tokens", col("__prev_cum") + sum(col(tokensCol)).over(dw))
      .filter(col("cum_tokens") <= budget)
      .select(col(idCol), col(domainCol), col(tokensCol), col("cum_tokens"))
  }

  /** Leakage-safe train/val/test split: the split UNIT is a group
    * (source domain, url host, dedup component id …), hashed once, so
    * every document of a group lands on the same side — within-group
    * near-duplicates can never straddle the split boundary, which is
    * the classic train→eval contamination channel a row-level split
    * leaves open. `trainPct`/`valPct` are integer percents of the
    * GROUP hash space (group counts, not doc counts — the point is
    * purity, not exact sizing; pair with [[domainMix]] when the doc
    * mass per side must also hit a target). The remainder is "test".
    *
    * Zero shuffle at any scale: membership is one md5 of the group key
    * per row, a pure codegen projection the DuckDB oracle replays
    * byte-for-byte ([[hashBucket]] — engine-portable, unlike
    * `hash()`/`xxhash64` whose seeds differ across engines). NULL
    * group keys hash to the md5 of the SQL NULL → bucket NULL → split
    * "test" via the otherwise-branch, on both engines.
    */
  def groupSplit(df: DataFrame, groupCol: String,
      trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "percents must be non-negative and sum to <= 100")
    val b = hashBucket(col(groupCol))
    df.withColumn("split",
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Deterministic corpus shuffle into training shards — the shard
    * writer's assignment step: a training run wants the corpus in a
    * reproducible pseudo-random order, materialized as N shard files
    * each internally shuffled. Each doc gets a 60-bit order key (md5
    * of its id, chars 1-15) and a shard from an INDEPENDENT md5 slice
    * (chars 16-23 — reusing the order key would make shard membership
    * a function of in-shard position); `shard_pos` ranks the order key
    * within the shard, id tie-break.
    *
    * Scale shape: one shuffle, partitioned BY SHARD with an in-shard
    * sort — exactly the distribution a shard writer needs
    * (`repartition(shard).sortWithinPartitions(okey)` then write).
    * `numShards` is chosen so corpus/N ≈ the target shard file size
    * (N grows with the corpus; per-shard volume — and so per-task sort
    * memory — stays constant at 100 TB). The hash order key makes the
    * permutation a pure function of doc ids: reruns, retries, and the
    * DuckDB oracle all produce the identical shuffle.
    */
  def shardShuffle(df: DataFrame, idCol: String, numShards: Int): DataFrame = {
    require(numShards > 0)
    val okey = conv(substring(md5(col(idCol).cast(StringType)), 1, 15), 16, 10)
      .cast(LongType)
    val shard = conv(substring(md5(col(idCol).cast(StringType)), 16, 8), 16, 10)
      .cast(LongType) % numShards
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__okey"), col(idCol))
    df.withColumn("__okey", okey)
      .withColumn("shard", shard)
      .withColumn("shard_pos", row_number().over(w))
      .drop("__okey")
  }

  /** Upsampling-with-replacement by integer per-domain epoch factors —
    * the mixture-reweighting step of a training-data pipeline (a "3×
    * wiki, 2× code, drop spam" recipe): each doc expands into
    * `epochs(domain)` copies tagged `epoch` = 1..e (0 ⇒ dropped,
    * unlisted domains ⇒ `defaultEpochs`). Downstream, [[shardShuffle]]
    * on (id, epoch) scatters the copies so repeats of a doc land in
    * different shards.
    *
    * Scale shape: ZERO shuffles — the factor lookup is a literal
    * when-chain (the recipe is config-sized, never a joined relation)
    * and the expansion is a generator on each row; output volume is
    * the weighted sum the recipe asked for. Epoch factors are INTEGER
    * by design: fractional mixture weights belong to [[domainMix]]
    * (hash-rate downsampling); composing the two expresses any
    * rational weight ≥ 0 exactly, with no RNG on either engine.
    */
  def epochUpsample(df: DataFrame, domainCol: String,
      epochs: Map[String, Int], defaultEpochs: Int = 1): DataFrame = {
    require(epochs.values.forall(_ >= 0) && defaultEpochs >= 0,
      "epoch factors must be non-negative")
    val e = epochs.foldLeft(lit(defaultEpochs)) { case (acc, (d, n)) =>
      when(col(domainCol) === d, lit(n)).otherwise(acc)
    }
    // sequence(1, 0) would DESCEND (Spark default step -1): empty-array
    // branch expresses e = 0, and plain explode drops those rows
    df.withColumn("epoch",
      explode(when(e >= 1, sequence(lit(1), e))
        .otherwise(array().cast("array<int>"))))
  }

  /** Deterministic weighted sampling WITHOUT replacement, k per stratum
    * — Efraimidis-Spirakis A-Res: each row draws a uniform u from its
    * id (md5-derived, engine-portable) and gets key u^(1/w); the top-k
    * keys per stratum are an exact weighted sample without
    * replacement. Ranking by ln(u)/w descending is the same order as
    * u^(1/w) descending (ln is monotone, w > 0), without the pow.
    *
    * Determinism: u is a pure function of the id (no RNG state), so
    * the selected set is stable across reruns, partitionings, and
    * engines — the DuckDB oracle replays the identical arithmetic.
    * Ties (measure-zero on distinct ids) break by id.
    *
    * Scale shape: one rank window partitioned by the stratum — the
    * standard per-group top-k that AQE handles with WindowGroupLimit
    * pushdown (partial top-k before the shuffle), so the full corpus
    * is never sorted globally. Rows with w ≤ 0 are excluded (zero
    * weight = never sampled), matching the A-Res domain.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      strataCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    // u in (0, 1]: (h + 1) / 2^60 over the 60-bit md5 prefix — +1 keeps
    // ln(u) finite at h = 0
    val u = (conv(substring(md5(col(idCol).cast(StringType)), 1, 15), 16, 10)
      .cast(LongType) + 1).cast("double") / lit(1152921504606846976.0)
    val keyed = df.filter(col(weightCol) > 0)
      .withColumn("ares_key", log(u) / col(weightCol))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("ares_key").desc, col(idCol))
    keyed.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
      .drop("ares_key")
  }
}
