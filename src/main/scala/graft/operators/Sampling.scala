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
}
