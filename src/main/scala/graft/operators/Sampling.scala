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
}
