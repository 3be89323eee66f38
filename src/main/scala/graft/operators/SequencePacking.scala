package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy contiguous sequence packing: assign documents, in a fixed
  * deterministic order, to fixed-size token windows ("packs") — the step
  * that turns a tokenized corpus into context-length training rows.
  *
  * Packing is shard-local by design. A single global greedy pack is a
  * cumulative sum over one total order — a one-partition window that
  * serializes the whole corpus through a single task at 100 TB. Sharding
  * by `id % shards` keeps every running sum inside one window partition
  * (one shuffle, `shards`-way parallel) while staying exactly
  * reproducible: shard, pack and offset are pure integer functions of
  * the data, so reruns and the DuckDB oracle land every document on the
  * same pack. Documents longer than the window spill into the following
  * pack(s), i.e. token-level packing with document splitting — no
  * capacity is wasted and no document is dropped.
  */
object SequencePacking {

  /** Per-shard pack-id namespace width; shards stay disjoint as long as
    * no shard exceeds this many packs (≈ 5×10¹⁴ tokens per shard at
    * ctx 512 — ample for a 100 TB corpus spread over even a handful of
    * shards, but raise it before packing more tokens per shard than
    * that: overflow would silently merge adjacent shards' id ranges).
    */
  val PackIdSpace: Long = 1000000000000L

  /** @param idCol   unique, non-negative row id — uniqueness makes the
    *                 per-shard order total (ties would make the running
    *                 sum partition-dependent), non-negativity keeps `%`
    *                 sharding and integer division engine-portable
    * @param tokens  integer token count expression for a row
    * @return idCol, shard, n_tokens, pack_id, pack_offset (all integers)
    */
  def pack(df: DataFrame, idCol: String, tokens: Column,
      ctx: Int, shards: Int): DataFrame = {
    require(ctx > 0 && shards > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    df.select(col(idCol), tokens.cast("long").as("n_tokens"),
        (col(idCol) % shards).cast("long").as("shard"))
      .withColumn("__start", // tokens before this doc within its shard
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col(idCol), col("shard"), col("n_tokens"),
        (col("shard") * PackIdSpace + expr(s"__start div $ctx")).as("pack_id"),
        expr(s"__start % $ctx").as("pack_offset"))
  }
}
