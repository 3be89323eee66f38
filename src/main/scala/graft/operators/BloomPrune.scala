package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomMightContain

/** Bloom-prefiltered exact joins — the middle regime between broadcast
  * and full shuffle that a 100 TB decontamination pass lives in.
  *
  * Broadcast joins stop working when the small side's ROWS outgrow the
  * driver/executor memory (say, an eval-suite gram set in the hundreds
  * of millions), but its Bloom image at 1% fpp is ~1.2 bytes/key —
  * two orders denser. So: build the filter over the small side's key
  * hashes (distributed aggregation), probe it on the big side BEFORE
  * the shuffle, and let only probable matches through to the exact
  * join. The filter's one-sided error keeps every result exact:
  *
  *  - semi join: `false` ⇒ definitely unmatched ⇒ drop pre-shuffle;
  *    survivors confirmed by the exact semi join.
  *  - anti join: `false` ⇒ definitely clean ⇒ KEEP with no join at
  *    all; only probable matches (a vanishing fraction under low fpp)
  *    pay the exact anti join.
  *
  * Either way the shuffle sees `match_rate + fpp` of the corpus
  * instead of all of it. Keys of any type are canonicalized to one
  * `xxhash64` value on both sides (64-bit collisions would break
  * exactness ~never at catalog scales; the exact join re-checks the
  * REAL key columns anyway, so a hash collision costs a shuffled row,
  * not a wrong answer).
  */
object BloomPrune {

  /** Serialized Bloom image of `df`'s distinct key hashes.
    * `expectedItems` sizes the bit array (overestimating is cheap;
    * underestimating inflates fpp, never breaks exactness).
    */
  def buildFilter(df: DataFrame, keyCols: Seq[String],
      expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val bf = df.stat.bloomFilter(keyHash(keyCols), expectedItems, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** The canonical probe hash both sides agree on. */
  def keyHash(keyCols: Seq[String]): Column =
    xxhash64(keyCols.map(col): _*)

  /** Exact left-semi join of `big ⋉ small` on `keyCols`, Bloom-pruned:
    * the big side is filtered by the probe before its shuffle.
    */
  def semiJoin(big: DataFrame, small: DataFrame, keyCols: Seq[String],
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bytes = buildFilter(small, keyCols, expectedItems, fpp)
    big.filter(BloomMightContain(keyHash(keyCols), bytes))
      .join(small.select(keyCols.map(col): _*).distinct(), keyCols, "left_semi")
  }

  /** Exact left-anti join of `big ▷ small` on `keyCols`, Bloom-pruned:
    * rows the filter rejects bypass the join entirely (they cannot
    * match); only probable matches pay the exact anti join. The two
    * legs partition `big`, so the union is exactly `big ▷ small`.
    */
  def antiJoin(big: DataFrame, small: DataFrame, keyCols: Seq[String],
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bytes = buildFilter(small, keyCols, expectedItems, fpp)
    val probe = BloomMightContain(keyHash(keyCols), bytes)
    val definitelyClean = big.filter(!probe)
    val confirmed = big.filter(probe)
      .join(small.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
    definitelyClean.unionByName(confirmed)
  }
}
