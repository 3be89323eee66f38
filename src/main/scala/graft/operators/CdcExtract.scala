package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ROW-LEVEL CDC EXTRACTION between two keyed snapshots — the diff
  * that turns a copy-on-write table's version pair into a
  * merge-on-read delta: U for inserted or value-changed keys (the
  * full NEW row), D for removed keys (the OLD row, so the delta
  * carries the full base schema the MoR contract requires). This is
  * the "full load + ongoing replication" bridge (the DMS/Debezium
  * snapshot-diff shape): mirror a CoW table into a [[graft.sources
  * .MorStore]] by shipping O(|changes|) per version transition after
  * the initial copy, instead of re-copying the table.
  *
  * Shape: ONE full-outer join on the keys, change detection by
  * null-safe struct compare over the value columns — no window, no
  * collect; at 100 TB both sides shuffle once on the key (or zero
  * times if both snapshots are bucketed on it).
  */
object CdcExtract {

  /** The delta moving `oldDf` to `newDf` (both key-unique on `keys`,
    * same schema): rows with `__op` ∈ {U, D}. Unchanged keys emit
    * nothing.
    */
  def changes(oldDf: DataFrame, newDf: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(oldDf.columns.sameElements(newDf.columns),
      s"schema mismatch: ${oldDf.columns.mkString(",")} vs " +
        newDf.columns.mkString(","))
    val valCols = oldDf.columns.filterNot(keys.contains).toSeq
    require(valCols.nonEmpty, "key-only tables have no change signal")
    def pack(df: DataFrame, tag: String) = df.select(
      keys.map(col) :+ struct(valCols.map(col): _*).as(tag): _*)
    pack(oldDf, "__old").join(pack(newDf, "__new"), keys, "full_outer")
      .filter(col("__old").isNull || col("__new").isNull ||
        !(col("__old") <=> col("__new")))
      .select(keys.map(col) ++
        valCols.map(c => when(col("__new").isNull, col(s"__old.$c"))
          .otherwise(col(s"__new.$c")).as(c)) :+
        when(col("__new").isNull, lit("D")).otherwise(lit("U")).as("__op"): _*)
      // restore the input column order (keys may not be leading)
      .select(oldDf.columns.toIndexedSeq.map(col) :+ col("__op"): _*)
  }
}
