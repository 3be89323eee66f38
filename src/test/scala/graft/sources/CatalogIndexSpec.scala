package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-resident skip indexes: pruned exact lookups under
  * coverage, verified fallback when the index is stale or mismatched,
  * and refresh restoring pruning.
  */
class CatalogIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshRoot(): String = {
    val d = Files.createTempDirectory("graft-catidx").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/cat"
  }

  private def table(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, i * 7L)).toDF("k", "v")
      .repartitionByRange(8, col("k")) // clustered: disjoint file ranges
  }

  test("covered lookup opens one file of eight and matches the full scan") {
    val cat = new TableCatalog(spark, freshRoot())
    cat.commitAll(Map("t" -> table(800)), 1000L)
    CatalogIndex.refresh(spark, cat, "t", "k", 2000L)
    assert(CatalogIndex.covers(cat, "t", "k"))
    val (df, used, opened) = CatalogIndex.lookup(spark, cat, "t", "k", 400L)
    assert(used && opened == 1L, s"used=$used opened=$opened")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((400L, 2800L)))
    // absent key inside the range: Bloom kills it — zero files opened
    val cnt = cat.read("t").count()
    assert(cnt == 800)
    val (miss, u2, o2) = CatalogIndex.lookup(spark, cat, "t", "k", 100000L)
    assert(u2 && o2 == 0L && miss.isEmpty)
  }

  test("a data commit staleness-breaks the index: fallback stays exact, refresh re-prunes") {
    val cat = new TableCatalog(spark, freshRoot())
    cat.commitAll(Map("t" -> table(800)), 1000L)
    CatalogIndex.refresh(spark, cat, "t", "k", 2000L)
    // rewrite WITHOUT refreshing: index now covers the wrong version
    import spark.implicits._
    cat.commitAll(Map("t" -> (0 until 800).map(i => (i.toLong, i * 9L))
      .toDF("k", "v").repartitionByRange(8, col("k"))), 3000L)
    assert(!CatalogIndex.covers(cat, "t", "k"))
    val (df, used, _) = CatalogIndex.lookup(spark, cat, "t", "k", 400L)
    assert(!used, "stale index must not serve lookups")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((400L, 3600L)), "fallback returned stale data")
    CatalogIndex.refresh(spark, cat, "t", "k", 4000L)
    val (df2, used2, opened2) = CatalogIndex.lookup(spark, cat, "t", "k", 400L)
    assert(used2 && opened2 == 1L)
    assert(df2.head().getLong(1) == 3600L)
  }

  test("a key-column mismatch refuses coverage (never serves the wrong index)") {
    val cat = new TableCatalog(spark, freshRoot())
    cat.commitAll(Map("t" -> table(100)), 1000L)
    CatalogIndex.refresh(spark, cat, "t", "k", 2000L)
    assert(!CatalogIndex.covers(cat, "t", "v"))
    val (_, used, _) = CatalogIndex.lookup(spark, cat, "t", "v", 63L)
    assert(!used)
  }

  test("a dropped data table with a lingering __skipidx denies coverage, not crashes (ADVICE r9)") {
    val cat = new TableCatalog(spark, freshRoot())
    cat.commitAll(Map("t" -> table(100)), 1000L)
    CatalogIndex.refresh(spark, cat, "t", "k", 2000L)
    assert(CatalogIndex.covers(cat, "t", "k"))
    cat.dropTable("t", 3000L) // __skipidx_t stays in the catalog
    // covers() used to call versionOf unconditionally and throw from
    // inside lookup(); it must return false so the caller reaches the
    // read path's CLEAR missing-table error instead
    assert(!CatalogIndex.covers(cat, "t", "k"))
    val e = intercept[Exception] {
      CatalogIndex.lookup(spark, cat, "t", "k", 40L)._1.collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("t"),
      "fallback must surface the missing-table error, not an index crash")
    // the rename flavor: index under the OLD name no longer covers
    val cat2 = new TableCatalog(spark, freshRoot())
    cat2.commitAll(Map("t" -> table(100)), 1000L)
    CatalogIndex.refresh(spark, cat2, "t", "k", 2000L)
    cat2.renameTable("t", "u", 3000L)
    assert(!CatalogIndex.covers(cat2, "t", "k"))
  }
}
