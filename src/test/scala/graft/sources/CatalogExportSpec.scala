package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Export/import of a catalog cut: cross-table consistency (the
  * export reads ONE generation even as commits land mid-export),
  * manifest-verified import, and refusal of torn or tampered exports.
  */
class CatalogExportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fresh(tag: String): String = {
    val d = Files.createTempDirectory(s"graft-$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def nums(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(_.toLong).toDF("v")
  }

  test("export a cut, import into a fresh catalog, read back identically") {
    val cat = new TableCatalog(spark, fresh("exp-src") + "/cat")
    cat.commitAll(Map("a" -> nums(0, 10), "b" -> nums(0, 25)), 1000L)
    val g = cat.latestGeneration().get
    val dir = fresh("exp-dir")
    // commits landing AFTER the cut is chosen must not leak in
    val m = CatalogExport.exportCut(spark, cat, g, dir)
    cat.commitAll(Map("a" -> nums(0, 99)), 2000L)
    assert(m == Map("a" -> 10L, "b" -> 25L))
    val cat2 = new TableCatalog(spark, fresh("exp-dst") + "/cat")
    val g2 = CatalogExport.importCut(spark, cat2, dir, 100L)
    assert(g2 == 0L)
    assert(cat2.read("a").count() == 10 && cat2.read("b").count() == 25)
  }

  test("a tampered export refuses to import; nothing becomes visible") {
    val cat = new TableCatalog(spark, fresh("exp-src2") + "/cat")
    cat.commitAll(Map("a" -> nums(0, 10), "b" -> nums(0, 25)), 1000L)
    val dir = fresh("exp-dir2")
    CatalogExport.exportCut(spark, cat, cat.latestGeneration().get, dir)
    // tamper: delete one parquet part of table b
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new Path(dir, "b"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    fs.delete(part, false)
    val cat2 = new TableCatalog(spark, fresh("exp-dst2") + "/cat")
    intercept[IllegalArgumentException] {
      CatalogExport.importCut(spark, cat2, dir, 100L)
    }
    assert(cat2.latestGeneration().isEmpty, "partial import became visible")
    // a missing table directory is equally refused
    val dir3 = fresh("exp-dir3")
    CatalogExport.exportCut(spark, cat, cat.latestGeneration().get, dir3)
    fs.delete(new Path(dir3, "a"), true)
    intercept[IllegalArgumentException] {
      CatalogExport.importCut(spark, cat2, dir3, 200L)
    }
    assert(cat2.latestGeneration().isEmpty)
  }
}
